"""Device-side encode components.

The crack-code DFS trace is intrinsically sequential and stays on the
host (native C++); everything else about encoding is data-parallel and
runs on device:

  * boundary extraction: the voxel connectivity graph of a label
    volume is pure elementwise comparison,
  * per-slice CCL with format-normative numbering (the Pallas sweep
    kernel, shared with decode),
  * format choice statistics (pixel_pairs, max label) as reductions,
  * per-label/per-component histograms for the label map.

These are the building blocks for a fully sharded encode where only
the per-slice trace round-trips to the host.
"""
import functools

import numpy as np
import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("sx", "sy"))
def labels_to_vcg(labels_zyx, sx: int, sy: int):
  """Label slices -> 4-bit voxel connectivity graphs.

  labels_zyx: (B, sy, sx) label image batch.
  Returns (B, sy*sx) uint8 with bits +x, -x, +y, -y passable
  (= labels equal), matching the decoder's convention.
  """
  a = labels_zyx
  B = a.shape[0]
  right = jnp.zeros(a.shape, bool).at[:, :, :-1].set(
    a[:, :, :-1] == a[:, :, 1:]
  )
  left = jnp.zeros(a.shape, bool).at[:, :, 1:].set(
    a[:, :, 1:] == a[:, :, :-1]
  )
  down = jnp.zeros(a.shape, bool).at[:, :-1, :].set(
    a[:, :-1, :] == a[:, 1:, :]
  )
  up = jnp.zeros(a.shape, bool).at[:, 1:, :].set(
    a[:, 1:, :] == a[:, :-1, :]
  )
  vcg = (right.astype(jnp.uint8)
         | (left.astype(jnp.uint8) << 1)
         | (down.astype(jnp.uint8) << 2)
         | (up.astype(jnp.uint8) << 3))
  return vcg.reshape(B, sy * sx)


def ccl_from_labels(labels_zyx, sx: int, sy: int):
  """Per-slice first-visit CCL of a label batch on device.

  Returns (cc (B, sy*sx) int32, N (B,) int32) identical to the host
  ops.ccl.connected_components_slice numbering."""
  from . import ccl_pallas
  vcg = labels_to_vcg(labels_zyx, sx, sy)
  return ccl_pallas.ccl_batch(vcg, sx, sy)


@jax.jit
def format_stats(labels_flat):
  """(pixel_pairs, max_label) reductions for the encoder's format
  choice (crackle.hpp:48-55 parity)."""
  a = labels_flat
  pairs = jnp.sum(a[1:] == a[:-1])
  return pairs, jnp.max(a) if a.size else jnp.zeros((), a.dtype)


def component_labels(labels_zyx, cc, N, sx: int, sy: int):
  """Per-component source label (the flat-encode per-slice mapping):
  mapping[k] = label at the k-th component's first-visit voxel.

  Device part returns per-slice dense tables (B, CAP_N); the host
  trims each row to N[z]."""
  B = labels_zyx.shape[0]
  n = sx * sy
  cap_n = int(np.max(np.asarray(N))) if B else 0
  cap_n = max(1, 1 << max(int(cap_n) - 1, 0).bit_length())
  flat_labels = labels_zyx.reshape(B, n)

  @functools.partial(jax.jit, static_argnames=("cap",))
  def tables(flat_labels, cc, cap):
    # first-visit voxel of component k is the first index with cc==k;
    # scatter-min of position per component, then gather the label
    idx = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None, :],
                           (B, n))
    first = jnp.full((B, cap), n, jnp.int32).at[
      jnp.arange(B)[:, None], cc
    ].min(idx, mode='drop')
    first = jnp.minimum(first, n - 1)
    return jnp.take_along_axis(flat_labels, first, axis=1)

  return tables(flat_labels, cc, cap_n)
