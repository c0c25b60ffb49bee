"""JAX/TPU decode engine.

The per-slice decode pipeline (packed crack bytes -> codepoints ->
symbols -> positions -> VCG -> CCL -> component keys) expressed as
fixed-shape, data-parallel jnp ops so XLA can fuse and vectorize it on
the TPU's VPU, with slices as the batch (vmap/shard) axis:

  * 2-bit unpack + mod-4 cumsum undiff         (elementwise + scan)
  * b/t pair classification via run parity     (cummax + elementwise)
  * chain segmentation via running minima      (cummin)
  * branch-stack replay via scope matching     (sort + searchsorted +
                                                scatter-add + cumsum)
  * VCG painting via presence rasters          (scatter-max)
  * CCL via FastSV-style min-label propagation (shifts + scatter-min +
                                                pointer jumping)
  * first-visit renumbering                    (cumsum + gather)

This mirrors crackle_tpu.ops.crackcode / ops.ccl bit-for-bit; the
numpy implementations there are the correctness oracle.
"""
import functools
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

# The scope-matching sort keys need 64-bit integer range
# (depth * (2*CAP) + position overflows int32 for large slices).
jax.config.update("jax_enable_x64", True)

UP, RIGHT, DOWN, LEFT = 0, 1, 2, 3

_INT32_MAX = np.iinfo(np.int32).max


def _next_pow2(x: int) -> int:
  return 1 << max(int(x) - 1, 1).bit_length()


# ---------------------------------------------------------------------------
# Per-slice decode: packed bytes -> renumbered CCL + N
# ---------------------------------------------------------------------------

@functools.partial(
  jax.jit, static_argnames=("sx", "sy", "permissible", "ccl_iters")
)
def decode_slices_to_ccl(packed, nbytes, nodes, n_chains,
                         sx: int, sy: int, permissible: bool,
                         ccl_iters: int = 0):
  """Batched slice decode.

  packed:   (B, CAP_B) uint8  packed move bytes (BOC stripped)
  nbytes:   (B,)       int32  valid byte count per slice
  nodes:    (B, CAP_CH) int32 chain start corner nodes (sorted)
  n_chains: (B,)       int32  valid chain count per slice

  Returns (cc_labels (B, sy*sx) int32 first-visit numbered, N (B,)).
  """
  vcg = jax.vmap(
    lambda p, nb, nd, nc: _decode_one_vcg(p, nb, nd, nc, sx, sy,
                                          permissible)
  )(packed, nbytes, nodes, n_chains)
  cc, N = _ccl_batch(vcg, sx, sy, ccl_iters)
  return cc, N


def _decode_one_vcg(packed, nbytes, nodes, n_chains, sx, sy, permissible):
  """One slice: packed bytes -> 4-bit VCG (sy*sx,) uint8."""
  CAP_B = packed.shape[0]
  CAP_CH = nodes.shape[0]
  n_cps = nbytes * 4
  sxe = sx + 1

  # --- unpack 2-bit diffs, undiff via cumsum mod 4 ---
  b = packed.astype(jnp.int32)
  diffs = jnp.stack(
    [b & 3, (b >> 2) & 3, (b >> 4) & 3, (b >> 6) & 3], axis=1
  ).reshape(-1)  # (CAP_CPS,)
  CAP = diffs.shape[0]
  idx = jnp.arange(CAP, dtype=jnp.int32)
  in_range = idx < n_cps
  diffs = jnp.where(in_range, diffs, 0)
  cps = jnp.cumsum(diffs) & 3

  # --- classify: pair-second via run parity of the reversal flag ---
  prev = jnp.concatenate([jnp.full((1,), 255, jnp.int32), cps[:-1]])
  r = ((cps ^ prev) == 0b10) & in_range
  run_start = jnp.where(
    r & ~jnp.concatenate([jnp.zeros((1,), bool), r[:-1]]), idx, -1
  )
  run_start = jax.lax.cummax(jnp.where(r, run_start, -1))
  is_second = r & (((idx - run_start) & 1) == 0)

  pair_first = jnp.concatenate([is_second[1:], jnp.zeros((1,), bool)])
  second_cp = jnp.concatenate([cps[1:], jnp.zeros((1,), jnp.int32)])
  # UP(00)/LEFT(11) second -> terminate; DOWN/RIGHT -> branch
  is_term_pair = (second_cp == UP) | (second_cp == LEFT)
  is_branch = pair_first & ~is_term_pair
  is_term = pair_first & is_term_pair
  is_move = ~pair_first & ~is_second & in_range

  # --- chain segmentation: k-th chain ends at k-th strict new min ---
  tok = jnp.where(is_branch, 1, 0) - jnp.where(is_term, 1, 0)
  c = jnp.cumsum(tok)
  runmin = jax.lax.cummin(jnp.concatenate([jnp.zeros((1,), jnp.int32),
                                           c]))[:-1]
  is_end = (c < runmin) & in_range
  ends = jnp.nonzero(is_end, size=CAP_CH, fill_value=_INT32_MAX)[0] \
    .astype(jnp.int64)
  chain_ok = jnp.arange(CAP_CH) < n_chains
  ends = jnp.where(chain_ok, ends, jnp.int64(_INT32_MAX))

  last_end = jnp.where(
    n_chains > 0,
    ends[jnp.clip(n_chains - 1, 0, CAP_CH - 1)],
    jnp.int64(-1),
  )
  valid = idx <= (last_end + 1)

  # chain id per codepoint
  chain_of = jnp.clip(
    jnp.searchsorted(ends, idx.astype(jnp.int64), side='left'),
    0, jnp.maximum(n_chains - 1, 0),
  ).astype(jnp.int32)
  chain_start = jnp.where(
    chain_ok,
    jnp.concatenate([jnp.zeros((1,), jnp.int64), ends[:-1] + 2]),
    jnp.int64(CAP),
  )
  chain_start = jnp.clip(chain_start, 0, CAP).astype(jnp.int32)

  depth_after = c + chain_of + 1

  # --- scope matching: sort (depth, position) events ---
  BIG = jnp.int64(2 * CAP + 4)
  INF = jnp.int64(2 ** 62)

  open_key_real = jnp.where(
    is_branch & valid,
    depth_after.astype(jnp.int64) * BIG + 2 * idx.astype(jnp.int64),
    INF,
  )
  open_key_virtual = jnp.where(
    chain_ok,
    1 * BIG + (2 * chain_start.astype(jnp.int64) - 1),
    INF,
  )
  okeys = jnp.concatenate([open_key_real, open_key_virtual])

  close_key = jnp.where(
    is_term & valid,
    (depth_after + 1).astype(jnp.int64) * BIG + 2 * idx.astype(jnp.int64),
    INF,
  )
  # closes: real terms only; the count matches opens (#b + #chains)
  ckeys = jnp.sort(
    jnp.concatenate([close_key, jnp.full((CAP_CH,), INF, jnp.int64)])
  )
  oorder = jnp.argsort(okeys)
  okeys_sorted = okeys[oorder]
  close_pos_sorted = jnp.where(
    ckeys < INF, (ckeys % BIG) // 2, jnp.int64(CAP)
  ).astype(jnp.int32)

  # enclosing scope of each move -> its close position
  mkeys = jnp.where(
    is_move & valid,
    depth_after.astype(jnp.int64) * BIG + 2 * idx.astype(jnp.int64),
    INF - 1,
  )
  oi = jnp.searchsorted(okeys_sorted, mkeys, side='right') - 1
  oi = jnp.clip(oi, 0, okeys_sorted.shape[0] - 1)
  close_of_move = close_pos_sorted[oi]
  close_of_move = jnp.where(is_move & valid, close_of_move, CAP)

  # --- replay positions: scatter +delta at move, -delta at close ---
  delta_lut = jnp.array([-sxe, 1, sxe, -1], jnp.int32)
  deltas = jnp.where(is_move & valid, delta_lut[cps], 0)

  acc = jnp.zeros((CAP + 1,), jnp.int32)
  acc = acc.at[idx].add(deltas)
  acc = acc.at[close_of_move].add(-deltas, mode='drop')
  node_vals = jnp.where(chain_ok, nodes, 0).astype(jnp.int32)
  acc = acc.at[chain_start].add(node_vals, mode='drop')
  next_start = jnp.concatenate(
    [chain_start[1:], jnp.full((1,), CAP, jnp.int32)]
  )
  next_start = jnp.where(chain_ok, next_start, CAP)
  acc = acc.at[next_start].add(-node_vals, mode='drop')
  pos_after = jnp.cumsum(acc[:CAP])
  pos_before = pos_after - deltas

  # --- paint presence rasters ---
  py = pos_before // sxe
  px = pos_before - py * sxe

  is_u = is_move & valid & (cps == UP)
  is_d = is_move & valid & (cps == DOWN)
  is_l = is_move & valid & (cps == LEFT)
  is_r = is_move & valid & (cps == RIGHT)

  OOBV = sy * sxe
  OOBH = (sy + 1) * sx
  v_idx = jnp.where(
    is_u, px + sxe * (py - 1),
    jnp.where(is_d, px + sxe * py, OOBV)
  )
  v_idx = jnp.where(v_idx >= 0, v_idx, OOBV)
  h_idx = jnp.where(
    is_l, (px - 1) + sx * py,
    jnp.where(is_r, px + sx * py, OOBH)
  )
  h_idx = jnp.where(h_idx >= 0, h_idx, OOBH)

  V = jnp.zeros((sy * sxe,), jnp.uint8)
  V = V.at[v_idx].max(1, mode='drop')
  H = jnp.zeros(((sy + 1) * sx,), jnp.uint8)
  H = H.at[h_idx].max(1, mode='drop')
  V2 = V.reshape(sy, sxe)
  H2 = H.reshape(sy + 1, sx)

  vcg = (V2[:, 1:]
         | (V2[:, :sx] << 1)
         | (H2[1:, :] << 2)
         | (H2[:sy, :] << 3))
  vcg = vcg.reshape(-1)
  if not permissible:
    vcg = vcg ^ 0b1111
  return vcg


def _ccl_batch(vcg, sx, sy, ccl_iters: int):
  """Batched 4-connected CCL from VCG with first-visit numbering.

  FastSV-style: min-label propagation over passable edges + pointer
  jumping, iterated to a fixed point. Components end up labeled by
  their minimum flat index; the renumber pass converts that to dense
  first-visit raster order (identical to the reference's union-find
  numbering)."""
  B = vcg.shape[0]
  n = sx * sy
  v2 = vcg.reshape(B, sy, sx)
  left_ok = (v2 & 0b0010) > 0   # passable to x-1
  up_ok = (v2 & 0b1000) > 0     # passable to y-1

  p0 = jnp.broadcast_to(
    jnp.arange(n, dtype=jnp.int32).reshape(1, sy, sx), (B, sy, sx)
  )

  def neighbor_min(p):
    m = p
    if sx > 1:
      # from left neighbor (valid where left_ok, x>0)
      m = m.at[:, :, 1:].min(jnp.where(
        left_ok[:, :, 1:], p[:, :, :-1], _INT32_MAX))
      # from right neighbor
      m = m.at[:, :, :-1].min(jnp.where(
        left_ok[:, :, 1:], p[:, :, 1:], _INT32_MAX))
    if sy > 1:
      m = m.at[:, 1:, :].min(jnp.where(
        up_ok[:, 1:, :], p[:, :-1, :], _INT32_MAX))
      m = m.at[:, :-1, :].min(jnp.where(
        up_ok[:, 1:, :], p[:, 1:, :], _INT32_MAX))
    return m

  def cond(state):
    _p, changed, _it = state
    return changed

  def body_wrapped(state):
    p, changed, it = state
    m = neighbor_min(p)
    pf = p.reshape(B, n)
    mf = m.reshape(B, n)
    pf2 = jnp.take_along_axis(pf, pf, axis=1)
    roots = jnp.minimum(pf2, mf)
    base = jnp.full_like(pf, _INT32_MAX)
    hooked = base.at[jnp.arange(B)[:, None], pf].min(roots)
    newp = jnp.minimum(pf, hooked)
    for _ in range(2):
      newp = jnp.take_along_axis(newp, newp, axis=1)
    changed = jnp.any(newp != pf)
    return newp.reshape(B, sy, sx), changed, it + 1

  state = (p0, jnp.asarray(True), jnp.asarray(0, jnp.int32))
  p, _, _ = jax.lax.while_loop(cond, body_wrapped, state)
  pf = p.reshape(B, n)

  # first-visit renumber: roots are component min indices; rank them
  is_root = pf == jnp.arange(n, dtype=jnp.int32)[None, :]
  rank = jnp.cumsum(is_root.astype(jnp.int32), axis=1) - 1
  cc = jnp.take_along_axis(rank, pf, axis=1)
  N = rank[:, -1] + 1
  return cc, N


# ---------------------------------------------------------------------------
# Label painting
# ---------------------------------------------------------------------------

@jax.jit
def paint_keys(cc, N, key_offsets, keys):
  """cc (B, n) window-local component ids -> global key indices via
  per-slice offsets, then gather the uniq-index keys."""
  off = key_offsets[:, None]
  return keys[cc + off]


@jax.jit
def paint_labels_u32(cc, key_offsets, keys, uniq):
  """Full on-device paint when labels fit in uint32."""
  off = key_offsets[:, None]
  return uniq[keys[cc + off]]
