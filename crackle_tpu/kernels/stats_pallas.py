"""Per-component slice statistics on TPU: counts, coordinate sums
(centroids), and x/y extents (bounding boxes) in ONE pass over the
CCL image.

Reference parity: operations.hpp voxel_counts (321-419), centroids
(421-539), bounding_boxes (541-665) walk each decoded slice with
per-voxel scalar loops on a thread pool. Here the decoded CCL image
(already on device from the decode kernels) is reduced with a
stripe-windowed one-hot accumulation:

  * first-visit component ids are raster-ordered, so an 8-row stripe
    of the image only contains ids from a narrow window [rmin, rmax]
    (the same locality the plant-paint kernel exploits);
  * per image row, a (KW, sx) one-hot of the id row accumulates into
    a column histogram at a dynamic row offset — colhist[k, x] =
    |{y : cc[y, x] = k}| — plus running y-extent/y-sum registers;
  * counts / x-sums / x-extents then fall out of colhist with plain
    lane reductions; y statistics come from the per-row partial sums.

Everything per slice stays in VMEM; the (B, cap_n, 8) stats block is
the only output. The host maps component ids to labels (flat-format
key tables) and aggregates, which is O(total components), not
O(voxels).
"""
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import ccl_pallas

_F32MAX = np.float32(3.0e38)

KW = 128      # component-id window height per one-hot block
STRIPE = 8    # rows per window-bound probe

# output channel layout (lane index in the stats block)
CH_COUNT, CH_XSUM, CH_YSUM, CH_XMIN, CH_XMAX, CH_YMIN, CH_YMAX = \
  range(7)
N_CH = 8  # padded


def _stats_kernel(cc_ref, out_ref, col_scr, yext_scr, *, sx, sy,
                  cap_n):
  """One slice: cc (sy, sx) int32 -> (cap_n, 8) f32 stats."""
  CAPP = cap_n + KW  # window slack: k0 may start near cap_n
  col_scr[:, :] = jnp.zeros((CAPP, sx), jnp.float32)
  yext_scr[:, :] = jnp.zeros((CAPP, 128), jnp.float32)
  # yext lanes: 0 = ymin acc (stores min(y)), 1 = ymax, 2 = ysum
  yext_scr[:, 0:1] = jnp.full((CAPP, 1), _F32MAX, jnp.float32)
  yext_scr[:, 1:2] = jnp.full((CAPP, 1), -1.0, jnp.float32)

  iota_k = jax.lax.broadcasted_iota(jnp.int32, (KW, sx), 0)
  lane3 = jax.lax.broadcasted_iota(jnp.int32, (KW, 128), 1)

  n_stripes = (sy + STRIPE - 1) // STRIPE

  def stripe_body(s, carry):
    y0 = s * STRIPE
    blk = cc_ref[0, pl.ds(y0, STRIPE), :]
    rmin = jnp.min(blk)
    rmax = jnp.max(blk)
    # window starts at an 8-aligned offset below rmin
    k0_base = jnp.maximum((rmin >> 3) << 3, 0)
    nwin = (rmax - k0_base) // KW + 1

    def win_body(w, c2):
      k0 = k0_base + w * KW

      def row_body(yy, c3):
        row = cc_ref[0, pl.ds(y0 + yy, 1), :]  # (1, sx)
        rb = jax.lax.broadcast_in_dim(row, (KW, sx), (0, 1))
        A = jnp.where(rb - k0 == iota_k, jnp.float32(1),
                      jnp.float32(0))
        col_scr[pl.ds(k0, KW), :] = col_scr[pl.ds(k0, KW), :] + A
        rowsum = jnp.sum(A, axis=1, keepdims=True)  # (KW, 1)
        rs = jax.lax.broadcast_in_dim(rowsum, (KW, 128), (0, 1))
        yf = (y0 + yy).astype(jnp.float32)
        ye = yext_scr[pl.ds(k0, KW), :]
        hit = rs > 0
        upd = jnp.where(
          lane3 == 0, jnp.where(hit, jnp.minimum(ye, yf), ye),
          jnp.where(
            lane3 == 1, jnp.where(hit, jnp.maximum(ye, yf), ye),
            jnp.where(lane3 == 2, ye + rs * yf, ye)))
        yext_scr[pl.ds(k0, KW), :] = upd
        return c3

      jax.lax.fori_loop(0, STRIPE, row_body, 0)
      return c2

    jax.lax.fori_loop(0, nwin, win_body, 0)
    return carry

  jax.lax.fori_loop(0, n_stripes, stripe_body, 0)

  # reduce colhist -> per-component stats
  ch = col_scr[0:cap_n, :]
  xio = jax.lax.broadcasted_iota(jnp.int32, (cap_n, sx), 1) \
    .astype(jnp.float32)
  count = jnp.sum(ch, axis=1, keepdims=True)
  xsum = jnp.sum(ch * xio, axis=1, keepdims=True)
  pres = ch > 0
  xmin = jnp.min(jnp.where(pres, xio, _F32MAX), axis=1, keepdims=True)
  xmax = jnp.max(jnp.where(pres, xio, -1.0), axis=1, keepdims=True)
  ymin = yext_scr[0:cap_n, 0:1]
  ymax = yext_scr[0:cap_n, 1:2]
  ysum = yext_scr[0:cap_n, 2:3]

  lane = jax.lax.broadcasted_iota(jnp.int32, (cap_n, N_CH), 1)

  def put(acc, i, v):
    vb = jax.lax.broadcast_in_dim(v, (cap_n, N_CH), (0, 1))
    return jnp.where(lane == i, vb, acc)

  out = jnp.zeros((cap_n, N_CH), jnp.float32)
  out = put(out, CH_COUNT, count)
  out = put(out, CH_XSUM, xsum)
  out = put(out, CH_YSUM, ysum)
  out = put(out, CH_XMIN, xmin)
  out = put(out, CH_XMAX, xmax)
  out = put(out, CH_YMIN, ymin)
  out = put(out, CH_YMAX, ymax)
  out_ref[0] = out


def eligible(sx: int, sy: int, cap_n: int) -> bool:
  if sy % STRIPE != 0:
    return False
  if cap_n > 4096 or sx > 1024 or sx < 8:
    return False
  vmem = ((cap_n + KW) * sx * 4      # colhist
          + (cap_n + KW) * 128 * 4   # y extents
          + 4 * cap_n * sx * 4)      # reduction temps
  return vmem <= 12 * 1024 * 1024


def slice_stats_traced(cc, sx: int, sy: int, cap_n: int):
  """cc: (B, sy*sx) int32 device CCL images -> (B, cap_n, 8) f32.

  Channels: count, x-sum, y-sum, x-min, x-max, y-min, y-max (empty
  components: count 0, mins +big, maxes -1). Call inside jit."""
  B = cc.shape[0]
  v2 = cc.reshape(B, sy, sx)
  with jax.enable_x64(False):
    out = pl.pallas_call(
      functools.partial(_stats_kernel, sx=sx, sy=sy, cap_n=cap_n),
      grid=(B,),
      in_specs=[
        pl.BlockSpec((1, sy, sx), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
      ],
      out_specs=pl.BlockSpec((1, cap_n, N_CH), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
      out_shape=jax.ShapeDtypeStruct((B, cap_n, N_CH), jnp.float32),
      scratch_shapes=[
        pltpu.VMEM((cap_n + KW, sx), jnp.float32),
        pltpu.VMEM((cap_n + KW, 128), jnp.float32),
      ],
      compiler_params=ccl_pallas._compiler_params(sx, sy),
      interpret=ccl_pallas.INTERPRET,
    )(v2)
  return out


slice_stats = jax.jit(slice_stats_traced,
                      static_argnames=("sx", "sy", "cap_n"))
