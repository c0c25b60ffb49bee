"""Pallas TPU kernel for per-slice connected components labeling.

One grid step = one slice resident in VMEM. Labels start as flat
raster indices and converge to each component's minimum index via
alternating forward/backward row and column segmented-min sweeps, each
implemented as a log-step (Hillis-Steele) doubling scan of (value,
blocked) pairs — pure VPU rolls/selects, no HBM traffic inside the
loop and no gathers anywhere. The format's first-visit numbering then
falls out without a gather: rank the roots with a 2D prefix sum and
propagate the planted ranks through a second sweep pass.

Falls back to the XLA implementation (decode._ccl_batch) off-TPU or
for shapes where a slice does not fit VMEM.
"""
import functools
import sys

# deep unrolled scan chains in the kernel exceed the default python
# recursion limit during tracing
if sys.getrecursionlimit() < 10000:
  sys.setrecursionlimit(10000)

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INT32_MAX = np.iinfo(np.int32).max

# Truncated sweep reach: each segmented scan stops at roll distance
# SWEEP_SMAX instead of the full axis length. Any fixed point of the
# truncated sweep is a fixed point of the full sweep (the s=1 step is
# included, so stability means every pixel <= its connected
# neighbors, i.e. L is constant per component = the component min),
# so the while-loop convergence is exact for ANY reach; the reach
# only trades sweep count against per-sweep cost. Measured on the
# 512^3 corpus (BENCH_NOTES round 5): reach 15 converges in ~66 ms
# vs ~100 ms at full reach (more, much cheaper sweeps).
import os as _os_smax
SWEEP_SMAX = int(_os_smax.environ.get("CRACKLE_TPU_SWEEP_SMAX", 15))
# optional per-axis overrides (x = lane-dim rolls, y = sublane-dim
# rolls have different costs on the VPU); default symmetric
SWEEP_SMAX_X = int(_os_smax.environ.get("CRACKLE_TPU_SWEEP_SMAX_X",
                                        SWEEP_SMAX))
SWEEP_SMAX_Y = int(_os_smax.environ.get("CRACKLE_TPU_SWEEP_SMAX_Y",
                                        SWEEP_SMAX))
# scan order within one sweep (any permutation of the 4 scans is an
# exact schedule; order changes only the convergence count).
# Axis-interleaved beats axis-grouped by ~5-8% on the 512^3 corpus:
# yf,xf,yb,xb 1075 / yb,xb,yf,xf 1061 / xf,yf,xb,yb 1049 /
# yf,yb,xf,xb 1044 / xb,yb,xf,yf 1042 / xf,xb,yf,yb 997-1000 MVx/s
# end-to-end — alternating axes lets each scan relay the previous
# axis's progress around corners within the same sweep, and leading
# with y (the sublane axis) edges out x-leading.
SWEEP_ORDER = _os_smax.environ.get("CRACKLE_TPU_SWEEP_ORDER",
                                   "yf,xf,yb,xb")


def _roll_down(a, s, axis, fill):
  """a shifted s steps toward higher indices along axis:
  out[i] = a[i-s], fill for i < s. (static s, int32 arrays only --
  Mosaic lacks i1 vector rotates/selects)."""
  rolled = pltpu.roll(a, jnp.int32(s), axis=axis)
  pos = jax.lax.broadcasted_iota(jnp.int32, a.shape, axis)
  return jnp.where(pos < s, jnp.full_like(a, fill), rolled)


def _roll_up(a, s, axis, fill):
  """out[i] = a[i+s], fill for i >= size-s. (static s)"""
  size = a.shape[axis]
  rolled = pltpu.roll(a, jnp.int32(size - s), axis=axis)
  pos = jax.lax.broadcasted_iota(jnp.int32, a.shape, axis)
  return jnp.where(pos >= size - s, jnp.full_like(a, fill), rolled)


def _seg_min_fwd(L, blocked, axis):
  """v[i] = min of the maximal connected run ending at i.
  blocked[i] (int32 0/1) 1 = not connected to predecessor."""
  size = L.shape[axis]
  v, f = L, blocked
  s = 1
  while s < size:
    v_s = _roll_down(v, s, axis, _INT32_MAX)
    f_s = _roll_down(f, s, axis, 1)
    v = jnp.where(f > 0, v, jnp.minimum(v, v_s))
    f = f | f_s
    s *= 2
  return v


def _seg_min_bwd(L, blocked_b, axis):
  """v[i] = min of the maximal connected run starting at i.
  blocked_b[i] (int32 0/1) 1 = not connected to successor."""
  size = L.shape[axis]
  v, f = L, blocked_b
  s = 1
  while s < size:
    v_s = _roll_up(v, s, axis, _INT32_MAX)
    f_s = _roll_up(f, s, axis, 1)
    v = jnp.where(f > 0, v, jnp.minimum(v, v_s))
    f = f | f_s
    s *= 2
  return v


# -- precomputed-flag variants -----------------------------------------------
#
# The flag OR-chain of a segmented scan is value-independent, so inside
# the fixed-point loops (which re-run the same scans many times) it is
# hoisted: FB packs bit k = F^k where F^0 = blocked and F^{k+1} = F^k |
# roll(F^k, 2^k) with out-of-range = 1. With F^k[i] guaranteed 1 for
# i < 2^k (resp. i >= size - 2^k), the value rolls can wrap raw — the
# wrapped garbage is always masked out — which drops the per-step
# guard ops. Each step is then roll + and + min + select.

def _pack_flags(blocked, axis, up, smax=0):
  size = blocked.shape[axis]
  limit = min(size, smax + 1) if smax else size
  F = blocked
  FB = blocked  # bit 0
  k = 0
  s = 1
  while 2 * s < limit:
    if up:
      F = F | _roll_up(F, s, axis, 1)
    else:
      F = F | _roll_down(F, s, axis, 1)
    k += 1
    FB = FB | (F << k)
    s *= 2
  return FB


# -- additive-mask variants ---------------------------------------------------
#
# The per-step select of the packed-flag scans (and + cmp + min + select
# = 4 vector ops after the roll) folds into a single min when the
# blocked flag is carried as an ADDITIVE penalty instead of a bit:
# v = min(v, roll(v, s) + A_k) with A_k = F^k ? BIG : 0. Any blocked
# (or wrapped) lane contributes >= BIG, and every live value stays
# < BIG, so the min ignores it — the fixed point is identical. The
# per-step cost drops from 5 ops to 3 (roll + add + min). BIG must
# satisfy 2*BIG < 2^31 (sums of two penalties appear transiently) and
# BIG > any live value — live values are flat indices or first-visit
# ranks (< sx*sy <= 2^22) and the re-prop "infinity" _ADD_INF.

_ADD_BIG = np.int32(1 << 28)
_ADD_INF = np.int32((1 << 28) - 1)  # plant value for non-roots


def _pack_addmasks(blocked, axis, up, smax=0):
  """Per-step additive penalty masks [A_0, A_1, ...] for a segmented
  min scan: A_k = F^k * BIG with F^0 = blocked, F^{k+1} = F^k |
  roll(F^k, 2^k) (out-of-range = 1)."""
  size = blocked.shape[axis]
  limit = min(size, smax + 1) if smax else size
  F = blocked
  masks = [F * _ADD_BIG]
  s = 1
  while 2 * s < limit:
    if up:
      F = F | _roll_up(F, s, axis, 1)
    else:
      F = F | _roll_down(F, s, axis, 1)
    masks.append(F * _ADD_BIG)
    s *= 2
  return masks


def _seg_min_fwd_a(L, masks, axis, smax=0):
  size = L.shape[axis]
  limit = min(size, smax + 1) if smax else size
  v = L
  s = 1
  k = 0
  while s < limit:
    v_s = pltpu.roll(v, jnp.int32(s), axis=axis)
    v = jnp.minimum(v, v_s + masks[k])
    s *= 2
    k += 1
  return v


def _seg_min_bwd_a(L, masks, axis, smax=0):
  size = L.shape[axis]
  limit = min(size, smax + 1) if smax else size
  v = L
  s = 1
  k = 0
  while s < limit:
    v_s = pltpu.roll(v, jnp.int32(size - s), axis=axis)
    v = jnp.minimum(v, v_s + masks[k])
    s *= 2
    k += 1
  return v


def _seg_min_fwd_p(L, FB, axis, smax=0):
  size = L.shape[axis]
  limit = min(size, smax + 1) if smax else size
  v = L
  s = 1
  k = 0
  while s < limit:
    v_s = pltpu.roll(v, jnp.int32(s), axis=axis)
    v = jnp.where((FB & (1 << k)) > 0, v, jnp.minimum(v, v_s))
    s *= 2
    k += 1
  return v


def _seg_min_bwd_p(L, FB, axis, smax=0):
  size = L.shape[axis]
  limit = min(size, smax + 1) if smax else size
  v = L
  s = 1
  k = 0
  while s < limit:
    v_s = pltpu.roll(v, jnp.int32(size - s), axis=axis)
    v = jnp.where((FB & (1 << k)) > 0, v, jnp.minimum(v, v_s))
    s *= 2
    k += 1
  return v


import os as _os_add
ADD_SWEEP = _os_add.environ.get("CRACKLE_TPU_CCL_ADD", "1") == "1"

# Mixed sweep schedule: an optional full-reach PRIME pass runs before
# the truncated-sweep loops ("xf" = one forward x scan, "xfxb" = both
# x scans, "full" = one full 4-scan sweep, "full2" = two; "" = none).
# The convergence check runs on the truncated sweep (which contains
# the s=1 step), so the fixed-point proof is unchanged; the rank
# re-propagation replays the same operator sequence (prime, then
# truncated), which suffices because each component carries exactly
# one finite value whose relay path is the same as the one that
# carried the component min. Measured on the 512^3 corpus: every
# prime LOSES (none 986, xf 948, xfxb 885, full 876, full2 846
# MVx/s end-to-end) — the truncated sweeps converge in few enough
# extra rounds that no full-reach priming pass pays for itself.
SWEEP_PRIME = _os_add.environ.get("CRACKLE_TPU_SWEEP_PRIME", "")

# plant-paint stripe loop shape (see _ccl_paint_kernel). Tuned on the
# 512^3 corpus: (32, 8) 997, (32, 4) 993, (64, 8) 991, (64, 4) 986,
# (128, 4) 916 MVx/s end-to-end — narrower stripes shrink each
# stripe's first-visit rank window, deeper unroll amortizes the
# loop carry.
PAINT_BLK = int(_os_add.environ.get("CRACKLE_TPU_PAINT_BLK", "32"))
PAINT_UNROLL = int(_os_add.environ.get("CRACKLE_TPU_PAINT_UNROLL", "8"))


def _build_sweep(left_ok, up_ok, smax):
  """Hoist the value-independent flag state of the four segmented-min
  scans and return (sweep, inf) where sweep(L) is one full 4-scan
  relaxation and inf is the "no value" plant constant for it."""
  sx_r = SWEEP_SMAX_X if smax else 0
  sy_r = SWEEP_SMAX_Y if smax else 0
  if ADD_SWEEP:
    Axf = _pack_addmasks(1 - left_ok, 1, up=False, smax=sx_r)
    Axb = _pack_addmasks(1 - _roll_up(left_ok, 1, 1, 0), 1, up=True,
                         smax=sx_r)
    Ayf = _pack_addmasks(1 - up_ok, 0, up=False, smax=sy_r)
    Ayb = _pack_addmasks(1 - _roll_up(up_ok, 1, 0, 0), 0, up=True,
                         smax=sy_r)
    scans = {
      "xf": lambda L: _seg_min_fwd_a(L, Axf, 1, sx_r),
      "xb": lambda L: _seg_min_bwd_a(L, Axb, 1, sx_r),
      "yf": lambda L: _seg_min_fwd_a(L, Ayf, 0, sy_r),
      "yb": lambda L: _seg_min_bwd_a(L, Ayb, 0, sy_r),
    }
    inf = _ADD_INF
  else:
    FBxf = _pack_flags(1 - left_ok, 1, up=False, smax=sx_r)
    FBxb = _pack_flags(1 - _roll_up(left_ok, 1, 1, 0), 1, up=True,
                       smax=sx_r)
    FByf = _pack_flags(1 - up_ok, 0, up=False, smax=sy_r)
    FByb = _pack_flags(1 - _roll_up(up_ok, 1, 0, 0), 0, up=True,
                       smax=sy_r)
    scans = {
      "xf": lambda L: _seg_min_fwd_p(L, FBxf, 1, sx_r),
      "xb": lambda L: _seg_min_bwd_p(L, FBxb, 1, sx_r),
      "yf": lambda L: _seg_min_fwd_p(L, FByf, 0, sy_r),
      "yb": lambda L: _seg_min_bwd_p(L, FByb, 0, sy_r),
    }
    inf = jnp.int32(_INT32_MAX)

  order = SWEEP_ORDER.split(",")
  assert sorted(order) == ["xb", "xf", "yb", "yf"], SWEEP_ORDER

  def sweep(L):
    for name in order:
      L = scans[name](L)
    return L

  return sweep, inf


def _build_prime(left_ok, up_ok, mode):
  """Optional full-reach priming pass (see SWEEP_PRIME). Uses
  packed-bit flags (1 i32 flag array per scan instead of the additive
  form's per-step masks — the prime runs once per loop, so VMEM
  matters more than per-step op count here). Returns a function
  applying the pass, or None."""
  if not mode:
    return None
  FBxf = _pack_flags(1 - left_ok, 1, up=False)
  if mode == "xf":
    return lambda L: _seg_min_fwd_p(L, FBxf, 1)
  FBxb = _pack_flags(1 - _roll_up(left_ok, 1, 1, 0), 1, up=True)
  if mode == "xfxb":
    return lambda L: _seg_min_bwd_p(_seg_min_fwd_p(L, FBxf, 1),
                                    FBxb, 1)
  FByf = _pack_flags(1 - up_ok, 0, up=False)
  FByb = _pack_flags(1 - _roll_up(up_ok, 1, 0, 0), 0, up=True)

  def sweep(L):
    L = _seg_min_fwd_p(L, FBxf, 1)
    L = _seg_min_bwd_p(L, FBxb, 1)
    L = _seg_min_fwd_p(L, FByf, 0)
    L = _seg_min_bwd_p(L, FByb, 0)
    return L

  if mode == "full2":
    return lambda L: sweep(sweep(L))
  return sweep


def _changed(a, b):
  # jnp.any / 64-bit intermediates choke the Mosaic lowering under
  # x64; reduce and carry strictly in int32
  one = jnp.ones(a.shape, jnp.int32)
  zero = jnp.zeros(a.shape, jnp.int32)
  return jnp.max(jnp.where(a != b, one, zero))


def _ccl_kernel(vcg_ref, cc_ref, *, sx, sy):
  # pallas kernels must return None; _ccl_core returns the
  # intermediates the paint kernel reuses
  _ccl_core(vcg_ref, cc_ref, sx=sx, sy=sy)


def _ccl_core(vcg_ref, cc_ref, *, sx, sy):
  # work in int32 from the start: Mosaic lacks some i8 vector ops
  v = vcg_ref[0].astype(jnp.int32)
  yy = jax.lax.broadcasted_iota(jnp.int32, (sy, sx), 0)
  xx = jax.lax.broadcasted_iota(jnp.int32, (sy, sx), 1)

  one = jnp.ones((sy, sx), jnp.int32)
  zero = jnp.zeros((sy, sx), jnp.int32)
  left_ok = jnp.where(((v & 0b0010) > 0) & (xx > 0), one, zero)
  up_ok = jnp.where(((v & 0b1000) > 0) & (yy > 0), one, zero)

  # borders are blocked by construction (left_ok[:,0] = up_ok[0,:] =
  # 0, and the bwd flags set the trailing edge below), which the raw
  # wrap-rolls of the hoisted-flag scans rely on
  smax = SWEEP_SMAX
  sweep, inf = _build_sweep(left_ok, up_ok, smax)
  prime = _build_prime(left_ok, up_ok,
                       SWEEP_PRIME if smax else "")

  L0 = yy * sx + xx

  def cond(state):
    _L, changed, _n = state
    return changed > 0

  def body(state):
    L, _, n = state
    L2 = sweep(L)
    return L2, _changed(L2, L), n + 1

  Lf = prime(L0) if prime else L0
  L1 = sweep(Lf)
  L, _, n_sweeps = jax.lax.while_loop(
    cond, body, (L1, _changed(L1, Lf), jnp.int32(1)))

  # first-visit rank of each root via a raster-order 2D prefix sum
  is_root = (L == L0)
  row_cum = is_root.astype(jnp.int32)
  s = 1
  while s < sx:
    row_cum = row_cum + _roll_down(row_cum, s, 1, 0)
    s *= 2
  row_tot = jax.lax.broadcast_in_dim(
    row_cum[:, sx - 1], (sy, sx), (0,)
  )
  # inclusive cumsum of row totals down the rows
  row_off = row_tot
  s = 1
  while s < sy:
    row_off = row_off + _roll_down(row_off, s, 0, 0)
    s *= 2
  rank = row_cum + (row_off - row_tot) - 1

  # plant ranks at roots and re-propagate (gather-free renumber).
  # Propagation distance is value-independent: the planted root value
  # reaches every pixel through exactly the scan relays that carried
  # the component minimum in loop 1, so n_sweeps - 1 sweeps (the count
  # loop 1 needed before its no-change verify) are provably enough —
  # no second convergence check. (A dense init from the raster root
  # prefix count was measured SLOWER on the 512^3 corpus: raster
  # order interleaves other components' roots between nearly every
  # pixel and its own root, so the dense bound is wrong almost
  # everywhere and the convergence-check sweeps cost more than the
  # fixed count.)
  R0 = jnp.where(is_root, rank, jnp.full_like(rank, inf))
  if prime:
    R0 = prime(R0)
  R = jax.lax.fori_loop(
    0, jnp.maximum(n_sweeps - 1, 1), lambda _i, Rv: sweep(Rv), R0)

  cc_ref[0] = R
  return is_root, rank, sweep, cond, R


def _ccl_paint_kernel(vcg_ref, t_ref, cc_ref, painted_ref, *, sx, sy,
                      cap_n, channels):
  """CCL + in-kernel label paint: the propagated rank image cc_ref is
  a dense component id per pixel, so painting is a bounded table loop
  over it (painted = t[cc] without a gather) — no extra propagation
  pass. channels=2 paints u64 labels as (lo32, hi32) planes.

  Ranks are first-visit (raster) ordered, so the ranks present in a
  horizontal stripe form a small contiguous window [rmin, rmax]: the
  select loop runs per stripe over only that window (components span
  a fraction of the slice height), and 4 table entries per iteration
  amortize the loop-carry overhead."""
  is_root, rank, sweep, cond, R = _ccl_core(
    vcg_ref, cc_ref, sx=sx, sy=sy
  )

  BLK = PAINT_BLK
  UNROLL = PAINT_UNROLL
  for y0 in range(0, sy, BLK):
    y1 = min(y0 + BLK, sy)
    Rb = R[y0:y1]
    rmin = jnp.maximum(jnp.min(Rb), 0)
    rmax = jnp.minimum(jnp.max(Rb), cap_n - 1)
    n_iter = (rmax - rmin) // UNROLL + 1

    def plant_body(i, accs, Rb=Rb, rmin=rmin):
      k0 = rmin + i * UNROLL
      for u in range(UNROLL):
        k = jnp.minimum(k0 + u, cap_n - 1)
        eq = Rb == k
        accs = tuple(
          jnp.where(eq, jnp.full_like(a, t_ref[0, ch, k]), a)
          for ch, a in enumerate(accs)
        )
      return accs

    accs = jax.lax.fori_loop(
      0, n_iter, plant_body,
      tuple(jnp.zeros((y1 - y0, sx), jnp.int32)
            for _ in range(channels)),
    )
    for ch in range(channels):
      painted_ref[0, ch, y0:y1, :] = accs[ch]


# ---------------------------------------------------------------------------
# v2 CCL: converge-only kernel + XLA root extraction + plant kernel
#
# The renumber-by-re-propagation of _ccl_core (plant first-visit ranks
# at roots, run n_sweeps-1 more sweeps) is 40-50% of the CCL budget on
# the 512^3 corpus. The v2 path stops after convergence: kernel A
# emits the min-index image L; roots (sorted component min indices =
# first-visit order) come from one XLA top_k over the root mask; and
# kernel B produces the dense cc numbering AND the painted labels in
# the same windowed stripe loop the old paint kernel already ran —
# eq = (L == roots[k]) instead of (rank == k), at one extra select.
# Net: the second sweep loop disappears entirely.
# ---------------------------------------------------------------------------

def _ccl_min_kernel(vcg_ref, l_ref, tgt_ref, *, sx, sy):
  """Kernel A: converge the segmented-min sweeps; emit the min-index
  image L (component id = min flat raster index) plus the scatter
  targets tgt = first-visit rank at roots / -1 elsewhere (the 2D
  raster prefix count, cc3d.hpp relabel parity). The rank->index
  scatter itself rides the MXU outside the kernel
  (roots_from_L)."""
  v = vcg_ref[0].astype(jnp.int32)
  yy = jax.lax.broadcasted_iota(jnp.int32, (sy, sx), 0)
  xx = jax.lax.broadcasted_iota(jnp.int32, (sy, sx), 1)

  one = jnp.ones((sy, sx), jnp.int32)
  zero = jnp.zeros((sy, sx), jnp.int32)
  left_ok = jnp.where(((v & 0b0010) > 0) & (xx > 0), one, zero)
  up_ok = jnp.where(((v & 0b1000) > 0) & (yy > 0), one, zero)

  smax = SWEEP_SMAX
  FBxf = _pack_flags(1 - left_ok, 1, up=False, smax=smax)
  FBxb = _pack_flags(1 - _roll_up(left_ok, 1, 1, 0), 1, up=True,
                     smax=smax)
  FByf = _pack_flags(1 - up_ok, 0, up=False, smax=smax)
  FByb = _pack_flags(1 - _roll_up(up_ok, 1, 0, 0), 0, up=True,
                     smax=smax)

  def sweep(L):
    L = _seg_min_fwd_p(L, FBxf, 1, smax)
    L = _seg_min_bwd_p(L, FBxb, 1, smax)
    L = _seg_min_fwd_p(L, FByf, 0, smax)
    L = _seg_min_bwd_p(L, FByb, 0, smax)
    return L

  L0 = yy * sx + xx

  def cond(state):
    _L, changed = state
    return changed > 0

  def body(state):
    L, _ = state
    L2 = sweep(L)
    return L2, _changed(L2, L)

  L1 = sweep(L0)
  L, _ = jax.lax.while_loop(cond, body, (L1, _changed(L1, L0)))
  l_ref[0] = L

  # first-visit rank of each root via a raster-order 2D prefix sum
  is_root = (L == L0)
  row_cum = is_root.astype(jnp.int32)
  s = 1
  while s < sx:
    row_cum = row_cum + _roll_down(row_cum, s, 1, 0)
    s *= 2
  row_tot = jax.lax.broadcast_in_dim(
    row_cum[:, sx - 1], (sy, sx), (0,)
  )
  row_off = row_tot
  s = 1
  while s < sy:
    row_off = row_off + _roll_down(row_off, s, 0, 0)
    s *= 2
  rank = row_cum + (row_off - row_tot) - 1
  tgt_ref[0] = jnp.where(is_root, rank, jnp.full_like(rank, -1))


def _plant_kernel(l_ref, roots_ref, t_ref, cc_ref, *refs, sx, sy,
                  cap_n, channels, BLK=64, UNROLL=4):
  """Kernel B: min-index image + sorted roots (+ value tables) ->
  dense first-visit cc numbering (+ painted labels).

  Ranks are first-visit (raster) ordered, so the components present
  in a horizontal stripe form a contiguous rank window; the window
  bounds come from an in-kernel binary search of the stripe's
  min/max component id over the sorted SMEM roots table."""
  painted_refs = refs
  for y0 in range(0, sy, BLK):
    y1 = min(y0 + BLK, sy)
    Lb = l_ref[0, y0:y1]
    lmin = jnp.maximum(jnp.min(Lb), 0)
    lmax = jnp.minimum(jnp.max(Lb), sx * sy - 1)

    # branchless lower_bound over the sorted roots (pad = sx*sy is
    # greater than any valid component id)
    def lower_bound(target):
      pos = jnp.int32(0)
      step = cap_n // 2
      while step >= 1:
        v = roots_ref[0, 0, pos + step - 1]
        pos = jnp.where(v < target, pos + step, pos)
        step //= 2
      return pos

    klo = lower_bound(lmin)
    khi = jnp.minimum(lower_bound(lmax), cap_n - 1)
    n_iter = jnp.maximum(khi - klo, 0) // UNROLL + 1

    def plant_body(i, accs, Lb=Lb, klo=klo):
      k0 = klo + i * UNROLL
      for u in range(UNROLL):
        k = jnp.minimum(k0 + u, cap_n - 1)
        eq = Lb == roots_ref[0, 0, k]
        cc_acc = jnp.where(eq, jnp.full_like(accs[0], k), accs[0])
        pacc = tuple(
          jnp.where(eq, jnp.full_like(a, t_ref[0, ch, k]), a)
          for ch, a in enumerate(accs[1:])
        ) if channels else ()
        accs = (cc_acc,) + pacc
      return accs

    accs = jax.lax.fori_loop(
      0, n_iter, plant_body,
      (jnp.zeros((y1 - y0, sx), jnp.int32),)
      + tuple(jnp.zeros((y1 - y0, sx), jnp.int32)
              for _ in range(channels)),
    )
    cc_ref[0, y0:y1, :] = accs[0]
    for ch in range(channels):
      painted_refs[ch][0, 0, y0:y1, :] = accs[1 + ch]


def ccl_min_traced(vcg, sx: int, sy: int):
  """Trace-time kernel A entry: vcg (B, sy*sx) ->
  (L (B, sy, sx), tgt (B, sy, sx) rank-at-roots / -1)."""
  B = vcg.shape[0]
  v2 = vcg.reshape(B, sy, sx)
  kernel = functools.partial(_ccl_min_kernel, sx=sx, sy=sy)
  with jax.enable_x64(False):
    L, tgt = pl.pallas_call(
      kernel,
      grid=(B,),
      in_specs=[
        pl.BlockSpec((1, sy, sx), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
      ],
      out_specs=[
        pl.BlockSpec((1, sy, sx), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, sy, sx), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
      ],
      out_shape=[
        jax.ShapeDtypeStruct((B, sy, sx), jnp.int32),
        jax.ShapeDtypeStruct((B, sy, sx), jnp.int32),
      ],
      compiler_params=_compiler_params(sx, sy),
      interpret=INTERPRET,
    )(v2)
  return L, tgt


def roots_from_tgt(tgt, cap_n: int):
  """Sorted component min-indices (= first-visit root order) per
  slice, padded with n, from kernel A's scatter targets (rank at
  roots, -1 elsewhere).

  The extraction is a scatter roots[rank] = index phrased as MXU
  one-hot matmuls (mxu_scatter.scatter_add_multi) with the index
  split into three byte planes so every weight is bf16-exact.
  (jax.lax.top_k over the root mask was measured 20x slower at this
  width, and an XLA cumsum for the ranks slower still — the ranks
  come from the kernel's in-VMEM 2D prefix instead.) Callers
  guarantee N <= cap_n."""
  from . import mxu_scatter
  B = tgt.shape[0]
  n = int(np.prod(tgt.shape[1:]))
  tf = tgt.reshape(B, n)
  idx = jax.lax.broadcasted_iota(jnp.int32, (B, n), 1)
  N = jnp.max(tf, axis=1) + 1
  p0 = idx & 255
  p1 = (idx >> 8) & 255
  p2 = idx >> 16
  r0, r1, r2 = mxu_scatter.scatter_add_multi(
    tf, (p0, p1, p2), n_bins=cap_n)
  roots = r0 | (r1 << 8) | (r2 << 16)
  # ranks are unique per slice so each bin receives at most one
  # index; unfilled bins (k >= N) pad with n
  kio = jax.lax.broadcasted_iota(jnp.int32, (B, cap_n), 1)
  roots = jnp.where(kio < N[:, None], roots, n)
  return roots, N


def plant_traced(L, roots, T, sx: int, sy: int, BLK=64, UNROLL=4):
  """Trace-time kernel B entry.

  L (B, sy, sx) int32, roots (B, cap_n) int32 sorted (pad n),
  T (B, K, cap_n) int32 value tables (K may be 0 for cc-only).
  Returns (cc (B, sy*sx) int32, painted (B, K, sy*sx) int32)."""
  B = L.shape[0]
  cap_n = roots.shape[1]
  K = T.shape[1]
  kernel = functools.partial(_plant_kernel, sx=sx, sy=sy,
                             cap_n=cap_n, channels=K,
                             BLK=BLK, UNROLL=UNROLL)
  out_specs = [pl.BlockSpec((1, sy, sx), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)]
  out_shape = [jax.ShapeDtypeStruct((B, sy, sx), jnp.int32)]
  for _ in range(K):
    out_specs.append(pl.BlockSpec((1, 1, sy, sx),
                                  lambda i: (i, 0, 0, 0),
                                  memory_space=pltpu.VMEM))
    out_shape.append(jax.ShapeDtypeStruct((B, 1, sy, sx), jnp.int32))
  t_in = T if K else jnp.zeros((B, 1, cap_n), jnp.int32)
  with jax.enable_x64(False):
    outs = pl.pallas_call(
      kernel,
      grid=(B,),
      in_specs=[
        pl.BlockSpec((1, sy, sx), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, cap_n), lambda i: (i, 0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, max(K, 1), cap_n), lambda i: (i, 0, 0),
                     memory_space=pltpu.SMEM),
      ],
      out_specs=out_specs,
      out_shape=out_shape,
      compiler_params=_compiler_params(sx, sy),
      interpret=INTERPRET,
    )(L, roots[:, None, :], t_in)
  if K:
    cc, *painted = outs
    painted = jnp.concatenate(painted, axis=1)
  else:
    cc = outs[0] if isinstance(outs, (list, tuple)) else outs
    painted = jnp.zeros((B, 0, sy, sx), jnp.int32)
  return cc.reshape(B, sy * sx), painted.reshape(B, K, sy * sx)


def _pow2_cap(cap_n: int) -> int:
  return max(8, 1 << max(int(cap_n) - 1, 0).bit_length())


def ccl_paint_v2(vcg, T, sx: int, sy: int):
  """v2 CCL + paint: converge-only sweeps, XLA root extraction, one
  windowed plant loop producing cc AND painted labels. Drop-in for
  ccl_paint_traced (returns (cc, N, painted))."""
  cap_n = T.shape[2]
  cap2 = _pow2_cap(cap_n)  # binary search needs a power-of-two table
  if cap2 != cap_n:
    T = jnp.pad(T, ((0, 0), (0, 0), (0, cap2 - cap_n)))
  L, tgt = ccl_min_traced(vcg, sx, sy)
  roots, N = roots_from_tgt(tgt, cap2)
  cc, painted = plant_traced(L, roots, T, sx, sy)
  return cc, N, painted


def _compiler_params(sx: int, sy: int):
  """Mosaic's default scoped-VMEM cap is 16 MB; the unrolled log-step
  sweep chains keep tens of (sy, sx) i32 buffers live at 512^2, which
  the v5e's physical VMEM (128 MB) holds comfortably. Raise the cap
  for large slices; leave the default for small ones."""
  if sx * sy <= 128 * 1024:
    return None
  return pltpu.CompilerParams(
    vmem_limit_bytes=100 * 1024 * 1024)


def ccl_batch_traced(vcg, sx: int, sy: int):
  """Trace-time entry: call inside an enclosing jit."""
  B = vcg.shape[0]
  v2 = vcg.reshape(B, sy, sx)

  kernel = functools.partial(_ccl_kernel, sx=sx, sy=sy)
  # trace the kernel with x64 disabled: the global x64 mode (needed by
  # the decode sort keys) breaks Mosaic's while_loop lowering
  with jax.enable_x64(False):
    cc = pl.pallas_call(
      kernel,
      grid=(B,),
      in_specs=[
        pl.BlockSpec((1, sy, sx), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
      ],
      out_specs=pl.BlockSpec((1, sy, sx), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
      out_shape=jax.ShapeDtypeStruct((B, sy, sx), jnp.int32),
      compiler_params=_compiler_params(sx, sy),
      interpret=INTERPRET,
    )(v2)
  cc = cc.reshape(B, sy * sx)
  # ranks are dense 0..N-1 per slice
  N = (jnp.max(cc, axis=1) + 1).astype(jnp.int32)
  return cc, N


ccl_batch_pallas = jax.jit(ccl_batch_traced,
                           static_argnames=("sx", "sy"))


def ccl_paint_traced(vcg, T, sx: int, sy: int):
  """CCL + in-kernel paint. T: (B, K, CAP_N) int32 painted-value
  table per slice (K=1: bitcast of uint32 labels; K=2: lo/hi planes
  of uint64 labels). Returns (cc, N, painted (B, K, sy*sx) int32)."""
  B = vcg.shape[0]
  K = T.shape[1]
  cap_n = T.shape[2]
  v2 = vcg.reshape(B, sy, sx)

  kernel = functools.partial(_ccl_paint_kernel, sx=sx, sy=sy,
                             cap_n=cap_n, channels=K)
  with jax.enable_x64(False):
    cc, painted = pl.pallas_call(
      kernel,
      grid=(B,),
      in_specs=[
        pl.BlockSpec((1, sy, sx), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, K, cap_n), lambda i: (i, 0, 0),
                     memory_space=pltpu.SMEM),
      ],
      out_specs=[
        pl.BlockSpec((1, sy, sx), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, K, sy, sx), lambda i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
      ],
      out_shape=[
        jax.ShapeDtypeStruct((B, sy, sx), jnp.int32),
        jax.ShapeDtypeStruct((B, K, sy, sx), jnp.int32),
      ],
      compiler_params=_compiler_params(sx, sy),
      interpret=INTERPRET,
    )(v2, T)
  cc = cc.reshape(B, sy * sx)
  N = (jnp.max(cc, axis=1) + 1).astype(jnp.int32)
  return cc, N, painted.reshape(B, K, sy * sx)


# paint-table loop stays cheap only for moderate component counts
PAINT_CAP_N = 2048


def _vmem_ok(sx: int, sy: int) -> bool:
  # ~8 (sy, sx) int32 buffers live at once; stay well under VMEM
  return 4 * sx * sy * 8 <= 12 * 1024 * 1024 and sx >= 2 and sy >= 2


import os as _os

_NO_PALLAS = _os.environ.get("CRACKLE_TPU_NO_PALLAS", "") == "1"
# interpret mode runs the kernels through the Pallas interpreter so
# the TPU code paths are testable on CPU (slow; tests only)
INTERPRET = _os.environ.get("CRACKLE_TPU_PALLAS_INTERPRET", "") == "1"


def use_pallas(sx: int, sy: int) -> bool:
  if _NO_PALLAS or not _vmem_ok(sx, sy):
    return False
  return INTERPRET or jax.default_backend() == "tpu"


def ccl_batch(vcg, sx: int, sy: int):
  """Dispatch: Pallas sweep kernel on TPU, XLA fallback elsewhere.
  Safe to call inside an enclosing jit trace."""
  from . import decode as _dec
  if use_pallas(sx, sy):
    return ccl_batch_traced(vcg, sx=sx, sy=sy)
  return _dec._ccl_batch(vcg, sx, sy)
