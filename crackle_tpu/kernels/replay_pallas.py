"""Fused Pallas TPU kernels for the crack-code replay.

The XLA replay (decode._decode_vcg_batch) is a chain of ~10
full-array scans plus two one-hot matmul scatters; every step round-
trips (B, CAP) arrays through HBM and XLA lowers each scan to log(n)
separate passes. These kernels keep one slice's whole replay resident
in VMEM:

  kernel P1: diff codepoints -> classified stream -> int32 sort keys
  (XLA runs an unstable bitonic sort between the kernels — the keys
  embed the stream index, so they are unique and stability is waste)
  kernel P2: sorted keys -> next-close scope matching (flat scans) ->
             scope-cancellation scatter -> position replay -> edge
             bin ids. The cancel scatter runs as grouped one-hot
             matmuls over all CAP bins (= the (R, 128) position grid),
             with the +-1 weight channels folded into the hi-one-hot.
  (XLA sorts the edge bin ids — sorted chunks span ~1 paint window
   vs ~4-5 unsorted, because chunks crossing branch-scope boundaries
   jump across the raster)
  kernel P3: sorted edge ids -> VH presence raster -> the assembled
             4-bit VCG (crack-format complement included), emitted as
             int32 straight into the CCL kernels. The paint scatter is
             windowed: per group of 4 sorted chunks, W-row one-hot
             matmuls accumulate at dynamic offsets precomputed in XLA
             (in-kernel scalar reductions stall the VPU ~300 cycles;
             each dynamic-offset accumulate costs ~100 cycles, hence
             the grouping).

Layout: the CAP codepoints of a slice live as a (R, 128) int32 grid
in flat raster order; scans are log-step roll/select passes within
rows plus a row-carry pass (the same pattern as the CCL kernel).
The cancel accumulator has CAP bins = exactly the (R, 128) grid. The
VH paint bins interleave the vertical/horizontal edge rasters by dual
row (bin row 2y = V edges of row y, 2y+1 = H edges) so windows stay
narrow; the final VCG assembly (shift/or of the V/H planes) happens
in-kernel.

Eligibility (host checks, else the XLA path runs): CAP a power of two
in [256, 16384] (int32 keys need depth*CAP*8 < 2^31), chain table
<= 32 entries, rasters fit VMEM. Reference semantics:
crackcodes.hpp:523-603 (state machine) / 706-862 (VCG paint);
oracle = ops/crackcode.py, cross-checked by tests/test_jax_decode.py.
"""
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .ccl_pallas import _roll_down, _roll_up
from . import ccl_pallas

_I32MAX = np.iinfo(np.int32).max

LANES = 128
# chain-start bases plant with a min(n_chains, CAP_CH)-iteration
# select loop over the (R, 128) grid — cheap VPU work even for
# thousands of chains; the bound is the nodes table's SMEM footprint
MAX_CHAINS = 2048


# ---------------------------------------------------------------------------
# flat-order scan helpers over a (R, 128) grid
# ---------------------------------------------------------------------------

def _flat_scan(v, op, unit, reverse=False):
  """Inclusive scan in flat raster order over the whole (R, C) grid.

  Forward: out[i] = op(...op(v[0], v[1])..., v[i]) — op(earlier, cur).
  Reverse: out[i] = op(v[i], op(v[i+1], ...)) — op(cur, later).
  op must be associative with identity `unit`."""
  R, C = v.shape
  s = 1
  while s < C:
    if reverse:
      v_s = _roll_up(v, s, 1, unit)
      v = op(v, v_s)
    else:
      v_s = _roll_down(v, s, 1, unit)
      v = op(v_s, v)
    s *= 2
  # carry across rows: exclusive fold of complete-row results
  edge = v[:, 0] if reverse else v[:, C - 1]
  tot = jax.lax.broadcast_in_dim(edge, (R, C), (0,))
  s = 1
  while s < R:
    if reverse:
      t_s = _roll_up(tot, s, 0, unit)
      tot = op(tot, t_s)
    else:
      t_s = _roll_down(tot, s, 0, unit)
      tot = op(t_s, tot)
    s *= 2
  if reverse:
    carry = _roll_up(tot, 1, 0, unit)
    return op(v, carry)
  carry = _roll_down(tot, 1, 0, unit)
  return op(carry, v)


def _op_add(a, b):
  return a + b


def _op_max(a, b):
  return jnp.maximum(a, b)


def _op_min(a, b):
  return jnp.minimum(a, b)


def _op_firstset(a, b):
  """Earlier-set-wins fold for reverse scans: a if set (>= 0) else b.
  unit = -1."""
  return jnp.where(a < 0, b, a)


def _flat_cumsum(v):
  return _flat_scan(v, _op_add, 0)


def _flat_cummax(v):
  return _flat_scan(v, _op_max, -_I32MAX - 1)


def _flat_cummin(v):
  return _flat_scan(v, _op_min, _I32MAX)


def _flat_shift_right(v, fill):
  """out[i] = v[i-1] in flat order; out[0] = fill."""
  R, C = v.shape
  within = _roll_down(v, 1, 1, 0)
  lastcol = jax.lax.broadcast_in_dim(v[:, C - 1], (R, C), (0,))
  prev_last = _roll_down(lastcol, 1, 0, fill)
  col = jax.lax.broadcasted_iota(jnp.int32, (R, C), 1)
  return jnp.where(col == 0, prev_last, within)


def _flat_shift_left(v, fill):
  """out[i] = v[i+1] in flat order; out[n-1] = fill."""
  R, C = v.shape
  within = _roll_up(v, 1, 1, 0)
  firstcol = jax.lax.broadcast_in_dim(v[:, 0], (R, C), (0,))
  next_first = _roll_up(firstcol, 1, 0, fill)
  col = jax.lax.broadcasted_iota(jnp.int32, (R, C), 1)
  return jnp.where(col == C - 1, next_first, within)


# ---------------------------------------------------------------------------
# shared stream classification (P1 and P2 both derive it)
# ---------------------------------------------------------------------------

def _classify(diffs, n_cps, n_chains):
  """diff codepoints (R, 128) int32 -> per-codepoint stream state,
  all (R, 128) int32 grids in flat order. Booleans are 0/1 int32
  (Mosaic's i1 vector support is partial). Mirrors
  decode._decode_vcg_batch."""
  R, C = diffs.shape
  col = jax.lax.broadcasted_iota(jnp.int32, (R, C), 1)
  row = jax.lax.broadcasted_iota(jnp.int32, (R, C), 0)
  pos = row * C + col

  in_range = jnp.where(pos < n_cps, 1, 0)
  diffs = diffs * in_range
  cps = _flat_cumsum(diffs) & 3

  prev = _flat_shift_right(cps, 255)
  r = jnp.where((cps ^ prev) == 0b10, 1, 0) * in_range
  rs = jnp.where((r > 0) & (_flat_shift_right(r, 0) == 0), pos, -1)
  run_start = _flat_cummax(jnp.where(r > 0, rs, -1))
  is_second = r * jnp.where(((pos - run_start) & 1) == 0, 1, 0)

  pair_first = _flat_shift_left(is_second, 0)
  second_cp = _flat_shift_left(cps, 0)
  term_pair = jnp.where((second_cp == 0) | (second_cp == 3), 1, 0)
  is_term = pair_first * term_pair
  is_move = (1 - pair_first) * (1 - is_second) * in_range

  tok = pair_first * (1 - term_pair) - is_term
  c = _flat_cumsum(tok)
  runmin = jnp.minimum(_flat_shift_right(_flat_cummin(c), 0), 0)
  is_end = jnp.where(c < runmin, 1, 0) * in_range

  end_cum = _flat_cumsum(is_end)
  cnt_before = end_cum - is_end
  chain_of = jnp.clip(cnt_before, 0, jnp.maximum(n_chains - 1, 0))
  prev_is_end = _flat_shift_right(is_end, 0)
  valid = jnp.where((cnt_before < n_chains) | (prev_is_end > 0), 1, 0)

  depth_after = c + chain_of + 1
  return dict(
    pos=pos, cps=cps, is_move=is_move, is_term=is_term,
    valid=valid, chain_of=chain_of, depth_after=depth_after,
  )


# ---------------------------------------------------------------------------
# P1: sort keys
# ---------------------------------------------------------------------------

def _keys_kernel(diffs_ref, meta_ref, keys_ref, cls_ref, *, CAP):
  st = _classify(
    diffs_ref[0].astype(jnp.int32),
    meta_ref[0, 0, 0] * 4, meta_ref[0, 0, 1],
  )
  depth_evt = jnp.where(st["is_term"] > 0, st["depth_after"] + 1,
                        st["depth_after"])
  close = st["is_term"] * st["valid"]
  active = st["valid"] * jnp.minimum(st["is_move"] + st["is_term"], 1)
  keys = (((depth_evt * CAP + st["pos"]) << 3)
          | (close << 2) | st["cps"])
  keys_ref[0] = jnp.where(active > 0, keys, _I32MAX)
  # pass the classification to the replay kernel so it does not redo
  # the scan chain: cps (2b) | is_move*valid (1b) | chain_of (rest)
  cls_ref[0] = (st["cps"] | ((st["is_move"] * st["valid"]) << 2)
                | (st["chain_of"] << 3))


# ---------------------------------------------------------------------------
# P2: sorted keys -> VH presence raster
# ---------------------------------------------------------------------------

def _floor_div(a, d):
  """Exact floor division by a positive non-power-of-2 constant via
  f32 reciprocal + correction (needs |a| < 2^24)."""
  q = jnp.floor(a.astype(jnp.float32) * np.float32(1.0 / d)) \
    .astype(jnp.int32)
  rem = a - q * d
  q = q + jnp.where(rem >= d, 1, 0)
  q = q - jnp.where(a - q * d < 0, 1, 0)
  return q


PAINT_W = 16   # paint scatter: bin-row window height per matmul
PAINT_LO = 512


def _paint_scatter_sorted(ids_ref, lim_ref, acc_scr, *, R, W, LO,
                          n_hi, G):
  """Sorted-window presence scatter via one-hot matmuls on the MXU.

  ids_ref holds a (R, 128) grid of SORTED bin ids (hi = id // LO,
  lo = id % LO); pad entries carry bin n_hi * LO and land in the
  scratch pad rows past the raster. Because the ids are sorted, a
  G*128-entry group spans a handful of W-row windows [bq, bq+nsub)
  (precomputed in XLA from the group's first/last element and fed
  through SMEM — in-kernel scalar reductions stall the VPU pipeline).
  Per window, G one-hot matmuls accumulate into a register partial and
  hit the scratch accumulator ONCE at a dynamic row offset (a multiple
  of W for sublane alignment): grouping amortizes the ~100-cycle cost
  each dynamic-offset access carries."""
  C = LANES
  shift = int(np.log2(LO))
  iota_w = jax.lax.broadcasted_iota(jnp.int32, (W, C), 0)
  iota_lo = jax.lax.broadcasted_iota(jnp.int32, (LO, C), 0)

  def group(j, carry):
    his = []
    Blos = []
    for g in range(G):
      row = ids_ref[0, pl.ds(j * G + g, 1), :]  # (1, C) sorted ids
      his.append(jax.lax.broadcast_in_dim(row >> shift, (W, C),
                                          (0, 1)))
      lob = jax.lax.broadcast_in_dim(row & (LO - 1), (LO, C), (0, 1))
      Blos.append(
        jnp.where(lob == iota_lo, jnp.float32(1), jnp.float32(0))
        .astype(jnp.bfloat16))
    bq = lim_ref[0, 0, j]
    nsub = lim_ref[0, 1, j]

    def sub(w, c2):
      start = (bq + w) * W
      part = jnp.zeros((W, LO), jnp.float32)
      for g in range(G):
        A = jnp.where(his[g] - start == iota_w, jnp.float32(1),
                      jnp.float32(0)).astype(jnp.bfloat16)
        part = part + jax.lax.dot_general(
          A, Blos[g], (((1,), (1,)), ((), ())),
          preferred_element_type=jnp.float32,
        )
      acc_scr[pl.ds(start, W), :] = acc_scr[pl.ds(start, W), :] + part
      return c2

    jax.lax.fori_loop(0, nsub, sub, 0)
    return carry

  jax.lax.fori_loop(0, R // G, group, 0)


def _replay_kernel(cls_ref, meta_ref, nodes_ref, skeys_ref,
                   vhidx_ref, acc_scr, io_scr, *,
                   CAP, CAP_CH, sx, sy, HI2):
  """P2: sorted keys -> next-close scope matching (flat scans) ->
  scope-cancellation scatter (one-hot matmuls over the CAP-bin
  position grid, weights folded into the hi-one-hot) -> position
  replay -> edge bin ids in the interleaved V/H paint layout."""
  C = LANES
  R = CAP // C
  sxe = sx + 1
  n_chains = meta_ref[0, 0, 1]
  clsv = cls_ref[0]
  cps = clsv & 3
  mv = (clsv >> 2) & 1
  chain_of = clsv >> 3

  # --- sorted space: next close at same depth ---
  skeys = skeys_ref[0]
  is_inf = jnp.where(skeys == _I32MAX, 1, 0)
  cps_s = skeys & 3
  is_close = ((skeys >> 2) & 1) * (1 - is_inf)
  body = skeys >> 3
  depth_s = body >> int(np.log2(CAP))
  pos_s = body & (CAP - 1)

  seg_last = jnp.where(
    (depth_s != _flat_shift_left(depth_s, -1)) | (is_inf > 0), 1, 0)
  setf = jnp.minimum(is_close + seg_last, 1)
  e = jnp.where(setf > 0, jnp.where(is_close > 0, pos_s, CAP), -1)
  nextclose = _flat_scan(e, _op_firstset, -1, reverse=True)
  nextclose = jnp.where(nextclose < 0, CAP, nextclose)

  move_s = (1 - is_inf) * (1 - is_close)
  w_h = (jnp.where(cps_s == 3, 1, 0) - jnp.where(cps_s == 1, 1, 0)) \
      * move_s
  w_v = (jnp.where(cps_s == 0, 1, 0) - jnp.where(cps_s == 2, 1, 0)) \
      * move_s
  tgt = jnp.where((move_s > 0) & (nextclose < CAP), nextclose, -1)

  # --- cancel scatter as chunked one-hot matmuls over all CAP bins
  # (bins = the (R, 128) position grid itself: hi = row, lo = lane).
  # The two weight channels fold into the hi-one-hot — invalid
  # entries (t_hi = -1) match no bin row and drop for free.
  t_hi = jnp.where(tgt < 0, -1, tgt >> 7)
  t_lo = tgt & (C - 1)
  iota_hi_c = jax.lax.broadcasted_iota(jnp.int32, (R, C), 0)
  iota_lo_c = jax.lax.broadcasted_iota(jnp.int32, (C, C), 0)

  acc_scr[:, :] = jnp.zeros((R, 2 * C), jnp.float32)
  io_scr[0] = t_hi
  io_scr[1] = t_lo
  io_scr[2] = w_h
  io_scr[3] = w_v

  GC = 4 if R % 4 == 0 else (2 if R % 2 == 0 else 1)

  def cancel_group(i, carry):
    ph = jnp.zeros((R, C), jnp.float32)
    pv = jnp.zeros((R, C), jnp.float32)
    for g in range(GC):
      hb = jax.lax.broadcast_in_dim(
        io_scr[0, pl.ds(i * GC + g, 1), :], (R, C), (0, 1))
      A = jnp.where(hb == iota_hi_c, 1, 0)
      whb = jax.lax.broadcast_in_dim(
        io_scr[2, pl.ds(i * GC + g, 1), :], (R, C), (0, 1))
      wvb = jax.lax.broadcast_in_dim(
        io_scr[3, pl.ds(i * GC + g, 1), :], (R, C), (0, 1))
      lb = jax.lax.broadcast_in_dim(
        io_scr[1, pl.ds(i * GC + g, 1), :], (C, C), (0, 1))
      Blo = jnp.where(lb == iota_lo_c, jnp.float32(1), jnp.float32(0)) \
        .astype(jnp.bfloat16)
      ph = ph + jax.lax.dot_general(
        (A * whb).astype(jnp.bfloat16), Blo, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
      pv = pv + jax.lax.dot_general(
        (A * wvb).astype(jnp.bfloat16), Blo, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    acc_scr[0:R, 0:C] = acc_scr[0:R, 0:C] + ph
    acc_scr[0:R, C:2 * C] = acc_scr[0:R, C:2 * C] + pv
    return carry

  jax.lax.fori_loop(0, R // GC, cancel_group, 0)
  cancel_h = acc_scr[0:R, 0:C].astype(jnp.int32)
  cancel_v = acc_scr[0:R, C:2 * C].astype(jnp.int32)

  # --- position replay ---
  deltas = jnp.where(
    cps == 0, -sxe,
    jnp.where(cps == 1, 1, jnp.where(cps == 2, sxe, -1)))
  deltas = deltas * mv
  acc = deltas + cancel_h + sxe * cancel_v
  pos_after = _flat_cumsum(acc)

  # chain-start bases: tiny table in SMEM, bounded select loop
  def base_body(k, b):
    nk = nodes_ref[0, 0, k]
    return jnp.where(chain_of == k, jnp.full_like(b, nk), b)

  base = jax.lax.fori_loop(
    0, jnp.minimum(n_chains, CAP_CH), base_body,
    jnp.zeros((R, C), jnp.int32),
  )
  pos_before = pos_after + base * mv - deltas

  # --- edge bin ids in the interleaved V/H layout ---
  # bin row 2*py = V edges of dual row py, 2*py+1 = H edges of py
  py = _floor_div(pos_before, sxe)
  px = pos_before - py * sxe
  LO = PAINT_LO
  vh_idx = jnp.where(
    cps == 0, (2 * (py - 1)) * LO + px,
    jnp.where(
      cps == 2, (2 * py) * LO + px,
      jnp.where(cps == 3, (2 * py + 1) * LO + (px - 1),
                (2 * py + 1) * LO + px)))
  vh_idx = jnp.where((mv > 0) & (vh_idx >= 0), vh_idx, -1)
  vh_idx = jnp.where(vh_idx < HI2 * LO, vh_idx, -1)
  vhidx_ref[0] = vh_idx


def _paint_group(R):
  return 4 if R % 4 == 0 else (2 if R % 2 == 0 else 1)


def _paint_vcg_kernel(svh_ref, limp_ref, vcg_ref, paint_scr, *,
                      R, sx, sy, HI2, permissible):
  """P3: sorted edge-presence scatter + in-kernel 4-bit VCG assembly
  from the interleaved V/H raster."""
  LO = PAINT_LO
  paint_scr[:, :] = jnp.zeros((HI2 + PAINT_W, LO), jnp.float32)
  _paint_scatter_sorted(svh_ref, limp_ref, paint_scr, R=R,
                        W=PAINT_W, LO=LO, n_hi=HI2, G=_paint_group(R))

  # interleaved rows: 2y = V edges of dual row y, 2y+1 = H edges.
  # vcg[y, x] = V[y, x+1] | V[y, x]<<1 | H[y+1, x]<<2 | H[y, x]<<3
  pres = jnp.where(paint_scr[0:HI2, :] > 0, 1, 0)  # (HI2, LO) int32
  r3 = pres.reshape(sy + 1, 2, LO)
  V2 = r3[:, 0, :]  # (sy+1, LO); valid V rows are 0..sy-1
  H2 = r3[:, 1, :]  # (sy+1, LO); valid H rows are 0..sy
  v_lo = V2[0:sy, :]
  v_sh = _roll_up(v_lo, 1, 1, 0)        # V[y, x+1]
  h_dn = _roll_up(H2, 1, 0, 0)[0:sy, :]  # H[y+1, x]
  h_up = H2[0:sy, :]
  vcg = (v_sh | (v_lo << 1) | (h_dn << 2) | (h_up << 3))
  if not permissible:
    vcg = vcg ^ 0b1111  # impermissible streams store the complement
  vcg_ref[0] = vcg[:, 0:sx]


# ---------------------------------------------------------------------------
# host-facing entry (call inside jit)
# ---------------------------------------------------------------------------

def eligible(CAP: int, CAP_CH: int, sx: int, sy: int) -> bool:
  if CAP < 2 * LANES or CAP > 16384 or CAP & (CAP - 1):
    return False
  if CAP_CH > MAX_CHAINS:
    return False
  # chain bases and positions must fit the f32 floor-div window
  if (sx + 1) * (sy + 1) >= (1 << 24):
    return False
  if sx + 1 > PAINT_LO:  # interleaved V/H bin rows hold one dual row
    return False
  R = CAP // LANES
  HI2 = 2 * (sy + 1)
  vmem = (30 * R * LANES * 4
          + (HI2 + PAINT_W) * PAINT_LO * 4   # paint accumulator
          + 3 * HI2 * PAINT_LO * 4)          # presence/V/H planes
  return vmem <= 10 * 1024 * 1024


import os as _os

# tests set this to route small streams through the generalized
# chunked path (replay_big) so its carry logic runs in interpret mode
FORCE_BIG = _os.environ.get("CRACKLE_TPU_REPLAY_FORCE_BIG", "") == "1"


def _pick_path(CAP, CAP_CH, sx, sy):
  """Which fused replay path handles this shape: 'fused' (original
  single-chunk kernels), 'big' (chunked/segmented generalization for
  sx > 511 or CAP > 16384), or None (XLA fallback)."""
  from . import replay_big
  if not FORCE_BIG and eligible(CAP, CAP_CH, sx, sy):
    return "fused"
  if replay_big.eligible(CAP, CAP_CH, sx, sy):
    return "big"
  if FORCE_BIG and eligible(CAP, CAP_CH, sx, sy):
    return "fused"
  return None


def use_replay(CAP, CAP_CH, sx, sy) -> bool:
  if _pick_path(CAP, CAP_CH, sx, sy) is None:
    return False
  if ccl_pallas._NO_PALLAS:
    return False
  return ccl_pallas.INTERPRET or jax.default_backend() == "tpu"


def replay_vcg_traced(packed, nbytes, nodes, n_chains, sx, sy,
                      permissible):
  """Fused replay: packed (B, CAP_B) uint8 -> VCG (B, sy*sx) uint8.
  Call inside jit; caller guarantees use_replay()."""
  vcg = replay_vcg_i32_traced(packed, nbytes, nodes, n_chains, sx, sy,
                              permissible)
  return vcg.reshape(vcg.shape[0], sy * sx).astype(jnp.uint8)


def replay_vcg_i32_traced(packed, nbytes, nodes, n_chains, sx, sy,
                          permissible):
  """Fused replay to an int32 (B, sy, sx) VCG (crack-format
  complement already applied in-kernel) — feeds the CCL kernels with
  no intermediate cast/xor passes. Dispatches to the generalized
  chunked path (replay_big) for wide slices / long streams."""
  from . import replay_big
  if _pick_path(packed.shape[1] * 4, nodes.shape[1], sx, sy) == "big":
    return replay_big.replay_vcg_i32_big(
      packed, nbytes, nodes, n_chains, sx, sy, permissible)
  B, CAP_B = packed.shape
  CAP = CAP_B * 4
  R = CAP // LANES
  CAP_CH = nodes.shape[1]
  HI2 = 2 * (sy + 1)
  INTERPRET = ccl_pallas.INTERPRET

  # 2-bit unpack in XLA (one cheap pass); kernels get (B, R, 128)
  b = packed.astype(jnp.uint8)
  diffs = jnp.stack(
    [b & 3, (b >> 2) & 3, (b >> 4) & 3, (b >> 6) & 3], axis=2
  ).reshape(B, R, LANES)
  meta = jnp.stack(
    [nbytes.astype(jnp.int32), n_chains.astype(jnp.int32)],
    axis=1)[:, None, :]  # (B, 1, 2): SMEM blocks need full trailing dims
  nodes_ = nodes.astype(jnp.int32)[:, None, :]  # (B, 1, CAP_CH)

  with jax.enable_x64(False):
    keys, cls = pl.pallas_call(
      functools.partial(_keys_kernel, CAP=CAP),
      grid=(B,),
      in_specs=[
        pl.BlockSpec((1, R, LANES), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 2), lambda i: (i, 0, 0),
                     memory_space=pltpu.SMEM),
      ],
      out_specs=[
        pl.BlockSpec((1, R, LANES), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, R, LANES), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
      ],
      out_shape=[
        jax.ShapeDtypeStruct((B, R, LANES), jnp.int32),
        jax.ShapeDtypeStruct((B, R, LANES), jnp.int32),
      ],
      interpret=INTERPRET,
    )(diffs, meta)

    # keys are unique (the stream index rides inside), so an
    # unstable sort is free speedup (~20% on this chip)
    skeys = jax.lax.sort(keys.reshape(B, CAP), dimension=1,
                         is_stable=False).reshape(B, R, LANES)

    vhidx = pl.pallas_call(
      functools.partial(
        _replay_kernel, CAP=CAP, CAP_CH=CAP_CH, sx=sx, sy=sy,
        HI2=HI2,
      ),
      grid=(B,),
      in_specs=[
        pl.BlockSpec((1, R, LANES), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 2), lambda i: (i, 0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1, CAP_CH), lambda i: (i, 0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, R, LANES), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
      ],
      out_specs=pl.BlockSpec((1, R, LANES), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
      out_shape=jax.ShapeDtypeStruct((B, R, LANES), jnp.int32),
      scratch_shapes=[
        pltpu.VMEM((R, 2 * LANES), jnp.float32),
        pltpu.VMEM((4, R, LANES), jnp.int32),
      ],
      interpret=INTERPRET,
    )(cls, meta, nodes_, skeys)

    # sort edge bin ids per slice; pads / out-of-raster moves become
    # bin HI2*LO and land in the scratch pad rows past the raster.
    # Sorted chunks span 1-2 W-row windows (vs ~4-5 unsorted: chunks
    # crossing branch-scope boundaries jump across the raster), and
    # the window limits fall out of each chunk's first/last element.
    W = PAINT_W
    LO = PAINT_LO
    logw = int(np.log2(W))
    vflat = vhidx.reshape(B, CAP)
    svh = jnp.where(vflat < 0, HI2 * LO, vflat)
    svh = jax.lax.sort(svh, dimension=1, is_stable=False) \
      .reshape(B, R, LANES)
    # group-level window limits: a group = G consecutive sorted
    # chunks, so its window runs from the group's first element to its
    # last
    G = _paint_group(R)
    bq = jnp.minimum(svh[:, 0::G, 0] >> int(np.log2(LO)), HI2) >> logw
    lq = jnp.minimum(
      svh[:, G - 1::G, LANES - 1] >> int(np.log2(LO)), HI2) >> logw
    lims_p = jnp.stack([bq, lq - bq + 1], axis=1).astype(jnp.int32)

    vcg = pl.pallas_call(
      functools.partial(
        _paint_vcg_kernel, R=R, sx=sx, sy=sy, HI2=HI2,
        permissible=permissible,
      ),
      grid=(B,),
      in_specs=[
        pl.BlockSpec((1, R, LANES), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 2, R // G), lambda i: (i, 0, 0),
                     memory_space=pltpu.SMEM),
      ],
      out_specs=pl.BlockSpec((1, sy, sx), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
      out_shape=jax.ShapeDtypeStruct((B, sy, sx), jnp.int32),
      scratch_shapes=[
        pltpu.VMEM((HI2 + PAINT_W, PAINT_LO), jnp.float32),
      ],
      interpret=INTERPRET,
    )(svh, lims_p)

  return vcg
