"""Fused Pallas TPU kernels for the crack-code replay.

The XLA replay (decode._decode_vcg_batch) is a chain of ~10
full-array scans plus two one-hot matmul scatters; every step round-
trips (B, CAP) arrays through HBM and XLA lowers each scan to log(n)
separate passes. These kernels keep one slice's whole replay resident
in VMEM:

  kernel P1: diff codepoints -> classified stream -> int32 sort keys
  (XLA sorts the keys between the kernels — its bitonic sort is fast)
  kernel P2: sorted keys -> next-close matching -> position replay ->
             per-move edge indices, with the cancel scatter as one-hot
             matmuls feeding the MXU directly from VMEM.
  (XLA sorts the edge indices)
  kernel P3: sorted edge indices -> VH presence raster. Because the
             indices are sorted, each 128-update chunk touches a
             narrow contiguous window of output bins, so the one-hot
             scatter matmul only spans that window (dynamic-offset
             accumulate) instead of all sy*sx*2 bins — ~25x fewer
             MACs than a full-bin scatter at 256x256.

Layout: the CAP codepoints of a slice live as a (R, 128) int32 grid
in flat raster order; scans are log-step roll/select passes within
rows plus a row-carry pass (the same pattern as the CCL kernel).
The cancel accumulator has CAP bins = exactly the (R, 128) grid, and
the VH paint bins (sy*(sx+1) + (sy+1)*sx) tile as (HI, 512).

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


def _row(ref, k, i):
  """(1, C) dynamic row slice of plane k of a (K, R, C) scratch ref
  (Mosaic has no dynamic_slice on values, only on refs)."""
  return ref[k, pl.ds(i, 1), :]


def _bf16_onehot(row_1c, iota_rc):
  """one-hot (ROWS, C): [iota == row broadcast] in bf16."""
  b = jax.lax.broadcast_in_dim(row_1c, iota_rc.shape, (0, 1))
  return jnp.where(b == iota_rc, jnp.float32(1), jnp.float32(0)) \
    .astype(jnp.bfloat16)


def _replay_kernel(cls_ref, meta_ref, nodes_ref, skeys_ref,
                   vhidx_ref, acc_scr, io_scr, *,
                   CAP, CAP_CH, sx, sy):
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

  # --- cancel scatter as a chunked one-hot matmul ---
  # bins = CAP laid out as the (R, 128) grid itself: hi = row index,
  # lo = lane. Two weight channels (horizontal, vertical) share the
  # hi one-hot; each chunk is one 128-entry row.
  t_hi = jnp.where(tgt < 0, -1, tgt >> 7)
  t_lo = tgt & (C - 1)
  iota_hi_c = jax.lax.broadcasted_iota(jnp.int32, (R, C), 0)
  iota_lo_c = jax.lax.broadcasted_iota(jnp.int32, (2 * C, C), 0) \
      & (C - 1)
  chan = jax.lax.broadcasted_iota(jnp.int32, (2 * C, C), 0) >= C

  acc_scr[0:R, 0:2 * C] = jnp.zeros((R, 2 * C), jnp.float32)
  io_scr[0] = t_hi
  io_scr[1] = t_lo
  io_scr[2] = w_h
  io_scr[3] = w_v

  def cancel_chunk(i, carry):
    A = _bf16_onehot(_row(io_scr, 0, i), iota_hi_c)
    lb = jax.lax.broadcast_in_dim(
      _row(io_scr, 1, i), (2 * C, C), (0, 1))
    onehot = jnp.where(lb == iota_lo_c, 1, 0)
    whb = jax.lax.broadcast_in_dim(
      _row(io_scr, 2, i), (2 * C, C), (0, 1))
    wvb = jax.lax.broadcast_in_dim(
      _row(io_scr, 3, i), (2 * C, C), (0, 1))
    w = jnp.where(chan, wvb, whb)
    Bm = (onehot * w).astype(jnp.bfloat16)
    part = jax.lax.dot_general(
      A, Bm, (((1,), (1,)), ((), ())),
      preferred_element_type=jnp.float32,
    )  # (R, 2C)
    acc_scr[0:R, 0:2 * C] = acc_scr[0:R, 0:2 * C] + part
    return carry

  jax.lax.fori_loop(0, R, cancel_chunk, 0)
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

  # --- edge indices ---
  py = _floor_div(pos_before, sxe)
  px = pos_before - py * sxe
  NV = sy * sxe
  vh_idx = jnp.where(
    cps == 0, px + sxe * (py - 1),
    jnp.where(
      cps == 2, px + sxe * py,
      jnp.where(cps == 3, NV + (px - 1) + sx * py,
                NV + px + sx * py)))
  vh_idx = jnp.where((mv > 0) & (vh_idx >= 0), vh_idx, -1)
  vhidx_ref[0] = vh_idx


# ---------------------------------------------------------------------------
# P3: sorted edge indices -> VH presence raster
# ---------------------------------------------------------------------------

PAINT_W = 16  # output-row window height per scatter matmul


def _paint_kernel(svh_ref, lim_ref, vh_ref, acc_scr, *, R, HI, LO, W):
  """Sorted-window scatter: chunk j holds 128 sorted edge indices, so
  its bin rows span [base_j, last_j] — a handful of W-row windows.
  Each window is one (W, 128)@(128, LO) one-hot matmul accumulated at
  a dynamic row offset. Total MACs ~ (R + HI/W) * W*LO*128 instead of
  R * HI*LO*128 for the full-bin scatter. Pad entries sort to the end
  as bin HI*LO and land in the W scratch pad rows."""
  C = LANES
  shift = int(np.log2(LO))
  acc_scr[:, :] = jnp.zeros((HI + W, LO), jnp.float32)
  iota_w = jax.lax.broadcasted_iota(jnp.int32, (W, C), 0)
  iota_lo = jax.lax.broadcasted_iota(jnp.int32, (LO, C), 0)

  def chunk(j, carry):
    row = svh_ref[0, pl.ds(j, 1), :]  # (1, C) sorted bins
    hi = row >> shift
    lo = row & (LO - 1)
    lob = jax.lax.broadcast_in_dim(lo, (LO, C), (0, 1))
    Blo = jnp.where(lob == iota_lo, jnp.float32(1), jnp.float32(0)) \
      .astype(jnp.bfloat16)
    hib = jax.lax.broadcast_in_dim(hi, (W, C), (0, 1))
    # window index (rows/W): start = (bq + w) * W is a multiple of W,
    # which Mosaic needs to prove sublane alignment of dynamic loads
    bq = lim_ref[0, 0, j]
    nsub = lim_ref[0, 1, j]

    def sub(w, c2):
      start = (bq + w) * W
      rel = hib - start
      A = jnp.where(rel == iota_w, jnp.float32(1), jnp.float32(0)) \
        .astype(jnp.bfloat16)
      part = jax.lax.dot_general(
        A, Blo, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
      )  # (W, LO)
      acc_scr[pl.ds(start, W), :] = acc_scr[pl.ds(start, W), :] + part
      return c2

    jax.lax.fori_loop(0, nsub, sub, 0)
    return carry

  jax.lax.fori_loop(0, R, chunk, 0)
  vh_ref[0] = jnp.where(acc_scr[0:HI, :] > 0, 1, 0)


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
  R = CAP // LANES
  HI = -(-(sy * (sx + 1) + (sy + 1) * sx) // 512)
  vmem = 30 * R * LANES * 4 + (HI + 8) * 512 * 4
  return vmem <= 10 * 1024 * 1024


def use_replay(CAP, CAP_CH, sx, sy) -> bool:
  if not eligible(CAP, CAP_CH, sx, sy):
    return False
  if ccl_pallas._NO_PALLAS:
    return False
  return ccl_pallas.INTERPRET or jax.default_backend() == "tpu"


def replay_vcg_traced(packed, nbytes, nodes, n_chains, sx, sy,
                      permissible):
  """Fused replay: packed (B, CAP_B) uint8 -> VCG (B, sy*sx) uint8.
  Call inside jit; caller guarantees use_replay()."""
  B, CAP_B = packed.shape
  CAP = CAP_B * 4
  R = CAP // LANES
  CAP_CH = nodes.shape[1]
  LO = 512
  NV = sy * (sx + 1)
  NH = (sy + 1) * sx
  OOB = NV + NH
  HI = -(-OOB // LO)
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

    skeys = jnp.sort(keys.reshape(B, CAP), axis=1) \
      .reshape(B, R, LANES)

    vhidx = pl.pallas_call(
      functools.partial(
        _replay_kernel, CAP=CAP, CAP_CH=CAP_CH, sx=sx, sy=sy,
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

    # sort edge indices per slice; pads / out-of-raster moves become
    # bin HI*LO (one row past the raster, landing in scratch pad rows)
    W = PAINT_W
    vflat = vhidx.reshape(B, CAP)
    svh = jnp.where((vflat < 0) | (vflat >= OOB), HI * LO, vflat)
    svh = jnp.sort(svh, axis=1).reshape(B, R, LANES)
    logw = int(np.log2(W))
    bq = jnp.minimum(svh[:, :, 0] >> int(np.log2(LO)), HI) >> logw
    lq = jnp.minimum(svh[:, :, LANES - 1] >> int(np.log2(LO)), HI) \
      >> logw
    lims = jnp.stack([bq, lq - bq + 1], axis=1) \
      .astype(jnp.int32)  # (B, 2, R): W-row window index + count

    vh = pl.pallas_call(
      functools.partial(_paint_kernel, R=R, HI=HI, LO=LO, W=W),
      grid=(B,),
      in_specs=[
        pl.BlockSpec((1, R, LANES), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 2, R), lambda i: (i, 0, 0),
                     memory_space=pltpu.SMEM),
      ],
      out_specs=pl.BlockSpec((1, HI, LO), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
      out_shape=jax.ShapeDtypeStruct((B, HI, LO), jnp.int32),
      scratch_shapes=[
        pltpu.VMEM((HI + W, LO), jnp.float32),
      ],
      interpret=INTERPRET,
    )(svh, lims)

  VH = vh.reshape(B, HI * LO)[:, :OOB].astype(jnp.uint8)
  V2 = VH[:, :NV].reshape(B, sy, sx + 1)
  H2 = VH[:, NV:].reshape(B, sy + 1, sx)
  vcg = (V2[:, :, 1:]
         | (V2[:, :, :sx] << 1)
         | (H2[:, 1:, :] << 2)
         | (H2[:, :sy, :] << 3))
  vcg = vcg.reshape(B, sy * sx)
  if not permissible:
    vcg = vcg ^ 0b1111
  return vcg
