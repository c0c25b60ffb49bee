"""Generalized fused Pallas replay: any slice width up to 1023 and
codepoint capacities up to 2^19 (the canonical 512^3 corpus and
binary-noise slices included).

Same algorithm as replay_pallas (classify -> sort by (depth, pos) ->
scope match -> cancel -> position replay -> edge paint; reference
semantics crackcodes.hpp:523-603 / 706-862, oracle ops/crackcode.py),
restructured so VMEM stays bounded at any CAP:

  * every full-stream scan runs CHUNKED: a fori_loop walks (Rc, 128)
    row windows of the (R, 128) codepoint grid with the scan carries
    held as int32 scalars; windows read one lookahead row for the
    shift-left dependencies (pair-second classification,
    depth-segment ends)
  * sort keys adapt to CAP: one packed int32 key up to 16K
    codepoints; a flagless int32 key (depth*CAP + pos, which fits
    because depth <= n_cps/4 + chains + 2) plus an int8 flags VALUE
    operand through a single-key sort up to 64K; two int32 keys
    beyond
  * the scope-cancellation scatter: each move emits a target key
    ((isV*CAP + close_pos) << 1 | sign), XLA sorts them, and a
    windowed signed one-hot scatter (the same machinery as the
    paint) accumulates the H/V cancel planes in O(CAP) matmul rows.
    (An unsorted variant with per-group min/max windows was measured
    ~9 subwindows/group on the 512^3 corpus — a depth segment's
    closes span the whole raster — so the sort pays for itself.)
  * the edge-presence paint raster is segmented: plane-major bin rows
    (plane in {V, H}, segment = ex >> 9, dual row ey) keep the lane
    width at 512 for any sx; the in-kernel VCG assembly stitches
    segments, carrying the V column across segment seams

Corrupt streams can drive replayed positions outside the f32
floor-div window and alias edges into the valid raster; as everywhere
else in the decoder, the per-slice CCL crc32c is the integrity gate.
"""
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .ccl_pallas import _roll_up
from . import ccl_pallas
from .replay_pallas import (
  LANES, MAX_CHAINS,
  _flat_scan, _flat_cumsum, _flat_cummax, _flat_cummin,
  _flat_shift_right, _flat_shift_left, _op_firstset, _floor_div,
)

_I32MAX = np.iinfo(np.int32).max

PAINT_LO = 512   # paint scatter lane width (one segment of a dual row)
PAINT_W = 16     # paint scatter: bin-row window height per matmul
CANCEL_W = 16    # cancel scatter window height (bins = position grid)
# Mosaic compile time explodes with the stream row count (R = CAP/128):
# R=512 compiles in under a minute, R=4096 was still compiling after
# 28 minutes (binary-noise 512^2 slices). Cap the fused path at
# R=1024; longer streams take the XLA fallback, which compiles fast
# and is the correctness-oracle path.
MAX_CAP = 1 << 17

# rows per chunk of the in-kernel scans (tests shrink this to cover
# the multi-chunk carry paths on small streams)
CHUNK_R = 256

import os as _os

# Alternative cancel path: aggregate per-close run sums in sorted
# event order (segmented scans), compact the ~3% close records with a
# windowed value-scatter, sort only the compact tables, and scatter
# the summed values. Byte-correct on hardware but measured SLOWER
# than the per-move sort it replaces (512^3, B=512: compaction
# kernel 70.9 ms + narrow 3-operand sort 20.3 ms + run-sum kernel
# 11 ms + lims 6.5 ms vs the 27.5 ms full-width single-key sort —
# XLA's bitonic sort at 0.8 ns/element beats value-carrying one-hot
# matmul scatters, which need Precision.HIGHEST since bf16 one-hot
# tricks only stay exact for +-1 weights). Kept behind a flag as the
# measured negative result; default = the sort path.
CANCEL_COMPACT = _os.environ.get(
  "CRACKLE_TPU_CANCEL_COMPACT", "0") == "1"


def _chunk_rows(R: int) -> int:
  if R <= CHUNK_R:
    return R
  if R >= 4096:
    return min(128, CHUNK_R)
  return CHUNK_R


def _nseg(sx: int) -> int:
  return -(-(sx + 1) // PAINT_LO)


def _bc11(v, shape):
  """Splat a scalar carry across a grid (Mosaic supports scalar
  broadcasts; a (1, 1) vector at an arbitrary sublane/lane offset is
  a both-axes broadcast it rejects)."""
  return jnp.full(shape, v, jnp.int32)


def _shift_right_v(v, fillv):
  """Flat-order shift right with a traced scalar fill for element 0."""
  R, C = v.shape
  out = _flat_shift_right(v, 0)
  row = jax.lax.broadcasted_iota(jnp.int32, (R, C), 0)
  col = jax.lax.broadcasted_iota(jnp.int32, (R, C), 1)
  return jnp.where((row == 0) & (col == 0), _bc11(fillv, (R, C)), out)


# ---------------------------------------------------------------------------
# P1: chunked classification -> sort keys + cls
# ---------------------------------------------------------------------------

def _classify_chunk(d, pos, n_cps, n_chains, carr):
  """One (Rw, 128) window of the stream classification. carr is a
  tuple of int32 scalar carries from the previous chunk's last true
  element; returns (state dict, new carries evaluated at [Rc-1, C-1])
  where Rc = Rw - 1 (the last row is lookahead)."""
  (cps_c, prev_c, r_c, rs_c, c_c, cm_c, ie_c, ec_c) = carr
  Rw, C = d.shape
  shape = (Rw, C)

  in_range = jnp.where(pos < n_cps, 1, 0)
  d = d * in_range
  cps = (_flat_cumsum(d) + _bc11(cps_c, shape)) & 3

  prev = _shift_right_v(cps, prev_c)
  r = jnp.where((cps ^ prev) == 0b10, 1, 0) * in_range
  r_prev = _shift_right_v(r, r_c)
  rs = jnp.where((r > 0) & (r_prev == 0), pos, -1)
  run_start = jnp.maximum(
    _flat_cummax(jnp.where(r > 0, rs, -1)), _bc11(rs_c, shape))
  is_second = r * jnp.where(((pos - run_start) & 1) == 0, 1, 0)

  pair_first = _flat_shift_left(is_second, 0)
  second_cp = _flat_shift_left(cps, 0)
  term_pair = jnp.where((second_cp == 0) | (second_cp == 3), 1, 0)
  is_term = pair_first * term_pair
  is_move = (1 - pair_first) * (1 - is_second) * in_range

  tok = pair_first * (1 - term_pair) - is_term
  c = _flat_cumsum(tok) + _bc11(c_c, shape)
  cm = jnp.minimum(_flat_cummin(c), _bc11(cm_c, shape))
  runmin = jnp.minimum(_shift_right_v(cm, cm_c), 0)
  is_end = jnp.where(c < runmin, 1, 0) * in_range

  end_cum = _flat_cumsum(is_end) + _bc11(ec_c, shape)
  cnt_before = end_cum - is_end
  chain_of = jnp.clip(cnt_before, 0, jnp.maximum(n_chains - 1, 0))
  prev_is_end = _shift_right_v(is_end, ie_c)
  valid = jnp.where((cnt_before < n_chains) | (prev_is_end > 0), 1, 0)
  depth_after = c + chain_of + 1

  e = Rw - 2  # last true row
  new_carr = (
    cps[e, C - 1], cps[e, C - 1], r[e, C - 1],
    run_start[e, C - 1], c[e, C - 1],
    cm[e, C - 1], is_end[e, C - 1], end_cum[e, C - 1],
  )
  st = dict(
    pos=pos, cps=cps, is_move=is_move, is_term=is_term,
    valid=valid, chain_of=chain_of, depth_after=depth_after,
  )
  return st, new_carr


def _carr_init():
  def c11(v):
    return jnp.int32(v)
  return (c11(0), c11(255), c11(0), c11(-1), c11(0), c11(_I32MAX),
          c11(0), c11(0))


def _keys_kernel_big(diffs_ref, meta_ref, *out_refs, CAP, Rc, mode):
  if mode == "wide":
    kd_ref, kp_ref, cls_ref = out_refs
  else:  # packed / mid: one int32 key (+ int8 flags for mid)
    kp_ref = None
    if mode == "mid":
      kd_ref, kf_ref, cls_ref = out_refs
    else:
      kd_ref, cls_ref = out_refs
  C = LANES
  R = CAP // C
  NCH = R // Rc
  n_cps = meta_ref[0, 0, 0] * 4
  n_chains = meta_ref[0, 0, 1]

  def chunk(k, carr):
    r0 = pl.multiple_of(k * Rc, Rc)
    d = diffs_ref[0, pl.ds(r0, Rc + 1), :].astype(jnp.int32)
    row = jax.lax.broadcasted_iota(jnp.int32, (Rc + 1, C), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (Rc + 1, C), 1)
    pos = (r0 + row) * C + col
    st, new_carr = _classify_chunk(d, pos, n_cps, n_chains, carr)

    depth_evt = st["depth_after"] + st["is_term"]
    close = st["is_term"] * st["valid"]
    active = st["valid"] * jnp.minimum(st["is_move"] + st["is_term"], 1)
    flags = (close << 2) | st["cps"]
    if mode == "packed":
      keys = (depth_evt * CAP + st["pos"]) * 8 + flags
      kd_ref[0, pl.ds(r0, Rc), :] = \
        jnp.where(active > 0, keys, _I32MAX)[0:Rc]
    elif mode == "mid":
      # depth_evt <= n_cps/4 + chains + 2 < 2^31 / CAP for CAP <= 2^16,
      # so the flagless key fits int32; flags ride as an int8 value
      # operand through the (cheaper) single-key sort
      keys = depth_evt * CAP + st["pos"]
      kd_ref[0, pl.ds(r0, Rc), :] = \
        jnp.where(active > 0, keys, _I32MAX)[0:Rc]
      kf_ref[0, pl.ds(r0, Rc), :] = flags.astype(jnp.int8)[0:Rc]
    else:
      kd_ref[0, pl.ds(r0, Rc), :] = \
        jnp.where(active > 0, depth_evt, _I32MAX)[0:Rc]
      kp_ref[0, pl.ds(r0, Rc), :] = jnp.where(
        active > 0,
        (st["pos"] << 3) | (close << 2) | st["cps"], _I32MAX)[0:Rc]
    cls_ref[0, pl.ds(r0, Rc), :] = \
      (st["cps"] | ((st["is_move"] * st["valid"]) << 2)
       | (st["chain_of"] << 3))[0:Rc]
    return new_carr

  if NCH == 1:
    chunk(0, _carr_init())
  else:
    jax.lax.fori_loop(0, NCH, chunk, _carr_init())


# A slice's close (term) count is bounded by the pair structure:
# cps = moves + 2(branches + terms) and terms = branches + chains give
# terms <= (cps + 2*chains)/4. The compact cancel tables size to that
# bound, so overflow is impossible for well-formed streams of the
# given CAP; corrupt streams fall to the CRC gate like everywhere.
def _close_rows(CAP: int, CAP_CH: int) -> int:
  bound = (CAP + 2 * CAP_CH) // 4 + 1
  rows = -(-bound // LANES)
  return -(-rows // 4) * 4  # multiple of the scatter group size


def _decode_evt(mode, refs, r0, rows, CAP):
  """Decode a window of sorted event slots into
  (inf, cps, close, pos, depth)."""
  if mode == "packed":
    sk = refs[0][0, pl.ds(r0, rows), :]
    inf = jnp.where(sk == _I32MAX, 1, 0)
    cps = sk & 3
    close = ((sk >> 2) & 1) * (1 - inf)
    body = sk >> 3
    pos = body & (CAP - 1)
    depth = body >> int(np.log2(CAP))
  elif mode == "mid":
    sk = refs[0][0, pl.ds(r0, rows), :]
    fl = refs[1][0, pl.ds(r0, rows), :].astype(jnp.int32)
    inf = jnp.where(sk == _I32MAX, 1, 0)
    cps = fl & 3
    close = ((fl >> 2) & 1) * (1 - inf)
    pos = sk & (CAP - 1)
    depth = sk >> int(np.log2(CAP))
  else:
    depth = refs[0][0, pl.ds(r0, rows), :]
    kp = refs[1][0, pl.ds(r0, rows), :]
    inf = jnp.where(depth == _I32MAX, 1, 0)
    cps = kp & 3
    close = ((kp >> 2) & 1) * (1 - inf)
    pos = kp >> 3
  return inf, cps, close, pos, depth


_SENT = _I32MAX


def _op_lastset(a, b):
  """Later-set-wins fold for forward scans; unit = _SENT."""
  return jnp.where(b == _SENT, a, b)


def _cancel_sums_kernel(*refs, CAP, Rc, mode):
  """Per-close cancel run sums in sorted-event order (forward
  chunked). A depth segment is runs of moves each ended by their
  shared close, so each close's cancel contribution is the sum of
  -delta over the moves since the previous close (or segment start).
  Emits dense (dest = close rank, pos, sumH, sumV); non-closes get
  dest = -1."""
  n_in = 1 if mode == "packed" else 2
  in_refs = refs[:n_in]
  dest_ref, cpos_ref, sh_ref, sv_ref = refs[n_in:]
  C = LANES
  R = CAP // C
  NCH = R // Rc

  def chunk(k, carr):
    (c_depth, c_cumh, c_cumv, c_lah, c_lav, c_rank) = carr
    r0 = pl.multiple_of(k * Rc, Rc)
    inf, cps, close, pos, depth = _decode_evt(mode, in_refs, r0, Rc,
                                              CAP)
    move = (1 - inf) * (1 - close)
    # cancel contributions: -delta, split into H (x) and V (y, in
    # units of sxe) exactly like the replay kernel's deltas
    dh = move * (jnp.where(cps == 1, -1, 0)
                 + jnp.where(cps == 3, 1, 0))
    dv = move * (jnp.where(cps == 2, -1, 0)
                 + jnp.where(cps == 0, 1, 0))
    cumh = _flat_cumsum(dh) + _bc11(c_cumh, dh.shape)
    cumv = _flat_cumsum(dv) + _bc11(c_cumv, dv.shape)
    cumh_prev = _shift_right_v(cumh, c_cumh)
    cumv_prev = _shift_right_v(cumv, c_cumv)

    depth_prev = _shift_right_v(depth, c_depth)
    seg_first = jnp.where(depth != depth_prev, 1, 0)

    def last_anchor(cum, cum_prev, c_la):
      A = jnp.where(seg_first > 0, cum_prev,
                    jnp.where(close > 0, cum, _SENT))
      la = _flat_scan(A, _op_lastset, _SENT)
      la = jnp.where(la == _SENT, _bc11(c_la, la.shape), la)
      la_prev = _shift_right_v(la, c_la)
      return la, la_prev

    lah, lah_prev = last_anchor(cumh, cumh_prev, c_lah)
    lav, lav_prev = last_anchor(cumv, cumv_prev, c_lav)

    sumh = close * jnp.where(seg_first > 0, 0, cumh - lah_prev)
    sumv = close * jnp.where(seg_first > 0, 0, cumv - lav_prev)

    rank = _flat_cumsum(close) + _bc11(c_rank, close.shape)
    dest = jnp.where(close > 0, rank - 1, -1)

    dest_ref[0, pl.ds(r0, Rc), :] = dest
    cpos_ref[0, pl.ds(r0, Rc), :] = pos
    sh_ref[0, pl.ds(r0, Rc), :] = sumh
    sv_ref[0, pl.ds(r0, Rc), :] = sumv

    e = Rc - 1
    return (depth[e, C - 1], cumh[e, C - 1], cumv[e, C - 1],
            lah[e, C - 1], lav[e, C - 1], rank[e, C - 1])

  init = (jnp.int32(-1), jnp.int32(0), jnp.int32(0),
          jnp.int32(0), jnp.int32(0), jnp.int32(0))
  if NCH == 1:
    chunk(0, init)
  else:
    jax.lax.fori_loop(0, NCH, chunk, init)


def _compact_kernel(dest_ref, cpos_ref, sh_ref, sv_ref, lim_ref,
                    out_pos, out_sh, out_sv, scr_pos, scr_sh, scr_sv,
                    *, R, CROWS, G):
  """Windowed value-scatter of the (rank-indexed) close records into
  compact tables. Destinations are monotone (rank order), so per-group
  windows are narrow; the per-group [start, span] pairs come from the
  XLA-side close-count prefix (lim_ref)."""
  C = LANES
  W = CANCEL_W
  iota_w = jax.lax.broadcasted_iota(jnp.int32, (W, C), 0)
  iota_lo = jax.lax.broadcasted_iota(jnp.int32, (C, C), 0)
  zero = jnp.zeros((CROWS + W, C), jnp.float32)
  scr_pos[:, :] = zero
  scr_sh[:, :] = zero
  scr_sv[:, :] = zero

  def group(j, carry):
    his = []
    Blos = []
    vals = []
    for g in range(G):
      d = dest_ref[0, pl.ds(j * G + g, 1), :]
      p = cpos_ref[0, pl.ds(j * G + g, 1), :]
      sh = sh_ref[0, pl.ds(j * G + g, 1), :]
      sv = sv_ref[0, pl.ds(j * G + g, 1), :]
      valid = d >= 0
      hi = jnp.where(valid, d >> 7, 2 * CROWS + 2 * W)
      lo = jnp.where(valid, d & (C - 1), C)
      his.append(jax.lax.broadcast_in_dim(hi, (W, C), (0, 1)))
      lob = jax.lax.broadcast_in_dim(lo, (C, C), (0, 1))
      Blos.append(jnp.where(lob == iota_lo, jnp.float32(1),
                            jnp.float32(0)))
      vals.append((
        jax.lax.broadcast_in_dim((p + 1).astype(jnp.float32), (W, C),
                                 (0, 1)),
        jax.lax.broadcast_in_dim(sh.astype(jnp.float32), (W, C),
                                 (0, 1)),
        jax.lax.broadcast_in_dim(sv.astype(jnp.float32), (W, C),
                                 (0, 1)),
      ))
    bq = lim_ref[0, 0, j]
    nsub = lim_ref[0, 1, j]

    def sub(w, c2):
      start = (bq + w) * W
      parts = [jnp.zeros((W, C), jnp.float32) for _ in range(3)]
      for g in range(G):
        m = jnp.where(his[g] - start == iota_w, jnp.float32(1),
                      jnp.float32(0))
        for t in range(3):
          # HIGHEST: TPU default f32 dots multiply in bf16, which is
          # exact for the 0/1 one-hots elsewhere but not for these
          # value operands (positions up to 2*CAP, sums up to CAP)
          parts[t] = parts[t] + jax.lax.dot_general(
            m * vals[g][t], Blos[g], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
          )
      scr_pos[pl.ds(start, W), :] = scr_pos[pl.ds(start, W), :] + parts[0]
      scr_sh[pl.ds(start, W), :] = scr_sh[pl.ds(start, W), :] + parts[1]
      scr_sv[pl.ds(start, W), :] = scr_sv[pl.ds(start, W), :] + parts[2]
      return c2

    jax.lax.fori_loop(0, nsub, sub, 0)
    return carry

  jax.lax.fori_loop(0, R // G, group, 0)

  p = scr_pos[0:CROWS, :].astype(jnp.int32)
  out_pos[0] = jnp.where(p > 0, p - 1, jnp.int32(2 * R * C))
  out_sh[0] = scr_sh[0:CROWS, :].astype(jnp.int32)
  out_sv[0] = scr_sv[0:CROWS, :].astype(jnp.int32)


# ---------------------------------------------------------------------------
# P2a: sorted keys -> per-move cancel targets (reverse chunked)
# ---------------------------------------------------------------------------

def _scope_kernel(*refs, CAP, Rc, mode):
  if mode == "wide":
    skd_ref, skp_ref, tk_ref = refs
    skf_ref = None
  elif mode == "mid":
    skd_ref, skf_ref, tk_ref = refs
    skp_ref = None
  else:
    skd_ref, tk_ref = refs
    skp_ref = skf_ref = None
  C = LANES
  R = CAP // C
  NCH = R // Rc
  PADK = (2 * CAP) << 1

  def chunk(i, carr):
    carr_nc, carr_depth = carr
    k = (NCH - 1 - i) if NCH > 1 else 0
    r0 = pl.multiple_of(k * Rc, Rc)
    if mode == "packed":
      sk = skd_ref[0, pl.ds(r0, Rc + 1), :]
      inf = jnp.where(sk == _I32MAX, 1, 0)
      cps_s = sk & 3
      close = ((sk >> 2) & 1) * (1 - inf)
      body = sk >> 3
      pos_s = body & (CAP - 1)
      depth = body >> int(np.log2(CAP))
    elif mode == "mid":
      sk = skd_ref[0, pl.ds(r0, Rc + 1), :]
      fl = skf_ref[0, pl.ds(r0, Rc + 1), :].astype(jnp.int32)
      inf = jnp.where(sk == _I32MAX, 1, 0)
      cps_s = fl & 3
      close = ((fl >> 2) & 1) * (1 - inf)
      pos_s = sk & (CAP - 1)
      depth = sk >> int(np.log2(CAP))
    else:
      depth = skd_ref[0, pl.ds(r0, Rc + 1), :]
      kp = skp_ref[0, pl.ds(r0, Rc + 1), :]
      inf = jnp.where(depth == _I32MAX, 1, 0)
      cps_s = kp & 3
      close = ((kp >> 2) & 1) * (1 - inf)
      pos_s = kp >> 3

    nxt = _flat_shift_left(depth, -1)
    # the shift's window-end fill (-1) would fabricate a depth-segment
    # boundary at every chunk seam, silently dropping any move whose
    # close lies beyond the lookahead row (the round-3 512^3 corruption:
    # 40/512 slices with uncancelled deltas). Splice in the true depth
    # of the element after the window, carried from the next chunk
    # (processed first in this reverse iteration); -1 only at the real
    # end of the stream.
    Rw, Cw = depth.shape
    rowi = jax.lax.broadcasted_iota(jnp.int32, (Rw, Cw), 0)
    coli = jax.lax.broadcasted_iota(jnp.int32, (Rw, Cw), 1)
    at_end = (rowi == Rw - 1) & (coli == Cw - 1)
    nxt = jnp.where(at_end, _bc11(carr_depth, (Rw, Cw)), nxt)
    seg_last = jnp.minimum(
      jnp.where(depth != nxt, 1, 0) + inf, 1)
    setf = jnp.minimum(close + seg_last, 1)
    e = jnp.where(setf > 0,
                  jnp.where(close > 0, pos_s, CAP), -1)
    w = _flat_scan(e, _op_firstset, -1, reverse=True)
    nc = jnp.where(w < 0, _bc11(carr_nc, w.shape), w)
    nc_full = jnp.where(nc < 0, CAP, nc)

    # cancel-target keys: measured on the 512^3 corpus, a depth
    # segment's closes span the whole raster, so unsorted windows
    # average ~9 subwindows/group vs 1-2 sorted — the sort pays for
    # itself. Keys: ((isV*CAP + close_pos) << 1) | sign.
    move_s = (1 - inf) * (1 - close)
    ok = jnp.where((move_s > 0) & (nc_full < CAP), 1, 0)
    isV = jnp.where((cps_s == 0) | (cps_s == 2), 1, 0)
    neg = jnp.where((cps_s == 1) | (cps_s == 2), 1, 0)
    tkey = ((isV * CAP + nc_full) << 1) | neg
    tk_ref[0, pl.ds(r0, Rc), :] = \
      jnp.where(ok > 0, tkey, PADK)[0:Rc]
    # depth[1, 0] is the element just past the PREVIOUS chunk's window
    # end ((k*Rc + 1, 0) here = ((k-1)*Rc + Rc + 1, 0) there)
    return nc[0, 0], depth[1, 0]

  init = (jnp.int32(-1), jnp.int32(-1))
  if NCH == 1:
    chunk(0, init)
  else:
    jax.lax.fori_loop(0, NCH, chunk, init)


# ---------------------------------------------------------------------------
# shared windowed sorted scatter (signed cancel / presence paint)
# ---------------------------------------------------------------------------

def _scatter_sorted_keys(keys_ref, lim_ref, acc_scr, *, R, W, LO, G,
                         signed):
  """Accumulate sorted bin keys into acc_scr via windowed one-hot
  matmuls. signed=True: key = bin << 1 | negflag, weight = +-1;
  signed=False: key = bin, weight = 1. Pads carry bin = n_hi * LO and
  land in the scratch rows past the raster (the one-hot row select
  places them exactly; windows only need W rows of slack)."""
  C = LANES
  shift = int(np.log2(LO))
  iota_w = jax.lax.broadcasted_iota(jnp.int32, (W, C), 0)
  iota_lo = jax.lax.broadcasted_iota(jnp.int32, (LO, C), 0)

  def group(j, carry):
    his = []
    sgns = []
    Blos = []
    for g in range(G):
      krow = keys_ref[0, pl.ds(j * G + g, 1), :]  # (1, C) sorted
      if signed:
        bins = krow >> 1
        sg = (1 - 2 * (krow & 1)).astype(jnp.float32)
        sgns.append(jax.lax.broadcast_in_dim(sg, (W, C), (0, 1)))
      else:
        bins = krow
      his.append(jax.lax.broadcast_in_dim(bins >> shift, (W, C),
                                          (0, 1)))
      lob = jax.lax.broadcast_in_dim(bins & (LO - 1), (LO, C), (0, 1))
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
                      jnp.float32(0))
        if signed:
          A = A * sgns[g]
        part = part + jax.lax.dot_general(
          A.astype(jnp.bfloat16), Blos[g], (((1,), (1,)), ((), ())),
          preferred_element_type=jnp.float32,
        )
      acc_scr[pl.ds(start, W), :] = acc_scr[pl.ds(start, W), :] + part
      return c2

    jax.lax.fori_loop(0, nsub, sub, 0)
    return carry

  jax.lax.fori_loop(0, R // G, group, 0)


def _scatter_group(R):
  return 4 if R % 4 == 0 else (2 if R % 2 == 0 else 1)


# ---------------------------------------------------------------------------
# P2b: cancel scatter + chunked position replay -> edge bin ids
# ---------------------------------------------------------------------------

def _replay_kernel_big(cls_ref, stk_ref, limc_ref, nodes_ref,
                       vh_ref, acc_scr, *, CAP, Rc, sx, sy, NSEG, G):
  C = LANES
  R = CAP // C

  acc_scr[:, :] = jnp.zeros((2 * R + CANCEL_W, C), jnp.float32)
  _scatter_sorted_keys(stk_ref, limc_ref, acc_scr, R=R, W=CANCEL_W,
                       LO=C, G=G, signed=True)
  _replay_positions(cls_ref, nodes_ref, vh_ref, acc_scr,
                    CAP=CAP, Rc=Rc, sx=sx, sy=sy, NSEG=NSEG)


def _replay_kernel_compact(cls_ref, cpos_ref, csh_ref, csv_ref,
                           limd_ref, nodes_ref, vh_ref, acc_scr, *,
                           CAP, Rc, sx, sy, NSEG, G, CROWS):
  """Replay with per-close aggregated cancel values: instead of
  scattering every move's +-1 through a full-width sorted key array,
  the (position-sorted) compact close tables scatter their run sums —
  sumH into the H plane rows [0, R) and sumV into [R, 2R) — with the
  same windowed one-hot matmuls (f32 operands: sums exceed bf16's
  mantissa but stay under 2^24)."""
  C = LANES
  R = CAP // C
  W = CANCEL_W
  iota_w = jax.lax.broadcasted_iota(jnp.int32, (W, C), 0)
  iota_lo = jax.lax.broadcasted_iota(jnp.int32, (C, C), 0)
  acc_scr[:, :] = jnp.zeros((2 * R + 2 * CANCEL_W, C), jnp.float32)

  def group(j, carry):
    his = []
    Blos = []
    vh_vals = []
    for g in range(G):
      p = cpos_ref[0, pl.ds(j * G + g, 1), :]
      sh = csh_ref[0, pl.ds(j * G + g, 1), :]
      sv = csv_ref[0, pl.ds(j * G + g, 1), :]
      valid = p < CAP
      hi = jnp.where(valid, p >> 7, 4 * R + 4 * W)
      lo = jnp.where(valid, p & (C - 1), C)
      his.append(jax.lax.broadcast_in_dim(hi, (W, C), (0, 1)))
      lob = jax.lax.broadcast_in_dim(lo, (C, C), (0, 1))
      Blos.append(jnp.where(lob == iota_lo, jnp.float32(1),
                            jnp.float32(0)))
      vh_vals.append((
        jax.lax.broadcast_in_dim(sh.astype(jnp.float32), (W, C),
                                 (0, 1)),
        jax.lax.broadcast_in_dim(sv.astype(jnp.float32), (W, C),
                                 (0, 1)),
      ))
    bq = limd_ref[0, 0, j]
    nsub = limd_ref[0, 1, j]

    def sub(w, c2):
      start = (bq + w) * W
      ph = jnp.zeros((W, C), jnp.float32)
      pv = jnp.zeros((W, C), jnp.float32)
      for g in range(G):
        m = jnp.where(his[g] - start == iota_w, jnp.float32(1),
                      jnp.float32(0))
        ph = ph + jax.lax.dot_general(
          m * vh_vals[g][0], Blos[g], (((1,), (1,)), ((), ())),
          preferred_element_type=jnp.float32,
          precision=jax.lax.Precision.HIGHEST)
        pv = pv + jax.lax.dot_general(
          m * vh_vals[g][1], Blos[g], (((1,), (1,)), ((), ())),
          preferred_element_type=jnp.float32,
          precision=jax.lax.Precision.HIGHEST)
      acc_scr[pl.ds(start, W), :] = acc_scr[pl.ds(start, W), :] + ph
      acc_scr[pl.ds(R + start, W), :] = \
        acc_scr[pl.ds(R + start, W), :] + pv
      return c2

    jax.lax.fori_loop(0, nsub, sub, 0)
    return carry

  jax.lax.fori_loop(0, CROWS // G, group, 0)
  _replay_positions(cls_ref, nodes_ref, vh_ref, acc_scr,
                    CAP=CAP, Rc=Rc, sx=sx, sy=sy, NSEG=NSEG)


def _replay_positions(cls_ref, nodes_ref, vh_ref, acc_scr, *,
                      CAP, Rc, sx, sy, NSEG):
  C = LANES
  R = CAP // C
  NCH = R // Rc
  sxe = sx + 1
  HIS = 2 * NSEG * (sy + 1)

  def chunk(k, carr_pos):
    r0 = pl.multiple_of(k * Rc, Rc)
    clsv = cls_ref[0, pl.ds(r0, Rc), :]
    cps = clsv & 3
    mv = (clsv >> 2) & 1
    chain_of = clsv >> 3
    ch = acc_scr[pl.ds(r0, Rc), :].astype(jnp.int32)
    cv = acc_scr[pl.ds(R + r0, Rc), :].astype(jnp.int32)

    deltas = jnp.where(
      cps == 0, -sxe,
      jnp.where(cps == 1, 1, jnp.where(cps == 2, sxe, -1)))
    deltas = deltas * mv
    acc = deltas + ch + sxe * cv
    pos_after = _flat_cumsum(acc) + _bc11(carr_pos, (Rc, C))

    cmin = chain_of[0, 0]
    cmax = chain_of[Rc - 1, C - 1]

    def base_body(kk, b):
      nk = nodes_ref[0, 0, kk]
      return jnp.where(chain_of == kk, jnp.full_like(b, nk), b)

    base = jax.lax.fori_loop(
      cmin, cmax + 1, base_body, jnp.zeros((Rc, C), jnp.int32))
    pos_before = pos_after + base * mv - deltas

    py = _floor_div(pos_before, sxe)
    px = pos_before - py * sxe
    ey = jnp.where(cps == 0, py - 1, py)
    ex = jnp.where(cps == 3, px - 1, px)
    plH = jnp.where((cps == 1) | (cps == 3), 1, 0)
    seg = ex >> int(np.log2(PAINT_LO))
    binrow = (plH * NSEG + seg) * (sy + 1) + ey
    vh = binrow * PAINT_LO + (ex & (PAINT_LO - 1))
    ok = (mv * jnp.where(ey >= 0, 1, 0) * jnp.where(ey <= sy, 1, 0)
          * jnp.where(ex >= 0, 1, 0) * jnp.where(ex < sxe, 1, 0))
    vh = jnp.where(ok > 0, vh, HIS * PAINT_LO)
    vh_ref[0, pl.ds(r0, Rc), :] = vh
    return pos_after[Rc - 1, C - 1]

  init = jnp.int32(0)
  if NCH == 1:
    chunk(0, init)
  else:
    jax.lax.fori_loop(0, NCH, chunk, init)


# ---------------------------------------------------------------------------
# P3: sorted edge ids -> segmented presence paint -> assembled VCG
# ---------------------------------------------------------------------------

def _paint_vcg_big(svh_ref, limp_ref, vcg_ref, paint_scr, asm_scr, *,
                   R, sx, sy, NSEG, G, permissible):
  LO = PAINT_LO
  sye = sy + 1
  HIS = 2 * NSEG * sye
  paint_scr[:, :] = jnp.zeros((HIS + PAINT_W, LO), jnp.float32)
  _scatter_sorted_keys(svh_ref, limp_ref, paint_scr, R=R, W=PAINT_W,
                       LO=LO, G=G, signed=False)

  comp = 0 if permissible else 0b1111
  one = jnp.int32(1)
  zero = jnp.int32(0)

  def plane_v(s):
    return jnp.where(paint_scr[s * sye:(s + 1) * sye, :] > 0, one,
                     zero)

  def plane_h(s):
    return jnp.where(
      paint_scr[(NSEG + s) * sye:(NSEG + s + 1) * sye, :] > 0, one,
      zero)

  col = jax.lax.broadcasted_iota(jnp.int32, (sy, LO), 1)
  for s in range(NSEG):
    V2 = plane_v(s)
    H2 = plane_h(s)
    v_lo = V2[0:sy, :]
    v_sh = _roll_up(v_lo, 1, 1, 0)
    if s + 1 < NSEG:
      nxt = jnp.where(
        paint_scr[(s + 1) * sye:(s + 1) * sye + sy, 0:1] > 0, one,
        zero)
      v_sh = jnp.where(col == LO - 1,
                       jax.lax.broadcast_in_dim(nxt, (sy, LO), (0, 1)),
                       v_sh)
    h_up = H2[0:sy, :]
    h_dn = _roll_up(H2, 1, 0, 0)[0:sy, :]
    vcg_s = (v_sh | (v_lo << 1) | (h_dn << 2) | (h_up << 3)) ^ comp
    if NSEG == 1:
      vcg_ref[0] = vcg_s[:, 0:sx]
    else:
      asm_scr[:, s * LO:(s + 1) * LO] = vcg_s
  if NSEG > 1:
    vcg_ref[0] = asm_scr[:, 0:sx]


# ---------------------------------------------------------------------------
# eligibility + host-facing entry
# ---------------------------------------------------------------------------

def eligible(CAP: int, CAP_CH: int, sx: int, sy: int) -> bool:
  if CAP < 2 * LANES or CAP > MAX_CAP or CAP & (CAP - 1):
    return False
  if CAP_CH > MAX_CHAINS:
    return False
  if (sx + 1) * (sy + 1) >= (1 << 24):
    return False
  NSEG = _nseg(sx)
  if NSEG > 2 or NSEG * (sy + 1) > 1536:
    return False
  R = CAP // LANES
  # P2b/P3 VMEM: full streams + cancel planes + paint raster
  vmem = (4 * (R + 1) * LANES * 4
          + (2 * R + CANCEL_W) * LANES * 4
          + (2 * NSEG * (sy + 1) + PAINT_W) * PAINT_LO * 4
          + (sy * NSEG * PAINT_LO * 4 if NSEG > 1 else 0)
          + 3 * (sy + 1) * PAINT_LO * 4)
  return vmem <= 12 * 1024 * 1024


def replay_vcg_i32_big(packed, nbytes, nodes, n_chains, sx, sy,
                      permissible, stash=None):
  """Generalized fused replay to an int32 (B, sy, sx) VCG. Call
  inside jit; caller guarantees eligible().

  stash: optional dict; when given, per-stage intermediates (keys,
  cls, tk, vhidx, ...) are recorded into it so hardware runs can be
  bisected against interpret-mode runs stage by stage."""
  B, CAP_B = packed.shape
  CAP = CAP_B * 4
  R = CAP // LANES
  Rc = _chunk_rows(R)
  CAP_CH = nodes.shape[1]
  NSEG = _nseg(sx)
  HIS = 2 * NSEG * (sy + 1)
  INTERPRET = ccl_pallas.INTERPRET
  # key mode: single packed int32 key up to 16K codepoints; flagless
  # int32 key + int8 flags value up to 64K (depth <= n_cps/4 +
  # MAX_CHAINS + 2 keeps depth*CAP + pos inside int32); two int32 keys
  # beyond that
  mode = ("packed" if CAP <= 16384
          else ("mid" if CAP <= 65536 else "wide"))

  b = packed.astype(jnp.uint8)
  diffs = jnp.stack(
    [b & 3, (b >> 2) & 3, (b >> 4) & 3, (b >> 6) & 3], axis=2
  ).reshape(B, R, LANES)
  # one zero lookahead row (masked by in_range in the kernel)
  diffs = jnp.concatenate(
    [diffs, jnp.zeros((B, 1, LANES), diffs.dtype)], axis=1)
  meta = jnp.stack(
    [nbytes.astype(jnp.int32), n_chains.astype(jnp.int32)],
    axis=1)[:, None, :]
  nodes_ = nodes.astype(jnp.int32)[:, None, :]

  def pad_row(x, fill, dtype=jnp.int32):
    return jnp.concatenate(
      [x.reshape(B, R, LANES),
       jnp.full((B, 1, LANES), fill, dtype)], axis=1)

  with jax.enable_x64(False):
    n_outs = 2 if mode == "packed" else 3
    key_dtypes = {"packed": [jnp.int32],
                  "mid": [jnp.int32, jnp.int8],
                  "wide": [jnp.int32, jnp.int32]}[mode]
    outs = pl.pallas_call(
      functools.partial(_keys_kernel_big, CAP=CAP, Rc=Rc, mode=mode),
      grid=(B,),
      in_specs=[
        pl.BlockSpec((1, R + 1, LANES), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 2), lambda i: (i, 0, 0),
                     memory_space=pltpu.SMEM),
      ],
      out_specs=[
        pl.BlockSpec((1, R, LANES), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM)
        for _ in range(n_outs)
      ],
      out_shape=[jax.ShapeDtypeStruct((B, R, LANES), dt)
                 for dt in key_dtypes]
      + [jax.ShapeDtypeStruct((B, R, LANES), jnp.int32)],
      interpret=INTERPRET,
    )(diffs, meta)
    if mode == "packed":
      kd, cls = outs
      skd = jax.lax.sort(kd.reshape(B, CAP), dimension=1,
                         is_stable=False)
      sorted_keys = [pad_row(skd, _I32MAX)]
    elif mode == "mid":
      kd, kf, cls = outs
      skd, skf = jax.lax.sort(
        (kd.reshape(B, CAP), kf.reshape(B, CAP)), dimension=1,
        is_stable=False, num_keys=1)
      sorted_keys = [pad_row(skd, _I32MAX),
                     pad_row(skf, 0, jnp.int8)]
    else:
      kd, kp, cls = outs
      skd, skp = jax.lax.sort(
        (kd.reshape(B, CAP), kp.reshape(B, CAP)), dimension=1,
        is_stable=False, num_keys=2)
      sorted_keys = [pad_row(skd, _I32MAX), pad_row(skp, _I32MAX)]
    if stash is not None:
      stash["outs"] = outs
      stash["sorted_keys"] = sorted_keys

    G = _scatter_group(R)
    logw_c = int(np.log2(CANCEL_W))
    if CANCEL_COMPACT:
      CROWS = _close_rows(CAP, CAP_CH)
      CCAP = CROWS * LANES
      # dense per-slot close records (rank dest, pos, run sums)
      dense = pl.pallas_call(
        functools.partial(_cancel_sums_kernel, CAP=CAP, Rc=Rc,
                          mode=mode),
        grid=(B,),
        in_specs=[
          pl.BlockSpec((1, R + 1, LANES), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
          for _ in range(len(sorted_keys))
        ],
        out_specs=[
          pl.BlockSpec((1, R, LANES), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
          for _ in range(4)
        ],
        out_shape=[jax.ShapeDtypeStruct((B, R, LANES), jnp.int32)
                   for _ in range(4)],
        interpret=INTERPRET,
      )(*sorted_keys)
      dest_d, cpos_d, sh_d, sv_d = dense
      if stash is not None:
        stash["dense_close"] = dense

      # compaction window limits: per-group close-count prefix
      is_cl = (dest_d >= 0).reshape(B, R // G, G * LANES)
      counts = jnp.sum(is_cl, axis=2, dtype=jnp.int32)
      prefix = jnp.cumsum(counts, axis=1) - counts
      first_d = prefix
      last_d = jnp.maximum(prefix + counts - 1, first_d)
      bqk = (first_d >> 7) >> logw_c
      lqk = (last_d >> 7) >> logw_c
      limk = jnp.stack([bqk, lqk - bqk + 1], axis=1).astype(jnp.int32)

      compact = pl.pallas_call(
        functools.partial(_compact_kernel, R=R, CROWS=CROWS, G=G),
        grid=(B,),
        in_specs=[
          pl.BlockSpec((1, R, LANES), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
          for _ in range(4)
        ] + [
          pl.BlockSpec((1, 2, R // G), lambda i: (i, 0, 0),
                       memory_space=pltpu.SMEM),
        ],
        out_specs=[
          pl.BlockSpec((1, CROWS, LANES), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
          for _ in range(3)
        ],
        out_shape=[jax.ShapeDtypeStruct((B, CROWS, LANES), jnp.int32)
                   for _ in range(3)],
        scratch_shapes=[
          pltpu.VMEM((CROWS + CANCEL_W, LANES), jnp.float32)
          for _ in range(3)
        ],
        interpret=INTERPRET,
      )(dest_d, cpos_d, sh_d, sv_d, limk)
      cpos_c, sh_c, sv_c = compact

      # narrow sort by close position (sums ride as values)
      cposs, shs, svs = jax.lax.sort(
        (cpos_c.reshape(B, CCAP), sh_c.reshape(B, CCAP),
         sv_c.reshape(B, CCAP)), dimension=1, is_stable=False,
        num_keys=1)
      cposs = cposs.reshape(B, CROWS, LANES)
      shs = shs.reshape(B, CROWS, LANES)
      svs = svs.reshape(B, CROWS, LANES)
      if stash is not None:
        stash["compact_sorted"] = (cposs, shs, svs)
      G2 = _scatter_group(CROWS)
      bq = jnp.minimum(cposs[:, 0::G2, 0] >> 7, R) >> logw_c
      lq = jnp.minimum(
        cposs[:, G2 - 1::G2, LANES - 1] >> 7, R) >> logw_c
      limd = jnp.stack([bq, lq - bq + 1], axis=1).astype(jnp.int32)

      vhidx = pl.pallas_call(
        functools.partial(_replay_kernel_compact, CAP=CAP, Rc=Rc,
                          sx=sx, sy=sy, NSEG=NSEG, G=G2, CROWS=CROWS),
        grid=(B,),
        in_specs=[
          pl.BlockSpec((1, R, LANES), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM),
        ] + [
          pl.BlockSpec((1, CROWS, LANES), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
          for _ in range(3)
        ] + [
          pl.BlockSpec((1, 2, CROWS // G2), lambda i: (i, 0, 0),
                       memory_space=pltpu.SMEM),
          pl.BlockSpec((1, 1, CAP_CH), lambda i: (i, 0, 0),
                       memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, R, LANES), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, R, LANES), jnp.int32),
        scratch_shapes=[
          pltpu.VMEM((2 * R + 2 * CANCEL_W, LANES), jnp.float32),
        ],
        interpret=INTERPRET,
      )(cls, cposs, shs, svs, limd, nodes_)
    else:
      tk = pl.pallas_call(
        functools.partial(_scope_kernel, CAP=CAP, Rc=Rc, mode=mode),
        grid=(B,),
        in_specs=[
          pl.BlockSpec((1, R + 1, LANES), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
          for _ in range(len(sorted_keys))
        ],
        out_specs=pl.BlockSpec((1, R, LANES), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, R, LANES), jnp.int32),
        interpret=INTERPRET,
      )(*sorted_keys)

      # sort cancel-target keys; window limits per group of G chunks
      stk = jax.lax.sort(tk.reshape(B, CAP), dimension=1,
                         is_stable=False).reshape(B, R, LANES)
      if stash is not None:
        stash["tk"] = tk
        stash["stk"] = stk
      bq = jnp.minimum((stk[:, 0::G, 0] >> 1) >> 7, 2 * R) >> logw_c
      lq = jnp.minimum(
        (stk[:, G - 1::G, LANES - 1] >> 1) >> 7, 2 * R) >> logw_c
      limc = jnp.stack([bq, lq - bq + 1], axis=1).astype(jnp.int32)

      vhidx = pl.pallas_call(
        functools.partial(_replay_kernel_big, CAP=CAP, Rc=Rc, sx=sx,
                          sy=sy, NSEG=NSEG, G=G),
        grid=(B,),
        in_specs=[
          pl.BlockSpec((1, R, LANES), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, R, LANES), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, 2, R // G), lambda i: (i, 0, 0),
                       memory_space=pltpu.SMEM),
          pl.BlockSpec((1, 1, CAP_CH), lambda i: (i, 0, 0),
                       memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, R, LANES), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, R, LANES), jnp.int32),
        scratch_shapes=[
          pltpu.VMEM((2 * R + CANCEL_W, LANES), jnp.float32),
        ],
        interpret=INTERPRET,
      )(cls, stk, limc, nodes_)

    logw_p = int(np.log2(PAINT_W))
    log_lo = int(np.log2(PAINT_LO))
    svh = jax.lax.sort(vhidx.reshape(B, CAP), dimension=1,
                       is_stable=False).reshape(B, R, LANES)
    if stash is not None:
      stash["vhidx"] = vhidx
      stash["svh"] = svh
    bqp = jnp.minimum(svh[:, 0::G, 0] >> log_lo, HIS) >> logw_p
    lqp = jnp.minimum(
      svh[:, G - 1::G, LANES - 1] >> log_lo, HIS) >> logw_p
    limp = jnp.stack([bqp, lqp - bqp + 1], axis=1).astype(jnp.int32)

    asm_rows = sy if NSEG > 1 else 1
    vcg = pl.pallas_call(
      functools.partial(_paint_vcg_big, R=R, sx=sx, sy=sy, NSEG=NSEG,
                        G=G, permissible=permissible),
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
        pltpu.VMEM((HIS + PAINT_W, PAINT_LO), jnp.float32),
        pltpu.VMEM((asm_rows, NSEG * PAINT_LO), jnp.int32),
      ],
      interpret=INTERPRET,
    )(svh, limp)

  return vcg
