"""Stage-by-stage timing of the device decode pipeline on the bench
volume. Run: python benchmarks/profile_decode.py"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, '.')
import bench as B
from crackle_tpu.kernels import engine, decode as D, ccl_pallas
from crackle_tpu import codec as _codec
from crackle_tpu.headers import CrackFormat


def timeit(fn, *args, n=5, **kw):
  out = fn(*args, **kw)
  jax.block_until_ready(out)
  ts = []
  for _ in range(n):
    t0 = time.perf_counter()
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    ts.append(time.perf_counter() - t0)
  return min(ts), out


def main():
  binary, vol = B.get_binary()
  sz = B.SHAPE[2]
  head = _codec.header(binary)
  sx, sy = head.sx, head.sy
  permissible = head.crack_format == CrackFormat.PERMISSIBLE

  t0 = time.perf_counter()
  inputs = engine.prepare_slice_inputs(binary, 0, sz)
  prep_dt = time.perf_counter() - t0
  print(f"host prep: {prep_dt*1e3:.1f} ms")

  packed = jnp.asarray(inputs["packed"])
  nbytes = jnp.asarray(inputs["nbytes"])
  nodes = jnp.asarray(inputs["nodes"])
  n_chains = jnp.asarray(inputs["n_chains"])
  jax.block_until_ready((packed, nbytes, nodes, n_chains))
  print(f"packed shape {packed.shape} nodes {nodes.shape}")

  # stage 1: full VCG
  dt, vcg = timeit(
    D.decode_slices_to_vcg, packed, nbytes, nodes, n_chains,
    sx=sx, sy=sy, permissible=permissible)
  print(f"vcg total: {dt*1e3:.1f} ms")

  # stage 2: CCL pallas
  dt, (cc, N) = timeit(ccl_pallas.ccl_batch_pallas, vcg, sx=sx, sy=sy)
  print(f"ccl pallas: {dt*1e3:.1f} ms")

  # --- sub-stages of the VCG replay, jitted separately ---
  CAP = int(packed.shape[1]) * 4
  idx = jnp.arange(CAP, dtype=jnp.int32)

  @jax.jit
  def s_unpack(packed, nbytes):
    b = packed.astype(jnp.int32)
    diffs = jnp.stack(
      [b & 3, (b >> 2) & 3, (b >> 4) & 3, (b >> 6) & 3], axis=2
    ).reshape(b.shape[0], -1)
    n_cps = (nbytes * 4).astype(jnp.int32)
    in_range = idx[None, :] < n_cps[:, None]
    diffs = jnp.where(in_range, diffs, 0)
    cps = (jnp.cumsum(diffs, axis=1) & 3).astype(jnp.int32)
    return cps, in_range

  dt, (cps, in_range) = timeit(s_unpack, packed, nbytes)
  print(f"  unpack+cumsum: {dt*1e3:.1f} ms")

  @jax.jit
  def s_classify(cps, in_range):
    def shift_right(x, fill):
      return jnp.concatenate(
        [jnp.full((x.shape[0], 1), fill, x.dtype), x[:, :-1]], axis=1)
    def shift_left(x, fill):
      return jnp.concatenate(
        [x[:, 1:], jnp.full((x.shape[0], 1), fill, x.dtype)], axis=1)
    prev = shift_right(cps, 255)
    r = ((cps ^ prev) == 0b10) & in_range
    run_start = jnp.where(r & ~shift_right(r, False), idx[None], -1)
    run_start = jax.lax.cummax(jnp.where(r, run_start, -1), axis=1)
    is_second = r & (((idx[None] - run_start) & 1) == 0)
    pair_first = shift_left(is_second, False)
    second_cp = shift_left(cps, 0)
    is_term_pair = (second_cp == 0) | (second_cp == 3)
    is_branch = pair_first & ~is_term_pair
    is_term = pair_first & is_term_pair
    is_move = ~pair_first & ~is_second & in_range
    tok = jnp.where(is_branch, 1, 0) - jnp.where(is_term, 1, 0)
    c = jnp.cumsum(tok, axis=1)
    runmin = shift_right(jax.lax.cummin(c, axis=1), 0)
    runmin = jnp.minimum(runmin, 0)
    is_end = (c < runmin) & in_range
    return is_move, is_branch, is_term, c, is_end

  dt, (is_move, is_branch, is_term, c, is_end) = timeit(
    s_classify, cps, in_range)
  print(f"  classify scans: {dt*1e3:.1f} ms")
  nb = int(jnp.sum(is_branch))
  nt = int(jnp.sum(is_term))
  nm = int(jnp.sum(is_move))
  print(f"  counts: moves={nm} branches={nb} terms={nt} "
        f"CAP*B={CAP*vcg.shape[0]}")
  print(f"  max depth: {int(jnp.max(c))}")

  # sort cost alone
  if 4 * CAP * CAP + 8 * CAP < 2 ** 31:
    kdt = jnp.int32
  else:
    kdt = jnp.int64
  keys = (c.astype(kdt) * kdt(2 * CAP + 2) + idx[None].astype(kdt))

  @jax.jit
  def s_sort(keys):
    return jnp.sort(keys, axis=1)

  dt, _ = timeit(s_sort, keys)
  print(f"  sort {keys.dtype} (B,{CAP}): {dt*1e3:.1f} ms")

  # scatter cost alone (CAP-sized scatter-add per slice)
  tgt = jnp.where(is_move, idx[None], CAP)

  @jax.jit
  def s_scatter(tgt, cps):
    acc = jnp.zeros((tgt.shape[0], CAP + 1), jnp.int32)
    return acc.at[jnp.arange(tgt.shape[0])[:, None], tgt].add(
      cps, mode='drop')

  dt, _ = timeit(s_scatter, tgt, cps)
  print(f"  one batched scatter-add (B,{CAP}): {dt*1e3:.1f} ms")

  # paint scatter (into sy*(sx+1)+(sy+1)*sx raster)
  OOB = sy * (sx + 1) + (sy + 1) * sx

  @jax.jit
  def s_paint(tgt):
    vh = jnp.zeros((tgt.shape[0], OOB + 1), jnp.uint8)
    return vh.at[jnp.arange(tgt.shape[0])[:, None],
                 jnp.minimum(tgt * 7, OOB)].max(1, mode='drop')

  dt, _ = timeit(s_paint, tgt)
  print(f"  paint scatter-max (B,{OOB}): {dt*1e3:.1f} ms")

  # full fused path
  uniq, cum, keys_np = engine._flat_label_tables(head, binary)
  dt, _ = timeit(engine.decode_window_device, binary, 0, sz, n=3)
  print(f"decode_window_device end-to-end: {dt*1e3:.1f} ms "
        f"({vol.size/dt/1e6:.1f} MVx/s)")


if __name__ == "__main__":
  main()
