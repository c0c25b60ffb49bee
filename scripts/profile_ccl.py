"""Finer CCL/plant timing + slice size distribution."""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
import bench
from crackle_tpu.kernels import engine, decode as _dec, ccl_pallas
from crackle_tpu.headers import CrackFormat

binary, vol = bench.get_binary()
sz = bench.SHAPE[2]
inputs = engine.prepare_slice_inputs(binary, 0, sz)
head = inputs["head"]

nb = inputs["nbytes"]
print(f"nbytes: min {nb.min()} p50 {np.percentile(nb, 50):.0f} "
      f"p75 {np.percentile(nb, 75):.0f} p90 {np.percentile(nb, 90):.0f} "
      f"max {nb.max()}  CAP_B {inputs['packed'].shape[1]}",
      file=sys.stderr)
nch = inputs["n_chains"]
print(f"n_chains: min {nch.min()} max {nch.max()}", file=sys.stderr)

uniq, cum, keys = engine._flat_label_tables(head, binary)
n_per = cum[1:sz+1] - cum[0:sz]
print(f"n_comp/slice: min {n_per.min()} p50 {np.percentile(n_per,50):.0f} "
      f"max {n_per.max()}", file=sys.stderr)

packed = jnp.asarray(inputs["packed"])
nbytes = jnp.asarray(inputs["nbytes"])
nodes = jnp.asarray(inputs["nodes"])
n_chains = jnp.asarray(inputs["n_chains"])
permissible = head.crack_format == CrackFormat.PERMISSIBLE
sx, sy = head.sx, head.sy


def sync(x):
  np.asarray(jnp.sum(x.astype(jnp.int32)))


def timeit(name, fn, *args, iters=10):
  out = fn(*args)
  leaves = jax.tree_util.tree_leaves(out)
  sync(leaves[0])
  best = None
  for _ in range(3):
    t0 = time.perf_counter()
    acc = None
    for _ in range(iters):
      out = fn(*args)
      acc = jax.tree_util.tree_leaves(out)[0]
    sync(acc)
    dt = (time.perf_counter() - t0) / iters
    best = dt if best is None else min(best, dt)
  print(f"{name}: {best*1e3:.2f} ms", file=sys.stderr)
  return out


vcg_fn = jax.jit(lambda p, nb_, nd, nc: _dec.decode_slices_to_vcg.__wrapped__(
  p, nb_, nd, nc, sx=sx, sy=sy, permissible=permissible))
vcg = vcg_fn(packed, nbytes, nodes, n_chains)
sync(vcg)

ccl_fn = jax.jit(lambda v: ccl_pallas.ccl_batch_traced(v, sx, sy))
timeit("ccl only (no paint)", ccl_fn, vcg)

cap_n = engine._next_pow2(max(int(n_per.max()), 8))
t64 = uniq.astype(np.uint64)[keys.astype(np.int64)]
idx = (cum[0:sz, None] + np.arange(cap_n)[None, :]).astype(np.int64)
T = np.stack([np.concatenate([
  (t64 & 0xffffffff).astype(np.uint32).view(np.int32),
  np.zeros(cap_n, np.int32)])[idx]], axis=1)
Tj = jnp.asarray(T)
ccl_paint_fn = jax.jit(lambda v, t: ccl_pallas.ccl_paint_traced(v, t, sx, sy))
timeit("ccl+plant", ccl_paint_fn, vcg, Tj)

# half-CAP replay: how much does CAP really cost?
CAP_B = inputs["packed"].shape[1]
half = CAP_B // 2
ok = nb <= half
print(f"slices fitting CAP_B/2={half}: {ok.sum()}/{len(nb)}", file=sys.stderr)
if ok.sum() > 8:
  sel = np.where(ok)[0]
  p2 = jnp.asarray(inputs["packed"][sel][:, :half])
  nb2 = jnp.asarray(inputs["nbytes"][sel])
  nd2 = jnp.asarray(inputs["nodes"][sel])
  nc2 = jnp.asarray(inputs["n_chains"][sel])
  vcg_fn2 = jax.jit(
    lambda p, nb_, nd, nc: _dec.decode_slices_to_vcg.__wrapped__(
      p, nb_, nd, nc, sx=sx, sy=sy, permissible=permissible))
  timeit(f"vcg half-CAP (B={len(sel)})", vcg_fn2, p2, nb2, nd2, nc2)
