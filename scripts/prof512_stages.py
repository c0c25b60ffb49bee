"""Per-stage device timing of the 512^3 decode (DeviceStream inputs):
vcg production (P1+sorts+P2+P3), ccl converge-only, ccl+reprop,
ccl+reprop+plant, and the fused full pipeline."""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
import bench
from crackle_tpu.kernels import engine, decode as _dec, ccl_pallas

path = os.path.join(bench.BENCH_DIR, "connectomics_v2_512x512x512.ckl")
binary = open(path, "rb").read()
stream = engine.upload_stream(binary)
sx, sy = stream.head.sx, stream.head.sy
packed, nbytes = stream.packed, stream.nbytes
nodes, n_chains, T = stream.nodes, stream.n_chains, stream.T
permissible = stream.permissible
print(f"B={packed.shape[0]} CAP_B={packed.shape[1]} "
      f"cap_n={T.shape[2]} ADD={ccl_pallas.ADD_SWEEP} "
      f"SMAX={ccl_pallas.SWEEP_SMAX}", file=sys.stderr)


def sync(x):
  np.asarray(jnp.sum(x.astype(jnp.int32) if x.dtype == jnp.uint32 else x))


def timeit(name, fn, *args, iters=4):
  out = fn(*args)
  sync(jax.tree_util.tree_leaves(out)[0])
  best = None
  for _ in range(3):
    t0 = time.perf_counter()
    acc = None
    for _ in range(iters):
      acc = jax.tree_util.tree_leaves(fn(*args))[0]
    sync(acc)
    dt = (time.perf_counter() - t0) / iters
    best = dt if best is None else min(best, dt)
  print(f"{name}: {best*1e3:.2f} ms", file=sys.stderr)
  return out


timeit("full fused pipeline", lambda: _dec.decode_slices_full_plant(
  packed, nbytes, nodes, n_chains, T, sx=sx, sy=sy,
  permissible=permissible))

vcg_fn = jax.jit(lambda p, nb, nd, nc: _dec.decode_slices_to_vcg.__wrapped__(
  p, nb, nd, nc, sx=sx, sy=sy, permissible=permissible))
vcg = timeit("vcg (P1+sorts+P2+P3)", vcg_fn, packed, nbytes, nodes,
             n_chains)

conv_fn = jax.jit(lambda v: ccl_pallas.ccl_min_traced(v, sx, sy))
timeit("ccl converge-only (kernel A)", conv_fn, vcg)

ccl_fn = jax.jit(lambda v: ccl_pallas.ccl_batch_traced(v, sx, sy))
timeit("ccl converge+reprop", ccl_fn, vcg)

paint_fn = jax.jit(lambda v, t: ccl_pallas.ccl_paint_traced(v, t, sx, sy))
timeit("ccl converge+reprop+plant", paint_fn, vcg, T)
