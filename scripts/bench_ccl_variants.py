"""CCL kernel micro-variants on the real chip: find where the
propagation time actually goes.

Variants:
  base      current ccl_batch_traced (packed flags, counted loop 2)
  sweepN    fixed N sweeps, no while loop (isolates convergence-check
            and loop overhead from raw sweep cost)
  xonly     x-direction scans only (isolates sublane-roll cost of y)
  yonly     y-direction scans only
  transy    y scans via transpose + lane scans + transpose back
"""
import sys
import time

sys.setrecursionlimit(100000)

import numpy as np
import jax
import jax.numpy as jnp
import functools
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")
import bench
from crackle_tpu.kernels import engine, decode as _dec, ccl_pallas
from crackle_tpu import codec as _codec
from crackle_tpu.headers import CrackFormat

binary, vol = bench.get_binary()
sz = bench.SHAPE[2]
inputs = engine.prepare_slice_inputs(binary, 0, sz)
head = inputs["head"]
sx, sy = head.sx, head.sy
permissible = head.crack_format == CrackFormat.PERMISSIBLE

vcg_fn = jax.jit(
  lambda p, nb, nd, nc: _dec.decode_slices_to_vcg.__wrapped__(
    p, nb, nd, nc, sx=sx, sy=sy, permissible=permissible))
vcg = vcg_fn(
  jnp.asarray(inputs["packed"]), jnp.asarray(inputs["nbytes"]),
  jnp.asarray(inputs["nodes"]), jnp.asarray(inputs["n_chains"]))
vcg = jnp.asarray(np.asarray(vcg))  # materialize
B = vcg.shape[0]


def sync(x):
  np.asarray(jnp.sum(x))


def timeit(name, fn, *args, iters=10):
  with jax.enable_x64(False):
    out = fn(*args)
    sync(jax.tree_util.tree_leaves(out)[0])
    best = None
    for _ in range(3):
      t0 = time.perf_counter()
      for _ in range(iters):
        out = fn(*args)
      sync(jax.tree_util.tree_leaves(out)[0])
      dt = (time.perf_counter() - t0) / iters
      best = dt if best is None else min(best, dt)
  print(f"{name}: {best * 1e3:.2f} ms", file=sys.stderr)
  return out


# --- base ---
timeit("base ccl (packed flags)", jax.jit(
  lambda v: ccl_pallas.ccl_batch_traced(v, sx=sx, sy=sy)), vcg)


def make_fixed_kernel(n_sweeps, dirs, transpose_y):
  def kern(vcg_ref, cc_ref):
    v = vcg_ref[0].astype(jnp.int32)
    yy = jax.lax.broadcasted_iota(jnp.int32, (sy, sx), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (sy, sx), 1)
    one = jnp.ones((sy, sx), jnp.int32)
    zero = jnp.zeros((sy, sx), jnp.int32)
    left_ok = jnp.where(((v & 0b0010) > 0) & (xx > 0), one, zero)
    up_ok = jnp.where(((v & 0b1000) > 0) & (yy > 0), one, zero)
    FBxf = ccl_pallas._pack_flags(1 - left_ok, 1, up=False)
    FBxb = ccl_pallas._pack_flags(
      1 - ccl_pallas._roll_up(left_ok, 1, 1, 0), 1, up=True)
    if transpose_y:
      up_t = up_ok.T
      FByf = ccl_pallas._pack_flags(1 - up_t, 1, up=False)
      FByb = ccl_pallas._pack_flags(
        1 - ccl_pallas._roll_up(up_t, 1, 1, 0), 1, up=True)
    else:
      FByf = ccl_pallas._pack_flags(1 - up_ok, 0, up=False)
      FByb = ccl_pallas._pack_flags(
        1 - ccl_pallas._roll_up(up_ok, 1, 0, 0), 0, up=True)

    def sweep(L):
      if 'x' in dirs:
        L = ccl_pallas._seg_min_fwd_p(L, FBxf, 1)
        L = ccl_pallas._seg_min_bwd_p(L, FBxb, 1)
      if 'y' in dirs:
        if transpose_y:
          Lt = L.T
          Lt = ccl_pallas._seg_min_fwd_p(Lt, FByf, 1)
          Lt = ccl_pallas._seg_min_bwd_p(Lt, FByb, 1)
          L = Lt.T
        else:
          L = ccl_pallas._seg_min_fwd_p(L, FByf, 0)
          L = ccl_pallas._seg_min_bwd_p(L, FByb, 0)
      return L

    L = yy * sx + xx
    L = jax.lax.fori_loop(0, n_sweeps, lambda i, Lv: sweep(Lv), L)
    cc_ref[0] = L
  return kern


def run_fixed(name, n_sweeps, dirs='xy', transpose_y=False):
  @jax.jit
  def fn(v):
    v2 = v.reshape(B, sy, sx)
    return pl.pallas_call(
      make_fixed_kernel(n_sweeps, dirs, transpose_y),
      grid=(B,),
      in_specs=[pl.BlockSpec((1, sy, sx), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)],
      out_specs=pl.BlockSpec((1, sy, sx), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
      out_shape=jax.ShapeDtypeStruct((B, sy, sx), jnp.int32),
      interpret=ccl_pallas.INTERPRET,
    )(v2)
  timeit(name, fn, vcg)


run_fixed("fixed 1 sweep xy", 1)
run_fixed("fixed 8 sweeps xy", 8)
run_fixed("fixed 8 sweeps x only", 8, dirs='x')
run_fixed("fixed 8 sweeps y only", 8, dirs='y')
run_fixed("fixed 8 sweeps xy transposed-y", 8, transpose_y=True)


def run_fixed_batched(name, n_sweeps, SB):
  """SB slices per grid step: does per-step overhead amortize?"""
  @jax.jit
  def fn(v):
    v2 = v.reshape(B // SB, SB, sy, sx)

    def kern(vcg_ref, cc_ref):
      for g in range(SB):
        yy = jax.lax.broadcasted_iota(jnp.int32, (sy, sx), 0)
        xx = jax.lax.broadcasted_iota(jnp.int32, (sy, sx), 1)
        vg = vcg_ref[0, g].astype(jnp.int32)
        one = jnp.ones((sy, sx), jnp.int32)
        zero = jnp.zeros((sy, sx), jnp.int32)
        left_ok = jnp.where(((vg & 0b0010) > 0) & (xx > 0), one, zero)
        up_ok = jnp.where(((vg & 0b1000) > 0) & (yy > 0), one, zero)
        FBxf = ccl_pallas._pack_flags(1 - left_ok, 1, up=False)
        FBxb = ccl_pallas._pack_flags(
          1 - ccl_pallas._roll_up(left_ok, 1, 1, 0), 1, up=True)
        FByf = ccl_pallas._pack_flags(1 - up_ok, 0, up=False)
        FByb = ccl_pallas._pack_flags(
          1 - ccl_pallas._roll_up(up_ok, 1, 0, 0), 0, up=True)

        def sweep(L):
          L = ccl_pallas._seg_min_fwd_p(L, FBxf, 1)
          L = ccl_pallas._seg_min_bwd_p(L, FBxb, 1)
          L = ccl_pallas._seg_min_fwd_p(L, FByf, 0)
          L = ccl_pallas._seg_min_bwd_p(L, FByb, 0)
          return L

        L = yy * sx + xx
        L = jax.lax.fori_loop(0, n_sweeps, lambda i, Lv: sweep(Lv), L)
        cc_ref[0, g] = L

    return pl.pallas_call(
      kern,
      grid=(B // SB,),
      in_specs=[pl.BlockSpec((1, SB, sy, sx), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM)],
      out_specs=pl.BlockSpec((1, SB, sy, sx), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
      out_shape=jax.ShapeDtypeStruct((B // SB, SB, sy, sx), jnp.int32),
      interpret=ccl_pallas.INTERPRET,
    )(v2)
  timeit(name, fn, vcg)


run_fixed_batched("fixed 8 sweeps, 2 slices/step", 8, 2)
run_fixed_batched("fixed 8 sweeps, 4 slices/step", 8, 4)
