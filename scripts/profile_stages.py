"""Per-stage device timing of the decode pipeline on the real chip.

Times each piece in isolation by dispatching it N times back-to-back
and fetching one tiny reduction at the end (block_until_ready is a
no-op over the axon tunnel)."""
import sys
import time

sys.setrecursionlimit(100000)

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
import bench
from crackle_tpu.kernels import engine, decode as _dec, ccl_pallas, replay_pallas
from crackle_tpu import codec as _codec
from crackle_tpu.headers import CrackFormat

binary, vol = bench.get_binary()
sz = bench.SHAPE[2]

t0 = time.perf_counter()
inputs = engine.prepare_slice_inputs(binary, 0, sz)
host_parse = time.perf_counter() - t0
head = inputs["head"]
print(f"host parse/pad: {host_parse*1e3:.1f} ms", file=sys.stderr)

uniq, cum, keys = engine._flat_label_tables(head, binary)
t64 = uniq.astype(np.uint64)[keys.astype(np.int64)]
n_per_slice = cum[1:sz+1] - cum[0:sz]
cap_n = engine._next_pow2(max(int(n_per_slice.max()), 8))
idx = (cum[0:sz, None] + np.arange(cap_n)[None, :]).astype(np.int64)
T = np.stack([np.concatenate([
  (t64 & 0xffffffff).astype(np.uint32).view(np.int32),
  np.zeros(cap_n, np.int32)])[idx]], axis=1)

packed = jnp.asarray(inputs["packed"])
nbytes = jnp.asarray(inputs["nbytes"])
nodes = jnp.asarray(inputs["nodes"])
n_chains = jnp.asarray(inputs["n_chains"])
Tj = jnp.asarray(T)
permissible = head.crack_format == CrackFormat.PERMISSIBLE
sx, sy = head.sx, head.sy

CAP_B = packed.shape[1]
CAP = CAP_B * 4
print(f"B={packed.shape[0]} CAP={CAP} CAP_CH={nodes.shape[1]} cap_n={cap_n}",
      file=sys.stderr)


def sync(x):
  np.asarray(jnp.sum(x.astype(jnp.int32) if x.dtype == jnp.uint32 else x))


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
      leaves = jax.tree_util.tree_leaves(out)
      acc = leaves[0]
    sync(acc)
    dt = (time.perf_counter() - t0) / iters
    best = dt if best is None else min(best, dt)
  print(f"{name}: {best*1e3:.2f} ms", file=sys.stderr)
  return out




class _NoX64:
  def __enter__(self):
    self.ctx = jax.enable_x64(False)
    self.ctx.__enter__()
  def __exit__(self, *a):
    self.ctx.__exit__(*a)


def timeit32(name, fn, *args, iters=10):
  with jax.enable_x64(False):
    return timeit(name, fn, *args, iters=iters)

# full fused pipeline
timeit("full plant pipeline", lambda: _dec.decode_slices_full_plant(
  packed, nbytes, nodes, n_chains, Tj, sx=sx, sy=sy,
  permissible=permissible))

# vcg only (P1 + sort + P2)
vcg_fn = jax.jit(lambda p, nb, nd, nc: _dec.decode_slices_to_vcg.__wrapped__(
  p, nb, nd, nc, sx=sx, sy=sy, permissible=permissible))
vcg = timeit("vcg (P1+sort+P2)", vcg_fn, packed, nbytes, nodes, n_chains)

# ccl + paint from vcg
ccl_paint_fn = jax.jit(lambda v, t: ccl_pallas.ccl_paint_traced(v, t, sx, sy))
timeit("ccl+plant from vcg", ccl_paint_fn, vcg, Tj)

# P1 keys alone + sort alone
B = packed.shape[0]
R = CAP // 128
b8 = packed.astype(jnp.uint8)


@jax.jit
def p1_fn(pk, nb, nc):
  b = pk.astype(jnp.uint8)
  diffs = jnp.stack(
    [b & 3, (b >> 2) & 3, (b >> 4) & 3, (b >> 6) & 3], axis=2
  ).reshape(B, R, 128)
  import functools
  from jax.experimental import pallas as pl
  from jax.experimental.pallas import tpu as pltpu
  meta = jnp.stack([nb.astype(jnp.int32), nc.astype(jnp.int32)],
                   axis=1)[:, None, :]
  keys, cls = pl.pallas_call(
    functools.partial(replay_pallas._keys_kernel, CAP=CAP),
    grid=(B,),
    in_specs=[
      pl.BlockSpec((1, R, 128), lambda i: (i, 0, 0),
                   memory_space=pltpu.VMEM),
      pl.BlockSpec((1, 1, 2), lambda i: (i, 0, 0),
                   memory_space=pltpu.SMEM),
    ],
    out_specs=[
      pl.BlockSpec((1, R, 128), lambda i: (i, 0, 0),
                   memory_space=pltpu.VMEM),
      pl.BlockSpec((1, R, 128), lambda i: (i, 0, 0),
                   memory_space=pltpu.VMEM),
    ],
    out_shape=[
      jax.ShapeDtypeStruct((B, R, 128), jnp.int32),
      jax.ShapeDtypeStruct((B, R, 128), jnp.int32),
    ],
    interpret=False,
  )(diffs, meta)
  return keys


keys_out = timeit32("P1 keys kernel", p1_fn, packed, nbytes, n_chains)

sort_fn = jax.jit(lambda k: jnp.sort(k.reshape(B, CAP), axis=1))
skeys_out = timeit("XLA sort (keys)", sort_fn, keys_out)

# P2 / P3 in isolation
import functools
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CAP_CH = nodes.shape[1]
HI2 = 2 * (sy + 1)


@jax.jit
def p1_and_sort(pk, nb, nc):
  b = pk.astype(jnp.uint8)
  diffs = jnp.stack(
    [b & 3, (b >> 2) & 3, (b >> 4) & 3, (b >> 6) & 3], axis=2
  ).reshape(B, R, 128)
  meta = jnp.stack([nb.astype(jnp.int32), nc.astype(jnp.int32)],
                   axis=1)[:, None, :]
  keys, cls = pl.pallas_call(
    functools.partial(replay_pallas._keys_kernel, CAP=CAP),
    grid=(B,),
    in_specs=[
      pl.BlockSpec((1, R, 128), lambda i: (i, 0, 0),
                   memory_space=pltpu.VMEM),
      pl.BlockSpec((1, 1, 2), lambda i: (i, 0, 0),
                   memory_space=pltpu.SMEM),
    ],
    out_specs=[
      pl.BlockSpec((1, R, 128), lambda i: (i, 0, 0),
                   memory_space=pltpu.VMEM),
      pl.BlockSpec((1, R, 128), lambda i: (i, 0, 0),
                   memory_space=pltpu.VMEM),
    ],
    out_shape=[
      jax.ShapeDtypeStruct((B, R, 128), jnp.int32),
      jax.ShapeDtypeStruct((B, R, 128), jnp.int32),
    ],
  )(diffs, meta)
  return (jnp.sort(keys.reshape(B, CAP), axis=1).reshape(B, R, 128),
          cls, meta)


@jax.jit
def p2_only(cls, meta, nds, skeys):
  return pl.pallas_call(
    functools.partial(replay_pallas._replay_kernel, CAP=CAP,
                      CAP_CH=CAP_CH, sx=sx, sy=sy, HI2=HI2),
    grid=(B,),
    in_specs=[
      pl.BlockSpec((1, R, 128), lambda i: (i, 0, 0),
                   memory_space=pltpu.VMEM),
      pl.BlockSpec((1, 1, 2), lambda i: (i, 0, 0),
                   memory_space=pltpu.SMEM),
      pl.BlockSpec((1, 1, CAP_CH), lambda i: (i, 0, 0),
                   memory_space=pltpu.SMEM),
      pl.BlockSpec((1, R, 128), lambda i: (i, 0, 0),
                   memory_space=pltpu.VMEM),
    ],
    out_specs=pl.BlockSpec((1, R, 128), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((B, R, 128), jnp.int32),
    scratch_shapes=[
      pltpu.VMEM((R, 2 * 128), jnp.float32),
      pltpu.VMEM((4, R, 128), jnp.int32),
    ],
  )(cls, meta, nds, skeys)


LO = replay_pallas.PAINT_LO
W = replay_pallas.PAINT_W


@jax.jit
def sort_and_lims(vhidx):
  logw = int(np.log2(W))
  vflat = vhidx.reshape(B, CAP)
  svh = jnp.where(vflat < 0, HI2 * LO, vflat)
  svh = jnp.sort(svh, axis=1).reshape(B, R, 128)
  bq = jnp.minimum(svh[:, :, 0] >> int(np.log2(LO)), HI2) >> logw
  lq = jnp.minimum(svh[:, :, 127] >> int(np.log2(LO)), HI2) >> logw
  return svh, jnp.stack([bq, lq - bq + 1], axis=1).astype(jnp.int32)


@jax.jit
def p3_only(svh, lims_p):
  return pl.pallas_call(
    functools.partial(replay_pallas._paint_vcg_kernel, R=R, sx=sx,
                      sy=sy, HI2=HI2, permissible=permissible),
    grid=(B,),
    in_specs=[
      pl.BlockSpec((1, R, 128), lambda i: (i, 0, 0),
                   memory_space=pltpu.VMEM),
      pl.BlockSpec((1, 2, R), lambda i: (i, 0, 0),
                   memory_space=pltpu.SMEM),
    ],
    out_specs=pl.BlockSpec((1, sy, sx), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((B, sy, sx), jnp.int32),
    scratch_shapes=[
      pltpu.VMEM((HI2 + W, LO), jnp.float32),
    ],
  )(svh, lims_p)


with jax.enable_x64(False):
  skeys_j, cls_j, meta_j = p1_and_sort(packed, nbytes, n_chains)
  nodes_j = nodes.astype(jnp.int32)[:, None, :]
  vhidx_j = timeit("P2 kernel", p2_only, cls_j, meta_j, nodes_j,
                   skeys_j)
  svh_j, limp_j = timeit("sort edges + lims", sort_and_lims, vhidx_j)
  timeit("P3 kernel", p3_only, svh_j, limp_j)
