"""Scatter micro-variants on the real chip: find the cheapest way to
run the cancel scatter (CAP bins as an (R, 128) grid) and the paint
scatter. All variants compute the same result from the same synthetic
inputs; timings decide the production kernel shape.
"""
import sys
import time

sys.setrecursionlimit(100000)

import functools
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")

B = 128
R = 128
C = 128
CAP = R * C

rng = np.random.RandomState(0)
# targets: piecewise-ascending like real cancel targets
tgt = np.sort(rng.randint(0, CAP, size=(B, CAP)), axis=1).astype(np.int32)
mask = rng.rand(B, CAP) < 0.2
tgt[mask] = -1
w_h = rng.randint(-1, 2, size=(B, CAP)).astype(np.int32)
w_v = rng.randint(-1, 2, size=(B, CAP)).astype(np.int32)

tgt_j = jnp.asarray(tgt.reshape(B, R, C))
wh_j = jnp.asarray(w_h.reshape(B, R, C))
wv_j = jnp.asarray(w_v.reshape(B, R, C))


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


def pallas_run(kernel, extra_scratch=()):
  @jax.jit
  def fn(t, wh, wv):
    return pl.pallas_call(
      kernel,
      grid=(B,),
      in_specs=[
        pl.BlockSpec((1, R, C), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, R, C), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, R, C), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
      ],
      out_specs=pl.BlockSpec((1, R, 2 * C), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
      out_shape=jax.ShapeDtypeStruct((B, R, 2 * C), jnp.float32),
      scratch_shapes=list(extra_scratch),
      interpret=False,
    )(t, wh, wv)
  return fn


iota_hi = jax.lax.broadcasted_iota(jnp.int32, (R, C), 0)
iota_lo_s = jax.lax.broadcasted_iota(jnp.int32, (C, C), 0)


def kern_chunk1(t_ref, wh_ref, wv_ref, out_ref, io_scr, acc_scr):
  """baseline: one 128-entry chunk per iteration, full-R one-hot."""
  io_scr[0] = jnp.where(t_ref[0] < 0, -1, t_ref[0] >> 7)
  io_scr[1] = t_ref[0] & (C - 1)
  io_scr[2] = wh_ref[0]
  io_scr[3] = wv_ref[0]
  acc_scr[:, :] = jnp.zeros((R, 2 * C), jnp.float32)
  ih = jax.lax.broadcasted_iota(jnp.int32, (R, C), 0)
  il = jax.lax.broadcasted_iota(jnp.int32, (C, C), 0)

  def chunk(i, carry):
    hb = jax.lax.broadcast_in_dim(
      io_scr[0, pl.ds(i, 1), :], (R, C), (0, 1))
    A = jnp.where(hb == ih, 1, 0)
    whb = jax.lax.broadcast_in_dim(
      io_scr[2, pl.ds(i, 1), :], (R, C), (0, 1))
    wvb = jax.lax.broadcast_in_dim(
      io_scr[3, pl.ds(i, 1), :], (R, C), (0, 1))
    lb = jax.lax.broadcast_in_dim(
      io_scr[1, pl.ds(i, 1), :], (C, C), (0, 1))
    Blo = jnp.where(lb == il, jnp.float32(1), jnp.float32(0)) \
      .astype(jnp.bfloat16)
    ph = jax.lax.dot_general(
      (A * whb).astype(jnp.bfloat16), Blo, (((1,), (1,)), ((), ())),
      preferred_element_type=jnp.float32)
    pv = jax.lax.dot_general(
      (A * wvb).astype(jnp.bfloat16), Blo, (((1,), (1,)), ((), ())),
      preferred_element_type=jnp.float32)
    acc_scr[:, 0:C] = acc_scr[:, 0:C] + ph
    acc_scr[:, C:2 * C] = acc_scr[:, C:2 * C] + pv
    return carry

  jax.lax.fori_loop(0, R, chunk, 0)
  out_ref[0] = acc_scr[:, :]


def make_kern_group(G):
  """G chunks per iteration, one accumulate per group."""
  def kern(t_ref, wh_ref, wv_ref, out_ref, io_scr, acc_scr):
    io_scr[0] = jnp.where(t_ref[0] < 0, -1, t_ref[0] >> 7)
    io_scr[1] = t_ref[0] & (C - 1)
    io_scr[2] = wh_ref[0]
    io_scr[3] = wv_ref[0]
    acc_scr[:, :] = jnp.zeros((R, 2 * C), jnp.float32)
    ih = jax.lax.broadcasted_iota(jnp.int32, (R, C), 0)
    il = jax.lax.broadcasted_iota(jnp.int32, (C, C), 0)

    def chunk(i, carry):
      ph = jnp.zeros((R, C), jnp.float32)
      pv = jnp.zeros((R, C), jnp.float32)
      for g in range(G):
        hb = jax.lax.broadcast_in_dim(
          io_scr[0, pl.ds(i * G + g, 1), :], (R, C), (0, 1))
        A = jnp.where(hb == ih, 1, 0)
        whb = jax.lax.broadcast_in_dim(
          io_scr[2, pl.ds(i * G + g, 1), :], (R, C), (0, 1))
        wvb = jax.lax.broadcast_in_dim(
          io_scr[3, pl.ds(i * G + g, 1), :], (R, C), (0, 1))
        lb = jax.lax.broadcast_in_dim(
          io_scr[1, pl.ds(i * G + g, 1), :], (C, C), (0, 1))
        Blo = jnp.where(lb == il, jnp.float32(1), jnp.float32(0)) \
          .astype(jnp.bfloat16)
        ph = ph + jax.lax.dot_general(
          (A * whb).astype(jnp.bfloat16), Blo,
          (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        pv = pv + jax.lax.dot_general(
          (A * wvb).astype(jnp.bfloat16), Blo,
          (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
      acc_scr[:, 0:C] = acc_scr[:, 0:C] + ph
      acc_scr[:, C:2 * C] = acc_scr[:, C:2 * C] + pv
      return carry

    jax.lax.fori_loop(0, R // G, chunk, 0)
    out_ref[0] = acc_scr[:, :]
  return kern


def kern_multidim(t_ref, wh_ref, wv_ref, out_ref):
  """multi-dim contraction: one dot_general per 32-row block,
  contracting over BOTH grid dims of the block."""
  NB = 4
  RB = R // NB  # 32 rows per block
  t = t_ref[0]
  t_hi = jnp.where(t < 0, -1, t >> 7)
  t_lo = t & (C - 1)
  ih = jax.lax.broadcasted_iota(jnp.int32, (R, RB, C), 0)
  il3 = jax.lax.broadcasted_iota(jnp.int32, (RB, C, C), 2)

  acc = jnp.zeros((R, 2 * C), jnp.float32)
  parts = []
  for b in range(NB):
    hi_b = t_hi[b * RB:(b + 1) * RB]   # (RB, C)
    lo_b = t_lo[b * RB:(b + 1) * RB]
    wh_b = wh_ref[0][b * RB:(b + 1) * RB]
    wv_b = wv_ref[0][b * RB:(b + 1) * RB]
    hib = jax.lax.broadcast_in_dim(hi_b, (R, RB, C), (1, 2))
    A = jnp.where(hib == ih, 1, 0)  # (R, RB, C)
    whb = jax.lax.broadcast_in_dim(wh_b, (R, RB, C), (1, 2))
    wvb = jax.lax.broadcast_in_dim(wv_b, (R, RB, C), (1, 2))
    lob = jax.lax.broadcast_in_dim(lo_b, (RB, C, C), (0, 1))
    Bl = jnp.where(lob == il3, jnp.float32(1), jnp.float32(0)) \
      .astype(jnp.bfloat16)  # (RB, C, C_lo)
    ph = jax.lax.dot_general(
      (A * whb).astype(jnp.bfloat16), Bl,
      (((1, 2), (0, 1)), ((), ())),
      preferred_element_type=jnp.float32)  # (R, C_lo)
    pv = jax.lax.dot_general(
      (A * wvb).astype(jnp.bfloat16), Bl,
      (((1, 2), (0, 1)), ((), ())),
      preferred_element_type=jnp.float32)
    parts.append((ph, pv))
  ph = parts[0][0] + parts[1][0] + parts[2][0] + parts[3][0]
  pv = parts[0][1] + parts[1][1] + parts[2][1] + parts[3][1]
  out_ref[0] = jnp.concatenate([ph, pv], axis=1)


# reference result in XLA for correctness
def ref_result():
  out = np.zeros((B, R, 2 * C), np.float32)
  for b in range(B):
    valid = tgt[b] >= 0
    hi = tgt[b][valid] >> 7
    lo = tgt[b][valid] & (C - 1)
    np.add.at(out[b, :, 0:C], (hi, lo), w_h[b][valid])
    np.add.at(out[b, :, C:2 * C], (hi, lo), w_v[b][valid])
  return out


expected = ref_result()

fn1 = pallas_run(
  kern_chunk1,
  extra_scratch=(pltpu.VMEM((4, R, C), jnp.int32),
                 pltpu.VMEM((R, 2 * C), jnp.float32)))
out = timeit("cancel chunk=128 (baseline)", fn1, tgt_j, wh_j, wv_j)
np.testing.assert_allclose(np.asarray(out), expected)
print("baseline correct", file=sys.stderr)

for G in (2, 4):
  fng = pallas_run(
    make_kern_group(G),
    extra_scratch=(pltpu.VMEM((4, R, C), jnp.int32),
                   pltpu.VMEM((R, 2 * C), jnp.float32)))
  out = timeit(f"cancel group G={G}", fng, tgt_j, wh_j, wv_j)
  np.testing.assert_allclose(np.asarray(out), expected)
  print(f"G={G} correct", file=sys.stderr)

fnm = pallas_run(kern_multidim)
out = timeit("cancel multidim blocks", fnm, tgt_j, wh_j, wv_j)
np.testing.assert_allclose(np.asarray(out), expected)
print("multidim correct", file=sys.stderr)
