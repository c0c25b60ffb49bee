"""Per-stage timing of the 512^3 decode window on the real chip.

Each stage is jitted standalone and timed over N iterations with a
tiny reduction fetched to sync (block_until_ready is a no-op over the
axon tunnel)."""
import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, '/root/repo')
import crackle_tpu as crackle  # noqa: E402
from crackle_tpu.kernels import engine, decode as dec  # noqa: E402
from crackle_tpu.kernels import replay_big as rb, ccl_pallas  # noqa: E402
from crackle_tpu.headers import CrackFormat  # noqa: E402
from crackle_tpu import codec  # noqa: E402

N = 8


def timeit(fn, *args, **kw):
  if kw:
    fn = functools.partial(fn, **kw)
  out = fn(*args)
  sync(out)
  best = None
  for _ in range(3):
    t0 = time.perf_counter()
    for _ in range(N):
      out = fn(*args)
    sync(out)
    dt = (time.perf_counter() - t0) / N
    best = dt if best is None else min(best, dt)
  return best * 1e3, out


def sync(out):
  x = out
  while isinstance(x, (tuple, list)):
    x = x[0]
  np.asarray(jnp.max(jnp.ravel(x).astype(jnp.int32)[:16]))


def main():
  path = sys.argv[1] if len(sys.argv) > 1 else \
    '/root/repo/bench_data/connectomics_v2_512x512x512.ckl'
  z1 = int(sys.argv[2]) if len(sys.argv) > 2 else None
  binary = open(path, 'rb').read()
  head = codec.header(binary)
  if z1 is None:
    z1 = head.sz
  inputs = engine.prepare_slice_inputs(binary, 0, z1)
  sx, sy = head.sx, head.sy
  perm = head.crack_format == CrackFormat.PERMISSIBLE
  packed = jnp.asarray(inputs["packed"])
  nbytes = jnp.asarray(inputs["nbytes"])
  nodes = jnp.asarray(inputs["nodes"])
  n_chains = jnp.asarray(inputs["n_chains"])
  B, CAP_B = packed.shape
  CAP = CAP_B * 4
  print(f"B={B} CAP={CAP} sx={sx} sy={sy} perm={perm}", flush=True)

  jf = functools.partial(jax.jit, static_argnames=(
    "sx", "sy", "permissible"))

  t, vcg = timeit(
    jf(rb.replay_vcg_i32_big), packed, nbytes, nodes, n_chains,
    sx=sx, sy=sy, permissible=perm)
  print(f"replay total:        {t:8.1f} ms", flush=True)

  vflat = vcg.reshape(B, sy * sx)
  t, cc = timeit(
    jax.jit(ccl_pallas.ccl_batch_traced, static_argnames=("sx", "sy")),
    vflat, sx, sy)
  print(f"ccl (no paint):      {t:8.1f} ms", flush=True)

  stream = engine.upload_stream(binary)
  t, _ = timeit(lambda: stream.decode_window(0, z1))
  print(f"full plant decode:   {t:8.1f} ms "
        f"({B * sy * sx / t / 1e3:.1f} MVx/s)", flush=True)

  # --- replay sub-stages ---
  R = CAP // 128
  Rc = rb._chunk_rows(R)
  mode = ('packed' if CAP <= 16384 else ('mid' if CAP <= 65536 else 'wide'))
  b8 = packed.astype(jnp.uint8)

  @jax.jit
  def p1(packed):
    b = packed.astype(jnp.uint8)
    diffs = jnp.stack(
      [b & 3, (b >> 2) & 3, (b >> 4) & 3, (b >> 6) & 3], axis=2
    ).reshape(B, R, 128)
    diffs = jnp.concatenate(
      [diffs, jnp.zeros((B, 1, 128), diffs.dtype)], axis=1)
    meta = jnp.stack(
      [nbytes.astype(jnp.int32), n_chains.astype(jnp.int32)],
      axis=1)[:, None, :]
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    n_keys = 1 if mode == 'packed' else 2
    kdts = {'packed': [jnp.int32], 'mid': [jnp.int32, jnp.int8],
            'wide': [jnp.int32, jnp.int32]}[mode]
    with jax.enable_x64(False):
      outs = pl.pallas_call(
        functools.partial(rb._keys_kernel_big, CAP=CAP, Rc=Rc,
                          mode=mode),
        grid=(B,),
        in_specs=[
          pl.BlockSpec((1, R + 1, 128), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, 1, 2), lambda i: (i, 0, 0),
                       memory_space=pltpu.SMEM),
        ],
        out_specs=[pl.BlockSpec((1, R, 128), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)] * (n_keys + 1),
        out_shape=[jax.ShapeDtypeStruct((B, R, 128), dt)
                   for dt in kdts]
        + [jax.ShapeDtypeStruct((B, R, 128), jnp.int32)],
        interpret=False,
      )(diffs, meta)
    return outs

  t, outs = timeit(p1, packed)
  print(f"  P1 classify:       {t:8.1f} ms", flush=True)

  if mode == 'packed':
    kd, cls = outs
    t, _ = timeit(jax.jit(lambda kd: jax.lax.sort(
      kd.reshape(B, CAP), dimension=1, is_stable=False)), kd)
  elif mode == 'mid':
    kd, kf, cls = outs
    t, _ = timeit(jax.jit(lambda kd, kf: jax.lax.sort(
      (kd.reshape(B, CAP), kf.reshape(B, CAP)), dimension=1,
      is_stable=False, num_keys=1)), kd, kf)
  else:
    kd, kp, cls = outs
    t, _ = timeit(jax.jit(lambda kd, kp: jax.lax.sort(
      (kd.reshape(B, CAP), kp.reshape(B, CAP)), dimension=1,
      is_stable=False, num_keys=2)), kd, kp)
  print(f"  sort keys:         {t:8.1f} ms", flush=True)

  t, _ = timeit(jax.jit(lambda v: jax.lax.sort(
    v.reshape(B, CAP), dimension=1, is_stable=False)), cls)
  print(f"  sort 1-op (ref):   {t:8.1f} ms", flush=True)


if __name__ == "__main__":
  main()
