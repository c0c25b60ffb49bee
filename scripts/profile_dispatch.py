"""Isolate per-call dispatch/tunnel overhead vs kernel execution for
the DeviceStream window decode (the 256^2x128 steady-state metric).

Measures, each as best-of-3 over 8 back-to-back calls with ONE final
tiny fetch:
  1. fetch RTT (tiny array materialization)
  2. trivial jit op on decode-sized operands
  3. decode_slices_full_plant (the one-dispatch window decode)
  4. DeviceStream.decode_window (adds python glue)
  5. stage splits: replay-only, ccl-only (via decode_slices_to_ccl)
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
import bench
from crackle_tpu.kernels import engine, decode as _dec
from crackle_tpu.headers import CrackFormat

binary, vol = bench.get_binary()
sz = bench.SHAPE[2]
head = engine._codec.header(binary)


def fetch(x):
  return np.asarray(x)


def timeit(name, fn, iters=8, reps=3):
  out = fn()
  fetch(jnp.max(out) if hasattr(out, 'dtype') else jnp.max(out[0]))
  best = None
  for _ in range(reps):
    t0 = time.perf_counter()
    for _ in range(iters):
      out = fn()
    fetch(jnp.max(out) if hasattr(out, 'dtype') else jnp.max(out[0]))
    dt = (time.perf_counter() - t0) / iters
    best = dt if best is None else min(best, dt)
  print(f"{name}: {best * 1e3:.2f} ms/call", flush=True)
  return best


# 1. RTT
t0 = time.perf_counter()
for _ in range(5):
  fetch(jnp.zeros((1,), jnp.int32) + 1)
print(f"fetch RTT: {(time.perf_counter() - t0) / 5 * 1e3:.1f} ms",
      flush=True)

stream = engine.upload_stream(binary)
assert stream is not None

# 2. trivial op on decode-sized operand
big = jnp.zeros((128, 256 * 256), jnp.int32)
trivial = jax.jit(lambda x: x + 1)
timeit("trivial jit (128,64K)", lambda: trivial(big))

# 3. one-dispatch full window decode
permissible = stream.permissible
args = (stream.packed, stream.nbytes, stream.nodes, stream.n_chains,
        stream.T)


def full_plant():
  labels, cc, N = _dec.decode_slices_full_plant(
    *args, sx=head.sx, sy=head.sy, permissible=permissible)
  return labels


timeit("decode_slices_full_plant", full_plant)

# 4. DeviceStream.decode_window
timeit("DeviceStream.decode_window",
       lambda: stream.decode_window(0, sz)[0])

# 5. ccl-only path (replay + ccl, no paint)
def to_ccl():
  cc, N = _dec.decode_slices_to_ccl(
    stream.packed, stream.nbytes, stream.nodes, stream.n_chains,
    sx=head.sx, sy=head.sy, permissible=permissible)
  return cc


timeit("decode_slices_to_ccl", to_ccl)
