"""A/B the additive-mask sweep vs the packed-flag sweep on the 512^3
corpus: steady-state full-volume decode_window, both variants in one
process is impossible (module-level gate), so run me twice:

  CRACKLE_TPU_CCL_ADD=0 python scripts/prof512_add.py
  CRACKLE_TPU_CCL_ADD=1 python scripts/prof512_add.py
"""
import os
import sys
import time

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, ".")
import bench
from crackle_tpu.kernels import engine, ccl_pallas


def _sync(x):
  np.asarray(jnp.sum(x.astype(jnp.int32) if x.dtype == jnp.uint32 else x))


path = os.path.join(bench.BENCH_DIR, "connectomics_v2_512x512x512.ckl")
binary = open(path, "rb").read()
sz = bench.SHAPE512[2]
voxels = int(np.prod(bench.SHAPE512))

print(f"ADD_SWEEP={ccl_pallas.ADD_SWEEP} SMAX={ccl_pallas.SWEEP_SMAX}",
      file=sys.stderr)
stream = engine.upload_stream(binary)
t0 = time.perf_counter()
labels, cc, N = stream.decode_window(0, sz, check_crcs=True)
_sync(labels)
print(f"compile+first decode: {time.perf_counter() - t0:.1f} s "
      f"(crc ok)", file=sys.stderr)

best = None
for _ in range(3):
  t0 = time.perf_counter()
  outs = []
  for _i in range(4):
    labels, cc, N = stream.decode_window(0, sz)
    outs.append(jnp.max(labels))
  _sync(jnp.stack(outs))
  dt = (time.perf_counter() - t0) / 4
  best = dt if best is None else min(best, dt)
mvx = voxels / best / 1e6
print(f"512^3 steady-state: {best * 1e3:.1f} ms/volume {mvx:.1f} MVx/s",
      file=sys.stderr)
