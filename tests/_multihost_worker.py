"""Worker for the 2-process multi-host test (run via subprocess).

Each process owns a z-window: it compresses its shard, a real
cross-process barrier/allgather moves the bytes, the writer host
splices them (byte-identical to single-process compression), and
every host decodes only its own window of the assembled stream.
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import numpy as np  # noqa: E402
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main():
  pid = int(sys.argv[1])
  nproc = int(sys.argv[2])
  port = sys.argv[3]
  tmp = sys.argv[4]

  jax.distributed.initialize(
    coordinator_address=f"localhost:{port}",
    num_processes=nproc, process_id=pid)
  from jax.experimental import multihost_utils

  sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
  import crackle_tpu as crackle
  from crackle_tpu.parallel import multihost

  assert jax.process_count() == nproc
  assert len(jax.devices()) == 2 * nproc  # global device view

  rng = np.random.RandomState(0)
  vol = rng.randint(0, 6, size=(24, 20, 12)).astype(np.uint32)
  for _ in range(6):
    axis = rng.randint(0, 3)
    m = rng.rand(*vol.shape) < 0.6
    vol = np.where(m, np.roll(vol, 1, axis=axis), vol)
  vol = np.asfortranarray(vol)
  sz = vol.shape[2]

  z0, z1 = multihost.host_z_window(sz, nproc, pid)
  shard = multihost.compress_shard(
    np.asfortranarray(vol[:, :, z0:z1]))

  # the full SURVEY 2.5 story: each process encodes its z-window with
  # the sharded encode over its LOCAL devices (per-voxel stages under
  # shard_map), then the shards splice into the global stream —
  # byte-identical at every level
  from crackle_tpu.parallel import sharding
  local_mesh = sharding.make_mesh(jax.local_devices())
  shard_sharded = sharding.compress_sharded(
    np.asfortranarray(vol[:, :, z0:z1]), local_mesh)
  assert shard_sharded is not None, "sharded encode declined"
  assert shard_sharded == shard, \
      "sharded-encode shard bytes != host-encode shard bytes"

  with open(os.path.join(tmp, f"shard_{pid}.ckl"), "wb") as f:
    f.write(shard)
  multihost_utils.sync_global_devices("shards_written")

  if pid == 0:
    shards = [
      open(os.path.join(tmp, f"shard_{i}.ckl"), "rb").read()
      for i in range(nproc)
    ]
    full = multihost.assemble_shards(shards)
    ref = crackle.compress(vol)
    assert full == ref, "assembled stream != single-process bytes"
    with open(os.path.join(tmp, "full.ckl"), "wb") as f:
      f.write(full)
  multihost_utils.sync_global_devices("assembled")

  full = open(os.path.join(tmp, "full.ckl"), "rb").read()
  out, (a, b) = multihost.decompress_shard(full, nproc, pid)
  np.testing.assert_array_equal(out, vol[:, :, a:b])

  # a real cross-process collective: allgather per-host label
  # histograms and check the global reduction
  local = np.bincount(
    vol[:, :, z0:z1].ravel(), minlength=8).astype(np.int64)
  gathered = multihost_utils.process_allgather(local)
  assert gathered.shape[0] == nproc
  got = np.asarray(gathered).sum(axis=0)
  want = np.bincount(vol.ravel(), minlength=8).astype(np.int64)
  np.testing.assert_array_equal(got, want)

  # per-host unique -> merged dictionary equals the stream's
  uniqs = multihost_utils.process_allgather(
    np.pad(np.unique(vol[:, :, z0:z1]), (0, 8))[:8])
  merged = multihost.merged_unique(list(uniqs))
  assert set(np.unique(vol).tolist()) <= set(merged.tolist())

  print(f"worker {pid} OK", flush=True)


if __name__ == "__main__":
  main()
