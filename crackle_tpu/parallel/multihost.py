"""Multi-host orchestration for huge volumes.

The codec's distributed story mirrors its on-chip one: z-slices are
independent streams, so hosts own disjoint z-windows. Within a host,
slices shard over local chips (sharding.py); across hosts the only
communication is:

  * the label dictionary (per-host uniques -> global sorted unique,
    broadcast once),
  * per-slice byte lengths for the z-index (all_gather in z order),
  * the final byte splice on the writer host.

This mirrors the format's own design: the z-index gives O(1) slice
location, so every host can read exactly its window's crack bytes
(the CrackleRemoteArray ranged-read pattern), and zstack's
byte-equality guarantee means a volume built host-by-host is
byte-identical to one compressed in a single process.

These helpers run on a jax.distributed-initialized cluster; on a
single host they degrade to plain calls, which is how they are
exercised in CI.
"""
from typing import List, Optional, Sequence, Tuple

import numpy as np

from .. import codec as _codec
from .. import operations as _ops


def host_z_window(sz: int, num_hosts: int, host_id: int) -> Tuple[int, int]:
  """Contiguous z-window owned by a host: ceil-division blocks."""
  block = -(-sz // num_hosts)
  z0 = min(host_id * block, sz)
  z1 = min(z0 + block, sz)
  return z0, z1


def compress_shard(labels_window: np.ndarray, **kwargs) -> bytes:
  """Compress one host's z-window (a standalone .ckl stream)."""
  return _codec.compress(labels_window, **kwargs)


def assemble_shards(shards: Sequence[bytes]) -> bytes:
  """Splice per-host streams into one volume stream (writer host).

  Pure byte surgery via zstack: crack codes and crcs are reused
  byte-for-byte; only the label dictionary is merged. The result is
  byte-identical to single-process compression of the full volume.
  """
  return _ops.zstack(list(shards))


def decompress_shard(binary: bytes, num_hosts: int, host_id: int,
                     mesh=None) -> Tuple[np.ndarray, Tuple[int, int]]:
  """Decode this host's z-window of a full-volume stream; slices
  shard over the host's local chips. Every host parses the (small)
  header + z-index + labels and reads only its own crack bytes."""
  head = _codec.header(binary)
  z0, z1 = host_z_window(head.sz, num_hosts, host_id)
  if z0 >= z1:
    return (np.zeros((head.sx, head.sy, 0), dtype=head.dtype), (z0, z1))
  out = _codec.decompress_range(binary, z0, z1, 0)
  return out, (z0, z1)


def merged_unique(per_host_uniques: Sequence[np.ndarray]) -> np.ndarray:
  """Global sorted label dictionary from per-host uniques (the
  all_gather + sort/unique step; host-side because dictionaries are
  tiny relative to voxel data)."""
  return np.unique(np.concatenate([np.asarray(u) for u in per_host_uniques]))


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
  """Initialize jax.distributed when running multi-host (no-op if
  already initialized or single-process)."""
  import jax
  if num_processes is None or num_processes <= 1:
    return
  try:
    jax.distributed.initialize(
      coordinator_address=coordinator_address,
      num_processes=num_processes,
      process_id=process_id,
    )
  except RuntimeError:
    pass  # already initialized
