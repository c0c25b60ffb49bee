"""Host glue for the TPU decode engine: parses the container sections,
pads per-slice crack streams into fixed-shape device arrays (bucketed
to limit recompiles), launches the batched kernels, and assembles the
output volume."""
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..headers import CrackleHeader, CrackFormat, LabelFormat
from ..lib import crc32c, ctoi, compute_dtype
from ..ops import crackcode as _cc
from ..ops import labels as _labels_ops
from .. import codec as _codec
from . import decode as _dec


def _next_pow2(x: int) -> int:
  if x <= 1:
    return 1
  return 1 << (x - 1).bit_length()


def prepare_slice_inputs(binary: bytes, z_start: int, z_end: int):
  """Parse + pad the crack streams of a z window for device decode.

  Returns dict of padded arrays or None if this stream needs the
  numpy fallback (markov streams for now)."""
  head = _codec.header(binary)
  if head.markov_model_order > 0:
    return None

  codes = _codec.crack_codes(binary)[z_start:z_end]
  B = len(codes)

  packed_list = []
  nodes_list = []
  for code in codes:
    if len(code) == 0:
      packed_list.append(b'')
      nodes_list.append(np.zeros(0, np.int64))
      continue
    index_size = 4 + ctoi(code, 0, 4)
    nodes_list.append(_cc.read_boc_index(code, head.sx, head.sy))
    packed_list.append(code[index_size:])

  max_bytes = max((len(p) for p in packed_list), default=0)
  max_chains = max((len(n) for n in nodes_list), default=0)
  CAP_B = _next_pow2(max(max_bytes, 4))
  CAP_CH = _next_pow2(max(max_chains, 2))

  packed = np.zeros((B, CAP_B), np.uint8)
  nbytes = np.zeros(B, np.int32)
  nodes = np.zeros((B, CAP_CH), np.int32)
  n_chains = np.zeros(B, np.int32)
  for i, (p, nd) in enumerate(zip(packed_list, nodes_list)):
    packed[i, :len(p)] = np.frombuffer(p, np.uint8)
    nbytes[i] = len(p)
    nodes[i, :len(nd)] = nd
    n_chains[i] = len(nd)

  return {
    "head": head,
    "packed": packed,
    "nbytes": nbytes,
    "nodes": nodes,
    "n_chains": n_chains,
  }


def decode_window_ccl(binary: bytes, z_start: int, z_end: int,
                      check_crcs: bool = True):
  """Decode a z window to per-slice first-visit CCL images on device.

  Returns (cc (B, sy*sx) int32 numpy, N (B,) numpy) or None for
  fallback streams."""
  inputs = prepare_slice_inputs(binary, z_start, z_end)
  if inputs is None:
    return None
  head = inputs["head"]
  permissible = head.crack_format == CrackFormat.PERMISSIBLE
  cc, N = _dec.decode_slices_to_ccl(
    jnp.asarray(inputs["packed"]), jnp.asarray(inputs["nbytes"]),
    jnp.asarray(inputs["nodes"]), jnp.asarray(inputs["n_chains"]),
    sx=head.sx, sy=head.sy, permissible=permissible,
  )
  cc = np.asarray(cc)
  N = np.asarray(N)

  if check_crcs and head.format_version > 0:
    stored = _codec.crack_crcs(binary)
    for i, z in enumerate(range(z_start, z_end)):
      computed = crc32c(np.ascontiguousarray(cc[i].astype('<u4')))
      if computed != int(stored[z]):
        from ..headers import FormatError
        raise FormatError(
          f"crackle: crack code crc mismatch on z={z} "
          f"computed: {computed} stored: {int(stored[z])}"
        )
  return cc, N


def _flat_label_tables(head, binary):
  lb = bytes(_codec.raw_labels(binary))
  n_labels = _labels_ops.decode_num_labels(head, lb)
  uniq = _labels_ops.decode_uniq(head, lb)
  cpg = _labels_ops.components_per_grid(head, lb).astype(np.int64)
  cum = np.concatenate([[0], np.cumsum(cpg)])
  offset = (8 + n_labels * head.stored_data_width
            + head.component_width() * head.num_grids())
  keys = np.frombuffer(lb, offset=offset, dtype=compute_dtype(n_labels))
  return uniq, cum, keys


def decode_window_device(binary: bytes, z_start: int, z_end: int):
  """Fused device decode of a z window: everything stays on device.

  Returns (labels (B, sy*sx) device array, cc, N, head) — the
  TPU-native consumption path (decoded segmentation feeds downstream
  device code without a host roundtrip) — or None for fallback
  streams."""
  head = _codec.header(binary)
  if head.label_format != LabelFormat.FLAT:
    return None
  inputs = prepare_slice_inputs(binary, z_start, z_end)
  if inputs is None:
    return None
  uniq, cum, keys = _flat_label_tables(head, binary)
  if uniq.dtype.itemsize > 4:
    return None  # u64 labels: painted on host via decode_window
  permissible = head.crack_format == CrackFormat.PERMISSIBLE

  from . import ccl_pallas
  n_per_slice = cum[z_start + 1:z_end + 1] - cum[z_start:z_end]
  max_n = int(n_per_slice.max()) if len(n_per_slice) else 1
  cap_n = _next_pow2(max(max_n, 8))
  if (ccl_pallas.use_pallas(head.sx, head.sy)
      and cap_n <= ccl_pallas.PAINT_CAP_N):
    # in-kernel plant paint: build per-slice painted-value tables
    t_flat = uniq.astype(np.uint32).view(np.int32)[
      keys.astype(np.int64)
    ]
    t_pad = np.concatenate([t_flat, np.zeros(cap_n, np.int32)])
    idx = cum[z_start:z_end, None] + np.arange(cap_n)[None, :]
    T = t_pad[idx.astype(np.int64)].astype(np.int32)
    labels, cc, N = _dec.decode_slices_full_plant(
      jnp.asarray(inputs["packed"]), jnp.asarray(inputs["nbytes"]),
      jnp.asarray(inputs["nodes"]), jnp.asarray(inputs["n_chains"]),
      jnp.asarray(T[:, None, :]),
      sx=head.sx, sy=head.sy, permissible=permissible,
    )
    return labels, cc, N, head

  labels, cc, N = _dec.decode_slices_full(
    jnp.asarray(inputs["packed"]), jnp.asarray(inputs["nbytes"]),
    jnp.asarray(inputs["nodes"]), jnp.asarray(inputs["n_chains"]),
    jnp.asarray(cum[z_start:z_end].astype(np.int32)),
    jnp.asarray(keys.astype(np.int32)),
    jnp.asarray(uniq.astype(np.uint32)),
    sx=head.sx, sy=head.sy, permissible=permissible,
  )
  return labels, cc, N, head


def decode_window(binary: bytes, z_start: int, z_end: int,
                  label: Optional[int] = None,
                  check_crcs: bool = True) -> Optional[np.ndarray]:
  """Full device decode of a z window. Returns the (sx, sy, szr)
  volume or None if the stream needs the numpy fallback."""
  head = _codec.header(binary)
  if head.label_format != LabelFormat.FLAT:
    return None  # pins label painting is host-side for now

  B = z_end - z_start
  uniq, cum, keys = _flat_label_tables(head, binary)

  fused = label is None and uniq.dtype.itemsize <= 4
  if fused:
    res = decode_window_device(binary, z_start, z_end)
    if res is None:
      return None
    labels_dev, cc_dev, N_dev, _ = res
    out = np.asarray(labels_dev).astype(head.dtype, copy=False)
    cc = np.asarray(cc_dev) if check_crcs else None
  else:
    res = decode_window_ccl(binary, z_start, z_end, check_crcs=False)
    if res is None:
      return None
    cc, N = res
    key_idx = np.asarray(_dec.paint_keys(
      jnp.asarray(cc), jnp.asarray(N),
      jnp.asarray(cum[z_start:z_end].astype(np.int32)),
      jnp.asarray(keys.astype(np.int32)),
    ))
    if label is not None:
      pos = np.searchsorted(uniq, label)
      hit = pos < len(uniq) and uniq[pos] == label
      out = (key_idx == pos) if hit else np.zeros_like(key_idx, bool)
    else:
      out = uniq[key_idx].astype(head.dtype, copy=False)

  if check_crcs and head.format_version > 0 and cc is not None:
    stored = _codec.crack_crcs(binary)
    for i, z in enumerate(range(z_start, z_end)):
      computed = crc32c(np.ascontiguousarray(cc[i].astype('<u4')))
      if computed != int(stored[z]):
        from ..headers import FormatError
        raise FormatError(
          f"crackle: crack code crc mismatch on z={z} "
          f"computed: {computed} stored: {int(stored[z])}"
        )

  vol = out.reshape(B, head.sy, head.sx).transpose(2, 1, 0)
  if head.fortran_order:
    return np.asfortranarray(vol)
  return np.ascontiguousarray(vol)
