"""Decode-lite analytics: compute label statistics from the crack
codes + label maps without materializing the full volume (reference
parity: src/operations.hpp, crackle/codec.py wrappers).

Each op shares the per-slice pipeline (crack code -> VCG -> CCL ->
label map) and then reduces with vectorized segmented ops instead of
the reference's per-voxel loops."""
import builtins
import os
from typing import Dict, Iterator, List, Optional, Tuple, Union

import numpy as np

from .. import codec
from ..headers import CrackleHeader, CrackFormat, LabelFormat, FormatError
from ..lib import width2dtype, compute_byte_width
from . import labels as _labels_ops
from .ccl import color_connectivity_graph_slice

_min = builtins.min
_max = builtins.max


def _clamp_z_range(head, z_start, z_end):
  z_start = _max(_min(int(z_start), head.sz - 1), 0)
  z_end = head.sz if z_end < 0 else int(z_end)
  z_end = _max(_min(z_end, head.sz), 0)
  if z_start >= z_end:
    raise ValueError(f"crackle: Invalid range: {z_start} - {z_end}")
  return z_start, z_end


def for_each_z(binary: bytes, z_start: int = -1, z_end: int = -1):
  """Yield (vcg, ccl, N, label_map, z) per slice in the window
  (for_each_z_parallel parity; slices stream sequentially on host,
  in parallel on device)."""
  head = codec.header(binary)
  z_start, z_end = _clamp_z_range(head, z_start, z_end)
  if head.sx * head.sy == 0:
    return

  model = codec.decode_markov_model(head, binary)
  codes = codec.crack_codes(binary)
  lb = bytes(codec.raw_labels(binary))

  for z in range(z_start, z_end):
    vcg = codec.slice_crack_code_to_vcg(codes[z], head, model)
    ccl, N = color_connectivity_graph_slice(vcg, head.sx, head.sy)
    if head.label_format == LabelFormat.FLAT:
      label_map = _labels_ops.decode_flat(head, lb, z, z + 1, head.dtype)
    else:
      label_map = _labels_ops.decode_condensed_pins_label_map(
        head, lb, ccl, N, z, z + 1, head.dtype
      )
    yield vcg, ccl, N, label_map, z


# ---------------------------------------------------------------------------
# batched device statistics (TPU fast path)
# ---------------------------------------------------------------------------

_DEVICE_WINDOW = 256  # z slices per device stats batch


def _use_device_stats() -> bool:
  from ..kernels import ccl_pallas
  if ccl_pallas._NO_PALLAS:
    return False
  if ccl_pallas.INTERPRET:
    return True
  import jax
  return jax.default_backend() == "tpu"


def _device_label_stats(binary: bytes):
  """Whole-volume per-(slice, component) stats on device.

  Yields (stats (B, cap_n, 8) f32 numpy, key_idx (B, cap_n) int64,
  n_per (B,) int64, z0) per z window, plus the uniq table first:
  the first yield is (uniq,). Returns None-equivalent by yielding
  nothing when the stream is not eligible."""
  from ..kernels import engine as _engine, stats_pallas, ccl_pallas
  head = codec.header(binary)
  if head.label_format != LabelFormat.FLAT:
    return
  if not ccl_pallas.use_pallas(head.sx, head.sy):
    return
  uniq, cum, keys = _engine._flat_label_tables(head, binary)
  n_per = cum[1:] - cum[:-1]
  cap_n = _engine._next_pow2(
    max(int(n_per.max()) if head.sz else 1, 8))
  if not stats_pallas.eligible(head.sx, head.sy, cap_n):
    return
  yield (uniq,)
  for z0 in range(0, head.sz, _DEVICE_WINDOW):
    z1 = _min(z0 + _DEVICE_WINDOW, head.sz)
    res = _engine.decode_window_ccl_device(binary, z0, z1)
    if res is None:
      return
    cc_dev, _N, _ = res
    stats = np.asarray(stats_pallas.slice_stats(
      cc_dev, head.sx, head.sy, cap_n))
    B = z1 - z0
    key_idx = np.zeros((B, cap_n), np.int64)
    for i, z in enumerate(range(z0, z1)):
      n = int(n_per[z])
      key_idx[i, :n] = keys[cum[z]:cum[z] + n]
    yield stats, key_idx, n_per[z0:z1], z0


def _device_stats_run(binary: bytes):
  """Collect the device stats generator; None if ineligible."""
  gen = _device_label_stats(binary)
  first = next(gen, None)
  if first is None:
    return None
  return first[0], gen


def voxel_counts(binary: bytes, label: Optional[int] = None,
                 parallel: int = 0) -> Union[Dict[int, int], int]:
  """Voxels per label (operations.hpp:321-419 parity)."""
  if label is None:
    z_start, z_end = 0, -1
  elif not codec.contains(binary, label):
    raise ValueError(f"Label {label} not contained in image.")
  else:
    z_start, z_end = codec.z_range_for_label(binary, label)

  head = codec.header(binary)
  if codec.num_labels(binary) == 1:
    single = int(codec.labels(binary)[0])
    vcts = {single: head.voxels()}
  else:
    vcts = None
    if label is None and _use_device_stats():
      dev = _device_stats_run(binary)
      if dev is not None:
        from ..kernels.stats_pallas import CH_COUNT
        uniq, gen = dev
        agg = np.zeros(len(uniq), np.int64)
        for stats, key_idx, n_per, z0 in gen:
          counts = stats[:, :, CH_COUNT].astype(np.int64)
          mask = (np.arange(counts.shape[1])[None, :]
                  < np.asarray(n_per)[:, None])
          np.add.at(agg, key_idx[mask], counts[mask])
        vcts = dict(zip(
          (int(u) for u in uniq.tolist()),
          (int(c) for c in agg.tolist())))
    if vcts is None:
      vcts: Dict[int, int] = {}
      for vcg, ccl, N, label_map, z in for_each_z(binary, z_start,
                                                  z_end):
        sub = np.bincount(ccl, minlength=N)
        for lbl, ct in zip(label_map.tolist(), sub.tolist()):
          vcts[lbl] = vcts.get(lbl, 0) + ct
  if label is not None:
    return vcts[label]
  return vcts


def centroids(binary: bytes, label: Optional[int] = None,
              parallel: int = 0):
  """Centroid (x, y, z) per label (operations.hpp:421-539 parity)."""
  if label is None:
    z_start, z_end = 0, -1
  elif not codec.contains(binary, label):
    raise ValueError(f"Label {label} not contained in image.")
  else:
    z_start, z_end = codec.z_range_for_label(binary, label)

  head = codec.header(binary)
  sx = head.sx

  if label is None and _use_device_stats():
    dev = _device_stats_run(binary)
    if dev is not None:
      from ..kernels.stats_pallas import CH_COUNT, CH_XSUM, CH_YSUM
      uniq, gen = dev
      agg = np.zeros((len(uniq), 4), np.float64)
      for stats, key_idx, n_per, z0 in gen:
        B, cap_n, _ = stats.shape
        mask = (np.arange(cap_n)[None, :]
                < np.asarray(n_per)[:, None])
        cnt = stats[:, :, CH_COUNT].astype(np.float64)
        zs = np.broadcast_to(
          (z0 + np.arange(B, dtype=np.float64))[:, None], cnt.shape)
        ki = key_idx[mask]
        np.add.at(agg[:, 0], ki, stats[:, :, CH_XSUM].astype(
          np.float64)[mask])
        np.add.at(agg[:, 1], ki, stats[:, :, CH_YSUM].astype(
          np.float64)[mask])
        np.add.at(agg[:, 2], ki, (zs * cnt)[mask])
        np.add.at(agg[:, 3], ki, cnt[mask])
      return {
        int(lbl): (a[0] / a[3], a[1] / a[3], a[2] / a[3])
        for lbl, a in zip(uniq.tolist(), agg)
      }

  acc: Dict[int, np.ndarray] = {}
  for vcg, ccl, N, label_map, z in for_each_z(binary, z_start, z_end):
    idx = np.arange(len(ccl))
    xs = idx % sx
    ys = idx // sx
    sub_x = np.bincount(ccl, weights=xs, minlength=N)
    sub_y = np.bincount(ccl, weights=ys, minlength=N)
    sub_n = np.bincount(ccl, minlength=N)
    for i, lbl in enumerate(label_map.tolist()):
      a = acc.setdefault(lbl, np.zeros(4))
      a[0] += sub_x[i]
      a[1] += sub_y[i]
      a[2] += z * sub_n[i]
      a[3] += sub_n[i]

  out = {
    lbl: (a[0] / a[3], a[1] / a[3], a[2] / a[3]) for lbl, a in acc.items()
  }
  if label is not None:
    return out[label]
  return out


def bounding_boxes(binary: bytes, label: Optional[int] = None,
                   parallel: int = 0, no_slice_conversion: bool = False):
  """Axis-aligned bounding boxes per label
  (operations.hpp:541-665 parity). Returns
  [xmin,ymin,zmin,xmax,ymax,zmax] arrays or slice triples."""
  if label is None:
    z_start, z_end = 0, -1
  elif not codec.contains(binary, label):
    raise ValueError(f"Label {label} not contained in image.")
  else:
    z_start, z_end = codec.z_range_for_label(binary, label)

  head = codec.header(binary)
  sx = head.sx

  if codec.num_labels(binary) == 1:
    single = int(codec.labels(binary)[0])
    bboxes = {
      single: np.array([0, 0, 0, head.sx - 1, head.sy - 1, head.sz - 1],
                       dtype=np.uint32),
    }
  else:
    bboxes = None
    if label is None and _use_device_stats():
      dev = _device_stats_run(binary)
      if dev is not None:
        from ..kernels.stats_pallas import (
          CH_XMIN, CH_XMAX, CH_YMIN, CH_YMAX)
        uniq, gen = dev
        INT = np.int64(np.iinfo(np.int64).max)
        mins = np.full((len(uniq), 3), INT)
        maxs = np.full((len(uniq), 3), -1, np.int64)
        for stats, key_idx, n_per, z0 in gen:
          B, cap_n, _ = stats.shape
          mask = (np.arange(cap_n)[None, :]
                  < np.asarray(n_per)[:, None])
          zs = np.broadcast_to(
            (z0 + np.arange(B))[:, None], mask.shape)
          ki = key_idx[mask]
          # pads carry +3e38 sentinels; clip before the int cast
          xmn = np.minimum(stats[:, :, CH_XMIN], 2.0**31)
          ymn = np.minimum(stats[:, :, CH_YMIN], 2.0**31)
          np.minimum.at(mins[:, 0], ki, xmn.astype(np.int64)[mask])
          np.minimum.at(mins[:, 1], ki, ymn.astype(np.int64)[mask])
          np.minimum.at(mins[:, 2], ki, zs[mask])
          np.maximum.at(maxs[:, 0], ki,
                        stats[:, :, CH_XMAX].astype(np.int64)[mask])
          np.maximum.at(maxs[:, 1], ki,
                        stats[:, :, CH_YMAX].astype(np.int64)[mask])
          np.maximum.at(maxs[:, 2], ki, zs[mask])
        bboxes = {
          int(lbl): np.array(
            [mins[i, 0], mins[i, 1], mins[i, 2],
             maxs[i, 0], maxs[i, 1], maxs[i, 2]], dtype=np.uint32)
          for i, lbl in enumerate(uniq.tolist())
        }
    if bboxes is None:
      bboxes = {}
      for vcg, ccl, N, label_map, z in for_each_z(binary, z_start,
                                                  z_end):
        idx = np.arange(len(ccl))
        xs = idx % sx
        ys = idx // sx
        INT = np.iinfo(np.int64).max
        xmin = np.full(N, INT)
        ymin = np.full(N, INT)
        xmax = np.zeros(N, dtype=np.int64)
        ymax = np.zeros(N, dtype=np.int64)
        np.minimum.at(xmin, ccl, xs)
        np.minimum.at(ymin, ccl, ys)
        np.maximum.at(xmax, ccl, xs)
        np.maximum.at(ymax, ccl, ys)
        for i, lbl in enumerate(label_map.tolist()):
          if lbl in bboxes:
            b = bboxes[lbl]
            b[0] = _min(b[0], xmin[i])
            b[1] = _min(b[1], ymin[i])
            b[2] = _min(b[2], z)
            b[3] = _max(b[3], xmax[i])
            b[4] = _max(b[4], ymax[i])
            b[5] = _max(b[5], z)
          else:
            bboxes[lbl] = np.array(
              [xmin[i], ymin[i], z, xmax[i], ymax[i], z],
              dtype=np.int64
            )
      bboxes = {k: v.astype(np.uint32) for k, v in bboxes.items()}

  if no_slice_conversion:
    if label is not None:
      return bboxes[label]
    return bboxes

  out = {
    lbl: (
      slice(int(b[0]), int(b[3]) + 1),
      slice(int(b[1]), int(b[4]) + 1),
      slice(int(b[2]), int(b[5]) + 1),
    )
    for lbl, b in bboxes.items()
  }
  if label is not None:
    return out[label]
  return out


def point_cloud(binary: bytes, label=None, parallel: int = 0,
                z_start: int = -1, z_end: int = -1,
                skip_background: bool = True):
  """Surface point clouds per label without full decompression
  (operations.hpp:185-319). A surface point is a voxel of the label
  adjacent to an impassable crack edge or the image border.

  Note: unlike the reference's Moore-neighbor contour walk, points are
  emitted uniquely (the reference may duplicate walk start points)."""
  scalar_input = False
  if isinstance(label, (int, np.integer)):
    scalar_input = True
    label = [int(label)]

  head = codec.header(binary)
  opt_z_start = z_start == -1
  opt_z_end = z_end == -1

  if isinstance(label, (list, tuple)):
    if z_start == -1:
      z_start = head.sz
    if z_end == -1:
      z_end = -1
    for lbl in label:
      if not codec.contains(binary, lbl):
        raise ValueError(f"Label {lbl} not contained in image.")
      elif opt_z_start or opt_z_end:
        zs, ze = codec.z_range_for_label(binary, lbl)
        if opt_z_start:
          z_start = _min(z_start, zs)
        if opt_z_end:
          z_end = _max(z_end, ze)
        if z_start == 0 and z_end == head.sz:
          break

  if z_start == -1:
    z_start = 0
  if z_end == -1:
    z_end = head.sz

  selective = label is not None
  label_set = set(label) if selective else None

  sx, sy = head.sx, head.sy
  all_pts: List[np.ndarray] = []
  all_lbls: List[np.ndarray] = []

  for vcg, ccl, N, label_map, z in for_each_z(binary, z_start, z_end):
    v = vcg.reshape(sy, sx)
    boundary = (v & 0b1111) != 0b1111
    boundary[0, :] = True
    boundary[-1, :] = True
    boundary[:, 0] = True
    boundary[:, -1] = True
    bidx = np.flatnonzero(boundary.ravel())
    if len(bidx) == 0:
      continue
    lbls = np.asarray(label_map)[ccl[bidx]]
    if skip_background or selective:
      if selective:
        keep = np.isin(lbls, np.asarray(sorted(label_set),
                                        dtype=lbls.dtype))
        if skip_background:
          # the background skip applies even with an explicit label
          # list (operations.hpp:236 applies it unconditionally)
          keep &= lbls != 0
      else:
        keep = lbls != 0
      bidx, lbls = bidx[keep], lbls[keep]
      if len(bidx) == 0:
        continue
    pts = np.empty((len(bidx), 3), np.uint16)
    pts[:, 0] = bidx % sx
    pts[:, 1] = bidx // sx
    pts[:, 2] = z
    all_pts.append(pts)
    all_lbls.append(lbls)

  ptc: Dict[int, np.ndarray] = {}
  if all_pts:
    # one global sort-based group-by instead of a per-label mask per
    # slice (points within a label stay in slice/raster order because
    # the sort is stable)
    pts = np.concatenate(all_pts)
    lbls = np.concatenate(all_lbls)
    order = np.argsort(lbls, kind='stable')
    pts, lbls = pts[order], lbls[order]
    uniq, starts = np.unique(lbls, return_index=True)
    bounds = np.append(starts, len(lbls))
    ptc = {
      int(u): np.ascontiguousarray(pts[bounds[i]:bounds[i + 1]])
      for i, u in enumerate(uniq)
    }
  if len(ptc) == 0:
    if label:
      return np.zeros([0, 3], dtype=np.uint16, order="C")
    return {}
  if scalar_input:
    return ptc[label[0]]
  return ptc


def voxel_connectivity_graph(binary: bytes, connectivity: int = 6,
                             parallel: int = 0) -> np.ndarray:
  """4- or 6-connected VCG as uint8 (bits 00zz-y+y-x+x, LSB right)
  reshaped to (sx, sy, sz) F-order (operations.hpp:667-841 parity)."""
  if connectivity not in (4, 6):
    raise ValueError(
      f"Only 4 and 6 connected are supported. Got: {connectivity}"
    )
  head = codec.header(binary)
  sx, sy, sz = head.sx, head.sy, head.sz
  sxy = sx * sy

  model = codec.decode_markov_model(head, binary)
  codes = codec.crack_codes(binary)
  lb = bytes(codec.raw_labels(binary))

  vcg = np.zeros((sz, sxy), dtype=np.uint8)
  for z in range(sz):
    vcg[z] = codec.slice_crack_code_to_vcg(codes[z], head, model)

  if sz == 1 or connectivity == 4:
    return vcg.reshape(sz, sy, sx).transpose(2, 1, 0).copy(order='F')

  prev_labels = None
  for z in range(sz):
    ccl, N = color_connectivity_graph_slice(vcg[z], sx, sy)
    if head.label_format == LabelFormat.FLAT:
      label_map = _labels_ops.decode_flat(head, lb, z, z + 1, np.uint64)
    else:
      label_map = _labels_ops.decode_condensed_pins_label_map(
        head, lb, ccl, N, z, z + 1, np.uint64
      )
    cur_labels = label_map[ccl]
    if prev_labels is not None:
      same = cur_labels == prev_labels
      vcg[z - 1][same] |= 0b010000
      vcg[z][same] |= 0b100000
    prev_labels = cur_labels

  # z boundaries passable for compatibility
  vcg[0] |= 0b100000
  vcg[sz - 1] |= 0b010000

  return vcg.reshape(sz, sy, sx).transpose(2, 1, 0).copy(order='F')


def contacts(binary: bytes,
             anisotropy: Tuple[float, float, float] = (1.0, 1.0, 1.0)
             ) -> Dict[Tuple[int, int], float]:
  """6-connected contact surface areas between labels, background (0)
  excluded (operations.hpp:849-1037 parity)."""
  wx, wy, wz = anisotropy
  area_x = wy * wz
  area_y = wx * wz
  area_z = wx * wy

  head = codec.header(binary)
  sx, sy = head.sx, head.sy

  acc_pairs: List[np.ndarray] = []
  acc_areas: List[np.ndarray] = []

  def add_edges(a: np.ndarray, b: np.ndarray, area: float):
    m = (a != b) & (a != 0) & (b != 0)
    if not m.any():
      return
    lo = np.minimum(a[m], b[m])
    hi = np.maximum(a[m], b[m])
    # pre-reduce within the slice, accumulate (pair, area) rows; one
    # global reduction at the end replaces a python dict update per pair
    if lo.size and int(lo.max()) < (1 << 32) and int(hi.max()) < (1 << 32):
      pairs, counts = np.unique((lo << 32) | hi, return_counts=True)
      acc_pairs.append(np.stack([pairs >> 32, pairs & 0xffffffff], 1))
      acc_areas.append(counts * area)
    else:
      pairs, counts = np.unique(
        np.stack([lo, hi], axis=1), axis=0, return_counts=True)
      acc_pairs.append(pairs)
      acc_areas.append(counts * area)

  prev = None
  for vcg, ccl, N, label_map, z in for_each_z(binary, 0, -1):
    cur = label_map[ccl].astype(np.uint64).reshape(sy, sx)
    add_edges(cur[:, :-1].ravel(), cur[:, 1:].ravel(), area_x)
    add_edges(cur[:-1, :].ravel(), cur[1:, :].ravel(), area_y)
    if prev is not None:
      add_edges(prev.ravel(), cur.ravel(), area_z)
    prev = cur

  if not acc_pairs:
    return {}
  keys = np.concatenate(acc_pairs)
  areas = np.concatenate(acc_areas)
  uniq, inv = np.unique(keys, axis=0, return_inverse=True)
  sums = np.bincount(inv.ravel(), weights=areas, minlength=len(uniq))
  return {
    (int(a), int(b)): float(s)
    for (a, b), s in zip(uniq.tolist(), sums.tolist())
  }


# ---------------------------------------------------------------------------
# Iteration
# ---------------------------------------------------------------------------

def each(binary: bytes, parallel: int = 0, crop: bool = True,
         labels: Optional[Iterator[int]] = None, multi: bool = False):
  """Iterate (label, binary_image) over each label; multi mode colors
  up to 255 labels per decode cycle (codec.py:1067-1149 parity)."""
  from ..operations import mask_except, renumber

  all_labels = codec.labels(binary)
  if labels is None:
    labels = all_labels.tolist()
  else:
    labels = list(set(all_labels.tolist()).intersection(set(labels)))

  if crop and not multi:
    bbxes = bounding_boxes(binary, no_slice_conversion=True)
    head = codec.header(binary)

  class BinaryImageIterator:
    def __len__(self):
      return len(labels)

    def __iter__(self):
      for label in labels:
        binimg = codec.decompress(
          binary, label=label, parallel=parallel, crop=crop
        )
        if crop:
          slc = bbxes[label]
          s = (slice(int(slc[0]), int(slc[3]) + 1),
               slice(int(slc[1]), int(slc[4]) + 1), slice(None))
          if head.fortran_order:
            binimg = np.asfortranarray(binimg[s])
          else:
            binimg = np.ascontiguousarray(binimg[s])
        yield (label, binimg)

  class MultiImageIterator:
    def __len__(self):
      return len(labels)

    def __iter__(self):
      cycles = int(np.ceil(len(labels) / 255.0))
      for ci in range(cycles):
        subset = labels[ci * 255:(ci + 1) * 255]
        sub_binary = mask_except(binary, subset, parallel=parallel)
        sub_binary, mapping = renumber(sub_binary, parallel=parallel)
        image = codec.decompress(sub_binary, parallel=parallel)
        for label in subset:
          yield (label, mapping[label], image)

  return MultiImageIterator() if multi else BinaryImageIterator()


# ---------------------------------------------------------------------------
# Downsampling / 3D CCL / metadata cache
# ---------------------------------------------------------------------------

def _mode_2x2(a: np.ndarray) -> np.ndarray:
  """Mode of 2x2 blocks of a (sy, sx) array; odd edges replicate."""
  sy, sx = a.shape
  ey, ex = (sy + 1) // 2 * 2, (sx + 1) // 2 * 2
  p = np.empty((ey, ex), dtype=a.dtype)
  p[:sy, :sx] = a
  if ex > sx:
    p[:sy, sx:] = a[:, -1:]
  if ey > sy:
    p[sy:, :] = p[sy - 1:sy, :]
  q = p.reshape(ey // 2, 2, ex // 2, 2).transpose(0, 2, 1, 3) \
       .reshape(-1, 4)
  va, vb, vc, vd = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
  out = np.where(
    (va == vb) | (va == vc) | (va == vd), va,
    np.where((vb == vc) | (vb == vd), vb,
             np.where(vc == vd, vc, va))
  )
  return out.reshape(ey // 2, ex // 2)


def mode_pooling_2x2x1(binary: bytes, parallel: int = 0) -> List[bytes]:
  """Downsample each slice 2x2 by mode pooling and recompress;
  returns per-slice binaries for zstack
  (operations.hpp:1201-1352 parity).

  Decodes in bounded z-windows (peak host memory stays O(window),
  not O(volume)), then per-slice pooled recompression on a thread
  pool — the encoder's hot path is native code that releases the GIL,
  matching the reference's for_each_z_parallel template
  (operations.hpp:89-182)."""
  import concurrent.futures as _fut
  head = codec.header(binary)
  n_workers = parallel if parallel > 0 else (os.cpu_count() or 1)
  n_workers = _min(_max(n_workers, 1), _max(head.sz, 1))

  # window sized to ~64 MB of decoded voxels (min one slice)
  slice_bytes = max(head.sx * head.sy * head.data_width, 1)
  window = _min(_max(int(64e6) // slice_bytes, 1), max(head.sz, 1))

  out: List[bytes] = []
  for z0 in range(0, head.sz, window):
    z1 = _min(z0 + window, head.sz)
    vol = codec.decompress_range(binary, z0, z1, parallel=parallel)

    def pool_one(z: int) -> bytes:
      a = np.asfortranarray(vol[:, :, z - z0])
      pooled = _mode_2x2(a.T).T  # operate in (sy, sx) then back
      return codec.compress(np.asfortranarray(pooled[:, :, np.newaxis]))

    if n_workers == 1 or z1 - z0 <= 1:
      out.extend(pool_one(z) for z in range(z0, z1))
    else:
      with _fut.ThreadPoolExecutor(n_workers) as ex:
        out.extend(ex.map(pool_one, range(z0, z1)))
  return out


def connected_components_3d(binary: bytes, connectivity: int = 26,
                            binary_image: bool = False,
                            memory_target: int = int(100e6),
                            progress: bool = False,
                            return_mapping: bool = False):
  """3D connected components of the stream as a new stream
  (operations.py:859-934 parity, using an internal multilabel 3D CCL
  instead of the external cc3d package)."""
  from scipy import sparse
  from scipy.sparse import csgraph

  if connectivity not in (6, 26):
    raise ValueError(f"connectivity must be 6 or 26, got {connectivity}")

  arr = codec.decompress(binary)
  sx, sy, sz = arr.shape
  a = arr
  if binary_image:
    a = (arr != 0).astype(np.uint8)

  n = a.size
  flat = np.asfortranarray(a).ravel(order='F')
  idx = np.arange(n, dtype=np.int64).reshape(a.shape, order='F')

  offsets = []
  if connectivity == 6:
    offsets = [(1, 0, 0), (0, 1, 0), (0, 0, 1)]
  else:
    for dz in (0, 1):
      for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
          if (dx, dy, dz) <= (0, 0, 0):
            continue
          offsets.append((dx, dy, dz))

  ei_list, ej_list = [], []
  for dx, dy, dz in offsets:
    src = idx[_max(0, -dx):sx - _max(0, dx),
              _max(0, -dy):sy - _max(0, dy),
              _max(0, -dz):sz - _max(0, dz)].ravel()
    dst = idx[_max(0, dx):sx - _max(0, -dx),
              _max(0, dy):sy - _max(0, -dy),
              _max(0, dz):sz - _max(0, -dz)].ravel()
    same = flat[src] == flat[dst]
    if binary_image:
      same &= flat[src] != 0
    ei_list.append(src[same])
    ej_list.append(dst[same])

  ei = np.concatenate(ei_list)
  ej = np.concatenate(ej_list)
  g = sparse.coo_matrix(
    (np.ones(len(ei), dtype=bool), (ei, ej)), shape=(n, n)
  )
  ncomp, comp = csgraph.connected_components(g, directed=False)

  # background stays 0; foreground components numbered 1..N by first
  # occurrence (cc3d convention keeps 0 only in binary_image mode)
  from .ccl import first_visit_renumber
  comp, _ = first_visit_renumber(comp, n, dtype=np.uint64)
  if binary_image:
    bgmask = flat == 0
    out = comp + 1
    out[bgmask] = 0
    # renumber foreground densely
    uniq = np.unique(out[~bgmask]) if (~bgmask).any() else np.zeros(0)
    remap_arr = np.searchsorted(uniq, out[~bgmask]) + 1
    final = np.zeros(n, dtype=np.uint64)
    final[~bgmask] = remap_arr
    comp = final
  else:
    comp = comp + 1

  ccl_vol = comp.reshape((sx, sy, sz), order='F')
  from ..lib import fit_dtype
  dt = fit_dtype(np.uint64, int(ccl_vol.max()) if n else 0)
  ccl_binary = codec.compress(np.asfortranarray(ccl_vol.astype(dt)))
  ccl_binary = codec.condense_unique(ccl_binary)

  if not return_mapping:
    return ccl_binary

  mapping = {}
  cflat = comp
  uniq_c, first_idx = np.unique(cflat, return_index=True)
  for c, fi in zip(uniq_c.tolist(), first_idx.tolist()):
    mapping[int(c)] = int(flat[fi]) if not binary_image else int(arr.ravel(order='F')[fi])
  return (ccl_binary, mapping)


def cache_meta(binary: bytes, path: str, parallel: int = 0):
  """Voxel counts + bounding boxes saved as a parquet sidecar
  (codec.py:1151-1216 parity)."""
  import pyarrow as pa
  import pyarrow.parquet as pq

  cts = voxel_counts(binary, parallel=parallel)
  bbxs = bounding_boxes(binary, parallel=parallel, no_slice_conversion=True)

  labels_arr = np.asarray(sorted(cts.keys()), dtype=np.uint64)
  cts_arr = np.asarray([cts[l] for l in labels_arr], dtype=np.uint32)

  head = codec.header(binary)
  max_dim = _max(head.sx, head.sy, head.sz)
  if max_dim <= np.iinfo(np.uint16).max:
    bbox_type = pa.uint16()
    bbox_dtype = np.uint16
  else:
    bbox_type = pa.uint32()
    bbox_dtype = np.uint32

  cols = {
    'label': labels_arr,
    'voxel_count': cts_arr,
    'min_x': np.asarray([bbxs[l][0] for l in labels_arr], dtype=bbox_dtype),
    'max_x': np.asarray([bbxs[l][3] for l in labels_arr], dtype=bbox_dtype),
    'min_y': np.asarray([bbxs[l][1] for l in labels_arr], dtype=bbox_dtype),
    'max_y': np.asarray([bbxs[l][4] for l in labels_arr], dtype=bbox_dtype),
  }
  schema = [
    pa.field('label', pa.uint64()),
    pa.field('voxel_count', pa.uint32()),
    pa.field('min_x', bbox_type),
    pa.field('max_x', bbox_type),
    pa.field('min_y', bbox_type),
    pa.field('max_y', bbox_type),
  ]
  if head.sz > 1:
    schema.append(pa.field('min_z', bbox_type))
    schema.append(pa.field('max_z', bbox_type))
    cols['min_z'] = np.asarray(
      [bbxs[l][2] for l in labels_arr], dtype=bbox_dtype
    )
    cols['max_z'] = np.asarray(
      [bbxs[l][5] for l in labels_arr], dtype=bbox_dtype
    )

  table = pa.table(cols, schema=pa.schema(schema))
  pq.write_table(table, path, compression="zstd")
  return table
