"""Mosaic-compiled replay/CCL equality vs the host oracle across every
dispatch boundary of replay_pallas._pick_path:

  fused kernel:  CAP <= 16384, sx <= 511
  big (chunked): CAP in (16384, 2^19], sx <= 1023, segmented paint
  XLA fallback:  everything else

plus the committed 512^3 bench stream's known-bad slices (round-3
regression: replay_big decoded 40/512 slices wrong on hardware while
interpret mode passed)."""
import os

import numpy as np
import pytest

import crackle_tpu as crackle
from crackle_tpu import codec
from crackle_tpu.kernels import engine
from crackle_tpu.ops import crackcode as cc_ops
from crackle_tpu.headers import CrackFormat
from crackle_tpu.lib import crc32c

BENCH_512 = os.path.join(
  os.path.dirname(__file__), "..", "bench_data",
  "connectomics_v2_512x512x512.ckl")


def random_volume(shape, num_labels, seed, smooth=0, dtype=np.uint32):
  rng = np.random.RandomState(seed)
  a = rng.randint(0, num_labels, size=shape).astype(dtype)
  for _ in range(smooth):
    axis = rng.randint(0, len(shape))
    m = rng.rand(*shape) < 0.6
    a = np.where(m, np.roll(a, 1, axis=axis), a)
  return np.asfortranarray(a)


def oracle_vcgs(binary, zs=None):
  head = codec.header(binary)
  permissible = head.crack_format == CrackFormat.PERMISSIBLE
  codes = codec.crack_codes(binary)
  zs = range(len(codes)) if zs is None else zs
  return np.stack([
    cc_ops.slice_code_to_vcg(codes[z], head.sx, head.sy, permissible)
    for z in zs
  ])


def device_vcgs(binary, z0, z1):
  from crackle_tpu.kernels import decode as _dec
  import jax.numpy as jnp
  inputs = engine.prepare_slice_inputs(binary, z0, z1)
  head = inputs["head"]
  permissible = head.crack_format == CrackFormat.PERMISSIBLE
  v = _dec.decode_slices_to_vcg(
    jnp.asarray(inputs["packed"]), jnp.asarray(inputs["nbytes"]),
    jnp.asarray(inputs["nodes"]), jnp.asarray(inputs["n_chains"]),
    sx=head.sx, sy=head.sy, permissible=permissible)
  return np.asarray(v)


# Dispatch-boundary matrix. (shape, labels, seed, smooth); sz small to
# bound compile time, sx straddles the fused/big boundary (511/512/513)
# and the paint segmentation (> 512 lanes needs 2 segments).
BOUNDARY_CASES = [
  ((511, 32, 2), 24, 100, 4),   # fused, at the sx ceiling
  ((512, 32, 2), 24, 101, 4),   # big: one paint segment exactly
  ((513, 32, 2), 24, 102, 4),   # big: two paint segments
  ((600, 24, 2), 16, 103, 3),   # big: wide two-segment paint
  ((256, 256, 2), 200, 104, 5),  # fused at production shape
]


@pytest.mark.parametrize("shape,nl,seed,smooth", BOUNDARY_CASES)
def test_vcg_boundaries(shape, nl, seed, smooth):
  vol = random_volume(shape, nl, seed, smooth)
  binary = crackle.compress(vol)
  got = device_vcgs(binary, 0, shape[2])
  want = oracle_vcgs(binary)
  np.testing.assert_array_equal(got.reshape(want.shape), want)


def test_vcg_cap_cliff_mid_mode():
  """A noisy 128^2 slice exceeds 16384 codepoints -> CAP 32768 ->
  replay_big 'mid' key mode on hardware."""
  vol = random_volume((128, 128, 2), 2, 105, 0)
  binary = crackle.compress(vol)
  inputs = engine.prepare_slice_inputs(binary, 0, 2)
  CAP = inputs["packed"].shape[1] * 4
  assert CAP > 16384, f"case regressed: CAP={CAP} not past the cliff"
  got = device_vcgs(binary, 0, 2)
  want = oracle_vcgs(binary)
  np.testing.assert_array_equal(got.reshape(want.shape), want)


def test_decode_window_roundtrip_multi():
  for shape, nl, seed, smooth in [
      ((64, 64, 4), 12, 106, 6),
      ((512, 40, 3), 30, 107, 4),
  ]:
    vol = random_volume(shape, nl, seed, smooth)
    binary = crackle.compress(vol)
    out = engine.decode_window(binary, 0, shape[2])
    assert out is not None
    np.testing.assert_array_equal(out, vol)


@pytest.mark.skipif(not os.path.exists(BENCH_512),
                    reason="bench stream not generated")
def test_bench512_bad_slices_vcg():
  """Round-3 regression: slices {14,17,20,41,...} of the canonical
  512^3 stream decoded wrong through the Mosaic-compiled chunked
  replay. Decode a window straddling several and compare VCGs."""
  binary = open(BENCH_512, "rb").read()
  z0, z1 = 12, 22
  got = device_vcgs(binary, z0, z1)
  want = oracle_vcgs(binary, range(z0, z1))
  bad = [z0 + i for i in range(z1 - z0)
         if not np.array_equal(got[i].ravel(), want[i].ravel())]
  assert not bad, f"VCG mismatch on slices {bad}"


@pytest.mark.skipif(not os.path.exists(BENCH_512),
                    reason="bench stream not generated")
def test_bench512_full_crc():
  """Every slice of the 512^3 stream must pass its stored crc32c when
  decoded through the DeviceStream path (the bench's integrity gate)."""
  binary = open(BENCH_512, "rb").read()
  stream = engine.upload_stream(binary)
  assert stream is not None
  stream.decode_window(0, 512, check_crcs=True)  # raises on mismatch


def test_device_crc_matches_host():
  from crackle_tpu.kernels import crc32c_tpu
  import jax.numpy as jnp
  vol = random_volume((96, 64, 4), 10, 108, 5)
  binary = crackle.compress(vol)
  res = engine.decode_window_ccl(binary, 0, 4, check_crcs=True)
  assert res is not None
  cc, N = res
  got = np.asarray(crc32c_tpu.crc32c_device(jnp.asarray(cc)))
  want = [crc32c(np.ascontiguousarray(cc[i].astype('<u4')))
          for i in range(4)]
  np.testing.assert_array_equal(got, np.asarray(want, got.dtype))


def test_pins_device_stream_hw():
  """Condensed-pins DeviceStream serving on hardware: window decode +
  on-device crc gate vs the host decoder."""
  vol = random_volume((20, 18, 10), 4, seed=9, smooth=12)
  binary = crackle.compress(vol, allow_pins=1)
  head = codec.header(binary)
  if head.label_format != 2:
    pytest.skip("volume did not trigger pin encoding")
  stream = engine.upload_stream(binary)
  assert stream is not None and stream.pins is not None
  labels, cc, N = stream.decode_window(0, 10, check_crcs=True)
  got = np.asarray(labels).astype(vol.dtype) \
    .reshape(10, 18, 20).transpose(2, 1, 0)
  np.testing.assert_array_equal(got, vol)


def test_watershed_u64_device_stream_hw():
  """u64 labels painted as (lo, hi) planes through DeviceStream."""
  vol = random_volume((48, 40, 6), 9, seed=201, smooth=6,
                      dtype=np.uint64)
  vol = vol + np.uint64(2) ** 40
  binary = crackle.compress(vol)
  stream = engine.upload_stream(binary)
  assert stream is not None
  labels, cc, N = stream.decode_window(0, 6, check_crcs=True)
  got = np.asarray(labels).astype(vol.dtype) \
    .reshape(6, 40, 48).transpose(2, 1, 0)
  np.testing.assert_array_equal(got, vol)


def test_split_virtual_slices_hw(monkeypatch):
  """Chain-aligned virtual-slice splitting on hardware: pieces merge
  to the same CCL as the host engine."""
  from crackle_tpu.ops.ccl import connected_components_slice
  vol = np.ones((48, 40, 2), np.uint32)
  k = 2
  for x0 in range(1, 45, 6):
    for y0 in range(1, 37, 6):
      for z in range(2):
        vol[x0:x0 + 3, y0:y0 + 3, z] = k
        k += 1
  vol = np.asfortranarray(vol)
  binary = crackle.compress(vol)
  monkeypatch.setattr(engine, "SPLIT_TARGET_CPS", 512)
  res = engine._decode_ccl_split(binary, 0, 2)
  assert res is not None
  cc, N, head = res
  cc = np.asarray(cc)
  for z in range(2):
    flat = np.ascontiguousarray(vol[:, :, z].T).ravel()
    want, _ = connected_components_slice(flat, 48, 40)
    np.testing.assert_array_equal(cc[z], want.astype(np.int32))
