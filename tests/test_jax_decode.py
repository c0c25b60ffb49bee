"""The JAX decode engine must agree exactly with the numpy engine
(which is itself oracle-verified against sequential semantics)."""
import numpy as np
import pytest

import crackle_tpu as crackle
from crackle_tpu.kernels import engine


def random_volume(shape, num_labels, seed, smooth=0, dtype=np.uint32):
  rng = np.random.RandomState(seed)
  a = rng.randint(0, num_labels, size=shape).astype(dtype)
  for _ in range(smooth):
    axis = rng.randint(0, len(shape))
    m = rng.rand(*shape) < 0.6
    a = np.where(m, np.roll(a, 1, axis=axis), a)
  return np.asfortranarray(a)


CASES = [
  ((9, 9, 4), 4, 0, 0),
  ((16, 16, 4), 5, 1, 4),
  ((16, 16, 4), 2, 2, 0),   # noisy -> permissible
  ((33, 17, 3), 6, 3, 6),   # smooth -> impermissible
  ((8, 8, 2), 1, 4, 0),     # constant
  ((64, 64, 4), 12, 5, 6),
  ((1, 1, 1), 2, 6, 0),
  ((5, 1, 3), 3, 7, 0),
]


@pytest.mark.parametrize("shape,nl,seed,smooth", CASES)
def test_jax_decode_matches_numpy(shape, nl, seed, smooth):
  vol = random_volume(shape, nl, seed, smooth)
  binary = crackle.compress(vol)
  out = engine.decode_window(binary, 0, shape[2])
  assert out is not None
  np.testing.assert_array_equal(out, vol)


def test_jax_decode_z_window():
  vol = random_volume((12, 10, 8), 5, 11, 4)
  binary = crackle.compress(vol)
  out = engine.decode_window(binary, 2, 6)
  np.testing.assert_array_equal(out, vol[:, :, 2:6])


def test_jax_decode_ccl_matches_numpy_ccl():
  from crackle_tpu.ops.ccl import connected_components_slice
  vol = random_volume((32, 32, 4), 6, 13, 5)
  binary = crackle.compress(vol)
  cc, N = engine.decode_window_ccl(binary, 0, 4)
  sxy = 32 * 32
  flat = vol.ravel(order='F')
  for z in range(4):
    expected, n_expected = connected_components_slice(
      flat[z * sxy:(z + 1) * sxy], 32, 32
    )
    assert int(N[z]) == n_expected
    np.testing.assert_array_equal(cc[z], expected.astype(np.int32))


def test_jax_decode_binary_label():
  vol = random_volume((10, 10, 4), 5, 17, 3)
  binary = crackle.compress(vol)
  lbl = int(np.unique(vol)[1])
  out = engine.decode_window(binary, 0, 4, label=lbl)
  np.testing.assert_array_equal(out, vol == lbl)


def test_jax_decode_crc_detects_corruption():
  vol = random_volume((10, 10, 4), 5, 19, 3)
  binary = bytearray(crackle.compress(vol))
  # corrupt a crack code byte
  head = crackle.header(bytes(binary))
  gi = crackle.codec.grid_index(bytes(binary))
  binary[int(gi[0]) + 6] ^= 0xFF
  with pytest.raises(crackle.FormatError):
    engine.decode_window(bytes(binary), 0, 4)


@pytest.mark.parametrize("order", [1, 3, 5])
def test_jax_decode_markov_stream(order):
  """Markov streams rank-decode on the host but replay on device."""
  vol = random_volume((24, 20, 5), 6, 21 + order, 5)
  binary = crackle.compress(vol, markov_model_order=order)
  assert crackle.header(binary).markov_model_order == order
  out = engine.decode_window(binary, 0, 5)
  assert out is not None
  np.testing.assert_array_equal(out, vol)


def blocky_volume(shape, block, num_labels, seed, dtype=np.uint32):
  """Large contiguous blobs: forces pixel_pairs >= voxels/2 so the
  encoder picks IMPERMISSIBLE + condensed pins when allowed."""
  rng = np.random.RandomState(seed)
  sx, sy, sz = shape
  bx, by, bz = -(-sx // block), -(-sy // block), -(-sz // block)
  coarse = rng.randint(0, num_labels, size=(bx, by, bz)).astype(dtype)
  vol = coarse.repeat(block, 0).repeat(block, 1).repeat(block, 2)
  return np.asfortranarray(vol[:sx, :sy, :sz])


@pytest.mark.parametrize("optimize", [1, 2])
def test_jax_decode_pins_stream(optimize):
  """Condensed-pins label painting runs on device (gather + table)."""
  from crackle_tpu.headers import LabelFormat
  vol = blocky_volume((20, 18, 6), 4, 5, 31 + optimize)
  binary = crackle.compress(vol, allow_pins=optimize)
  assert (crackle.header(binary).label_format
          == LabelFormat.PINS_VARIABLE_WIDTH)
  out = engine.decode_window(binary, 0, 6)
  assert out is not None
  np.testing.assert_array_equal(out, vol)


def test_jax_decode_pins_markov_window():
  from crackle_tpu.headers import LabelFormat
  vol = blocky_volume((16, 16, 8), 4, 4, 77)
  binary = crackle.compress(vol, allow_pins=1, markov_model_order=2)
  assert (crackle.header(binary).label_format
          == LabelFormat.PINS_VARIABLE_WIDTH)
  out = engine.decode_window(binary, 2, 7)
  assert out is not None
  np.testing.assert_array_equal(out, vol[:, :, 2:7])


def test_jax_decode_u64_plant_interpret(monkeypatch):
  """u64 labels paint as two int32 planes in the plant kernel; the
  Pallas interpreter stands in for the TPU on CPU."""
  from crackle_tpu.kernels import ccl_pallas
  monkeypatch.setattr(ccl_pallas, "INTERPRET", True)
  vol = random_volume((16, 12, 3), 5, 91, 4).astype(np.uint64)
  vol = np.asfortranarray(vol + np.uint64(0x1_0000_0000))
  binary = crackle.compress(vol)
  out = engine.decode_window(binary, 0, 3)
  assert out is not None
  assert out.dtype == np.uint64
  np.testing.assert_array_equal(out, vol)


def test_jax_decode_u32_plant_interpret(monkeypatch):
  from crackle_tpu.kernels import ccl_pallas
  monkeypatch.setattr(ccl_pallas, "INTERPRET", True)
  vol = random_volume((16, 16, 4), 6, 95, 5)
  binary = crackle.compress(vol)
  out = engine.decode_window(binary, 0, 4)
  assert out is not None
  np.testing.assert_array_equal(out, vol)


@pytest.mark.parametrize("smooth", [0, 6])
def test_jax_decode_replay_kernel_interpret(monkeypatch, smooth):
  """The fused Pallas replay kernels (P1 keys / P2 replay+paint) must
  match the XLA replay bit-for-bit; the volume is sized so CAP lands
  in the replay-eligible range (>= 256 codepoints)."""
  from crackle_tpu.kernels import ccl_pallas, replay_pallas, decode
  import jax.numpy as jnp
  monkeypatch.setattr(ccl_pallas, "INTERPRET", True)
  vol = random_volume((64, 48, 3), 14, 123, smooth)
  binary = crackle.compress(vol)
  inputs = engine.prepare_slice_inputs(binary, 0, 3)
  head = inputs["head"]
  CAP = inputs["packed"].shape[1] * 4
  assert replay_pallas.eligible(
    CAP, inputs["nodes"].shape[1], head.sx, head.sy)
  from crackle_tpu.headers import CrackFormat
  permissible = head.crack_format == CrackFormat.PERMISSIBLE
  args = (jnp.asarray(inputs["packed"]), jnp.asarray(inputs["nbytes"]),
          jnp.asarray(inputs["nodes"]), jnp.asarray(inputs["n_chains"]))
  vcg_pallas = np.asarray(replay_pallas.replay_vcg_traced(
    *args, head.sx, head.sy, permissible))
  vcg_xla = np.asarray(decode._decode_vcg_batch(
    *args, head.sx, head.sy, permissible))
  np.testing.assert_array_equal(vcg_pallas, vcg_xla)
  out = engine.decode_window(binary, 0, 3)
  np.testing.assert_array_equal(out, vol)


def test_device_stream_decode_interpret(monkeypatch):
  """upload_stream parks the parsed sections on device; window decodes
  must match the host oracle with no further host parsing."""
  from crackle_tpu.kernels import ccl_pallas
  monkeypatch.setattr(ccl_pallas, "INTERPRET", True)
  vol = random_volume((32, 24, 6), 9, 7, 4)
  binary = crackle.compress(vol)
  stream = engine.upload_stream(binary)
  assert stream is not None
  for z0, z1 in [(0, 6), (2, 5)]:
    labels, cc, N = stream.decode_window(z0, z1)
    got = np.asarray(labels).astype(vol.dtype) \
      .reshape(z1 - z0, 24, 32).transpose(2, 1, 0)
    np.testing.assert_array_equal(got, vol[:, :, z0:z1])


def test_device_crc32c_matches_reference():
  """CRC32C as bit-linear MXU matmuls must equal the byte-serial
  reference implementation (lib.crc32c / src/crc.hpp semantics)."""
  from crackle_tpu.kernels import crc32c_tpu
  from crackle_tpu.lib import crc32c
  rng = np.random.RandomState(5)
  for W in (1, 3, 129, 511, 512, 513, 4096):
    msgs = rng.randint(0, 2 ** 32, size=(4, W), dtype=np.uint32)
    got = np.asarray(crc32c_tpu.crc32c_device(msgs.view(np.int32)))
    want = np.array(
      [crc32c(np.ascontiguousarray(m.astype('<u4'))) for m in msgs],
      np.uint32)
    np.testing.assert_array_equal(got, want)


def test_device_crc32c_large_message():
  """Messages with 32*W > 2^24 bit-count sums: the per-plane parity
  must stay exact (regression: a single f32 accumulator across all 32
  bitplanes rounds and corrupts the parity at this size)."""
  from crackle_tpu.kernels import crc32c_tpu
  from crackle_tpu.lib import crc32c
  rng = np.random.RandomState(11)
  W = 600_001  # > 2^24 / 32, and not a multiple of the block size
  msgs = rng.randint(0, 2 ** 32, size=(2, W), dtype=np.uint32)
  got = np.asarray(crc32c_tpu.crc32c_device(msgs.view(np.int32)))
  want = np.array(
    [crc32c(np.ascontiguousarray(m.astype('<u4'))) for m in msgs],
    np.uint32)
  np.testing.assert_array_equal(got, want)


def test_device_stream_crc_check(monkeypatch):
  """DeviceStream.decode_window(check_crcs=True) verifies per-slice
  crack crcs on device and flags corruption."""
  from crackle_tpu.kernels import ccl_pallas
  from crackle_tpu.headers import FormatError
  monkeypatch.setattr(ccl_pallas, "INTERPRET", True)
  vol = random_volume((32, 24, 4), 7, 21, 4)
  binary = crackle.compress(vol)
  stream = engine.upload_stream(binary)
  assert stream is not None and stream.crcs is not None
  labels, cc, N = stream.decode_window(0, 4, check_crcs=True)
  got = np.asarray(labels).astype(vol.dtype) \
    .reshape(4, 24, 32).transpose(2, 1, 0)
  np.testing.assert_array_equal(got, vol)
  # corrupt a stored crc word: the device check must catch it
  import jax.numpy as jnp
  bad = np.asarray(stream.crcs).copy()
  bad[2] ^= 0x1
  stream.crcs = jnp.asarray(bad)
  with pytest.raises(FormatError, match="z=2"):
    stream.decode_window(0, 4, check_crcs=True)


# ---------------------------------------------------------------------------
# generalized chunked replay (replay_big): wide slices, long streams
# ---------------------------------------------------------------------------

@pytest.fixture
def force_big(monkeypatch):
  """Route eligible streams through the generalized chunked replay
  with tiny chunk rows so the carry logic is exercised, regardless of
  stream size."""
  import jax
  from crackle_tpu.kernels import ccl_pallas, replay_pallas, replay_big
  monkeypatch.setattr(ccl_pallas, "INTERPRET", True)
  monkeypatch.setattr(replay_pallas, "FORCE_BIG", True)
  monkeypatch.setattr(replay_big, "CHUNK_R", 2)
  jax.clear_caches()  # dispatch is baked into traced functions
  yield
  jax.clear_caches()


BIG_CASES = [
  ((9, 9, 4), 4, 31, 0),
  ((16, 16, 3), 5, 32, 4),     # impermissible, branches
  ((16, 16, 3), 2, 33, 0),     # noisy -> permissible
  ((33, 17, 3), 6, 34, 6),
  ((8, 8, 2), 1, 35, 0),       # constant
  ((5, 1, 3), 3, 36, 0),
]


@pytest.mark.parametrize("shape,nl,seed,smooth", BIG_CASES)
def test_replay_big_matches_numpy(force_big, shape, nl, seed, smooth):
  vol = random_volume(shape, nl, seed, smooth)
  binary = crackle.compress(vol)
  out = engine.decode_window(binary, 0, shape[2])
  assert out is not None
  np.testing.assert_array_equal(out, vol)


@pytest.mark.parametrize("shape,nl,seed,smooth", [
  ((513, 6, 2), 5, 41, 3),     # sx + 1 > 512: two paint segments
  ((600, 9, 2), 7, 42, 4),
  ((520, 5, 1), 2, 43, 0),
])
def test_replay_big_wide_slices(force_big, shape, nl, seed, smooth):
  """sx >= 512 runs the segmented paint raster (plane-major bins,
  cross-segment V carry); ineligible for the original fused kernel."""
  from crackle_tpu.kernels import replay_big
  assert replay_big._nseg(shape[0]) == 2
  vol = random_volume(shape, nl, seed, smooth)
  binary = crackle.compress(vol)
  out = engine.decode_window(binary, 0, shape[2])
  assert out is not None
  np.testing.assert_array_equal(out, vol)


def test_replay_big_long_scope_across_chunks(force_big):
  """Round-3/4 regression: a move whose scope close lies beyond the
  chunk lookahead row must fall through to the inter-chunk carry. The
  old _scope_kernel's shift fill fabricated a depth-segment boundary
  at every chunk seam, dropping those moves' cancellations (40/512
  slices of the 512^3 bench corpus decoded wrong).

  A square spiral path makes a region whose boundary is a single long
  branch-poor curve, so sorted depth segments span thousands of
  events — with CHUNK_R=2 (256-codepoint windows) the move->close
  span crosses many seams (3350 wrong VCG entries under the old
  kernel)."""
  vol = np.zeros((65, 65, 1), dtype=np.uint32)
  x0 = y0 = 0
  x1 = y1 = 64
  while x1 > x0:
    vol[x0:x1 + 1, y0, 0] = 1
    vol[x1, y0:y1 + 1, 0] = 1
    vol[x0:x1 + 1, y1, 0] = 1
    if y0 + 2 <= y1:
      vol[x0, y0 + 2:y1 + 1, 0] = 1
    x0 += 2; y0 += 2; x1 -= 2; y1 -= 2
  vol = np.asfortranarray(vol)
  binary = crackle.compress(vol)
  from crackle_tpu import codec
  from crackle_tpu.lib import ctoi
  code = codec.crack_codes(binary)[0]
  n_cps = (len(code) - 4 - ctoi(code, 0, 4)) * 4
  assert n_cps > 3 * 256, f"case regressed: {n_cps} cps"
  out = engine.decode_window(binary, 0, 1)
  assert out is not None
  np.testing.assert_array_equal(out, vol)


def test_replay_big_long_stream_two_key_sort(monkeypatch):
  """A noisy 128^2 slice exceeds 16384 codepoints, which forces the
  two-operand (depth, pos) lexicographic sort (the packed int32 key
  would overflow)."""
  import jax
  from crackle_tpu.kernels import ccl_pallas
  monkeypatch.setattr(ccl_pallas, "INTERPRET", True)
  jax.clear_caches()
  vol = random_volume((128, 128, 1), 2, 44, 0)
  binary = crackle.compress(vol)
  from crackle_tpu import codec
  from crackle_tpu.lib import ctoi
  code = codec.crack_codes(binary)[0]
  n_cps = (len(code) - 4 - ctoi(code, 0, 4)) * 4
  assert n_cps > 16384
  out = engine.decode_window(binary, 0, 1)
  assert out is not None
  np.testing.assert_array_equal(out, vol)
  jax.clear_caches()


@pytest.mark.parametrize("order", [1, 3, 5, 7])
def test_markov_stream_device_path(monkeypatch, order):
  from crackle_tpu.kernels import ccl_pallas
  monkeypatch.setattr(ccl_pallas, "INTERPRET", True)
  """Markov streams are DeviceStream-eligible: the serial rank decode
  runs once at upload (host, threaded across slices like the
  reference's markov.hpp:268-323 pool); every window decode after
  that is pure device work, crc-gated."""
  vol = random_volume((40, 40, 6), 20, 71, 5)
  binary = crackle.compress(vol)
  bm = crackle.reencode(binary, markov_model_order=order)
  stream = engine.upload_stream(bm)
  assert stream is not None
  labels, cc, N = stream.decode_window(0, 6, check_crcs=True)
  got = np.asarray(labels).astype(vol.dtype) \
    .reshape(6, 40, 40).transpose(2, 1, 0)
  np.testing.assert_array_equal(got, vol)


def test_replay_big_compact_cancel_path(force_big, monkeypatch):
  """The alternative compact-cancel path (per-close run sums +
  compact value scatter; CRACKLE_TPU_CANCEL_COMPACT=1) must stay
  byte-correct even though the default is the measured-faster sort
  path."""
  from crackle_tpu.kernels import replay_big
  monkeypatch.setattr(replay_big, "CANCEL_COMPACT", True)
  vol = np.zeros((65, 65, 1), dtype=np.uint32)
  x0 = y0 = 0
  x1 = y1 = 64
  while x1 > x0:
    vol[x0:x1 + 1, y0, 0] = 1
    vol[x1, y0:y1 + 1, 0] = 1
    vol[x0:x1 + 1, y1, 0] = 1
    if y0 + 2 <= y1:
      vol[x0, y0 + 2:y1 + 1, 0] = 1
    x0 += 2; y0 += 2; x1 -= 2; y1 -= 2
  vol = np.asfortranarray(vol)
  binary = crackle.compress(vol)
  out = engine.decode_window(binary, 0, 1)
  assert out is not None
  np.testing.assert_array_equal(out, vol)
  for shape, nl, seed, smooth in [((33, 17, 3), 6, 34, 6),
                                  ((16, 16, 3), 2, 33, 0)]:
    v2 = random_volume(shape, nl, seed, smooth)
    b2 = crackle.compress(v2)
    out2 = engine.decode_window(b2, 0, shape[2])
    np.testing.assert_array_equal(out2, v2)


def test_ccl_v2_plant_matches_v1(monkeypatch):
  """The v2 CCL (converge-only kernel + root plant) must produce the
  identical first-visit numbering and painted labels as the v1
  rank-re-propagation path. v2 is env-gated (CRACKLE_TPU_CCL_V2) —
  measured slower end-to-end on v5e (BENCH_NOTES round 5) — but kept
  correct for future hardware where the trade flips."""
  import jax.numpy as jnp
  from crackle_tpu.kernels import ccl_pallas
  monkeypatch.setattr(ccl_pallas, "INTERPRET", True)
  rng = np.random.RandomState(11)
  B, sy, sx = 3, 24, 40
  labels = rng.randint(0, 6, size=(B, sy, sx)).astype(np.int32)
  for _ in range(4):  # smooth so N stays under cap_n
    ax = rng.randint(1, 3)
    m = rng.rand(B, sy, sx) < 0.6
    labels = np.where(m, np.roll(labels, 1, axis=ax), labels)
  from crackle_tpu.kernels import encode as enc_k
  vcg = enc_k.labels_to_vcg(jnp.asarray(labels), sx, sy)
  cap_n = 512
  T = jnp.asarray(
    rng.randint(1, 1 << 20, size=(B, 1, cap_n)).astype(np.int32))
  cc1, N1, p1 = ccl_pallas.ccl_paint_traced(vcg, T, sx, sy)
  cc2, N2, p2 = ccl_pallas.ccl_paint_v2(vcg, T, sx, sy)
  np.testing.assert_array_equal(np.asarray(cc1), np.asarray(cc2))
  np.testing.assert_array_equal(np.asarray(N1), np.asarray(N2))
  np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))


def test_pins_device_stream_windows(monkeypatch):
  """Condensed-pins streams park in HBM via upload_stream (like flat
  streams) and serve arbitrary z windows with crc checking."""
  import jax.numpy as jnp
  from crackle_tpu.kernels import ccl_pallas, engine
  monkeypatch.setattr(ccl_pallas, "INTERPRET", True)
  rng = np.random.RandomState(9)
  vol = rng.randint(0, 4, size=(20, 18, 10)).astype(np.uint32)
  for _ in range(12):
    ax = rng.randint(0, 3)
    m = rng.rand(*vol.shape) < 0.6
    vol = np.where(m, np.roll(vol, 1, axis=ax), vol)
  vol = np.asfortranarray(vol)
  binary = crackle.compress(vol, allow_pins=1)
  head = crackle.header(binary)
  assert head.label_format == 2, "volume did not trigger pin encoding"
  stream = engine.upload_stream(binary)
  assert stream is not None and stream.pins is not None
  for z0, z1 in [(0, 10), (3, 7), (9, 10)]:
    labels, cc, N = stream.decode_window(z0, z1, check_crcs=True)
    got = np.asarray(labels).astype(vol.dtype) \
      .reshape(z1 - z0, 18, 20).transpose(2, 1, 0)
    np.testing.assert_array_equal(got, vol[:, :, z0:z1])


def test_split_decode_long_slices(monkeypatch):
  """Slices beyond the device replay capacity split at chain
  boundaries into virtual slices; piece VCGs merge on device and the
  CCL matches the host engine exactly. (Splitting requires multiple
  chains — a checkerboard of squares gives one closed-loop chain per
  square; single-giant-chain streams like binary noise stay on the
  host path by design.)"""
  from crackle_tpu.kernels import engine
  from crackle_tpu.ops.ccl import connected_components_slice
  # isolated 3x3 islands on background: each island's boundary loop
  # is its own connected crack component, hence its own chain
  vol = np.ones((48, 40, 3), np.uint32)
  k = 2
  for x0 in range(1, 45, 6):
    for y0 in range(1, 37, 6):
      for z in range(3):
        vol[x0:x0 + 3, y0:y0 + 3, z] = k
        k += 1
  vol = np.asfortranarray(vol)
  binary = crackle.compress(vol)
  monkeypatch.setattr(engine, "SPLIT_TARGET_CPS", 512)
  res = engine._decode_ccl_split(binary, 0, 3)
  assert res is not None
  cc, N, head = res
  cc = np.asarray(cc)
  for z in range(3):
    flat = np.ascontiguousarray(vol[:, :, z].T).ravel()
    want, wn = connected_components_slice(flat, 48, 40)
    np.testing.assert_array_equal(cc[z], want.astype(np.int32))
    assert int(np.asarray(N)[z]) == wn

  # dispatcher integration: an artificially tiny cap routes the
  # normal entry point through the split path with crc checking
  monkeypatch.setattr(engine, "MAX_DEVICE_CAP", 1024)
  out = engine.decode_window_ccl(binary, 0, 3, check_crcs=True)
  assert out is not None
  np.testing.assert_array_equal(out[0][2], cc[2])


@pytest.mark.parametrize("add_sweep,prime,sy,sx", [
  (True, "", 40, 48),        # default: additive-penalty sweeps
  (False, "", 41, 48),       # packed-bit sweeps (CCL_ADD=0)
  (True, "xf", 42, 48),      # full-reach x prime (gated negative)
  (True, "xfxb", 43, 48),
  (True, "full", 44, 48),
  (False, "full2", 45, 48),
])
def test_ccl_sweep_variants_match_xla(monkeypatch, add_sweep, prime,
                                      sy, sx):
  """Every sweep formulation (additive-penalty vs packed-bit flags,
  with and without a full-reach prime pass) must produce the exact
  first-visit numbering of the XLA oracle. The prime modes are
  env-gated measured negatives (BENCH_NOTES round 5) kept correct;
  distinct shapes per case bust any trace caching."""
  import jax.numpy as jnp
  from crackle_tpu.kernels import ccl_pallas, decode as _dec
  monkeypatch.setattr(ccl_pallas, "INTERPRET", True)
  monkeypatch.setattr(ccl_pallas, "ADD_SWEEP", add_sweep)
  monkeypatch.setattr(ccl_pallas, "SWEEP_PRIME", prime)
  rng = np.random.RandomState(sy)
  vcg = (rng.randint(0, 16, size=(2, sy * sx)) & 0b1010).astype(
    np.uint8)
  ref_cc, ref_N = _dec._ccl_batch(jnp.asarray(vcg), sx, sy)
  cc, N = ccl_pallas.ccl_batch_traced(jnp.asarray(vcg), sx, sy)
  np.testing.assert_array_equal(np.asarray(ref_cc), np.asarray(cc))
  np.testing.assert_array_equal(np.asarray(ref_N), np.asarray(N))
