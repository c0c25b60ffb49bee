"""End-to-end codec tests: round trips across dtypes, formats, markov
orders and pins; canonical byte constructions; differential oracles
against numpy (mirrors the reference's automated_test.py strategy)."""
import numpy as np
import pytest

import crackle_tpu as crackle


def random_volume(shape, num_labels, seed, smooth=0, dtype=np.uint32):
  rng = np.random.RandomState(seed)
  a = rng.randint(0, num_labels, size=shape).astype(dtype)
  for _ in range(smooth):
    axis = rng.randint(0, len(shape))
    m = rng.rand(*shape) < 0.6
    shifted = np.roll(a, 1, axis=axis)
    a = np.where(m, shifted, a)
  return np.asfortranarray(a)


@pytest.mark.parametrize("dtype", [np.uint8, np.uint16, np.uint32, np.uint64])
@pytest.mark.parametrize("smooth", [0, 4])
def test_roundtrip_random(dtype, smooth):
  labels = random_volume((13, 11, 7), 4, seed=42 + smooth, smooth=smooth,
                         dtype=dtype)
  binary = crackle.compress(labels)
  out = crackle.decompress(binary)
  assert out.dtype == labels.dtype
  np.testing.assert_array_equal(labels, out)


@pytest.mark.parametrize("markov", [0, 1, 3, 5])
def test_roundtrip_markov(markov):
  labels = random_volume((16, 16, 4), 5, seed=1, smooth=5)
  binary = crackle.compress(labels, markov_model_order=markov)
  head = crackle.header(binary)
  assert head.markov_model_order == markov
  out = crackle.decompress(binary)
  np.testing.assert_array_equal(labels, out)


@pytest.mark.parametrize("optimize", [False, True])
def test_roundtrip_pins(optimize):
  labels = random_volume((12, 12, 8), 3, seed=7, smooth=8)
  binary = crackle.compress(labels, allow_pins=2 if optimize else 1)
  head = crackle.header(binary)
  out = crackle.decompress(binary)
  np.testing.assert_array_equal(labels, out)


def test_roundtrip_pins_markov():
  labels = random_volume((10, 10, 6), 3, seed=9, smooth=9)
  binary = crackle.compress(labels, allow_pins=1, markov_model_order=4)
  out = crackle.decompress(binary)
  np.testing.assert_array_equal(labels, out)


def test_empty_volume():
  labels = np.zeros((0, 0, 0), dtype=np.uint32)
  binary = crackle.compress(labels)
  out = crackle.decompress(binary)
  assert out.size == 0
  assert crackle.num_labels(binary) == 0
  assert len(crackle.labels(binary)) == 0


def test_all_zero():
  labels = np.zeros((7, 11, 3), dtype=np.uint32, order="F")
  binary = crackle.compress(labels)
  out = crackle.decompress(binary)
  np.testing.assert_array_equal(labels, out)
  assert crackle.num_labels(binary) == 1


def test_uniform_nonzero():
  labels = np.full((7, 11, 3), 42, dtype=np.uint32, order="F")
  binary = crackle.compress(labels)
  out = crackle.decompress(binary)
  np.testing.assert_array_equal(labels, out)


def test_arange_all_distinct():
  labels = np.arange(6 * 6 * 3, dtype=np.uint32).reshape(
    (6, 6, 3), order="F"
  )
  binary = crackle.compress(labels)
  out = crackle.decompress(binary)
  np.testing.assert_array_equal(labels, out)


def test_2d_input():
  labels = random_volume((9, 13), 4, seed=3, smooth=2)
  binary = crackle.compress(labels)
  out = crackle.decompress(binary)
  np.testing.assert_array_equal(labels[..., np.newaxis], out)


def test_c_order_roundtrip():
  labels = np.ascontiguousarray(random_volume((8, 9, 4), 4, seed=5,
                                              smooth=3))
  binary = crackle.compress(labels)
  head = crackle.header(binary)
  assert not head.fortran_order
  out = crackle.decompress(binary)
  assert out.flags.c_contiguous
  np.testing.assert_array_equal(labels, out)


def test_labels_match_numpy_unique():
  vol = random_volume((12, 12, 5), 30, seed=11)
  binary = crackle.compress(vol)
  np.testing.assert_array_equal(crackle.labels(binary), np.unique(vol))
  assert crackle.num_labels(binary) == len(np.unique(vol))


def test_labels_match_numpy_unique_pins():
  vol = random_volume((12, 12, 5), 4, seed=12, smooth=8)
  binary = crackle.compress(vol, allow_pins=1)
  np.testing.assert_array_equal(crackle.labels(binary), np.unique(vol))


def test_z_window_decode():
  vol = random_volume((9, 10, 8), 5, seed=13, smooth=3)
  binary = crackle.compress(vol)
  from crackle_tpu.codec import decompress_range
  for z0, z1 in [(0, 8), (2, 5), (7, 8), (0, 1)]:
    out = decompress_range(binary, z0, z1, 0)
    np.testing.assert_array_equal(vol[:, :, z0:z1], out)


def test_contains():
  vol = random_volume((10, 10, 4), 50, seed=17)
  binary = crackle.compress(vol)
  uniq = set(np.unique(vol).tolist())
  for lbl in list(uniq)[:10]:
    assert crackle.contains(binary, lbl)
  for lbl in [777, 100000]:
    assert crackle.contains(binary, lbl) == (lbl in uniq)
  assert not crackle.contains(binary, 2 ** 63)


def test_contains_range():
  vol = random_volume((10, 10, 4), 100, seed=19)
  binary = crackle.compress(vol)
  uniq = np.unique(vol)
  got = crackle.contains_range(binary, 10, 50)
  expected = uniq[(uniq >= 10) & (uniq < 50)]
  np.testing.assert_array_equal(got, expected)


def test_min_max():
  vol = random_volume((10, 10, 4), 500, seed=23, dtype=np.uint16)
  binary = crackle.compress(vol)
  assert crackle.min(binary) == int(vol.min())
  assert crackle.max(binary) == int(vol.max())


def test_min_max_pins():
  vol = random_volume((10, 10, 6), 4, seed=29, smooth=8)
  binary = crackle.compress(vol, allow_pins=1)
  assert crackle.min(binary) == int(vol.min())
  assert crackle.max(binary) == int(vol.max())


def test_full_zeros_equals_compress():
  """full/zeros synthesized streams must be byte-identical to
  compressing the equivalent numpy array (automated_test:584-602)."""
  for fill in [0, 1, 17]:
    direct = crackle.compress(
      np.full((13, 11, 5), fill, dtype=np.uint32, order="F")
    )
    synth = crackle.full((13, 11, 5), fill, dtype=np.uint32, order="F")
    assert direct == synth, f"fill={fill}"


def test_zstack_equals_direct_compress():
  """zstack of compressed chunks == compress of the stacked volume
  (automated_test:448-561)."""
  vol = random_volume((9, 9, 8), 5, seed=31, smooth=4)
  direct = crackle.compress(vol)
  parts = [
    crackle.compress(np.asfortranarray(vol[:, :, :3])),
    crackle.compress(np.asfortranarray(vol[:, :, 3:5])),
    crackle.compress(np.asfortranarray(vol[:, :, 5:])),
  ]
  stacked = crackle.zstack(parts)
  assert stacked == direct


def test_zsplit_roundtrip():
  vol = random_volume((9, 9, 8), 5, seed=37, smooth=4)
  binary = crackle.compress(vol)
  before, middle, after = crackle.zsplit(binary, 3)
  np.testing.assert_array_equal(
    crackle.decompress(before), vol[:, :, :3]
  )
  np.testing.assert_array_equal(
    crackle.decompress(middle), vol[:, :, 3:4]
  )
  np.testing.assert_array_equal(
    crackle.decompress(after), vol[:, :, 4:]
  )
  restacked = crackle.zstack([before, middle, after])
  assert restacked == binary


def test_zshatter():
  vol = random_volume((7, 7, 5), 4, seed=41, smooth=2)
  binary = crackle.compress(vol)
  pieces = crackle.zshatter(binary)
  assert len(pieces) == 5
  for z, piece in enumerate(pieces):
    np.testing.assert_array_equal(
      crackle.decompress(piece), vol[:, :, z:z + 1]
    )


def test_remap():
  vol = random_volume((8, 8, 4), 5, seed=43)
  binary = crackle.compress(vol)
  uniq = np.unique(vol)
  mapping = {int(u): int(u) + 100 for u in uniq}
  remapped = crackle.remap(binary, mapping)
  out = crackle.decompress(remapped)
  np.testing.assert_array_equal(out, vol + 100)


def test_remap_widening():
  vol = random_volume((8, 8, 4), 5, seed=47, dtype=np.uint16)
  binary = crackle.compress(vol)
  mapping = {int(u): int(u) + 2 ** 33 for u in np.unique(vol)}
  remapped = crackle.remap(binary, mapping)
  out = crackle.decompress(remapped)
  assert out.dtype.itemsize == 8
  np.testing.assert_array_equal(out, vol.astype(np.uint64) + 2 ** 33)


def test_remap_preserve_missing():
  vol = random_volume((8, 8, 4), 5, seed=53)
  binary = crackle.compress(vol)
  uniq = np.unique(vol)
  mapping = {int(uniq[0]): 9999}
  remapped = crackle.remap(binary, mapping, preserve_missing_labels=True)
  out = crackle.decompress(remapped)
  expected = vol.copy()
  expected[vol == uniq[0]] = 9999
  np.testing.assert_array_equal(out, expected)
  with pytest.raises(KeyError):
    crackle.remap(binary, mapping, preserve_missing_labels=False)


def test_mask():
  vol = random_volume((8, 8, 4), 5, seed=59)
  binary = crackle.compress(vol)
  uniq = np.unique(vol)
  target = [int(uniq[0]), int(uniq[-1])]
  masked = crackle.mask(binary, target)
  out = crackle.decompress(masked)
  expected = vol.copy()
  for t in target:
    expected[vol == t] = 0
  np.testing.assert_array_equal(out, expected)


def test_mask_except():
  vol = random_volume((8, 8, 4), 5, seed=61)
  binary = crackle.compress(vol)
  uniq = np.unique(vol)
  keep = [int(uniq[1])]
  masked = crackle.mask_except(binary, keep)
  out = crackle.decompress(masked)
  expected = np.where(vol == uniq[1], vol, 0)
  np.testing.assert_array_equal(out, expected)


def test_astype_refit():
  vol = random_volume((8, 8, 4), 5, seed=67, dtype=np.uint64)
  binary = crackle.compress(vol)
  small = crackle.refit(binary)
  head = crackle.header(small)
  assert head.data_width == 1
  np.testing.assert_array_equal(
    crackle.decompress(small), vol.astype(np.uint8)
  )
  widened = crackle.astype(small, np.uint32)
  np.testing.assert_array_equal(
    crackle.decompress(widened), vol.astype(np.uint32)
  )


def test_renumber():
  vol = random_volume((8, 8, 4), 1000, seed=71) * 17
  binary = crackle.compress(vol)
  renum, mapping = crackle.renumber(binary, start=0)
  out = crackle.decompress(renum)
  expected = np.searchsorted(np.unique(vol), vol)
  np.testing.assert_array_equal(out.astype(np.int64), expected)


def test_scalar_ops():
  vol = random_volume((8, 8, 4), 5, seed=73) + 10
  binary = crackle.compress(vol)
  np.testing.assert_array_equal(
    crackle.decompress(crackle.add_scalar(binary, 5)), vol + 5
  )
  np.testing.assert_array_equal(
    crackle.decompress(crackle.subtract_scalar(binary, 3)), vol - 3
  )
  np.testing.assert_array_equal(
    crackle.decompress(crackle.multiply_scalar(binary, 2)), vol * 2
  )
  np.testing.assert_array_equal(
    crackle.decompress(crackle.floordiv_scalar(binary, 2)), vol // 2
  )


def test_header_crc_1bit_flips_detected():
  """Every 1-bit flip in header bytes [5, 28) must raise
  (automated_test:731-826)."""
  vol = random_volume((6, 6, 3), 4, seed=79)
  binary = bytearray(crackle.compress(vol))
  for byte_i in range(5, 29):
    for bit in range(8):
      corrupted = bytearray(binary)
      corrupted[byte_i] ^= (1 << bit)
      with pytest.raises(crackle.FormatError):
        crackle.header(bytes(corrupted))


def test_header_crc_2bit_flips_detected():
  vol = random_volume((6, 6, 3), 4, seed=83)
  binary = bytearray(crackle.compress(vol))
  rng = np.random.RandomState(0)
  for _ in range(200):
    b1, b2 = rng.randint(5, 29, size=2)
    k1, k2 = rng.randint(0, 8, size=2)
    if b1 == b2 and k1 == k2:
      continue
    corrupted = bytearray(binary)
    corrupted[b1] ^= (1 << k1)
    corrupted[b2] ^= (1 << k2)
    with pytest.raises(crackle.FormatError):
      crackle.header(bytes(corrupted))


def test_check_and_ok():
  vol = random_volume((6, 6, 3), 4, seed=89)
  binary = crackle.compress(vol)
  assert crackle.ok(binary)
  report = crackle.check(binary)
  assert report["header"] and report["crack_index"] and report["labels"]
  assert report["z"] == []

  corrupted = bytearray(binary)
  corrupted[40] ^= 0xFF  # stomp the z-index
  assert not crackle.ok(bytes(corrupted))


def test_labels_for_z_range():
  vol = random_volume((8, 8, 6), 6, seed=97, smooth=2)
  binary = crackle.compress(vol)
  for z0, z1 in [(0, 6), (1, 3), (5, 6)]:
    got = crackle.labels_for_z_range(binary, z0, z1)
    np.testing.assert_array_equal(got, np.unique(vol[:, :, z0:z1]))


def test_z_range_for_label():
  vol = np.zeros((6, 6, 8), dtype=np.uint32, order="F")
  vol[:, :, 2:5] = 7
  vol[2, 3, 6] = 9
  binary = crackle.compress(vol)
  z0, z1 = crackle.codec.z_range_for_label(binary, 7)
  assert z0 <= 2 and z1 >= 5
  z0, z1 = crackle.codec.z_range_for_label(binary, 9)
  assert z0 <= 6 and z1 >= 7
  assert crackle.codec.z_range_for_label(binary, 12345) == (-1, -1)


def test_decompress_binary_image():
  vol = random_volume((8, 8, 6), 4, seed=101, smooth=3)
  binary = crackle.compress(vol)
  for lbl in np.unique(vol)[:3]:
    img = crackle.decompress(binary, label=int(lbl))
    np.testing.assert_array_equal(img, vol == lbl)


def test_reencode_markov_cycle():
  vol = random_volume((12, 12, 4), 4, seed=103, smooth=4)
  binary = crackle.compress(vol)
  b5 = crackle.reencode(binary, markov_model_order=5)
  assert crackle.header(b5).markov_model_order == 5
  np.testing.assert_array_equal(crackle.decompress(b5), vol)
  b0 = crackle.reencode(b5, markov_model_order=0)
  assert crackle.header(b0).markov_model_order == 0
  np.testing.assert_array_equal(crackle.decompress(b0), vol)
  # a markov round trip back to order 0 reproduces the original bytes
  assert b0 == binary


def test_condense_unique():
  vol = random_volume((8, 8, 4), 5, seed=107)
  binary = crackle.compress(vol)
  uniq = np.unique(vol)
  mapping = {int(u): 7 for u in uniq}
  remapped = crackle.remap(binary, mapping)
  condensed = crackle.condense_unique(remapped)
  assert crackle.num_labels(condensed) == 1
  np.testing.assert_array_equal(
    crackle.decompress(condensed), np.full_like(vol, 7)
  )


def test_array_equal_and_structure_equal():
  vol = random_volume((8, 8, 4), 5, seed=109, smooth=2)
  b1 = crackle.compress(vol)
  b2 = crackle.compress(vol)
  assert crackle.array_equal(b1, b2)
  b3 = crackle.compress(vol + 5)
  assert not crackle.array_equal(b1, b3)
  assert crackle.structure_equal(b1, b3)
