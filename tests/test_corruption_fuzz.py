"""Corruption robustness: a bit flip anywhere in the stream must
either be detected by codec.ok/check or leave the decode byte-exact
(sub-byte padding in a crack code carries no meaning). The decoder
must never crash on malformed input.

Round-4 regression guard: the native decoder used to segfault on a
corrupted labels N (unvalidated table sizes) and on crack codepoints
that walked the replay off the dual grid; right-border branches also
aliased through an sx-wide revisit packing (reference keeps dual
positions sxe-wide throughout, crackcodes.hpp:374-453)."""
import numpy as np
import pytest

import crackle_tpu as crackle
from crackle_tpu import codec


def _volume(seed=7, shape=(48, 40, 6), n=20):
  rng = np.random.RandomState(seed)
  a = rng.randint(0, n, size=shape).astype(np.uint32)
  for _ in range(4):
    m = rng.rand(*shape) < 0.6
    a = np.where(m, np.roll(a, 1, axis=rng.randint(0, 3)), a)
  return np.asfortranarray(a)


@pytest.mark.parametrize("markov", [0, 3])
def test_bit_flips_detected_or_benign(markov):
  vol = _volume()
  binary = crackle.compress(vol, markov_model_order=markov)
  rng = np.random.RandomState(1)
  for off in range(0, len(binary), 23):
    data = bytearray(binary)
    data[off] ^= 1 << rng.randint(0, 8)
    bad = bytes(data)
    if codec.ok(bad):  # must then decode exactly (dead padding bits)
      np.testing.assert_array_equal(crackle.decompress(bad), vol)


def test_truncations_never_crash():
  vol = _volume(seed=9)
  binary = crackle.compress(vol)
  for cut in range(0, len(binary), max(len(binary) // 40, 1)):
    bad = binary[:cut]
    assert not codec.ok(bad)


def test_labels_count_corruption_raises():
  """A corrupted flat-labels N must fail cleanly (used to segfault in
  the native decoder)."""
  vol = _volume(seed=11)
  binary = crackle.compress(vol)
  head = codec.header(binary)
  at = head.header_bytes + head.grid_index_bytes + 3
  data = bytearray(binary)
  data[at] ^= 0x40
  assert not codec.ok(bytes(data))
  with pytest.raises(Exception):
    crackle.decompress(bytes(data))
