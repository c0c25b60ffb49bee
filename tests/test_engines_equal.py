"""All three decode engines (numpy, native C++, JAX) must produce
identical volumes for identical streams, across formats and orders."""
import numpy as np
import pytest

import crackle_tpu as crackle
from crackle_tpu import native
from crackle_tpu.kernels import engine as jax_engine
from crackle_tpu.ops import crackcode  # noqa: F401


def random_volume(shape, num_labels, seed, smooth=0, dtype=np.uint32,
                  order="F"):
  rng = np.random.RandomState(seed)
  a = rng.randint(0, num_labels, size=shape).astype(dtype)
  for _ in range(smooth):
    axis = rng.randint(0, len(shape))
    a = np.where(rng.rand(*shape) < 0.6, np.roll(a, 1, axis=axis), a)
  if order == "F":
    return np.asfortranarray(a)
  return np.ascontiguousarray(a)


CONFIGS = [
  dict(shape=(14, 11, 5), nl=5, seed=0, smooth=3, dtype=np.uint32,
       order="F", markov=0),
  dict(shape=(14, 11, 5), nl=5, seed=1, smooth=0, dtype=np.uint8,
       order="F", markov=0),
  dict(shape=(10, 13, 4), nl=4, seed=2, smooth=2, dtype=np.uint64,
       order="F", markov=0),
  dict(shape=(12, 12, 6), nl=6, seed=3, smooth=4, dtype=np.uint32,
       order="C", markov=0),
  dict(shape=(12, 12, 6), nl=6, seed=4, smooth=4, dtype=np.uint32,
       order="F", markov=3),
  dict(shape=(9, 9, 3), nl=300, seed=5, smooth=0, dtype=np.uint16,
       order="F", markov=0),
]


@pytest.mark.parametrize("cfg", CONFIGS)
def test_engines_agree(cfg):
  vol = random_volume(cfg["shape"], cfg["nl"], cfg["seed"],
                      cfg["smooth"], cfg["dtype"], cfg["order"])
  binary = crackle.compress(vol, markov_model_order=cfg["markov"])
  head = crackle.header(binary)
  sz = cfg["shape"][2]

  # numpy engine (native disabled by scope: exercise the pure path
  # by asking codec internals directly with engine numpy and the
  # native path removed from this call chain is hard; instead compare
  # native, numpy-fallback, and jax outputs)
  out_native = native.decompress_stream(
    binary, 0, sz, cfg["shape"], head.data_width, head.fortran_order
  )
  assert out_native is not None
  np.testing.assert_array_equal(out_native.view(vol.dtype), vol)

  # vectorized numpy path (bypasses native)
  from crackle_tpu.codec import _decode_slice_ccl, decode_markov_model
  from crackle_tpu import codec as codec_mod
  model = decode_markov_model(head, binary)
  codes = codec_mod.crack_codes(binary)
  from crackle_tpu.ops import labels as labels_ops
  lb = bytes(crackle.raw_labels(binary))
  sxy = head.sx * head.sy
  for z in range(sz):
    cc, N = _decode_slice_ccl(codes[z], head, model, None, z)
    lm = labels_ops.decode_flat(head, lb, z, z + 1, head.dtype)
    slab = lm[cc].reshape(head.sy, head.sx).T
    np.testing.assert_array_equal(slab, vol[:, :, z])

  # jax engine (CPU backend in tests)
  if cfg["markov"] == 0:
    out_jax = jax_engine.decode_window(binary, 0, sz)
    assert out_jax is not None
    np.testing.assert_array_equal(out_jax, vol)


def test_signed_stream_decode():
  """The format's signed bit: synthesize by header surgery and check
  the decoded view (the encoder rejects signed input, like the
  reference's python)."""
  vol = np.asfortranarray(
    np.random.RandomState(9).randint(0, 100, (8, 8, 3)).astype(np.uint32)
  )
  binary = crackle.compress(vol)
  head = crackle.header(binary)
  head.signed = True
  signed_binary = head.tobytes() + binary[head.header_bytes:]
  out = crackle.decompress(signed_binary)
  assert out.dtype == np.int32
  np.testing.assert_array_equal(out, vol.astype(np.int32))
  with pytest.raises(TypeError):
    crackle.compress(vol.astype(np.int32))
