"""The wasm shim (wasm/crackle_wasm.cc) must round-trip when built
natively — emscripten is not in this image, but the shim is plain
C++; compiling it with g++ exercises the exact code the wasm build
ships (build_wasm.sh runs em++ over the same file)."""
import ctypes
import os
import subprocess
import tempfile

import numpy as np
import pytest

import crackle_tpu as crackle

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.path.join(REPO, "wasm", "crackle_wasm.cc")


@pytest.fixture(scope="module")
def shim():
  tmp = tempfile.mkdtemp(prefix="crackle_wasm_")
  so = os.path.join(tmp, "libcrackle_shim.so")
  res = subprocess.run(
    ["g++", "-O2", "-std=c++17", "-shared", "-fPIC", SRC, "-o", so],
    capture_output=True, text=True,
  )
  assert res.returncode == 0, res.stderr
  lib = ctypes.CDLL(so)
  i64 = ctypes.c_int64
  p = ctypes.c_void_p
  lib.crackle_query.restype = i64
  lib.crackle_query.argtypes = [p, i64, p]
  lib.crackle_compress.restype = i64
  lib.crackle_compress.argtypes = [
    p, ctypes.c_int32, i64, i64, i64, ctypes.POINTER(p)]
  lib.crackle_decompress.restype = i64
  lib.crackle_decompress.argtypes = [p, i64, p, i64]
  lib.crackle_free.restype = None
  lib.crackle_free.argtypes = [p]
  return lib


def _pt(a):
  return a.ctypes.data_as(ctypes.c_void_p)


def test_wasm_shim_roundtrip(shim):
  rng = np.random.RandomState(5)
  vol = rng.randint(0, 7, size=(19, 13, 4)).astype(np.uint32)
  for _ in range(4):
    axis = rng.randint(0, 3)
    m = rng.rand(*vol.shape) < 0.6
    vol = np.where(m, np.roll(vol, 1, axis=axis), vol)
  vol = np.asfortranarray(vol)
  flat = np.ascontiguousarray(vol.ravel(order="F"))

  out_ptr = ctypes.c_void_p()
  n = shim.crackle_compress(
    _pt(flat), 4, vol.shape[0], vol.shape[1], vol.shape[2],
    ctypes.byref(out_ptr))
  assert n > 0
  binary = ctypes.string_at(out_ptr, n)
  shim.crackle_free(out_ptr)

  # byte-identical to the python/native encoder
  assert binary == crackle.compress(vol)

  # header query
  q = np.zeros(5, np.int64)
  buf = np.frombuffer(binary, np.uint8)
  assert shim.crackle_query(_pt(buf), len(binary), _pt(q)) == 0
  assert tuple(q[:4]) == (19, 13, 4, 4)

  # decompress through the shim
  out = np.zeros(vol.size, np.uint32)
  rc = shim.crackle_decompress(_pt(buf), len(binary), _pt(out),
                               out.nbytes)
  assert rc == 0
  np.testing.assert_array_equal(
    out.reshape(vol.shape, order="F"), vol)


def test_wasm_shim_rejects_corruption(shim):
  vol = np.asfortranarray(
    np.arange(4 * 3 * 2, dtype=np.uint32).reshape(4, 3, 2))
  binary = bytearray(crackle.compress(vol))
  binary[40] ^= 0xFF  # corrupt past the header
  buf = np.frombuffer(bytes(binary), np.uint8)
  out = np.zeros(vol.size, np.uint32)
  rc = shim.crackle_decompress(_pt(buf), len(buf), _pt(out),
                               out.nbytes)
  assert rc < 0
