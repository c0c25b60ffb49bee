"""Regression cases ported from the reference's automated_test.py."""
import numpy as np
import pytest

import crackle_tpu as crackle


def test_spurious_branch_elimination():
  """automated_test.py:907-934: looped paths through visited branch
  points must round-trip after the spurious-branch fixup."""
  arr = np.array([
    [0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
    [0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
    [0, 0, 1, 1, 2, 2, 0, 0, 0, 0],
    [0, 0, 1, 1, 2, 2, 0, 0, 0, 0],
    [0, 0, 4, 4, 3, 3, 0, 0, 0, 0],
    [0, 0, 4, 4, 3, 3, 0, 0, 0, 0],
    [0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
    [0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
    [0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
  ], dtype=np.uint8).T

  binary = crackle.compress(arr)
  recovered = crackle.decompress(binary)[:, :, 0]
  np.testing.assert_array_equal(recovered, arr)

  arr = np.array([
    [0, 139, 139, 139, 139],
    [0, 139, 0, 139, 139],
    [0, 161, 0, 0, 161],
    [161, 161, 161, 161, 161],
  ], dtype=np.uint8).T
  binary = crackle.compress(arr)
  recovered = crackle.decompress(binary)[:, :, 0]
  np.testing.assert_array_equal(recovered, arr)


def test_bounding_boxes_vs_scipy():
  """automated_test.py:876-906: scipy.ndimage.find_objects oracle."""
  import scipy.ndimage
  rng = np.random.RandomState(5)
  labels = rng.randint(1, 8, size=(12, 11, 5)).astype(np.uint32)
  for _ in range(3):
    ax = rng.randint(0, 3)
    labels = np.where(rng.rand(*labels.shape) < 0.6,
                      np.roll(labels, 1, axis=ax), labels)
  labels = np.asfortranarray(labels)
  binary = crackle.compress(labels)

  ckl_slices = crackle.bounding_boxes(binary)
  scipy_slices = scipy.ndimage.find_objects(labels)
  for i, slc in enumerate(scipy_slices):
    if slc is None:
      continue
    assert ckl_slices[i + 1] == slc


def test_centroids_vs_scipy():
  import scipy.ndimage
  rng = np.random.RandomState(6)
  labels = np.asfortranarray(
    rng.randint(0, 6, size=(9, 9, 4)).astype(np.uint32)
  )
  binary = crackle.compress(labels)
  cents = crackle.centroids(binary)
  for lbl in np.unique(labels):
    com = scipy.ndimage.center_of_mass(labels == lbl)
    np.testing.assert_allclose(cents[int(lbl)], com, atol=1e-9)


def test_full_volume_all_same_bytes_stable():
  """full() must be deterministic and self-consistent."""
  a = crackle.full((7, 5, 3), 9, dtype=np.uint16, order="F")
  b = crackle.full((7, 5, 3), 9, dtype=np.uint16, order="F")
  assert a == b
  out = crackle.decompress(a)
  np.testing.assert_array_equal(
    out, np.full((7, 5, 3), 9, dtype=np.uint16)
  )


def test_compress_order_flag_tracks_input():
  arr_f = np.asfortranarray(np.ones((4, 5, 6), dtype=np.uint32))
  arr_c = np.ascontiguousarray(arr_f)
  assert crackle.header(crackle.compress(arr_f)).fortran_order
  assert not crackle.header(crackle.compress(arr_c)).fortran_order


def test_asfortran_ascontiguous_cycle():
  arr = np.asfortranarray(
    np.random.RandomState(0).randint(0, 5, (6, 6, 3)).astype(np.uint32)
  )
  binary = crackle.compress(arr)
  b2 = crackle.asfortranarray(binary)
  assert binary == b2
  b2 = crackle.ascontiguousarray(binary)
  assert binary != b2
  head = crackle.header(b2)
  assert head.fortran_order is False
  out = crackle.decompress(b2)
  assert out.flags.c_contiguous
  np.testing.assert_array_equal(out, arr)
  assert crackle.asfortranarray(b2) == binary


def test_header_details_smoke():
  binary = crackle.compress(np.zeros((3, 3, 3), dtype=np.uint32))
  head = crackle.header(binary)
  text = head.details()
  assert 'crkl' in text and 'FLAT' in text


def test_num_labels_minimal_read(tmp_path):
  from crackle_tpu.util import load_num_labels, load_header
  arr = np.asfortranarray(
    np.random.RandomState(1).randint(0, 17, (8, 8, 4)).astype(np.uint32)
  )
  binary = crackle.compress(arr)
  p = str(tmp_path / "t.ckl")
  with open(p, 'wb') as f:
    f.write(binary)
  assert load_num_labels(p) == len(np.unique(arr))
  head = load_header(p)
  assert (head.sx, head.sy, head.sz) == (8, 8, 4)


def test_point_cloud_label0_skips_background():
  """skip_background (default True) applies even with an explicit
  label list (operations.hpp:236 applies it unconditionally)."""
  vol = np.asfortranarray(
    np.random.RandomState(3).randint(0, 4, (16, 16, 4)).astype(np.uint32))
  binary = crackle.compress(vol)
  assert len(crackle.point_cloud(binary, label=0)) == 0
  assert len(crackle.point_cloud(binary, label=0,
                                 skip_background=False)) > 0


def test_device_array_host_fallback_keeps_forder():
  """A jax-array input that falls back to the host encode path must
  carry the same fortran_order=True convention as the device path."""
  import jax.numpy as jnp
  vol = np.asfortranarray(
    np.random.RandomState(4).randint(0, 6, (12, 12, 4)).astype(np.uint32))
  b = crackle.compress(jnp.asarray(vol))
  assert crackle.header(b).fortran_order
  out = crackle.decompress(b)
  assert out.flags.f_contiguous
  np.testing.assert_array_equal(out, vol)
