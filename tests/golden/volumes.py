"""Deterministic test volumes shared by the golden-fixture generator
and tests/test_golden.py.

Both sides regenerate the SAME arrays from seeds, so only the
reference-produced .ckl bytes need to be checked in — the raw inputs
are reproducible. Patterns mirror the reference's own test corpus
(automated_test.py: random small-alphabet, uniform, arange/distinct,
binary noise) plus a smooth connectomics-like field that favors the
pins label format (crackle.hpp:48-55 picks pins when most voxel pairs
match).
"""
import numpy as np


def random_labels(seed, sx, sy, sz, hi, dtype):
  """Small-alphabet random labels (many components per slice)."""
  rng = np.random.RandomState(seed)
  return np.asfortranarray(
    rng.randint(0, hi, size=(sx, sy, sz)).astype(dtype))


def binary_noise(seed, sx, sy, sz, dtype):
  """Pathological binary noise (densest crack code)."""
  rng = np.random.RandomState(seed)
  return np.asfortranarray(
    (rng.rand(sx, sy, sz) > 0.5).astype(dtype))


def smooth_blobs(seed, sx, sy, sz, n_seeds, dtype):
  """Voronoi-ish smooth segmentation: nearest of n random seed points,
  labels sparse in value space. Mimics connectomics cutouts; mostly
  equal neighbor pairs, so the reference chooses pins when allowed."""
  rng = np.random.RandomState(seed)
  pts = np.stack([
    rng.randint(0, sx, n_seeds),
    rng.randint(0, sy, n_seeds),
    rng.randint(0, sz, n_seeds),
  ], axis=1).astype(np.float32)
  vals = (rng.randint(1, 2 ** 31, n_seeds)).astype(np.uint64)
  xs, ys, zs = np.meshgrid(
    np.arange(sx, dtype=np.float32),
    np.arange(sy, dtype=np.float32),
    np.arange(sz, dtype=np.float32) * 2.0,  # anisotropic in z
    indexing='ij')
  best = np.full((sx, sy, sz), np.inf, np.float32)
  lab = np.zeros((sx, sy, sz), np.uint64)
  for i in range(n_seeds):
    d = ((xs - pts[i, 0]) ** 2 + (ys - pts[i, 1]) ** 2
         + (zs - pts[i, 2] * 2.0) ** 2)
    take = d < best
    best = np.where(take, d, best)
    lab = np.where(take, vals[i], lab)
  return np.asfortranarray(lab.astype(dtype))


def uniform(value, sx, sy, sz, dtype):
  return np.asfortranarray(np.full((sx, sy, sz), value, dtype))


def arange_vol(sx, sy, sz, dtype):
  """Every voxel distinct (worst case for the label dictionary)."""
  return np.asfortranarray(
    np.arange(sx * sy * sz, dtype=dtype).reshape(sx, sy, sz, order='F'))


def make_volume(spec: dict) -> np.ndarray:
  kind = spec['kind']
  dtype = np.dtype(spec['dtype'])
  if kind == 'random':
    return random_labels(spec['seed'], *spec['shape'], spec['hi'], dtype)
  if kind == 'noise':
    return binary_noise(spec['seed'], *spec['shape'], dtype)
  if kind == 'smooth':
    return smooth_blobs(spec['seed'], *spec['shape'], spec['n_seeds'], dtype)
  if kind == 'uniform':
    return uniform(spec['value'], *spec['shape'], dtype)
  if kind == 'arange':
    return arange_vol(*spec['shape'], dtype)
  raise ValueError(kind)


# The fixture matrix: (name, volume spec, compress options).
# Options mirror the reference compress() signature
# (crackle.hpp:220-257): allow_pins, markov_model_order, optimize_pins.
CASES = [
  # flat, varying dtype and markov order
  ('rand_u8_m0', dict(kind='random', seed=1, shape=(40, 36, 9), hi=12,
                      dtype='uint8'), dict()),
  ('rand_u16_m0', dict(kind='random', seed=2, shape=(33, 47, 8), hi=300,
                       dtype='uint16'), dict()),
  ('rand_u32_m0', dict(kind='random', seed=3, shape=(48, 48, 12), hi=40,
                       dtype='uint32'), dict()),
  ('rand_u64_m0', dict(kind='random', seed=4, shape=(48, 48, 12), hi=40,
                       dtype='uint64'), dict()),
  ('rand_u32_m1', dict(kind='random', seed=5, shape=(48, 48, 12), hi=40,
                       dtype='uint32'), dict(markov_model_order=1)),
  ('rand_u32_m3', dict(kind='random', seed=6, shape=(48, 48, 12), hi=40,
                       dtype='uint32'), dict(markov_model_order=3)),
  ('rand_u32_m5', dict(kind='random', seed=7, shape=(48, 48, 12), hi=40,
                       dtype='uint32'), dict(markov_model_order=5)),
  ('rand_u32_m7', dict(kind='random', seed=8, shape=(40, 40, 10), hi=25,
                       dtype='uint32'), dict(markov_model_order=7)),
  # pins (smooth volumes so the pins branch actually triggers)
  ('smooth_u32_pins', dict(kind='smooth', seed=9, shape=(40, 40, 16),
                           n_seeds=30, dtype='uint32'),
   dict(allow_pins=1)),
  ('smooth_u64_pins_opt', dict(kind='smooth', seed=10, shape=(36, 36, 14),
                               n_seeds=24, dtype='uint64'),
   dict(allow_pins=1, optimize_pins=True)),
  ('smooth_u32_pins_m3', dict(kind='smooth', seed=11, shape=(40, 40, 12),
                              n_seeds=28, dtype='uint32'),
   dict(allow_pins=1, markov_model_order=3)),
  # smooth but pins DISALLOWED -> impermissible cracks never happen;
  # exercises permissible+flat on a smooth field
  ('smooth_u32_flat', dict(kind='smooth', seed=12, shape=(40, 40, 12),
                           n_seeds=28, dtype='uint32'), dict()),
  # edge cases
  ('noise_u8', dict(kind='noise', seed=13, shape=(64, 64, 4),
                    dtype='uint8'), dict()),
  ('noise_u8_m5', dict(kind='noise', seed=14, shape=(48, 48, 4),
                       dtype='uint8'), dict(markov_model_order=5)),
  ('uniform_u32', dict(kind='uniform', value=77, shape=(32, 32, 8),
                       dtype='uint32'), dict()),
  ('zeros_u16', dict(kind='uniform', value=0, shape=(32, 32, 8),
                     dtype='uint16'), dict()),
  ('arange_u32', dict(kind='arange', shape=(24, 24, 6),
                      dtype='uint32'), dict()),
  ('single_slice_u32', dict(kind='random', seed=15, shape=(51, 37, 1),
                            hi=20, dtype='uint32'), dict()),
]
