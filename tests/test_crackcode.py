"""Unit tests for the crack-code layer: the vectorized decoder must
agree with a straightforward sequential oracle, and encode->decode must
reproduce the connectivity structure of the source slice."""
import numpy as np
import pytest

from crackle_tpu.ops import crackcode as cc
from crackle_tpu.ops.ccl import (
  connected_components_slice, color_connectivity_graph_slice,
)


def oracle_decode_vcg(code: bytes, sx: int, sy: int, permissible: bool):
  """Sequential reference decoder (mirrors crackcodes.hpp semantics):
  state machine symbol classification + stack-based replay."""
  base = 0 if permissible else 0b1111
  edges = np.full(sx * sy, base, dtype=np.uint8)
  if len(code) == 0:
    return edges
  index_size = 4 + int.from_bytes(code[:4], 'little')
  nodes = cc.read_boc_index(code, sx, sy)
  cps = cc.unpack_codepoints(code, index_size)

  sxe = sx + 1
  NONE = 255
  node_i = 0
  branches_taken = 0
  last_move = NONE
  symbols = []
  chains = []
  i = 0
  node = 0
  while i < len(cps):
    if branches_taken == 0:
      if node_i >= len(nodes):
        break
      node = nodes[node_i]
      node_i += 1
      branches_taken = 1
      continue
    move = int(cps[i])
    if (move ^ last_move) != 0b10:
      symbols.append('urdl'[move])
      last_move = move
    elif bin(move).count('1') != 1:
      symbols[-1] = 't'
      branches_taken -= 1
      last_move = NONE
    else:
      symbols[-1] = 'b'
      branches_taken += 1
      last_move = NONE
    if branches_taken == 0:
      chains.append((int(node), symbols))
      symbols = []
    i += 1

  def setbit(loc, bit):
    if permissible:
      edges[loc] |= bit
    else:
      edges[loc] &= 0b1111 ^ bit

  for node, syms in chains:
    y, x = divmod(node, sxe)
    revisit = []
    for s in syms:
      if s == 'u':
        if x > 0 and y > 0:
          setbit((x - 1) + sx * (y - 1), 0b0001)
        if y > 0:
          setbit(x + sx * (y - 1), 0b0010)
        y -= 1
      elif s == 'd':
        if x > 0:
          setbit((x - 1) + sx * y, 0b0001)
        setbit(x + sx * y, 0b0010)
        y += 1
      elif s == 'l':
        if x > 0 and y > 0:
          setbit((x - 1) + sx * (y - 1), 0b0100)
        if x > 0:
          setbit((x - 1) + sx * y, 0b1000)
        x -= 1
      elif s == 'r':
        if y > 0:
          setbit(x + sx * (y - 1), 0b0100)
        setbit(x + sx * y, 0b1000)
        x += 1
      elif s == 'b':
        revisit.append(x + sx * y)  # voxel-coord storage like reference
      elif s == 't':
        if revisit:
          loc = revisit.pop()
          y, x = divmod(loc, sx)
  return edges


def random_slice(sx, sy, num_labels, seed, smooth=0):
  rng = np.random.RandomState(seed)
  a = rng.randint(0, num_labels, size=(sy, sx)).astype(np.uint32)
  for _ in range(smooth):
    # grow regions to make it smoother
    shift = rng.randint(0, 2)
    if shift:
      a[1:, :] = np.where(rng.rand(sy - 1, sx) < 0.5, a[:-1, :], a[1:, :])
    else:
      a[:, 1:] = np.where(rng.rand(sy, sx - 1) < 0.5, a[:, :-1], a[:, 1:])
  return a.ravel()


CASES = [
  (8, 8, 2, 0, 0),
  (8, 8, 5, 1, 2),
  (16, 16, 2, 2, 0),
  (16, 16, 3, 3, 4),
  (32, 17, 7, 4, 3),
  (1, 1, 1, 5, 0),
  (5, 1, 2, 6, 0),
  (1, 7, 2, 7, 0),
  (33, 29, 2, 8, 6),
  (64, 64, 10, 9, 5),
]


@pytest.mark.parametrize("sx,sy,nl,seed,smooth", CASES)
@pytest.mark.parametrize("permissible", [True, False])
def test_vectorized_decoder_matches_oracle(sx, sy, nl, seed, smooth,
                                           permissible):
  labels = random_slice(sx, sy, nl, seed, smooth)
  chains = cc.create_crack_codes(labels, sx, sy, permissible)
  code = cc.pack_codepoints(chains, sx, sy)

  vcg_fast = cc.slice_code_to_vcg(code, sx, sy, permissible)
  vcg_oracle = oracle_decode_vcg(code, sx, sy, permissible)
  np.testing.assert_array_equal(vcg_fast, vcg_oracle)


@pytest.mark.parametrize("sx,sy,nl,seed,smooth", CASES)
@pytest.mark.parametrize("permissible", [True, False])
def test_roundtrip_structure(sx, sy, nl, seed, smooth, permissible):
  """encode->pack->decode->CCL must reproduce the source components."""
  labels = random_slice(sx, sy, nl, seed, smooth)
  chains = cc.create_crack_codes(labels, sx, sy, permissible)
  code = cc.pack_codepoints(chains, sx, sy)
  vcg = cc.slice_code_to_vcg(code, sx, sy, permissible)

  cc_src, n_src = connected_components_slice(labels, sx, sy)
  cc_dec, n_dec = color_connectivity_graph_slice(vcg, sx, sy)
  assert n_src == n_dec
  np.testing.assert_array_equal(cc_src, cc_dec)


def test_empty_slice_code_is_canonical():
  labels = np.zeros(64, dtype=np.uint32)
  chains = cc.create_crack_codes(labels, 8, 8, permissible=False)
  code = cc.pack_codepoints(chains, 8, 8)
  assert code == b'\x01\x00\x00\x00\x00'
  vcg = cc.slice_code_to_vcg(code, 8, 8, False)
  assert (vcg == 0b1111).all()
