"""Scatter via one-hot matmuls on the MXU.

XLA scatters on TPU execute at ~77M updates/s; a batched scatter of
2M indices costs ~25ms. The same operation phrased as a one-hot
matmul rides the systolic array: decompose each flat index into
(hi, lo) = (idx // LO, idx % LO), build bf16 one-hot chunks and
compute out[b, hi, lo] = sum_i w[b,i] * [hi_i==hi] * [lo_i==lo] as a
batched dot_general with f32 accumulation — hundreds of GMACs run in
single-digit milliseconds.

Exactness: one-hots are 0/1 (exact in bf16); weights must be exact in
bf16 (use ±1/0 and scale outside, or split a value into bf16-exact
parts); f32 accumulation is exact while every partial sum stays an
integer below 2^24. Out-of-range indices (negative or >= n_bins)
produce all-zero one-hot rows, so dropping is free.

This is the TPU-native replacement for the reference's pointer-walk
writes into slice rasters (crackcodes.hpp:706-862 paints VCG bits by
following positions; here the whole batch of edge indices lands in
one matmul).
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np


def _ceil_to(x: int, m: int) -> int:
  return -(-x // m) * m


def _pick_lo(n_bins: int) -> int:
  """Lane dimension of the output tile; 128-multiple, near sqrt."""
  if n_bins <= 128 * 128:
    return 128
  if n_bins <= 512 * 512:
    return 512
  return 1024


def scatter_add_multi(idx, ws, n_bins: int, chunk: int = 2048,
                      lo_dim: int = 0):
  """Batched multi-channel scatter-add on the MXU.

  out[k][b, idx[b, i]] += ws[k][b, i]   for each weight channel k.

  idx: (B, N) int32; entries outside [0, n_bins) are dropped.
  ws:  tuple of (B, N) arrays. Every weight must be an integer with
       |w| <= 256 (bf16-exact); per-bin sums must stay below 2^24.
  Returns tuple of (B, n_bins) int32.

  All channels share the hi one-hot; the weighted lo one-hots are
  concatenated along lanes so the whole call is one matmul chain.
  Call inside jit (shapes must be static).
  """
  K = len(ws)
  B, N = idx.shape
  LO = lo_dim or _pick_lo(n_bins)
  HI = _ceil_to(n_bins, LO) // LO
  chunk = min(chunk, N)
  C = -(-N // chunk)
  pad = C * chunk - N
  if pad:
    idx = jnp.pad(idx, ((0, 0), (0, pad)), constant_values=-1)
    ws = tuple(jnp.pad(w, ((0, 0), (0, pad))) for w in ws)
  hi = idx // LO
  lo = idx - hi * LO
  # out-of-range bins -> hi outside [0, HI): one-hot row all zero
  hi = jnp.where((idx < 0) | (idx >= n_bins), -1, hi)

  hi_c = hi.reshape(B, C, chunk).transpose(1, 0, 2)
  lo_c = lo.reshape(B, C, chunk).transpose(1, 0, 2)
  ws_c = jnp.stack(
    [w.reshape(B, C, chunk).transpose(1, 0, 2) for w in ws], axis=-1
  )  # (C, B, chunk, K)

  iota_h = jnp.arange(HI, dtype=jnp.int32)
  iota_l = jnp.arange(LO, dtype=jnp.int32)

  def body(acc, xs):
    h, l, ww = xs  # (B, chunk) / (B, chunk, K)
    A = (h[:, :, None] == iota_h[None, None, :]).astype(jnp.bfloat16)
    onehot_l = (l[:, :, None] == iota_l[None, None, :])
    Bm = (onehot_l[:, :, :, None].astype(jnp.bfloat16)
          * ww[:, :, None, :].astype(jnp.bfloat16))
    Bm = Bm.reshape(Bm.shape[0], Bm.shape[1], LO * K)
    out = jax.lax.dot_general(
      A, Bm, (((1,), (1,)), ((0,), (0,))),
      preferred_element_type=jnp.float32,
    )  # (B, HI, LO*K)
    return acc + out, None

  acc0 = jnp.zeros((B, HI, LO * K), jnp.float32)
  acc, _ = jax.lax.scan(body, acc0, (hi_c, lo_c, ws_c))
  acc = acc.reshape(B, HI, LO, K)
  outs = []
  for k in range(K):
    outs.append(
      acc[:, :, :, k].astype(jnp.int32).reshape(B, HI * LO)[:, :n_bins]
    )
  return tuple(outs)


def scatter_presence(idx, n_bins: int, chunk: int = 2048,
                     lo_dim: int = 0):
  """Batched presence: out[b, j] = any(idx[b, i] == j) (call in jit).

  idx: (B, N) int32; entries outside [0, n_bins) are dropped.
  Returns (B, n_bins) bool.
  """
  w = jnp.ones(idx.shape, jnp.int32)
  (counts,) = scatter_add_multi(idx, (w,), n_bins=n_bins,
                                chunk=chunk, lo_dim=lo_dim)
  return counts > 0
