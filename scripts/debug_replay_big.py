"""Bisect the replay_big Pallas pipeline on real TPU hardware.

Runs the chunked replay stage by stage on known-bad slices of the
canonical 512^3 bench stream, once Mosaic-compiled and once in
interpreter mode (same process, same backend — interpret lowers to
plain XLA ops), and reports the first stage whose outputs diverge.

Usage: python scripts/debug_replay_big.py [z ...]
"""
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from crackle_tpu import codec as _codec
from crackle_tpu.headers import CrackFormat
from crackle_tpu.kernels import engine, replay_big, ccl_pallas

BENCH = os.path.join(os.path.dirname(__file__), "..", "bench_data",
                     "connectomics_v2_512x512x512.ckl")


def run(stash_interpret, zs):
  binary = open(BENCH, "rb").read()
  head = _codec.header(binary)
  permissible = head.crack_format == CrackFormat.PERMISSIBLE

  # pad every slice to the full volume's CAP so the kernel runs in the
  # same mode ("mid" at CAP=65536) the bench uses
  full = engine.prepare_slice_inputs(binary, 0, head.sz)
  CAP_B = full["packed"].shape[1]
  packed = full["packed"][zs]
  nbytes = full["nbytes"][zs]
  nodes = full["nodes"][zs]
  n_chains = full["n_chains"][zs]
  print(f"CAP={CAP_B * 4} CAP_CH={nodes.shape[1]} "
        f"nbytes={nbytes.tolist()}", file=sys.stderr)

  results = {}
  for tag, interp in (("compiled", False), ("interp", True)):
    old = ccl_pallas.INTERPRET
    ccl_pallas.INTERPRET = interp
    try:
      stash = {}
      vcg = replay_big.replay_vcg_i32_big(
        jnp.asarray(packed), jnp.asarray(nbytes), jnp.asarray(nodes),
        jnp.asarray(n_chains), head.sx, head.sy, permissible,
        stash=stash)
      flat = {}
      for k, v in stash.items():
        if isinstance(v, (list, tuple)):
          for i, vi in enumerate(v):
            flat[f"{k}[{i}]"] = np.asarray(vi)
        else:
          flat[k] = np.asarray(v)
      flat["vcg"] = np.asarray(vcg)
      results[tag] = flat
      print(f"{tag}: done", file=sys.stderr)
    finally:
      ccl_pallas.INTERPRET = old

  # host oracle: the pure-python replay (ops/crackcode.py)
  from crackle_tpu.ops import crackcode as cc_ops
  codes = _codec.crack_codes(binary)
  for i, z in enumerate(zs):
    want = cc_ops.slice_code_to_vcg(
      codes[z], head.sx, head.sy, permissible)
    for tag in results:
      got = results[tag]["vcg"][i]
      n = int((got.ravel() != want.ravel()).sum())
      status = "OK " if n == 0 else "BAD"
      print(f"  {status} vcg[{tag}] z={z} diffs-vs-host-oracle={n}")

  order = [k for k in results["interp"]]
  bad = False
  for k in order:
    a = results["compiled"][k]
    b = results["interp"][k]
    if np.array_equal(a, b):
      print(f"  OK   {k} shape={a.shape}")
    else:
      n = int((a != b).sum())
      idx = np.argwhere(a != b)
      bad = True
      print(f"  DIFF {k} shape={a.shape} n={n} "
            f"first@{idx[0].tolist()} "
            f"compiled={a[tuple(idx[0])]} interp={b[tuple(idx[0])]}")
      # per-slice breakdown
      per = [(int(z), int((a[i] != b[i]).sum()))
             for i, z in enumerate(zs)]
      print(f"       per-slice diffs: {per}")
  if not bad:
    print("all stages identical (compiled == interp)")


if __name__ == "__main__":
  zs = [int(a) for a in sys.argv[1:]] or [0, 14, 17, 20]
  run(True, zs)
