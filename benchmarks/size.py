"""Compressed-size comparison across encoder settings (reference
parity: benchmarks/size.py): plain, pins, markov orders, and gzip of
each, per test pattern.

Usage: python benchmarks/size.py [--shape 256,256,64]
"""
import argparse
import gzip
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit('/', 2)[0])
import crackle_tpu as crackle
from perf import PATTERNS


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument("--shape", default="256,256,64")
  ap.add_argument("--patterns", default="connectomics,random_noise,empty")
  args = ap.parse_args()
  shape = tuple(int(s) for s in args.shape.split(","))

  print(f"shape={shape}")
  hdr = (f"{'pattern':16s} {'raw':>12s} {'ckl':>10s} {'ckl%':>8s} "
         f"{'pins':>10s} {'mkv5':>10s} {'ckl.gz':>10s}")
  print(hdr)

  for name in args.patterns.split(","):
    vol = PATTERNS[name](shape)
    plain = crackle.compress(vol)
    pins = crackle.compress(vol, allow_pins=1) if shape[2] > 1 else plain
    mkv = crackle.compress(vol, markov_model_order=5)
    gz = gzip.compress(plain, 6)
    print(f"{name:16s} {vol.nbytes:12d} {len(plain):10d} "
          f"{len(plain) / vol.nbytes:8.3%} {len(pins):10d} "
          f"{len(mkv):10d} {len(gz):10d}")


if __name__ == "__main__":
  main()
