#!/usr/bin/env python
"""Regenerate tests/golden/fixtures/*.ckl from the REFERENCE
implementation. Requires /root/reference (or $CRACKLE_REFERENCE) and
g++; run manually when the fixture matrix in volumes.py changes. The
test suite only READS the checked-in fixtures — it never needs the
reference or a compiler.

    python tests/golden/generate.py
"""
import json
import os
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from volumes import CASES, make_volume  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))
REF = os.environ.get('CRACKLE_REFERENCE', '/root/reference')
FIXDIR = os.path.join(HERE, 'fixtures')


def build_harness() -> str:
  exe = os.path.join(tempfile.gettempdir(), 'crackle_ref_harness')
  src = os.path.join(HERE, 'ref_harness.cpp')
  if (os.path.exists(exe)
      and os.path.getmtime(exe) > os.path.getmtime(src)):
    return exe
  cmd = [
    'g++', '-std=c++20', '-O2', '-msse4.2', '-mpclmul',
    '-I', os.path.join(REF, 'src'),
    '-I', os.path.join(REF, 'third_party', 'fastcrc'),
    src, '-o', exe,
  ]
  print(' '.join(cmd))
  subprocess.check_call(cmd)
  return exe


def main():
  exe = build_harness()
  os.makedirs(FIXDIR, exist_ok=True)
  manifest = []
  total = 0
  for name, spec, opts in CASES:
    vol = make_volume(spec)
    raw = vol.tobytes(order='F')
    sx, sy, sz = vol.shape
    ap = (1 if opts.get('allow_pins') else 0) \
      + (10 if opts.get('optimize_pins') else 0)
    ckl = os.path.join(FIXDIR, name + '.ckl')
    with tempfile.NamedTemporaryFile(suffix='.raw') as tf:
      tf.write(raw)
      tf.flush()
      subprocess.check_call([
        exe, 'compress', tf.name, ckl,
        str(vol.dtype.itemsize), str(sx), str(sy), str(sz),
        str(ap), str(opts.get('markov_model_order', 0)),
      ])
    # sanity: the reference round-trips its own stream
    with tempfile.NamedTemporaryFile(suffix='.raw') as tf:
      subprocess.check_call([exe, 'decompress', ckl, tf.name])
      tf.seek(0)
      assert tf.read() == raw, name
    size = os.path.getsize(ckl)
    total += size
    manifest.append(dict(name=name, spec=spec, opts=opts, bytes=size))
    print(f'{name}: {size} bytes')
  with open(os.path.join(FIXDIR, 'manifest.json'), 'w') as f:
    json.dump(manifest, f, indent=1)
  print(f'{len(CASES)} fixtures, {total} bytes total')


if __name__ == '__main__':
  main()
