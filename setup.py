"""Wheel build: compile the native host helper (crackle_native.so)
into the package so installed wheels skip the lazy first-import g++
build. The library is a plain C-ABI shared object loaded via ctypes
(no Python headers), so we drive the compiler directly rather than
using Extension; if no toolchain is present the wheel still works —
native/__init__.py falls back to the pure numpy paths.

Reference equivalent: setup.py:10-39 (Pybind11Extension + arch flags)
+ .github/workflows/build_wheels.yml (cibuildwheel matrix).
"""
import os
import subprocess
import sys

from setuptools import setup
from setuptools.command.build_py import build_py


class BuildNative(build_py):
  def run(self):
    super().run()
    src = os.path.join("crackle_tpu", "native", "crackle_native.cpp")
    if not os.path.exists(src):
      return
    out_dir = os.path.join(self.build_lib, "crackle_tpu", "native")
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, "crackle_native.so")
    cxx = os.environ.get("CXX", "g++")
    # portable flags for redistributable wheels (the lazy in-place
    # build uses -march=native instead)
    cmd = [cxx, "-O3", "-shared", "-fPIC", "-std=c++17", src, "-o", out]
    if sys.platform == "darwin":
      cmd.insert(1, "-undefined")
      cmd.insert(2, "dynamic_lookup")
    try:
      res = subprocess.run(cmd, capture_output=True, timeout=600)
      if res.returncode != 0:
        self.warn(
          f"native build failed (wheel stays pure-python): "
          f"{res.stderr.decode(errors='replace')[:500]}")
    except Exception as e:  # noqa: BLE001
      self.warn(f"native build skipped: {e}")


setup(cmdclass={"build_py": BuildNative})
