"""Hardware test lane: these tests run the Mosaic-COMPILED kernels on
a real TPU. They exist because interpreter mode is not a Mosaic proxy
— round 3 shipped a chunked replay that was byte-correct interpreted
and wrong compiled (40/512 slices at 512^2), and the CPU-forced main
suite could not see it.

Run with:  python -m pytest tests_tpu/ -x -q      (needs a TPU)

The main suite under tests/ force-pins CPU (tests/conftest.py) so CI
stays hermetic; this lane is the shipping-configuration complement,
the analog of the reference testing every path in the configuration
it ships (.github/workflows/test.yml:20-56)."""
import os

import pytest

# do NOT force a platform: we want whatever real accelerator the
# environment provides. sitecustomize may pre-select the tunnel.


def pytest_collection_modifyitems(config, items):
  import jax
  try:
    backend = jax.default_backend()
  except Exception:  # noqa: BLE001
    backend = "none"
  if backend != "tpu":
    skip = pytest.mark.skip(
      reason=f"tests_tpu/ needs a real TPU (backend: {backend})")
    for item in items:
      item.add_marker(skip)
