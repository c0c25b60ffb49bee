import os

# Tests must not depend on real TPU hardware: force JAX onto a virtual
# 8-device CPU mesh so sharding logic is exercised the same way the
# driver's multichip dry-run does. The environment pre-imports jax with
# the TPU platform (sitecustomize), so the env var alone is not enough;
# override the already-loaded config before any computation runs.
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
  os.environ["XLA_FLAGS"] = (
    xla_flags + " --xla_force_host_platform_device_count=8"
  ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
