import os

# Tests must not depend on real TPU hardware: run JAX on a virtual
# 8-device CPU mesh so sharding logic is exercised the same way the
# driver's multichip dry-run does.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
  os.environ["XLA_FLAGS"] = (
    xla_flags + " --xla_force_host_platform_device_count=8"
  ).strip()
