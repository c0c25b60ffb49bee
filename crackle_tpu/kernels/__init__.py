"""TPU kernels: Pallas/XLA decode + encode building blocks.

On import, enables JAX's persistent compilation cache (unless the user
already configured one, or CRACKLE_TPU_NO_COMPILE_CACHE is set): cold
Mosaic compiles of the replay/CCL kernels take minutes over a remote
TPU tunnel, and every process would otherwise pay that again.
"""
import os as _os


def _enable_compile_cache():
  if _os.environ.get("CRACKLE_TPU_NO_COMPILE_CACHE"):
    return
  try:
    import jax
    if jax.config.jax_compilation_cache_dir:
      return  # user already configured one
    cache = _os.environ.get(
      "JAX_COMPILATION_CACHE_DIR",
      _os.path.join(_os.path.expanduser("~"), ".cache", "jax_crackle"))
    _os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    # cache even fast-compiling programs: dispatch dominates over a
    # remote tunnel, not compile time
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
  except Exception:
    pass


_enable_compile_cache()

from . import decode, engine
