"""JAX runtime configuration helpers.

The axon TPU runtime compiles slowly (minutes for large fori_loop bodies),
so the persistent compilation cache matters: enable it process-wide before
the first jit dispatch.  Studies, bench.py and the graft entry all call
``setup()``.
"""

from __future__ import annotations

import os

__all__ = ["setup"]

_DEFAULT_CACHE = os.path.join(os.path.expanduser("~"), ".cache",
                              "feu_tpu_jax_cache")


def setup(x64=True, cache_dir=None):
    import jax
    if x64:
        jax.config.update("jax_enable_x64", True)
    cache_dir = cache_dir or os.environ.get("FEU_JAX_CACHE", _DEFAULT_CACHE)
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # cache EVERY compile: with the axon remote compiler even sub-1s
        # compiles cost seconds of round-trip, and the eager assembly
        # path issues dozens of them -- measured 30-150s per fresh
        # process before this was set to 0
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          0.0)
    except Exception:
        pass
    return jax
