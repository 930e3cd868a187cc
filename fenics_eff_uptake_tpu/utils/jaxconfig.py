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


def _sync_seed_cache(cache_dir):
    """Link shipped compiled-program seeds (.jax_seed_cache at the repo
    root) into the writable cache dir.

    The repo ships the XLA persistent-cache entries for its standard
    workloads (bench sweep, graft entry) the way other frameworks ship
    AOT-compiled kernels: a fresh environment then skips the 1-2 minutes
    of remote TPU compilation on first use.  Hardlink when possible
    (same filesystem, zero copy), fall back to copy; entries whose keys
    don't match this jax/libtpu build are simply never requested."""
    seed = os.environ.get(
        "FEU_JAX_SEED_CACHE",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))),
            ".jax_seed_cache"))
    if not os.path.isdir(seed) or os.path.realpath(seed) == \
            os.path.realpath(cache_dir):
        return
    import shutil
    for name in os.listdir(seed):
        dst = os.path.join(cache_dir, name)
        if os.path.exists(dst):
            continue
        src = os.path.join(seed, name)
        try:
            os.link(src, dst)
        except OSError:
            try:
                shutil.copy2(src, dst)
            except OSError:
                pass


def setup(x64=True, cache_dir=None):
    import jax
    if x64:
        jax.config.update("jax_enable_x64", True)
    cache_dir = cache_dir or os.environ.get("FEU_JAX_CACHE", _DEFAULT_CACHE)
    try:
        os.makedirs(cache_dir, exist_ok=True)
        _sync_seed_cache(cache_dir)
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
