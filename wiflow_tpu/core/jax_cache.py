"""Persistent XLA compilation cache for CLI entries and benches.

Full-size train-step compiles cost 1-3 minutes on the chip; every CLI
process (and every relaunch in the kill/resume flow) would pay them
again.  The cache keys include backend, topology, and program hash, so
sharing one directory across entry points is safe.  Tests keep their own
cache (tests/conftest.py).
"""

from __future__ import annotations

import os


def enable_persistent_compilation_cache(path: str | None = None) -> str:
    import jax

    path = path or os.environ.get(
        "WIFLOW_JAX_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "wiflow_tpu_jax"))
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    return path
