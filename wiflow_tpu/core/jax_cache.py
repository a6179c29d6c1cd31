"""Persistent XLA compilation cache for CLI entries and benches.

Full-size train-step compiles cost 1-3 minutes on the chip; every CLI
process (and every relaunch in the kill/resume flow) would pay them
again.  The cache keys include backend, topology, and program hash, so
sharing one directory across entry points is safe.  Tests keep their own
cache (tests/conftest.py).

The directory is suffixed with a host-CPU fingerprint: XLA:CPU stores
ahead-of-time machine code keyed only by the program, so a cache written
on one VM generation aborts (SIGILL-class) when loaded after a migration
to a host with different CPU features — observed live when this repo's
VM migrated mid-round.  A fresh fingerprint = a fresh, safe cache.
"""

from __future__ import annotations

import hashlib
import os


def host_fingerprint() -> str:
    """Short hash of the host CPU feature flags (stable per machine)."""
    try:
        with open("/proc/cpuinfo", "r", encoding="utf-8") as fd:
            for line in fd:
                if line.startswith(("flags", "Features")):
                    return hashlib.sha256(
                        line.encode()).hexdigest()[:12]
    except OSError:
        pass
    return "nohost"


def honor_platform_env() -> None:
    """Make ``JAX_PLATFORMS=cpu`` work under platform plugins that
    force-select themselves via ``jax.config`` at interpreter start
    (the axon TPU relay does: sitecustomize sets
    ``jax_platforms='axon,cpu'``, which overrides the env var).  Called
    from every CLI entry before the first backend touch, so CPU-forced
    runs — tests, measured artifacts while the chip is down, judge
    re-runs — behave as the env var says."""
    env = os.environ.get("JAX_PLATFORMS")
    if not env:
        return
    import jax

    if jax.config.jax_platforms != env:
        jax.config.update("jax_platforms", env)


def enable_persistent_compilation_cache(path: str | None = None) -> str:
    import jax

    honor_platform_env()
    base = path or os.environ.get(
        "WIFLOW_JAX_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "wiflow_tpu_jax"))
    path = os.path.join(base, host_fingerprint())
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    return path
