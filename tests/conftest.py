"""Test harness: run JAX on a virtual 8-device CPU mesh.

Must set the env vars before jax initializes so multi-device sharding tests
(SURVEY.md §4 implication list) work without TPU hardware.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags += " --xla_force_host_platform_device_count=8"
if "collective_call_terminate" not in flags:
    # 8 virtual devices share one core: raise XLA:CPU's 40 s collective
    # rendezvous termination so a straggler device thread can't abort
    # the suite (see __graft_entry__._force_cpu_mesh)
    flags += (" --xla_cpu_collective_call_warn_stuck_timeout_seconds=120"
              " --xla_cpu_collective_call_terminate_timeout_seconds=900")
os.environ["XLA_FLAGS"] = flags.strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The axon TPU plugin (loaded by sitecustomize) force-selects
# jax_platforms="axon,cpu" via jax.config, which overrides the env var —
# override it back before any backend is initialized.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# persistent compilation cache: the suite is compile-bound on this 1-core
# box; repeated runs (CI retries, judge batches) hit the cache.  The
# host-CPU fingerprint suffix guards against VM migrations: XLA:CPU
# caches ahead-of-time machine code, and loading another host's blobs
# aborts (see wiflow_tpu/core/jax_cache.py).
from wiflow_tpu.core.jax_cache import host_fingerprint  # noqa: E402

_cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          ".jax_cache", host_fingerprint())
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def eight_devices():
    devices = jax.devices()
    if len(devices) < 8:
        pytest.skip("needs 8 virtual devices")
    return devices[:8]
