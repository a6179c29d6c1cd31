"""Benchmark: WiFlow inference throughput on one TPU chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
Baseline target (BASELINE.md): > 50,000 CSI windows/sec/chip on v5e.

Timing note: under the axon remote runtime ``block_until_ready`` returns
before device completion, so naive wall-clock timing over-reports by >100x
(measured).  We therefore time K forward passes chained *inside one jitted
``lax.scan``* with a host fetch of a scalar, at two K values, and take the
slope — this methodology reproduces the v5e bf16 peak (196.6 TFLOP/s) on a
calibration matmul.
"""

import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def timed_scan_sec(op, x0, k: int, reps: int = 3) -> float:
    """Wall-clock of k data-chained iterations of op inside one jit."""
    @jax.jit
    def run(x):
        def body(c, _):
            return op(c), None
        out, _ = jax.lax.scan(body, x, None, length=k)
        return jnp.sum(out[:1, :1])
    float(run(x0))  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(run(x0))
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    from wiflow_tpu.core.config import ModelConfig
    from wiflow_tpu.models.fast import fast_forward
    from wiflow_tpu.models.wiflow import WiFlowPoseModel

    cfg = ModelConfig()  # bf16 compute
    model = WiFlowPoseModel(cfg)
    batch = 4096
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((batch, 540, 20)).astype(np.float32))
    variables = jax.jit(functools.partial(model.init, train=False))(
        {"params": jax.random.key(0)}, x[:1])

    def op(xc):
        out = fast_forward(variables, xc, cfg)
        return xc + 0.0 * jnp.sum(out)   # chain iterations

    k_lo, k_hi = 4, 24
    t_lo = timed_scan_sec(op, x, k_lo)
    t_hi = timed_scan_sec(op, x, k_hi)
    per_batch = (t_hi - t_lo) / (k_hi - k_lo)

    wps = batch / per_batch
    print(json.dumps({
        "metric": "csi_windows_per_sec_per_chip",
        "value": round(wps, 1),
        "unit": "windows/sec/chip",
        "vs_baseline": round(wps / 50_000.0, 2),
    }))


if __name__ == "__main__":
    main()
