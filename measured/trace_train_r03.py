"""Op-level xprof trace of the training step on the real TPU chip.

Captures a jax.profiler trace of K data-chained train steps (the same
step program bench.py times) and parses the resulting .xplane.pb with
tensorboard_plugin_profile to print a per-op time breakdown — the tool
for attributing the ~2.5-3 ms/step of "glue" (decoder, transposes,
fusion boundaries) that isolated-component profiles under-count.

Usage: python measured/trace_train_r03.py [batch] [logdir]
"""

import functools
import glob
import os
import sys

# the C++ protobuf in this image predates the plugin's generated code;
# the pure-python implementation parses it fine (set before any import)
os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from wiflow_tpu.core import jax_cache
jax_cache.enable_persistent_compilation_cache()

from wiflow_tpu.core.config import ModelConfig
from wiflow_tpu.models.wiflow import WiFlowPoseModel

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 256
LOGDIR = sys.argv[2] if len(sys.argv) > 2 else "/tmp/xprof_train"
CFG = ModelConfig()


def main():
    model = WiFlowPoseModel(CFG)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((BATCH, 540, 20)).astype(np.float32))
    y = jnp.asarray(rng.standard_normal((BATCH, 15, 2)).astype(np.float32))
    variables = jax.jit(functools.partial(model.init, train=False))(
        {"params": jax.random.key(0)}, x[:1])
    params, stats = variables["params"], variables.get("batch_stats", {})

    def step(params, stats):
        def loss_fn(p):
            out, mut = model.apply(
                {"params": p, "batch_stats": stats}, x, train=True,
                mutable=["batch_stats"],
                rngs={"dropout": jax.random.key(1)})
            loss = jnp.mean((out.astype(jnp.float32) - y) ** 2)
            return loss, mut["batch_stats"]
        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        new_p = jax.tree.map(lambda p, g: p - 1e-6 * g, params, grads)
        return new_p, new_stats, loss

    @jax.jit
    def run(params, stats):
        def body(c, _):
            p, s, _ = step(c[0], c[1])
            return (p, s), None
        (p, s), _ = jax.lax.scan(body, (params, stats), None, length=16)
        return jnp.sum(jax.tree.leaves(p)[0]) * 0

    # warm (compile) outside the trace
    float(run(params, stats))
    float(run(params, stats))

    jax.profiler.start_trace(LOGDIR)
    float(run(params, stats))
    jax.profiler.stop_trace()
    print(f"trace written to {LOGDIR}", flush=True)

    # ---- parse: per-op self-time table ---------------------------------
    planes = glob.glob(os.path.join(LOGDIR, "plugins/profile/*/*.xplane.pb"))
    if not planes:
        print("no xplane.pb found")
        return
    from tensorflow.python.profiler.internal import _pywrap_profiler_plugin
    for tool in ("framework_op_stats", "op_profile"):
        raw = _pywrap_profiler_plugin.xspace_to_tools_data(
            [planes[-1]], tool)
        data = raw[0]
        if isinstance(data, bytes):
            try:
                import gzip
                data = gzip.decompress(data)
            except OSError:
                pass
            data = data.decode("utf-8", errors="replace")
        out = os.path.join(LOGDIR, f"{tool}.json")
        with open(out, "w", encoding="utf-8") as fd:
            fd.write(data)
        print(f"{tool} -> {out} ({len(data)} bytes)")


if __name__ == "__main__":
    main()
