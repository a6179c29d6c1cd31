"""Epoch-time probe: XLA vs stage-fused train paths on the real chip.

Times 3 epochs of the full train step (fwd+bwd+AdamW, batch 256) at a
given lowering combination — the verification/measurement tool for
flipping ModelConfig.tcn_train_impl / conv_train_impl to 'auto'.

Usage: python measured/probe_train_impls.py [tcn_impl] [conv_impl] [n]
(run from the repo root; tcn/conv impls: 'xla' | 'auto' | 'fused')
"""
import sys as _sys
_sys.path.insert(0, ".")
import sys, time
import numpy as np
import jax, jax.numpy as jnp

from wiflow_tpu.core import jax_cache
jax_cache.enable_persistent_compilation_cache()
from wiflow_tpu.core.config import ModelConfig, OptimConfig
from wiflow_tpu.models.wiflow import WiFlowPoseModel
from wiflow_tpu.parallel.mesh import make_mesh, batch_sharding, replicate
from wiflow_tpu.train.optim import make_optimizer
from wiflow_tpu.train.steps import TrainState, create_train_state, make_batch_indices, make_step_fns

tcn_impl = sys.argv[1] if len(sys.argv) > 1 else "auto"
conv_impl = sys.argv[2] if len(sys.argv) > 2 else "auto"
n = int(sys.argv[3]) if len(sys.argv) > 3 else 64_000
batch = 256

cfg = ModelConfig(tcn_train_impl=tcn_impl, conv_train_impl=conv_impl)
model = WiFlowPoseModel(cfg)
mesh = make_mesh(1)
tx = make_optimizer(OptimConfig())

rng = np.random.default_rng(0)
x_np = rng.standard_normal((n, 540, 20)).astype(np.float32)
y_np = (rng.standard_normal((n, 15, 2)) * 0.1).astype(np.float32)
sh = batch_sharding(mesh)
x = jax.device_put(jnp.asarray(x_np, jnp.bfloat16), sh)
y = jax.device_put(jnp.asarray(y_np), sh)
print("staged", flush=True)

train_epoch, _ = make_step_fns(model, tx, mesh=mesh, scan=True)
state = create_train_state(model, tx, x[:1])
state = TrainState(*replicate(mesh, tuple(state)))
key = jax.random.key(0)
idx = make_batch_indices(n, batch)
print(f"steps/epoch: {idx.shape[0]}", flush=True)

for ep in range(3):
    t0 = time.time()
    state, m = train_epoch(state, x, y, idx, jax.random.fold_in(key, ep), False)
    m = jax.device_get(m)
    print(f"[tcn={tcn_impl},conv={conv_impl}] epoch {ep}: "
          f"{time.time()-t0:.2f}s loss {float(m['loss']):.4f}", flush=True)
