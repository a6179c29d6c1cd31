import time, sys
import numpy as np
import jax, jax.numpy as jnp

from wiflow_tpu.core.config import Config, MeshConfig, ModelConfig, OptimConfig, TrainConfig
from wiflow_tpu.models.wiflow import WiFlowPoseModel
from wiflow_tpu.parallel.mesh import make_mesh, batch_sharding, replicate
from wiflow_tpu.train.optim import make_optimizer
from wiflow_tpu.train.steps import TrainState, create_train_state, make_batch_indices, make_step_fns

impl = sys.argv[1] if len(sys.argv) > 1 else "block_diag"
n = int(sys.argv[2]) if len(sys.argv) > 2 else 252_000
batch = 256

cfg = ModelConfig(tcn_matmul=impl)
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
    m = jax.device_get(m)   # host fetch forces completion
    print(f"[{impl}] epoch {ep}: {time.time()-t0:.2f}s loss {float(m['loss']):.4f}", flush=True)
