"""Jitted train/eval step and whole-epoch functions.

The reference's hot loop (ref: /root/reference/train.py:181-260) is a
Python per-batch loop with H2D copies, AMP autocast and GradScaler.  Here
the entire dataset lives in device HBM, and a whole epoch is ONE jitted
``lax.scan`` over batch index gathers — no host round-trips, no loss
scaling (bf16 has fp32 range), gradients/batch-norm reductions become XLA
collectives across the data mesh axis automatically.

Semantics kept from the reference:
  * effective batch = physical batch x grad-accum steps, loss / accum
    before backward (train.py:81-85, 199, 231-239),
  * global-norm clip 1.0 then AdamW step (train.py:234-236),
  * per-batch train metrics (loss parts, MPJPE, PCK@0.2/0.5) averaged
    sample-weighted over the epoch (train.py:204-219),
  * eval uses running BN stats; test reports PCK@{0.1..0.5} (train.py:401+).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from wiflow_tpu.core.config import LossConfig
from wiflow_tpu.data.augment import augment_batch
from wiflow_tpu.losses.pose_loss import pose_loss
from wiflow_tpu.metrics.metrics import mpjpe, pck_correct_fractions

TEST_THRESHOLDS = (0.1, 0.2, 0.3, 0.4, 0.5)


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any


def create_train_state(model, tx: optax.GradientTransformation,
                       sample_x: jax.Array, seed: int = 42) -> TrainState:
    variables = jax.jit(
        functools.partial(model.init, train=False)
    )({"params": jax.random.key(seed)}, sample_x)
    return TrainState(
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]),
    )


def make_step_fns(
    model,
    tx: optax.GradientTransformation,
    loss_cfg: LossConfig = LossConfig(),
    mesh: Optional[Mesh] = None,
    use_augmentation: bool = False,
    grad_accum_steps: int = 1,
    connections=None,
    pck_fn=None,
    mpe_fn=None,
    loss_fn=None,
    to_keypoints=None,
    scan: bool = True,
):
    """Build the jitted epoch-level functions.

    Returns ``(train_epoch, eval_epoch)``:
      train_epoch(state, x, y, batch_idx [nb, bs], key, aug: bool)
          -> (state, {metric: scalar})
      eval_epoch(variables, x, y, batch_idx [nb, bs])
          -> ({metric: scalar, pck_curve: [5]}, (pred_kp, target_kp))

    ``scan=True`` compiles the whole epoch as one ``lax.scan`` (fastest on
    TPU: zero per-batch dispatch).  ``scan=False`` jits only the per-batch
    step and loops in Python — XLA:CPU compiles While bodies ~10x slower
    (measured 12s -> 128s on a conv-heavy baseline), so tests and CPU runs
    prefer the loop.
    """
    loss_kwargs = {} if connections is None else {"connections": connections}
    # metric functions are pluggable: Setting 1 uses torso-normalized PCK +
    # plain MPJPE (utils/metrics.py); MM-Fi uses root-relative variants
    # (wiflow.py:610-643)
    if pck_fn is None:
        pck_fn = pck_correct_fractions
    if mpe_fn is None:
        mpe_fn = mpjpe
    # loss_fn(out, yb) -> (total, {'position', 'bone'}); PAM baselines use
    # confidence-weighted MSE.  to_keypoints(out, yb) maps raw outputs +
    # labels to keypoint pairs for the metrics (PAM models: diagonals).
    if loss_fn is None:
        def loss_fn(out, yb):
            return pose_loss(out, yb, loss_cfg, **loss_kwargs)
    if to_keypoints is None:
        def to_keypoints(out, yb):
            return out, yb
    data_sharding = (NamedSharding(mesh, P("data"))
                     if mesh is not None and mesh.size > 1 else None)
    # explicit in/out shardings keep the state's sharding identical across
    # epochs — without them the first epoch's output state re-triggers a
    # full compile on epoch 2 (measured: ~60s wasted)
    rep = NamedSharding(mesh, P()) if mesh is not None else None
    dsh = NamedSharding(mesh, P("data")) if mesh is not None else None

    def constrain(t):
        if data_sharding is None:
            return t
        return jax.lax.with_sharding_constraint(t, data_sharding)

    def forward_train(params, batch_stats, xb, yb, key):
        out, mut = model.apply(
            {"params": params, "batch_stats": batch_stats}, xb,
            train=True, mutable=["batch_stats"], rngs={"dropout": key})
        total, parts = loss_fn(out, yb)
        return total, (mut["batch_stats"], out, parts)

    def train_step(state: TrainState, xb, yb, key) -> Tuple[TrainState, Dict]:
        a = grad_accum_steps
        if a > 1:
            mb = xb.shape[0] // a
            xmb = xb[: a * mb].reshape(a, mb, *xb.shape[1:])
            ymb = yb[: a * mb].reshape(a, mb, *yb.shape[1:])

            def micro(carry, inp):
                grads_acc, batch_stats, i = carry
                x_i, y_i = inp
                k = jax.random.fold_in(key, i)
                (loss, (bs, out, parts)), grads = jax.value_and_grad(
                    forward_train, has_aux=True)(
                        state.params, batch_stats, x_i, y_i, k)
                grads_acc = jax.tree.map(jnp.add, grads_acc, grads)
                kp_p, kp_t = to_keypoints(out, y_i)
                pck = pck_fn(kp_p, kp_t, (0.2, 0.5))
                m = {"loss": loss, "position": parts["position"],
                     "bone": parts["bone"], "mpe": mpe_fn(kp_p, kp_t),
                     "pck": pck[0], "pck50": pck[1]}
                return (grads_acc, bs, i + 1), m

            zero_grads = jax.tree.map(jnp.zeros_like, state.params)
            (grads, batch_stats, _), ms = jax.lax.scan(
                micro, (zero_grads, state.batch_stats, 0), (xmb, ymb))
            grads = jax.tree.map(lambda g: g / a, grads)
            metrics = jax.tree.map(jnp.mean, ms)
        else:
            (loss, (batch_stats, out, parts)), grads = jax.value_and_grad(
                forward_train, has_aux=True)(
                    state.params, state.batch_stats, xb, yb, key)
            kp_p, kp_t = to_keypoints(out, yb)
            pck = pck_fn(kp_p, kp_t, (0.2, 0.5))
            metrics = {"loss": loss, "position": parts["position"],
                       "bone": parts["bone"], "mpe": mpe_fn(kp_p, kp_t),
                       "pck": pck[0], "pck50": pck[1]}

        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics["grad_norm"] = optax.global_norm(grads)
        return TrainState(params, batch_stats, opt_state), metrics

    jit_kwargs = {}
    if mesh is not None:
        jit_kwargs = {"in_shardings": (rep, dsh, dsh, rep, rep),
                      "out_shardings": (rep, rep)}

    @functools.partial(jax.jit, static_argnums=(5,),
                       donate_argnums=(0,), **jit_kwargs)
    def train_epoch(state: TrainState, x, y, batch_idx, key,
                    augment: bool = False):
        def body(state, inp):
            step, idx = inp
            xb = constrain(jnp.take(x, idx, axis=0))
            yb = constrain(jnp.take(y, idx, axis=0))
            k = jax.random.fold_in(key, step)
            if use_augmentation and augment:
                xb = augment_batch(xb, jax.random.fold_in(k, 1))
            return train_step(state, xb, yb, jax.random.fold_in(k, 2))

        steps = jnp.arange(batch_idx.shape[0])
        state, ms = jax.lax.scan(body, state, (steps, batch_idx))
        return state, jax.tree.map(jnp.mean, ms)

    eval_jit_kwargs = {}
    if mesh is not None:
        eval_jit_kwargs = {"in_shardings": (rep, dsh, dsh, rep),
                           "out_shardings": (rep, rep)}

    @functools.partial(jax.jit, **eval_jit_kwargs)
    def eval_epoch(variables, x, y, batch_idx):
        def body(_, idx):
            xb = constrain(jnp.take(x, idx, axis=0))
            yb = constrain(jnp.take(y, idx, axis=0))
            out = model.apply(variables, xb, train=False)
            total, parts = loss_fn(out, yb)
            kp_p, kp_t = to_keypoints(out, yb)
            pck_curve = pck_fn(kp_p, kp_t, TEST_THRESHOLDS)
            m = {"loss": total, "position": parts["position"],
                 "bone": parts["bone"], "mpe": mpe_fn(kp_p, kp_t),
                 "pck": pck_curve[1], "pck50": pck_curve[4],
                 "pck_curve": pck_curve}
            return None, (m, jnp.stack([kp_p, kp_t.astype(kp_p.dtype)]))

        _, (ms, preds) = jax.lax.scan(body, None, batch_idx)
        metrics = jax.tree.map(lambda v: jnp.mean(v, axis=0), ms)
        # preds: [nb, 2, bs, K, D] -> (pred, target) each [nb*bs, K, D]
        pk = preds[:, 0].reshape(-1, *preds.shape[3:])
        tk = preds[:, 1].reshape(-1, *preds.shape[3:])
        return metrics, (pk, tk)

    if scan:
        return train_epoch, eval_epoch

    # ---- non-scan variants: jitted per-batch step, Python epoch loop ----
    # (no explicit in_shardings: eagerly gathered batches carry whatever
    # sharding the gather produced; constrain() redistributes inside)

    @functools.partial(jax.jit, static_argnums=(4,), donate_argnums=(0,))
    def one_step(state, xb, yb, key, augment: bool = False):
        xb, yb = constrain(xb), constrain(yb)
        if use_augmentation and augment:
            xb = augment_batch(xb, jax.random.fold_in(key, 1))
        return train_step(state, xb, yb, jax.random.fold_in(key, 2))

    # On a multi-device mesh, concurrent async executions of the SAME
    # program deadlock XLA:CPU's in-process collective rendezvous (the
    # RendezvousKey's run_id is a program hash, not an execution id, so
    # overlapping runs join each other's all-reduce and wait forever —
    # observed live in the 8-virtual-device dryrun).  The unrolled loops
    # therefore retire each dispatch before issuing the next; the scan
    # paths (one program per epoch) and single-device meshes are immune.
    serialize = mesh is not None and mesh.size > 1

    def train_epoch_loop(state, x, y, batch_idx, key, augment=False):
        ms = []
        for step_i in range(batch_idx.shape[0]):
            xb = jnp.take(x, batch_idx[step_i], axis=0)
            yb = jnp.take(y, batch_idx[step_i], axis=0)
            state, m = one_step(state, xb, yb,
                                jax.random.fold_in(key, step_i), augment)
            if serialize:
                m = jax.block_until_ready(m)
            ms.append(m)
        metrics = jax.tree.map(lambda *v: jnp.mean(jnp.stack(v)), *ms)
        return state, metrics

    @jax.jit
    def eval_batch(variables, xb, yb):
        xb, yb = constrain(xb), constrain(yb)
        out = model.apply(variables, xb, train=False)
        total, parts = loss_fn(out, yb)
        kp_p, kp_t = to_keypoints(out, yb)
        pck_curve = pck_fn(kp_p, kp_t, TEST_THRESHOLDS)
        m = {"loss": total, "position": parts["position"],
             "bone": parts["bone"], "mpe": mpe_fn(kp_p, kp_t),
             "pck": pck_curve[1], "pck50": pck_curve[4],
             "pck_curve": pck_curve}
        return m, (kp_p, kp_t.astype(kp_p.dtype))

    def eval_epoch_loop(variables, x, y, batch_idx):
        ms, pks, tks = [], [], []
        for step_i in range(batch_idx.shape[0]):
            xb = jnp.take(x, batch_idx[step_i], axis=0)
            yb = jnp.take(y, batch_idx[step_i], axis=0)
            m, (kp_p, kp_t) = eval_batch(variables, xb, yb)
            if serialize:
                m = jax.block_until_ready(m)
            ms.append(m)
            pks.append(kp_p)
            tks.append(kp_t)
        metrics = jax.tree.map(lambda *v: jnp.mean(jnp.stack(v), axis=0), *ms)
        return metrics, (jnp.concatenate(pks), jnp.concatenate(tks))

    return train_epoch_loop, eval_epoch_loop


def make_batch_indices(num_samples: int, batch_size: int,
                       perm: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """[num_batches, batch_size] index table, drop_last=True semantics."""
    nb = num_samples // batch_size
    idx = perm if perm is not None else jnp.arange(num_samples)
    return idx[: nb * batch_size].reshape(nb, batch_size)
