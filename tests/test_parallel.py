"""GSPMD data-parallel numerics: N-chip sharded training == 1-device
big-batch training.

DESIGN.md claims the ('data',) mesh with globally-reduced BatchNorm is
numerically the single-device big-batch run (stronger than the
reference's nn.DataParallel, whose per-replica BN stats diverge —
ref /root/reference/train.py:91-93).  This proves it: K optimizer steps
from the same init, same global batch, on an 8-device mesh vs a 1-device
mesh, must produce matching loss trajectories and parameters."""

import jax
import jax.numpy as jnp
import numpy as np

from wiflow_tpu.core.config import LossConfig, ModelConfig, OptimConfig
from wiflow_tpu.models.wiflow import WiFlowPoseModel
from wiflow_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from wiflow_tpu.train.optim import make_optimizer
from wiflow_tpu.train.steps import (
    TrainState, create_train_state, make_batch_indices, make_step_fns,
)

TINY = ModelConfig(num_subcarriers=40, window_size=20, tcn_channels=(40, 60),
                   tcn_groups=4, conv_channels=(4, 8), attention_groups=2,
                   dropout=0.0, conv_dropout=0.0, compute_dtype="float32")


def _train_k_steps_generic(model, n_devices, x, y, k_steps, batch,
                           **step_kwargs):
    """K SGD steps of an arbitrary model on an n-device mesh (see
    _train_k_steps for why SGD keeps the parity check sharp)."""
    tx = make_optimizer(OptimConfig(lr=1e-2, kind="sgd", momentum=0.9))
    mesh = make_mesh(n_devices)
    state = create_train_state(model, tx, jnp.asarray(x[:1]), seed=0)
    state = TrainState(*replicate(mesh, tuple(state)))
    xd = shard_batch(mesh, jnp.asarray(x))
    yd = shard_batch(mesh, jnp.asarray(y))
    train_epoch, _ = make_step_fns(model, tx, LossConfig(), mesh=mesh,
                                   **step_kwargs)
    idx = make_batch_indices(len(x), batch)[:k_steps]
    state, metrics = train_epoch(state, xd, yd, idx,
                                 jax.random.key(123), False)
    return jax.device_get(state), jax.device_get(metrics)


def test_eight_device_dp_mmfi_and_baseline(eight_devices):
    """The GSPMD DP path is not flagship-only (VERDICT r3 item 7): the
    MM-Fi transfer model and an HPE-Li baseline train on the 8-device
    mesh, and the MM-Fi run matches its 1-device big-batch twin."""
    from wiflow_tpu.core.config import MMFI_SKELETON_CONNECTIONS
    from wiflow_tpu.metrics.mmfi_metrics import (
        root_aligned_mpjpe, root_relative_pck_fractions,
    )
    from wiflow_tpu.models.baselines import HPELiNet
    from wiflow_tpu.models.wiflow_mmfi import MMFiModelConfig, WiFlowMMFiModel

    rng = np.random.default_rng(1)
    x = rng.standard_normal((32, 3, 114, 10)).astype(np.float32)
    y = (rng.standard_normal((32, 17, 3)) * 0.1).astype(np.float32)
    mmfi_kwargs = dict(connections=MMFI_SKELETON_CONNECTIONS,
                       pck_fn=root_relative_pck_fractions,
                       mpe_fn=root_aligned_mpjpe)
    model = WiFlowMMFiModel(MMFiModelConfig(compute_dtype="float32",
                                            dropout=0.0, conv_dropout=0.0))
    s8, m8 = _train_k_steps_generic(model, 8, x, y, 2, 16, **mmfi_kwargs)
    s1, m1 = _train_k_steps_generic(model, 1, x, y, 2, 16, **mmfi_kwargs)
    np.testing.assert_allclose(m8["loss"], m1["loss"], rtol=1e-4)
    for (p8, a), (p1, b) in zip(
            jax.tree_util.tree_leaves_with_path(s8.params),
            jax.tree_util.tree_leaves_with_path(s1.params)):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6,
                                   err_msg=str(p8))

    # baseline: HPE-Li trains on the sharded mesh with finite metrics
    xb = rng.standard_normal((16, 540, 20)).astype(np.float32)
    yb = (rng.standard_normal((16, 15, 2)) * 0.1).astype(np.float32)
    _, mb = _train_k_steps_generic(HPELiNet(compute_dtype="float32"),
                                   8, xb, yb, 2, 8)
    assert np.isfinite(mb["loss"]) and np.isfinite(mb["mpe"])


def _train_k_steps(n_devices, x, y, k_steps, batch):
    # SGD+momentum keeps the parameter check sharp: updates are LINEAR in
    # the gradients, so sharded-vs-single differences stay at fp32
    # reduction-order scale.  (Adam's g/sqrt(v) normalization amplifies
    # ~1e-7 gradient noise to ~lr-scale update differences on near-zero
    # gradient elements, which would force meaninglessly loose tolerances.)
    model = WiFlowPoseModel(TINY)
    tx = make_optimizer(OptimConfig(lr=1e-2, kind="sgd", momentum=0.9))
    mesh = make_mesh(n_devices)
    state = create_train_state(model, tx, jnp.asarray(x[:1]), seed=0)
    state = TrainState(*replicate(mesh, tuple(state)))
    xd = shard_batch(mesh, jnp.asarray(x))
    yd = shard_batch(mesh, jnp.asarray(y))
    train_epoch, _ = make_step_fns(model, tx, LossConfig(), mesh=mesh)
    idx = make_batch_indices(len(x), batch)[:k_steps]
    state, metrics = train_epoch(state, xd, yd, idx,
                                 jax.random.key(123), False)
    return jax.device_get(state), jax.device_get(metrics)


def test_eight_device_dp_matches_single_device_big_batch(eight_devices):
    rng = np.random.default_rng(0)
    n, batch, k_steps = 128, 32, 4
    x = rng.standard_normal((n, 40, 20)).astype(np.float32)
    y = (rng.standard_normal((n, 15, 2)) * 0.1).astype(np.float32)

    s8, m8 = _train_k_steps(8, x, y, k_steps, batch)
    s1, m1 = _train_k_steps(1, x, y, k_steps, batch)

    # identical loss trajectory up to fp32 reduction-order noise
    np.testing.assert_allclose(m8["loss"], m1["loss"], rtol=1e-4)
    np.testing.assert_allclose(m8["mpe"], m1["mpe"], rtol=1e-4)
    # parameters match leaf-for-leaf after K optimizer steps
    flat8 = jax.tree_util.tree_leaves_with_path(s8.params)
    flat1 = jax.tree_util.tree_leaves_with_path(s1.params)
    assert len(flat8) == len(flat1)
    for (p8, a), (p1, b) in zip(flat8, flat1):
        assert str(p8) == str(p1)
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6,
                                   err_msg=str(p8))
    # batch-norm running stats were reduced over the GLOBAL batch on both
    for (p8, a), (p1, b) in zip(
            jax.tree_util.tree_leaves_with_path(s8.batch_stats),
            jax.tree_util.tree_leaves_with_path(s1.batch_stats)):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6,
                                   err_msg=str(p8))
