"""Robustness kit + FLOPs reporting + streaming inference tests."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wiflow_tpu.robustness import (
    StackedDenoisingAE, add_awgn, add_awgn_jax, add_salt_and_pepper_jax,
    add_salt_and_pepper_noise, evaluate_robustness, gaussian_filter,
    mean_filter, train_denoiser_stage,
)
from wiflow_tpu.utils.flops import profile_model, count_params


def test_awgn_scale():
    rng = np.random.default_rng(0)
    x = rng.random((8, 3, 20, 10)).astype(np.float32)   # range ~1
    noisy = add_awgn(x, 0.1, rng)
    resid = noisy - x
    assert 0.07 < resid.std() < 0.13


def test_salt_pepper_fraction():
    rng = np.random.default_rng(1)
    x = np.full((100, 100), 0.5, np.float32)
    noisy = add_salt_and_pepper_noise(x, 0.2, rng)
    frac = np.mean((noisy == 0) | (noisy == 1))
    assert 0.13 < frac < 0.22   # with-replacement sampling overlaps a bit
    np.testing.assert_array_equal(x, np.full_like(x, 0.5))  # input untouched


def test_jax_noise_variants():
    x = jnp.full((64, 64), 0.5)
    noisy = add_salt_and_pepper_jax(x, 0.2, jax.random.key(0))
    frac = float(jnp.mean((noisy == 0) | (noisy == 1)))
    assert 0.15 < frac < 0.25
    y = add_awgn_jax(jnp.asarray(np.random.default_rng(0).random((32, 32)),
                                 jnp.float32), 0.1, jax.random.key(1))
    assert y.shape == (32, 32)


def test_filters_smooth():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 3, 8, 50)).astype(np.float32)
    for filt in (gaussian_filter, mean_filter):
        out = np.asarray(filt(x, kernel_size=5))
        assert out.shape == x.shape
        # smoothing reduces temporal variation
        assert np.abs(np.diff(out, axis=-1)).mean() < \
            np.abs(np.diff(x, axis=-1)).mean()
    # mean filter of a constant is the constant (edge padding)
    const = np.ones((1, 1, 4, 20), np.float32)
    np.testing.assert_allclose(np.asarray(mean_filter(const)), const,
                               rtol=1e-6)


def test_denoiser_stage_training_reduces_reconstruction_error():
    rng = np.random.default_rng(3)
    clean = rng.random((64, 16, 8, 3)).astype(np.float32)   # NHWC

    def noise_fn(x, key):
        return add_salt_and_pepper_jax(x, 0.1, key)

    v0 = StackedDenoisingAE(1).init(
        {"params": jax.random.key(0)}, jnp.asarray(clean[:1]), train=False)
    model = StackedDenoisingAE(1)
    rec0 = model.apply(v0, jnp.asarray(clean[:8]), train=False)
    err0 = float(jnp.mean((rec0 - clean[:8]) ** 2))

    v1 = train_denoiser_stage(clean, 1, noise_fn, epochs=30, batch_size=32,
                              lr=3e-3)
    rec1 = model.apply(v1, jnp.asarray(clean[:8]), train=False)
    err1 = float(jnp.mean((rec1 - clean[:8]) ** 2))
    assert err1 < err0 * 0.6, (err0, err1)


def test_stacked_denoiser_freezes_previous_stage():
    rng = np.random.default_rng(4)
    clean = rng.random((32, 16, 8, 3)).astype(np.float32)
    noise_fn = lambda x, key: add_awgn_jax(x, 0.05, key)
    v1 = train_denoiser_stage(clean, 1, noise_fn, epochs=2, batch_size=16)
    v2 = train_denoiser_stage(clean, 2, noise_fn, prev_variables=v1,
                              epochs=2, batch_size=16)
    np.testing.assert_array_equal(
        np.asarray(v2["params"]["stage_0"]["enc_weight"]),
        np.asarray(v1["params"]["stage_0"]["enc_weight"]))
    assert "stage_1" in v2["params"]


def test_evaluate_robustness_sweep():
    rng = np.random.default_rng(5)
    kp = rng.standard_normal((64, 15, 2)).astype(np.float32) * 0.1
    csi = np.tile(kp.reshape(64, 30), (1, 18)).reshape(64, 540)
    csi = np.tile(csi[:, :, None], (1, 1, 20)).astype(np.float32)

    def perfect_predictor(xb):
        # recover keypoints from the (noise-corrupted) first 30 channels
        return xb[:, :30, 0].reshape(-1, 15, 2)

    res = evaluate_robustness(perfect_predictor, csi, kp,
                              noise_levels=(0.0, 0.5), noise_kind="awgn",
                              batch_size=32)
    assert res[0.0]["pck@0.2"] == 1.0
    assert res[0.5]["pck@0.2"] < res[0.0]["pck@0.2"]
    assert res[0.0]["mpjpe"] < res[0.5]["mpjpe"]


def test_profile_model_flops():
    from wiflow_tpu.core.config import ModelConfig
    from wiflow_tpu.models.wiflow import WiFlowPoseModel

    model = WiFlowPoseModel(ModelConfig(compute_dtype="float32"))
    prof = profile_model(model, jnp.zeros((8, 540, 20)))
    assert 2.2e6 < prof["params"] < 2.26e6
    if "gflops_per_sample" in prof:
        # ref README.md:119 reports 0.07 GFLOPs (thop MACs); XLA counts
        # true FLOPs on our tap-matmul lowering — same order of magnitude
        assert 0.02 < prof["gflops_per_sample"] < 1.0, prof


def test_streaming_inference():
    from wiflow_tpu.eval.streaming import make_stream_infer, sliding_windows

    stream = jnp.asarray(np.arange(50 * 6, dtype=np.float32).reshape(50, 6))
    win = sliding_windows(stream, 20, stride=1)
    assert win.shape == (31, 6, 20)
    np.testing.assert_array_equal(np.asarray(win[3, 2]),
                                  np.asarray(stream[3:23, 2]))

    def apply_fn(batch):     # fake pose head: mean over window
        return jnp.mean(batch, axis=2)[:, :6, None] * jnp.ones((1, 1, 2))

    infer = make_stream_infer(apply_fn, window=20, stride=1, batch=8)
    poses = infer(stream)
    assert poses.shape == (31, 6, 2)
    assert bool(jnp.all(jnp.isfinite(poses)))


def test_denoiser_hpe_composition():
    """Pretrained AE encoder + SK pose head (HPE-Li denoiser-HPE
    composition; trained end-to-end like main.py:65-67, with optional
    rebuild-only freezing via frozen_denoiser_labels)."""
    import optax
    from wiflow_tpu.robustness.denoiser import DenoiserHPE, frozen_denoiser_labels

    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.random((4, 3, 114, 10)).astype(np.float32))
    model = DenoiserHPE(num_stages=1, compute_dtype="float32")
    v = model.init({"params": jax.random.key(0)}, x, train=False)
    out = model.apply(v, x, train=False)
    assert out.shape == (4, 17, 2)

    # merge a pretrained stage and confirm it changes the output
    clean = rng.random((32, 114, 10, 3)).astype(np.float32)
    ae_v = train_denoiser_stage(clean, 1, lambda z, k: add_awgn_jax(z, .05, k),
                                epochs=1, batch_size=16)
    merged = {"params": {**v["params"], "denoiser": ae_v["params"]},
              "batch_stats": {**v["batch_stats"],
                              "denoiser": ae_v["batch_stats"]}}
    out2 = model.apply(merged, x, train=False)
    assert not np.allclose(np.asarray(out), np.asarray(out2))

    labels = frozen_denoiser_labels(merged["params"])
    assert labels["denoiser"] == "freeze" and labels["skunit1"] == "train"
    tx = optax.multi_transform({"train": optax.adam(1e-3),
                                "freeze": optax.set_to_zero()}, labels)
    tx.init(merged["params"])   # structure check


def test_engine_frozen_params_and_init_variables(tmp_path):
    """train_pose_model(init_variables=..., frozen_params=...) keeps the
    pretrained subtree bit-identical through training.  (Rebuild-only
    capability: the reference trains its denoiser-HPE compositions
    end-to-end, main.py:65-67 — freezing here is an explicit opt-in.)"""
    import dataclasses
    from wiflow_tpu.core.config import Config, MeshConfig, OptimConfig, TrainConfig
    from wiflow_tpu.models.baselines.hpeli_zoo import BasicCnnHPE
    from wiflow_tpu.robustness.denoiser import DenoiserHPE
    from wiflow_tpu.train.loop import train_pose_model

    rng = np.random.default_rng(0)
    def mk(n):
        x = rng.standard_normal((n, 3, 114, 10)).astype(np.float32)
        y = np.concatenate([
            rng.standard_normal((n, 17, 2)).astype(np.float32) * 0.1,
            np.ones((n, 17, 1), np.float32)], axis=-1)
        return x, y

    model = DenoiserHPE(num_stages=1, compute_dtype="float32")
    import jax
    v0 = model.init({"params": jax.random.key(7)},
                    jnp.zeros((1, 3, 114, 10)), train=False)
    pre = jax.device_get(v0["params"]["denoiser"])

    def conf_mse(out, yb):
        conf = yb[..., 2:3]
        loss = jnp.mean((conf * out - conf * yb[..., :2]) ** 2)
        return loss, {"position": loss, "bone": jnp.zeros(())}

    cfg = Config(train=TrainConfig(batch_size=8, num_epochs=1,
                                   scan_epochs=False,
                                   optim=OptimConfig(lr=1e-2, kind="sgd",
                                                     schedule="linear_decay")),
                 mesh=MeshConfig(num_devices=2))
    res = train_pose_model(
        mk(16), mk(8), mk(8), cfg, str(tmp_path / "frozen"),
        model=model, resume=False, loss_fn=conf_mse,
        to_keypoints=lambda out, yb: (out, yb[..., :2]),
        init_variables={"params": {"denoiser": pre},
                        "batch_stats": {"denoiser":
                                        v0["batch_stats"]["denoiser"]}},
        frozen_params=("denoiser",), verbose=False)

    got = res.variables["params"]["denoiser"]
    key = lambda kv: str(kv[0])  # noqa: E731
    for (pa, a), (pb, b) in zip(
            sorted(jax.tree_util.tree_leaves_with_path(pre), key=key),
            sorted(jax.tree_util.tree_leaves_with_path(got), key=key)):
        assert str(pa) == str(pb)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # while the head DID train
    assert np.isfinite(res.history["train_loss"][0])
