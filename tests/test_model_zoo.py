"""Model zoo tests: DSKNetTrans, MultiAxisAttention, attention variants,
WPformer-MMFi, PerUnet-MMFi, WiPose dataset."""

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wiflow_tpu.models.baselines import (
    DSKNetTrans, GlobalContextAttention, MultiAxisAttention,
    MultiHeadAttention, PerUnetMMFi, RegressionHead, SelfAttention,
    wpformer_mmfi,
)
from wiflow_tpu.data.wipose import WiPoseDataset


def _run(model, x, seed=0):
    v = model.init({"params": jax.random.key(seed)}, x, train=False)
    return v, model.apply(v, x, train=False)


def test_dsknet_trans_mmfi_shape():
    model = DSKNetTrans(compute_dtype="float32")
    x = jnp.zeros((2, 3, 114, 10))
    v, out = _run(model, x)
    assert out.shape == (2, 17, 2)


def test_dsknet_trans_wipose_shape():
    model = DSKNetTrans(num_keypoints=18, compute_dtype="float32")
    x = jnp.zeros((2, 9, 30, 5))
    v, out = _run(model, x)
    assert out.shape == (2, 18, 2)


def test_multi_axis_attention():
    model = MultiAxisAttention(embed_dim=32, depth=1, dim_feedforward=64)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, 16, 6, 4)).astype(np.float32))
    v = model.init({"params": jax.random.key(0)}, x, train=False)
    out = model.apply(v, x, train=False)
    assert out.shape == (2, 16, 6, 32)


def test_attention_variants():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 10, 16)).astype(np.float32))
    for cls in (SelfAttention, MultiHeadAttention, GlobalContextAttention):
        m = cls(16)
        v = m.init(jax.random.key(0), x)
        out = m.apply(v, x)
        assert out.shape == x.shape, cls.__name__

    # self-attention matches a manual softmax computation
    m = SelfAttention(16)
    v = m.init(jax.random.key(1), x)
    p = v["params"]
    def lin(name, inp):
        return inp @ p[name]["kernel"] + p[name]["bias"]
    q, k, vv = lin("query", x), lin("key", x), lin("value", x)
    scores = jax.nn.softmax(
        jnp.einsum("bnd,bmd->bnm", q, k) / np.sqrt(16), axis=-1)
    ref = jnp.einsum("bnm,bmd->bnd", scores, vv)
    np.testing.assert_allclose(np.asarray(m.apply(v, x)), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_wpformer_mmfi_shape():
    model = wpformer_mmfi(compute_dtype="float32")
    x = jnp.zeros((1, 3, 114, 10))
    v = model.init({"params": jax.random.key(0)}, x, train=False)
    out = model.apply(v, x, train=False)
    assert out.shape == (1, 17, 3)
    n = sum(np.size(p) for p in jax.tree.leaves(v["params"]))
    # ref README.md:238: 26.52M params for WPformer on MM-Fi
    assert 15e6 < n < 40e6, n


def test_perunet_mmfi_shape():
    model = PerUnetMMFi(base=64, compute_dtype="float32",
                        performer_exact=True)
    x = jnp.zeros((1, 3, 114, 10))
    v = model.init({"params": jax.random.key(0)}, x, train=False)
    out = model.apply(v, x, train=False)
    assert out.shape == (1, 17, 3)


def test_wipose_dataset(tmp_path):
    split = tmp_path / "Train"
    split.mkdir()
    rng = np.random.default_rng(0)
    for i in range(4):
        np.save(split / f"s{i}_csi.npy",
                rng.standard_normal((9, 30, 5)).astype(np.float32))
        np.save(split / f"s{i}_kp.npy",
                rng.standard_normal((18, 3)).astype(np.float32))
    ds = WiPoseDataset(str(tmp_path))
    assert len(ds) == 4
    item = ds[0]
    assert item["input_wifi-csi"].shape == (9, 30, 5)
    assert item["output"].shape == (18, 3)
    csi, kp = ds.materialize()
    assert csi.shape == (4, 9, 30, 5) and kp.shape == (4, 18, 3)
    mean, std = WiPoseDataset.compute_stats(csi)
    assert mean.shape == (9,) and std.shape == (9,)


def test_wiflow_ablation_variants():
    """Ablation switches (ref README.md:244-248) build and run."""
    import dataclasses
    from wiflow_tpu.core.config import ModelConfig
    from wiflow_tpu.models.wiflow import WiFlowPoseModel

    base = ModelConfig(num_subcarriers=40, window_size=20,
                       tcn_channels=(40, 60), tcn_groups=4,
                       conv_channels=(4, 8), attention_groups=2,
                       dropout=0.0, conv_dropout=0.0,
                       compute_dtype="float32")
    x = jnp.zeros((2, 40, 20))
    base_params = None
    for variant in (base,
                    dataclasses.replace(base, tcn_conv="plain"),
                    dataclasses.replace(base, tcn_conv="depthwise"),
                    dataclasses.replace(base, use_attention=False),
                    dataclasses.replace(base, encoder_kind="conv2d")):
        model = WiFlowPoseModel(variant)
        v = model.init({"params": jax.random.key(0)}, x, train=False)
        out = model.apply(v, x, train=False)
        assert out.shape == (2, 15, 2)
        n = sum(np.size(p) for p in jax.tree.leaves(v["params"]))
        if variant is base:
            base_params = n
    # attention-free variant has fewer params than the full model
    m_noatt = WiFlowPoseModel(dataclasses.replace(base, use_attention=False))
    v = m_noatt.init({"params": jax.random.key(0)}, x, train=False)
    assert sum(np.size(p) for p in jax.tree.leaves(v["params"])) < base_params


def test_conv2d_encoder_trains_and_checkpoints(tmp_path):
    """The encoder_kind='conv2d' ablation survives a full engine round —
    including best-model saving, which must skip the torch .pth export
    (no reference architecture analog)."""
    import dataclasses
    import os
    from wiflow_tpu.core.config import Config, MeshConfig, ModelConfig, TrainConfig
    from wiflow_tpu.train.loop import train_pose_model

    model_cfg = ModelConfig(num_subcarriers=40, window_size=20,
                            tcn_channels=(40, 60), tcn_groups=4,
                            conv_channels=(4, 8), attention_groups=2,
                            dropout=0.0, conv_dropout=0.0,
                            encoder_kind="conv2d", compute_dtype="float32")
    rng = np.random.default_rng(3)
    def mk(n):
        return (rng.standard_normal((n, 40, 20)).astype(np.float32),
                rng.standard_normal((n, 15, 2)).astype(np.float32) * 0.1)
    cfg = Config(model=model_cfg,
                 train=TrainConfig(batch_size=8, num_epochs=1,
                                   scan_epochs=False),
                 mesh=MeshConfig(num_devices=1))
    res = train_pose_model(mk(16), mk(8), mk(8), cfg,
                           str(tmp_path / "c2d"), resume=False,
                           verbose=False)
    assert np.isfinite(res.history["train_loss"][0])
    assert os.path.exists(tmp_path / "c2d" / "best_pose_model.msgpack")
    assert not os.path.exists(tmp_path / "c2d" / "best_pose_model.pth")
