"""Baseline model suite: shapes, param budgets, PAM machinery, smoke train."""

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from wiflow_tpu.data.pam import (
    keypoints_to_pam, pam_confidence_mse, pam_to_keypoints,
)
from wiflow_tpu.models.baselines import (
    HPELiMMFi, HPELiNet, Performer, PerUnet, WiSPPN, WPformer,
    convert_csi_format, extract_keypoints_from_pam,
)


def _init_and_run(model, x, seed=0):
    v = jax.jit(functools.partial(model.init, train=False))(
        {"params": jax.random.key(seed)}, x)
    out = jax.jit(lambda v, x: model.apply(v, x, train=False))(v, x)
    n_params = sum(np.size(p) for p in jax.tree.leaves(v["params"]))
    return v, out, n_params


def test_hpeli_shapes_and_params():
    model = HPELiNet(compute_dtype="float32")
    x = jnp.zeros((2, 540, 20))
    _, out, n = _init_and_run(model, x)
    assert out.shape == (2, 15, 2)
    # ref README.md:118 reports 0.83M params for HPE-Li
    assert 600_000 < n < 1_100_000, n


def test_hpeli_mmfi_shapes():
    model = HPELiMMFi(compute_dtype="float32")
    x = jnp.zeros((2, 3, 114, 10))
    _, out, _ = _init_and_run(model, x)
    assert out.shape == (2, 17, 2)


def test_convert_csi_format_matches_torch():
    import torch
    rng = np.random.default_rng(0)
    x = rng.standard_normal((3, 540, 20)).astype(np.float32)
    t = torch.from_numpy(x)
    ref = t.view(3, 2, 270, 20).view(3, 2, 30, 3, 3, 20) \
        .permute(0, 1, 5, 2, 3, 4).contiguous().view(3, 600, 3, 6).numpy()
    out = np.asarray(convert_csi_format(jnp.asarray(x)))
    np.testing.assert_array_equal(out, ref)


def test_wisppn_shapes_and_params():
    model = WiSPPN(compute_dtype="float32")
    x = jnp.zeros((1, 540, 20))
    _, out, n = _init_and_run(model, x)
    assert out.shape == (1, 2, 15, 15)
    # ref README.md:118: 121.5M params
    assert 80e6 < n < 160e6, n


def test_perunet_shapes_and_params():
    model = PerUnet(compute_dtype="float32", performer_exact=True)
    x = jnp.zeros((1, 540, 20))
    _, out, n = _init_and_run(model, x)
    assert out.shape == (1, 2, 15, 15)
    # ref README.md:118: 309M params
    assert 200e6 < n < 400e6, n


@pytest.mark.slow
def test_wpformer_shapes_and_params():
    model = WPformer(compute_dtype="float32")
    x = jnp.zeros((1, 540, 20))
    _, out, n = _init_and_run(model, x)
    assert out.shape == (1, 15, 2)
    # ref README.md:118: 10.04M params (w/o the transformer pos-emb detail
    # differences we allow a generous band)
    assert 6e6 < n < 16e6, n


@pytest.mark.slow
def test_performer_attention_unbiasedness():
    """FAVOR+ approximates exact softmax attention (same weights)."""
    from wiflow_tpu.models.baselines.performer import PerformerAttention

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 32, 64)).astype(np.float32) * 0.3)
    exact = PerformerAttention(64, heads=2, dim_head=16, exact=True)
    favor = PerformerAttention(64, heads=2, dim_head=16, exact=False)
    v = exact.init({"params": jax.random.key(0)}, x)
    out_exact = exact.apply(v, x)
    out_favor = favor.apply({"params": v["params"]}, x)
    err = float(jnp.mean(jnp.abs(out_exact - out_favor)))
    scale = float(jnp.mean(jnp.abs(out_exact))) + 1e-6
    assert err / scale < 0.15, (err, scale)


def test_pam_roundtrip_and_loss():
    rng = np.random.default_rng(1)
    kp = rng.standard_normal((4, 15, 2)).astype(np.float32)
    pam = keypoints_to_pam(kp)
    assert pam.shape == (4, 4, 15, 15)
    pred = jnp.asarray(pam[:, :2])
    kp_p, kp_t = pam_to_keypoints(pred, jnp.asarray(pam))
    np.testing.assert_allclose(np.asarray(kp_p), kp, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(kp_t), kp, rtol=1e-6)
    loss, parts = pam_confidence_mse(pred, jnp.asarray(pam))
    assert float(loss) == 0.0
    loss2, _ = pam_confidence_mse(pred + 0.1, jnp.asarray(pam))
    np.testing.assert_allclose(float(loss2), 0.01, rtol=1e-4)


def test_pam_keypoint_loss_reference_semantics():
    """WPformer's loss: confidence-weighted MSE on DIAGONAL keypoints
    (ref baseline/WPformer/model.py:504-525, 968-974) — pred is
    [B, K, D] keypoints, not a PAM."""
    from wiflow_tpu.data.pam import pam_diag_keypoints, pam_keypoint_mse

    rng = np.random.default_rng(3)
    kp = rng.standard_normal((4, 15, 2)).astype(np.float32)
    lab = jnp.asarray(keypoints_to_pam(kp))            # [4, 4, 15, 15]
    pred = jnp.asarray(
        rng.standard_normal((4, 15, 2)).astype(np.float32))
    loss, _ = pam_keypoint_mse(pred, lab)
    np.testing.assert_allclose(
        float(loss), np.mean((np.asarray(pred) - kp) ** 2), rtol=1e-5)
    # reference-style [B, 3, K, K] label, confidence 0.5 in channel 2
    lab3 = jnp.asarray(np.concatenate(
        [np.asarray(lab)[:, :2],
         np.full((4, 1, 15, 15), 0.5, np.float32)], axis=1))
    loss3, _ = pam_keypoint_mse(pred, lab3)
    np.testing.assert_allclose(
        float(loss3), 0.25 * np.mean((np.asarray(pred) - kp) ** 2),
        rtol=1e-5)
    p, t = pam_diag_keypoints(pred, lab)
    assert p is pred
    np.testing.assert_allclose(np.asarray(t), kp, rtol=1e-6)


@pytest.mark.slow
def test_perunet_favor_smoke_training(tmp_path):
    """E2e train of a tiny PerUnet with FAVOR+ attention (regression:
    the random projection was once a 'favor' flax collection the train
    engine dropped, crashing at the first train-mode apply)."""
    from wiflow_tpu.core.config import (
        Config, MeshConfig, OptimConfig, TrainConfig,
    )
    from wiflow_tpu.train.loop import train_pose_model

    rng = np.random.default_rng(0)
    def mk(n):
        kp = rng.standard_normal((n, 15, 2)).astype(np.float32) * 0.1
        csi = rng.standard_normal((n, 540, 20)).astype(np.float32)
        return csi, keypoints_to_pam(kp)
    model = PerUnet(base=24, performer_exact=False,
                    compute_dtype="float32")
    cfg = Config(train=TrainConfig(
        batch_size=8, num_epochs=1, scan_epochs=False,
        optim=OptimConfig(lr=1e-3, kind="adam", schedule="multistep",
                          milestones=(1,), gamma=0.5)),
        mesh=MeshConfig(num_devices=2))
    res = train_pose_model(mk(16), mk(8), mk(8), cfg,
                           str(tmp_path / "perunet"), model=model,
                           resume=False, loss_fn=pam_confidence_mse,
                           to_keypoints=pam_to_keypoints, verbose=False)
    assert np.isfinite(res.history["train_loss"][-1])
    assert res.predictions.shape[1:] == (15, 2)


@pytest.mark.slow
def test_wpformer_pam_keypoint_smoke_training(tmp_path):
    """E2e train of a tiny WPformer through the PAM-label dispatch
    (regression: the full-PAM loss was once wired to this
    keypoint-output model and crashed on shape mismatch)."""
    from wiflow_tpu.cli.run_baseline import BASELINE_SPECS
    from wiflow_tpu.core.config import (
        Config, MeshConfig, OptimConfig, TrainConfig,
    )
    from wiflow_tpu.data.pam import pam_train_kwargs
    from wiflow_tpu.train.loop import train_pose_model

    rng = np.random.default_rng(0)
    def mk(n):
        kp = rng.standard_normal((n, 15, 2)).astype(np.float32) * 0.1
        csi = rng.standard_normal((n, 540, 20)).astype(np.float32)
        return csi, keypoints_to_pam(kp)
    # the keypoint count is the trunk's output height: one stride-2
    # stage after (30, 16) input -> fh = 15 keypoints
    model = WPformer(num_chunks=2, resize_to=(30, 16),
                     trunk_widths=(8, 16), trunk_blocks=(1, 1),
                     heads=1, compute_dtype="float32")
    spec = BASELINE_SPECS["wpformer"]
    cfg = Config(train=TrainConfig(
        batch_size=8, num_epochs=3, scan_epochs=False,
        optim=OptimConfig(lr=1e-3, kind=spec["kind"],
                          schedule=spec["schedule"], decay_start=10,
                          decay_end=20)),
        mesh=MeshConfig(num_devices=2))
    res = train_pose_model(mk(32), mk(8), mk(8), cfg,
                           str(tmp_path / "wpformer"), model=model,
                           resume=False, verbose=False,
                           **pam_train_kwargs(spec))
    assert np.isfinite(res.history["train_loss"][-1])
    # the recipe must actually DESCEND, not just run (VERDICT r4 item 2:
    # the r4 table row was a train that never got off the floor)
    assert res.history["train_loss"][-1] < res.history["train_loss"][0], \
        res.history["train_loss"]
    assert res.predictions.shape[1:] == (15, 2)


def test_extract_keypoints_matches_torch_loop():
    import torch
    rng = np.random.default_rng(2)
    pam = rng.standard_normal((3, 2, 15, 15)).astype(np.float32)
    ref = np.zeros((3, 15, 2), np.float32)
    for b in range(3):
        for k in range(15):
            ref[b, k, 0] = pam[b, 0, k, k]
            ref[b, k, 1] = pam[b, 1, k, k]
    out = np.asarray(extract_keypoints_from_pam(jnp.asarray(pam)))
    np.testing.assert_array_equal(out, ref)


@pytest.mark.slow
def test_hpeli_smoke_training(tmp_path):
    """2-epoch keypoint-label baseline training via the shared engine."""
    from wiflow_tpu.core.config import Config, MeshConfig, OptimConfig, TrainConfig
    from wiflow_tpu.train.loop import train_pose_model

    rng = np.random.default_rng(0)
    def mk(n):
        kp = rng.standard_normal((n, 15, 2)).astype(np.float32) * 0.1
        csi = (kp.reshape(n, 30) @ rng.standard_normal((30, 540 * 20))
               .astype(np.float32) * 0.1).reshape(n, 540, 20)
        return csi, kp
    cfg = Config(train=TrainConfig(batch_size=16, num_epochs=2,
                                   scan_epochs=False,
                                   optim=OptimConfig(lr=1e-3)),
                 mesh=MeshConfig(num_devices=2))
    res = train_pose_model(mk(64), mk(16), mk(16), cfg,
                           str(tmp_path / "hpeli"),
                           model=HPELiNet(compute_dtype="float32"),
                           resume=False, verbose=False)
    assert np.isfinite(res.history["train_loss"][-1])
    assert res.history["train_loss"][-1] < res.history["train_loss"][0]


@pytest.mark.slow
def test_pam_smoke_training(tmp_path):
    """2-epoch PAM-label baseline (WiSPPN, small) via the shared engine."""
    from wiflow_tpu.core.config import Config, MeshConfig, OptimConfig, TrainConfig
    from wiflow_tpu.train.loop import train_pose_model

    rng = np.random.default_rng(0)
    def mk(n):
        kp = rng.standard_normal((n, 15, 2)).astype(np.float32) * 0.1
        csi = rng.standard_normal((n, 540, 20)).astype(np.float32)
        return csi, keypoints_to_pam(kp)
    model = WiSPPN(layers=(1, 1, 1, 1), widths=(32, 32, 64, 64),
                   compute_dtype="float32")
    cfg = Config(train=TrainConfig(
        batch_size=8, num_epochs=1, scan_epochs=False,
        optim=OptimConfig(lr=1e-3, kind="adam", schedule="multistep",
                          milestones=(1,), gamma=0.5)),
        mesh=MeshConfig(num_devices=2))
    res = train_pose_model(mk(32), mk(8), mk(8), cfg,
                           str(tmp_path / "wisppn"), model=model,
                           resume=False, loss_fn=pam_confidence_mse,
                           to_keypoints=pam_to_keypoints, verbose=False)
    assert np.isfinite(res.history["train_loss"][-1])
    assert res.predictions.shape[1:] == (15, 2)
    # multistep schedule applied after epoch 1
    assert res.history["lr"][0] == pytest.approx(1e-3)


# ---------------------------------------------------------------------------
# Round 2: ImageNet ResNet34 warm-start mapper (VERDICT r1 missing #7;
# ref baseline/WPformer/model.py:302-344).  torchvision isn't available
# here, so the state_dict is synthesized with torchvision's exact key/shape
# schema and one block is parity-checked against a functional torch
# BasicBlock forward.
# ---------------------------------------------------------------------------

def _fake_resnet34_state_dict(widths=(64, 128, 256), blocks=(3, 4, 6),
                              seed=0):
    import numpy as np
    rng = np.random.default_rng(seed)
    sd = {}

    def add_bn(prefix, c):
        sd[f"{prefix}.weight"] = rng.uniform(0.5, 1.5, c).astype(np.float32)
        sd[f"{prefix}.bias"] = rng.standard_normal(c).astype(np.float32) * .1
        sd[f"{prefix}.running_mean"] = rng.standard_normal(c).astype(
            np.float32) * .1
        sd[f"{prefix}.running_var"] = rng.uniform(0.5, 1.5, c).astype(
            np.float32)

    sd["conv1.weight"] = rng.standard_normal((64, 3, 7, 7)).astype(
        np.float32) * 0.05
    add_bn("bn1", 64)
    cin = 64
    for li, (w, n) in enumerate(zip(widths, blocks)):
        for bi in range(n):
            tp = f"layer{li + 1}.{bi}"
            c_in = cin if bi == 0 else w
            sd[f"{tp}.conv1.weight"] = rng.standard_normal(
                (w, c_in, 3, 3)).astype(np.float32) * 0.05
            add_bn(f"{tp}.bn1", w)
            sd[f"{tp}.conv2.weight"] = rng.standard_normal(
                (w, w, 3, 3)).astype(np.float32) * 0.05
            add_bn(f"{tp}.bn2", w)
            if bi == 0 and (li > 0 or c_in != w):
                sd[f"{tp}.downsample.0.weight"] = rng.standard_normal(
                    (w, c_in, 1, 1)).astype(np.float32) * 0.05
                add_bn(f"{tp}.downsample.1", w)
        cin = w
    return sd


def test_resnet34_warm_start_block_parity():
    """Mapped layer2.0 (strided, downsampled) matches a functional torch
    BasicBlock forward on the same weights."""
    import torch.nn.functional as F
    from wiflow_tpu.models.baselines.wpformer import (
        ResBasicBlock, resnet34_warm_start,
    )

    sd = _fake_resnet34_state_dict()
    warm = resnet34_warm_start(sd)
    blk = warm["params"]["trunk"]["layer2_0"]
    stats = warm["batch_stats"]["trunk"]["layer2_0"]

    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 8, 6, 64)).astype(np.float32)  # NHWC

    model = ResBasicBlock(128, stride=2)
    out = model.apply({"params": blk, "batch_stats": stats},
                      jnp.asarray(x), train=False)

    def bn(t, p):
        return F.batch_norm(
            t, torch.from_numpy(sd[f"{p}.running_mean"]),
            torch.from_numpy(sd[f"{p}.running_var"]),
            torch.from_numpy(sd[f"{p}.weight"]),
            torch.from_numpy(sd[f"{p}.bias"]), training=False)

    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    y = F.conv2d(xt, torch.from_numpy(sd["layer2.0.conv1.weight"]),
                 stride=2, padding=1)
    y = F.relu(bn(y, "layer2.0.bn1"))
    y = F.conv2d(y, torch.from_numpy(sd["layer2.0.conv2.weight"]),
                 padding=1)
    y = bn(y, "layer2.0.bn2")
    idn = F.conv2d(xt, torch.from_numpy(sd["layer2.0.downsample.0.weight"]),
                   stride=2)
    idn = bn(idn, "layer2.0.downsample.1")
    ref = F.relu(y + idn).numpy().transpose(0, 2, 3, 1)

    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_resnet34_warm_start_merges_into_wpformer():
    from wiflow_tpu.models.baselines.wpformer import (
        WPformer, merge_warm_start, resnet34_warm_start,
    )
    sd = _fake_resnet34_state_dict()
    model = WPformer(compute_dtype="float32", num_chunks=4)
    x = jnp.zeros((1, 120, 20))
    v = model.init({"params": jax.random.key(0)}, x, train=False)
    merged = merge_warm_start(v, resnet34_warm_start(sd))
    # mapped trunk BN really came from the state_dict
    np.testing.assert_allclose(
        np.asarray(merged["params"]["trunk"]["layer1_0"]["bn1"]["weight"]),
        sd["layer1.0.bn1.weight"])
    out = model.apply(merged, x, train=False)
    assert out.shape == (1, 15, 2)
