"""Golden tests for pose loss and metrics vs torch-computed references."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from wiflow_tpu.core.config import LossConfig, SKELETON_CONNECTIONS
from wiflow_tpu.losses.pose_loss import bone_lengths, pose_loss, smooth_l1
from wiflow_tpu.metrics.metrics import (
    calculate_mpjpe, calculate_pck, mpjpe, pck_correct_fractions,
)


def _torch_bone_lengths(kp):
    out = []
    for s, e in SKELETON_CONNECTIONS:
        v = kp[..., e, :] - kp[..., s, :]
        out.append(torch.sqrt(torch.sum(v ** 2, dim=-1) + 1e-8))
    return torch.stack(out, dim=-1)


@pytest.mark.parametrize("loss_type", ["smooth_l1", "l1", "mse"])
def test_pose_loss_matches_torch(loss_type):
    rng = np.random.default_rng(0)
    pred = rng.standard_normal((16, 15, 2)).astype(np.float32) * 0.1
    target = rng.standard_normal((16, 15, 2)).astype(np.float32) * 0.1

    tp, tt = torch.from_numpy(pred), torch.from_numpy(target)
    if loss_type == "mse":
        pos = F.mse_loss(tp, tt)
        bone = F.mse_loss(_torch_bone_lengths(tp), _torch_bone_lengths(tt))
    elif loss_type == "l1":
        pos = F.l1_loss(tp, tt)
        bone = F.l1_loss(_torch_bone_lengths(tp), _torch_bone_lengths(tt))
    else:
        pos = F.smooth_l1_loss(tp, tt, beta=0.1)
        bone = F.smooth_l1_loss(_torch_bone_lengths(tp),
                                _torch_bone_lengths(tt), beta=0.05)
    ref_total = float(pos + 0.2 * bone)

    total, parts = pose_loss(jnp.asarray(pred), jnp.asarray(target),
                             LossConfig(loss_type=loss_type))
    np.testing.assert_allclose(float(total), ref_total, rtol=1e-5)
    np.testing.assert_allclose(float(parts["position"]), float(pos), rtol=1e-5)
    np.testing.assert_allclose(float(parts["bone"]), float(bone), rtol=1e-5)


def test_pose_loss_accepts_flat_inputs():
    rng = np.random.default_rng(1)
    pred = rng.standard_normal((4, 30)).astype(np.float32)
    target = rng.standard_normal((4, 30)).astype(np.float32)
    t1, _ = pose_loss(jnp.asarray(pred), jnp.asarray(target))
    t2, _ = pose_loss(jnp.asarray(pred.reshape(4, 15, 2)),
                      jnp.asarray(target.reshape(4, 15, 2)))
    np.testing.assert_allclose(float(t1), float(t2), rtol=1e-6)


def test_smooth_l1_beta_semantics():
    d = jnp.asarray([0.05, 0.1, 0.5])
    out = smooth_l1(d, beta=0.1)
    np.testing.assert_allclose(
        np.asarray(out), [0.5 * 0.05 ** 2 / 0.1, 0.1 - 0.05, 0.5 - 0.05],
        rtol=1e-6)


def test_pck_reference_semantics():
    """Norm = dist(kp2, kp12) clamped at 0.01; mean over all kp of all
    samples (ref utils/metrics.py:12-31)."""
    rng = np.random.default_rng(2)
    target = rng.standard_normal((8, 15, 2)).astype(np.float32)
    pred = target + rng.standard_normal((8, 15, 2)).astype(np.float32) * 0.05

    norm = np.sqrt(((target[:, 2] - target[:, 12]) ** 2).sum(-1))
    norm = np.clip(norm, 0.01, None)
    dist = np.sqrt(((pred - target) ** 2).sum(-1)) / norm[:, None]
    for thr in (0.2, 0.5):
        expected = (dist <= thr).mean()
        got = calculate_pck(jnp.asarray(pred), jnp.asarray(target),
                            thresholds=[thr])[thr]
        np.testing.assert_allclose(got, expected, rtol=1e-6)


def test_pck_clamp_kicks_in():
    target = np.zeros((2, 15, 2), np.float32)     # degenerate torso -> 0.01
    pred = target.copy()
    pred[:, :, 0] = 0.001                          # err 0.001 < 0.2*0.01
    assert calculate_pck(jnp.asarray(pred), jnp.asarray(target))[0.2] == 1.0
    pred[:, :, 0] = 0.5                            # err 0.5 >> thresholds
    assert calculate_pck(jnp.asarray(pred), jnp.asarray(target))[0.2] == 0.0


def test_mpjpe():
    rng = np.random.default_rng(3)
    pred = rng.standard_normal((8, 15, 2)).astype(np.float32)
    target = rng.standard_normal((8, 15, 2)).astype(np.float32)
    expected = np.sqrt(((pred - target) ** 2).sum(-1)).mean()
    np.testing.assert_allclose(
        calculate_mpjpe(jnp.asarray(pred), jnp.asarray(target)),
        expected, rtol=1e-6)


def test_metric_cores_are_jittable():
    f = jax.jit(lambda p, t: (pck_correct_fractions(p, t, (0.2, 0.5)),
                              mpjpe(p, t)))
    p = jnp.ones((4, 15, 2))
    fr, m = f(p, p * 1.01)
    assert fr.shape == (2,) and np.isfinite(float(m))


# ---------------------------------------------------------------------------
# Per-keypoint PCK golden tests vs the reference's own numpy implementations
# (ref baseline/WPformer/evaluation.py, HPE-Li/utils/eval.py).
# ---------------------------------------------------------------------------

def _load_ref_module(path, name):
    import importlib.util
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _ref_evaluation():
    return _load_ref_module(
        "/root/reference/baseline/WPformer/evaluation.py", "ref_evaluation")


def test_compute_pck_pckh_17_golden():
    from wiflow_tpu.metrics.metrics import compute_pck_pckh
    ref = _ref_evaluation()
    rng = np.random.default_rng(7)
    gt = rng.standard_normal((32, 2, 17)).astype(np.float64)
    dt = gt + 0.1 * rng.standard_normal((32, 2, 17))
    for thr in (0.2, 0.5):
        expected = ref.compute_pck_pckh(dt, gt, thr)
        got = compute_pck_pckh(dt, gt, thr)
        assert got.shape == (18,)
        np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_compute_pck_pckh_18_golden():
    from wiflow_tpu.metrics.metrics import compute_pck_pckh_18
    ref = _ref_evaluation()
    rng = np.random.default_rng(8)
    gt = rng.standard_normal((16, 2, 18)).astype(np.float64)
    dt = gt + 0.2 * rng.standard_normal((16, 2, 18))
    expected = ref.compute_pck_pckh_18(dt, gt, 0.2)
    got = compute_pck_pckh_18(dt, gt, 0.2)
    assert got.shape == (19,)
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_compute_pck_pckh_15_golden_both_layouts():
    from wiflow_tpu.metrics.metrics import compute_pck_pckh_15
    ref = _ref_evaluation()
    rng = np.random.default_rng(9)
    gt = rng.standard_normal((24, 15, 2)).astype(np.float64)
    dt = gt + 0.05 * rng.standard_normal((24, 15, 2))
    expected = ref.compute_pck_pckh_15(dt, gt, 0.2)     # ref auto-transposes
    got_kp_major = compute_pck_pckh_15(dt, gt, 0.2)
    got_coord_major = compute_pck_pckh_15(
        dt.transpose(0, 2, 1), gt.transpose(0, 2, 1), 0.2)
    assert got_kp_major.shape == (16,)
    np.testing.assert_allclose(got_kp_major, expected, rtol=1e-5)
    np.testing.assert_allclose(got_coord_major, expected, rtol=1e-5)


def test_compute_pck_pckh_hpeli_golden():
    from wiflow_tpu.metrics.metrics import compute_pck_pckh_hpeli
    ref = _load_ref_module(
        "/root/reference/cross_dataset_test/HPE-Li/utils/eval.py", "ref_eval")
    rng = np.random.default_rng(10)
    gt = rng.standard_normal((16, 2, 17)).astype(np.float64)
    dt = gt + 0.15 * rng.standard_normal((16, 2, 17))
    expected = ref.compute_pck_pckh(dt, gt, 0.5)
    got = compute_pck_pckh_hpeli(dt, gt, 0.5)
    np.testing.assert_allclose(got, expected, rtol=1e-5)
