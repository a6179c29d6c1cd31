"""Evaluation metrics: PCK and MPJPE with reference-exact semantics.

Rebuild of ref /root/reference/utils/metrics.py:3-46.  Quirks preserved
deliberately (SURVEY.md §8.7):

  * "torso norm" uses keypoint indices 2 and 12 (named NECK/PELVIS in the
    reference but actually L_Shoulder / R_Hip per config.py:37-41),
  * the normalizer is clamped to >= 0.01,
  * PCK averages over all keypoints of all samples at once,
  * keypoints are in units of mm/1000, so MPJPE is in meters.

The MM-Fi variants (root-relative PCK, root-aligned MPJPE, PA-MPJPE) live
in metrics/mmfi_metrics.py.
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax
import jax.numpy as jnp

TORSO_A, TORSO_B = 2, 12          # ref: utils/metrics.py:13
SHOULDER_A, SHOULDER_B = 2, 5     # ref: utils/metrics.py:18
NORM_CLAMP = 0.01                 # ref: utils/metrics.py:23


def _as_keypoints(x: jax.Array) -> jax.Array:
    if x.ndim == 2:
        return x.reshape(x.shape[0], -1, 2)
    return x


def pck_correct_fractions(
    pred: jax.Array, target: jax.Array,
    thresholds: Sequence[float], use_torso_norm: bool = True,
) -> jax.Array:
    """Jittable core: returns ``[len(thresholds)]`` fractions in [0, 1]."""
    pred = _as_keypoints(pred).astype(jnp.float32)
    target = _as_keypoints(target).astype(jnp.float32)
    if use_torso_norm:
        a, b = TORSO_A, TORSO_B
    else:
        a, b = SHOULDER_A, SHOULDER_B
    norm = jnp.sqrt(jnp.sum((target[:, a] - target[:, b]) ** 2, axis=-1))
    norm = jnp.clip(norm, min=NORM_CLAMP)
    dist = jnp.sqrt(jnp.sum((pred - target) ** 2, axis=-1)) / norm[:, None]
    thr = jnp.asarray(thresholds, jnp.float32)
    return jnp.mean((dist[None] <= thr[:, None, None]).astype(jnp.float32),
                    axis=(1, 2))


def calculate_pck(
    pred, target, thresholds: Sequence[float] = (0.2,),
    use_torso_norm: bool = True,
) -> Dict[float, float]:
    """Host-facing wrapper returning ``{threshold: pck}`` like the reference."""
    fr = pck_correct_fractions(pred, target, thresholds, use_torso_norm)
    return {t: float(v) for t, v in zip(thresholds, fr)}


def pck_per_keypoint(
    pred: jax.Array, target: jax.Array, thr: float,
    scale_a: int, scale_b: int, clamp: float | None = None,
) -> jax.Array:
    """Jittable per-keypoint PCK in percent.

    Rebuild of the reference's ``compute_pck_pckh`` family
    (ref /root/reference/baseline/WPformer/evaluation.py:6-83 and
    /root/reference/cross_dataset_test/HPE-Li/utils/eval.py:44-76): the
    normalizer is the distance between target keypoints ``scale_a`` and
    ``scale_b`` (variant-specific indices), and the result is a
    ``[K + 1]`` array — per-joint PCK for each of the K keypoints followed
    by the overall PCK, each scaled to percent.

    Args are ``[B, K, D]`` keypoint-major (the reference uses coordinate-
    major ``[n, 2, K]``; the named wrappers below handle that layout).
    ``clamp`` preserves the variant split: the 15-kp variant clamps the
    scale at 1e-6 (evaluation.py:76), the 17/18-kp variants do not.
    """
    pred = _as_keypoints(pred).astype(jnp.float32)
    target = _as_keypoints(target).astype(jnp.float32)
    scale = jnp.sqrt(jnp.sum(
        (target[:, scale_a] - target[:, scale_b]) ** 2, axis=-1))
    if clamp is not None:
        scale = jnp.maximum(scale, clamp)
    dist = jnp.sqrt(jnp.sum((pred - target) ** 2, axis=-1)) / scale[:, None]
    correct = (dist <= thr).astype(jnp.float32)           # [B, K]
    per_joint = 100.0 * jnp.mean(correct, axis=0)         # [K]
    overall = 100.0 * jnp.mean(correct)
    return jnp.concatenate([per_joint, overall[None]])


def _coord_major_to_kp(x) -> jax.Array:
    """Reference layout [n, D, K] -> [n, K, D]; [B, K, 2|3] passes through."""
    x = jnp.asarray(x)
    # Mirrors evaluation.py:66-68's auto-transpose: treat a small middle
    # axis (2 or 3 = coords) as coordinate-major.
    if x.shape[1] in (2, 3) and x.shape[2] not in (2, 3):
        return jnp.transpose(x, (0, 2, 1))
    return x


def compute_pck_pckh(dt_kpts, gt_kpts, thr: float):
    """17-keypoint per-joint PCK, WPformer variant.

    Ref /root/reference/baseline/WPformer/evaluation.py:6-31 — scale is
    the gt distance between keypoints 5 and 12, no clamp.  Accepts the
    reference's ``[n, 2, 17]`` layout or ``[n, 17, 2]``.  Returns a
    length-18 numpy array in percent (index 17 = overall).
    """
    import numpy as np
    return np.asarray(pck_per_keypoint(
        _coord_major_to_kp(dt_kpts), _coord_major_to_kp(gt_kpts),
        thr, 5, 12))


def compute_pck_pckh_hpeli(dt_kpts, gt_kpts, thr: float):
    """17-keypoint per-joint PCK, HPE-Li variant (scale indices 1/11).

    Ref /root/reference/cross_dataset_test/HPE-Li/utils/eval.py:44-76.
    """
    import numpy as np
    return np.asarray(pck_per_keypoint(
        _coord_major_to_kp(dt_kpts), _coord_major_to_kp(gt_kpts),
        thr, 1, 11))


def compute_pck_pckh_18(dt_kpts, gt_kpts, thr: float):
    """18-keypoint (WiPose) per-joint PCK; scale indices 6/13.

    Ref /root/reference/baseline/WPformer/evaluation.py:33-57.
    """
    import numpy as np
    return np.asarray(pck_per_keypoint(
        _coord_major_to_kp(dt_kpts), _coord_major_to_kp(gt_kpts),
        thr, 6, 13))


def compute_pck_pckh_15(dt_kpts, gt_kpts, thr: float):
    """15-keypoint (Setting 1) per-joint PCK; scale 2/12 clamped at 1e-6.

    Ref /root/reference/baseline/WPformer/evaluation.py:60-83.
    """
    import numpy as np
    return np.asarray(pck_per_keypoint(
        _coord_major_to_kp(dt_kpts), _coord_major_to_kp(gt_kpts),
        thr, 2, 12, clamp=1e-6))


def pckh_fractions_fn(scale_a: int, scale_b: int,
                      clamp: float | None = None):
    """Factory for an engine-compatible ``pck_fn(pred, target, thresholds)``
    using the ``compute_pck_pckh`` normalization (target keypoints
    ``scale_a``/``scale_b``, x/y coords only).  Used by the HPE-Li
    robustness driver (ref HPE-Li/main.py:215-226 evaluates with
    utils/eval.py's compute_pck_pckh, scale indices 1/11)."""
    def fn(pred: jax.Array, target: jax.Array,
           thresholds: Sequence[float]) -> jax.Array:
        p = _as_keypoints(pred)[..., :2].astype(jnp.float32)
        t = _as_keypoints(target)[..., :2].astype(jnp.float32)
        scale = jnp.sqrt(jnp.sum((t[:, scale_a] - t[:, scale_b]) ** 2,
                                 axis=-1))
        if clamp is not None:
            scale = jnp.maximum(scale, clamp)
        dist = jnp.sqrt(jnp.sum((p - t) ** 2, axis=-1)) / scale[:, None]
        thr = jnp.asarray(thresholds, jnp.float32)
        return jnp.mean((dist[None] <= thr[:, None, None])
                        .astype(jnp.float32), axis=(1, 2))
    return fn


def mpjpe(pred: jax.Array, target: jax.Array) -> jax.Array:
    """Mean per-joint position error (jittable; ref: utils/metrics.py:36-46)."""
    pred = _as_keypoints(pred).astype(jnp.float32)
    target = _as_keypoints(target).astype(jnp.float32)
    return jnp.mean(jnp.sqrt(jnp.sum((pred - target) ** 2, axis=-1)))


def calculate_mpjpe(pred, target) -> float:
    return float(mpjpe(pred, target))
