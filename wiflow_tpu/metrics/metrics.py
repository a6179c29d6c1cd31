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


def mpjpe(pred: jax.Array, target: jax.Array) -> jax.Array:
    """Mean per-joint position error (jittable; ref: utils/metrics.py:36-46)."""
    pred = _as_keypoints(pred).astype(jnp.float32)
    target = _as_keypoints(target).astype(jnp.float32)
    return jnp.mean(jnp.sqrt(jnp.sum((pred - target) ** 2, axis=-1)))


def calculate_mpjpe(pred, target) -> float:
    return float(mpjpe(pred, target))
