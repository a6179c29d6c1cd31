"""MM-Fi (Setting 3) metrics: root-relative PCK, root-aligned MPJPE,
and PA-MPJPE (Procrustes-aligned).

Rebuilds of:
  * ref /root/reference/cross_dataset_test/WiFlow/wiflow.py:610-643 —
    keypoints are pelvis-aligned (index 0) before distances; the PCK scale
    is the *unaligned* distance between target keypoints 11 and 1, clamped
    at 1e-5,
  * ref /root/reference/cross_dataset_test/HPE-Li/utils/eval.py:79-188 —
    similarity-transform (Procrustes) alignment for PA-MPJPE.
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax
import jax.numpy as jnp

ROOT_IDX = 0          # pelvis
SCALE_A, SCALE_B = 11, 1
SCALE_CLAMP = 1e-5


def root_relative_pck_fractions(
    pred: jax.Array, target: jax.Array,
    thresholds: Sequence[float],
) -> jax.Array:
    """Jittable [len(thresholds)] correct-keypoint fractions."""
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    pred_rel = pred - pred[:, ROOT_IDX:ROOT_IDX + 1]
    target_rel = target - target[:, ROOT_IDX:ROOT_IDX + 1]
    scale = jnp.sqrt(jnp.sum(
        (target[:, SCALE_A] - target[:, SCALE_B]) ** 2, axis=-1))
    scale = jnp.clip(scale, min=SCALE_CLAMP)
    dist = jnp.sqrt(jnp.sum((pred_rel - target_rel) ** 2, axis=-1))
    dist = dist / scale[:, None]
    thr = jnp.asarray(thresholds, jnp.float32)
    return jnp.mean((dist[None] <= thr[:, None, None]).astype(jnp.float32),
                    axis=(1, 2))


def root_relative_pck(pred, target,
                      thresholds=(0.1, 0.2, 0.3, 0.4, 0.5)) -> Dict[float, float]:
    fr = root_relative_pck_fractions(pred, target, thresholds)
    return {t: float(v) for t, v in zip(thresholds, fr)}


def root_aligned_mpjpe(pred: jax.Array, target: jax.Array) -> jax.Array:
    """Mean joint error after pelvis alignment (wiflow.py:635-643)."""
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    pred_rel = pred - pred[:, ROOT_IDX:ROOT_IDX + 1]
    target_rel = target - target[:, ROOT_IDX:ROOT_IDX + 1]
    return jnp.mean(jnp.sqrt(jnp.sum((pred_rel - target_rel) ** 2, axis=-1)))


def similarity_transform(pred: jax.Array, target: jax.Array) -> jax.Array:
    """Batched Procrustes: optimal scale/rotation/translation of ``pred``
    onto ``target`` (ref HPE-Li utils/eval.py:79-135), jittable.

    Args: ``[B, K, D]`` point sets.  Returns aligned pred ``[B, K, D]``.
    """
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    mu_p = jnp.mean(pred, axis=1, keepdims=True)
    mu_t = jnp.mean(target, axis=1, keepdims=True)
    x = pred - mu_p
    y = target - mu_t
    var_x = jnp.sum(x * x, axis=(1, 2))                    # [B]
    cov = jnp.einsum("bkd,bke->bde", y, x)                 # [B, D, D]
    u, s, vt = jnp.linalg.svd(cov)
    # reflection fix: det(U V^T) must be +1
    det = jnp.linalg.det(jnp.einsum("bde,bef->bdf", u, vt))
    d = jnp.ones((pred.shape[0], cov.shape[-1]))
    d = d.at[:, -1].set(det)
    r = jnp.einsum("bde,be,bef->bdf", u, d, vt)            # [B, D, D]
    scale = jnp.sum(s * d, axis=1) / jnp.maximum(var_x, 1e-12)
    aligned = scale[:, None, None] * jnp.einsum("bkd,bed->bke", x, r) + mu_t
    return aligned


def pa_mpjpe(pred: jax.Array, target: jax.Array) -> jax.Array:
    """Procrustes-aligned MPJPE (ref HPE-Li utils/eval.py:138-188)."""
    aligned = similarity_transform(pred, target)
    return jnp.mean(jnp.sqrt(jnp.sum(
        (aligned - target.astype(jnp.float32)) ** 2, axis=-1)))
