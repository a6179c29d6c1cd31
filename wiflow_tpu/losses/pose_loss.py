"""Pose loss: position term + bone-length consistency term.

Rebuild of ref /root/reference/losses/pose_loss.py:5-88 with exact
numerics: smooth-L1 beta 0.1 on positions, beta 0.05 on the 14 bone
lengths (sqrt(sum(diff^2) + 1e-8)), bone weight 0.2.  'mse' and 'l1'
variants are switchable as in the reference.

Pure jittable functions; the [B,30]->[B,15,2] tolerant reshape of the
reference (pose_loss.py:47-51) is handled by the caller-facing wrapper.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from wiflow_tpu.core.config import LossConfig, SKELETON_CONNECTIONS


def smooth_l1(diff: jax.Array, beta: float) -> jax.Array:
    """torch ``F.smooth_l1_loss`` elementwise (mean-reduced by caller)."""
    ad = jnp.abs(diff)
    return jnp.where(ad < beta, 0.5 * ad * ad / beta, ad - 0.5 * beta)


def bone_lengths(keypoints: jax.Array, connections=SKELETON_CONNECTIONS) -> jax.Array:
    """Per-edge bone lengths ``[..., E]`` (ref: pose_loss.py:26-33)."""
    starts = jnp.asarray([s for s, _ in connections])
    ends = jnp.asarray([e for _, e in connections])
    vec = jnp.take(keypoints, ends, axis=-2) - jnp.take(keypoints, starts, axis=-2)
    return jnp.sqrt(jnp.sum(vec * vec, axis=-1) + 1e-8)


def pose_loss(
    pred: jax.Array,
    target: jax.Array,
    cfg: LossConfig = LossConfig(),
    connections=SKELETON_CONNECTIONS,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Total loss and components for ``[B, K, D]`` predictions/targets."""
    if pred.ndim == 2:
        pred = pred.reshape(pred.shape[0], -1, 2)
    if target.ndim == 2:
        target = target.reshape(target.shape[0], -1, 2)
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)

    diff = pred - target
    if cfg.loss_type == "mse":
        position = jnp.mean(diff * diff)
    elif cfg.loss_type == "l1":
        position = jnp.mean(jnp.abs(diff))
    elif cfg.loss_type == "smooth_l1":
        position = jnp.mean(smooth_l1(diff, cfg.position_beta))
    else:
        raise ValueError(f"Unknown loss type: {cfg.loss_type}")

    bd = bone_lengths(pred, connections) - bone_lengths(target, connections)
    if cfg.loss_type == "mse":
        bone = jnp.mean(bd * bd)
    elif cfg.loss_type == "l1":
        bone = jnp.mean(jnp.abs(bd))
    else:
        bone = jnp.mean(smooth_l1(bd, cfg.bone_beta))

    total = cfg.position_weight * position + cfg.bone_weight * bone
    return total, {"position": position, "bone": bone}
