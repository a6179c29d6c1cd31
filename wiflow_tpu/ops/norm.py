"""Batch normalization with exact torch semantics, as pure functions.

The reference uses BatchNorm pervasively — BatchNorm1d after every TCN conv
(ref: /root/reference/models/tcn.py:24-41), BatchNorm2d in the conv blocks
and decoder (convnet.py:13-28, pose_model.py:46-49), and, unusually,
BatchNorm on attention *logits* and outputs (attention.py:25-27,62,68).
SURVEY.md §7 flags train/eval duality + running-stat plumbing as hard part 1.

torch semantics replicated here:
  * normalization uses the biased batch variance,
  * running stats update with the *unbiased* variance:
      running <- (1 - m) * running + m * batch,  m = 0.1,
  * eps = 1e-5.

Under GSPMD data parallelism the batch axis is sharded, so the ``jnp.mean``
reductions below automatically become cross-replica collectives — this gives
synced-BN, i.e. exactly the semantics of the reference's single-GPU runs at
the same global batch size.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

EPS = 1e-5
MOMENTUM = 0.1


def batch_norm_eval(x: jax.Array, mean: jax.Array, var: jax.Array,
                    gamma: jax.Array, beta: jax.Array,
                    *, channel_axis: int = -1, eps: float = EPS) -> jax.Array:
    """Inference-mode BN using running statistics."""
    shape = [1] * x.ndim
    shape[channel_axis] = x.shape[channel_axis]
    inv = jax.lax.rsqrt(var.astype(jnp.float32) + eps)
    # per-channel scale/shift precomputed in fp32, applied in x.dtype:
    # a whole-tensor fp32 upcast materializes at Pallas/fusion boundaries
    # (0.4+ ms/step of convert_element_type in the round-3 trace); the
    # [C]-sized casts below are free and bf16 apply-noise is below the
    # output rounding anyway.
    a = (gamma.astype(jnp.float32) * inv).astype(x.dtype)
    m = mean.astype(x.dtype)
    bt = beta.astype(x.dtype)
    y = (x - m.reshape(shape)) * a.reshape(shape) + bt.reshape(shape)
    return y


def batch_norm_train(
    x: jax.Array, gamma: jax.Array, beta: jax.Array,
    running_mean: jax.Array, running_var: jax.Array,
    *, channel_axis: int = -1, eps: float = EPS, momentum: float = MOMENTUM,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Training-mode BN.

    Returns ``(y, new_running_mean, new_running_var)`` where the running
    update follows torch (momentum 0.1, unbiased variance).
    """
    axes = tuple(i for i in range(x.ndim) if i != channel_axis % x.ndim)
    # fp32-accumulated moments: the converts fuse into the reductions, no
    # fp32 copy of x is ever materialized (see batch_norm_eval note)
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=axes)
    var = jnp.mean(jnp.square(xf), axis=axes) - jnp.square(mean)
    n = 1
    for i in axes:
        n *= x.shape[i]
    unbiased = var * (n / max(n - 1, 1))

    shape = [1] * x.ndim
    shape[channel_axis] = x.shape[channel_axis]
    inv = jax.lax.rsqrt(var + eps)
    a = (gamma.astype(jnp.float32) * inv).astype(x.dtype)
    y = ((x - mean.astype(x.dtype).reshape(shape)) * a.reshape(shape)
         + beta.astype(x.dtype).reshape(shape))

    new_mean = (1.0 - momentum) * running_mean + momentum * mean
    new_var = (1.0 - momentum) * running_var + momentum * unbiased
    return y, new_mean, new_var


def dropout(x: jax.Array, rate: float, key: jax.Array) -> jax.Array:
    """Elementwise dropout with inverted scaling (torch ``nn.Dropout``)."""
    if rate <= 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


def dropout2d(x: jax.Array, rate: float, key: jax.Array) -> jax.Array:
    """Channel dropout (torch ``nn.Dropout2d``): zeroes whole feature maps.

    ``x [B, H, W, C]`` — the mask is shared over (H, W) per (sample, channel)
    (ref: /root/reference/models/convnet.py:15,20).
    """
    if rate <= 0.0:
        return x
    keep = 1.0 - rate
    b, _, _, c = x.shape
    mask = jax.random.bernoulli(key, keep, (b, 1, 1, c))
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)
