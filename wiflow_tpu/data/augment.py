"""On-device CSI augmentation, PRNG-keyed and fully jittable.

Rebuild of ref /root/reference/utils/augmentation.py:3-35 plus the calling
policy of train.py:187-193 (probabilities 0.6 / 0.6 / 0.5, active from
epoch 1 on).  The reference mutates batches on the GPU with Python loops
per sample; here everything is vectorized ``jnp`` so it fuses into the
jitted train step — augmentation costs ~nothing on TPU.

Semantics preserved (on ``[B, S=540, T=20]`` batches):
  * time_masking: per-sample with prob ``mask_ratio``, 1-2 spans of 5-9
    consecutive *subcarriers* (the reference permutes to [B, 20, 540] first,
    so the masked axis is the subcarrier axis) replaced by the per-time-step
    mean over subcarriers.
  * add_noise: gaussian scaled by ``noise_level * std(batch)``.
  * random_scaling: with prob 0.5, one global scale ~ U(0.9, 1.1).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def time_masking(x: jax.Array, key: jax.Array, mask_ratio: float = 0.3,
                 mask_len_range: Tuple[int, int] = (5, 10)) -> jax.Array:
    """Span masking along the TIME axis of ``[B, C, T]``.

    Torch-exact semantics (ref utils/augmentation.py:3-19): per sample
    with prob ``mask_ratio``, 1-2 spans of 5-9 time steps are replaced by
    each channel's mean over time; span starts are uniform over
    ``[0, T - len)`` like ``torch.randint(0, T - mask_len)``.
    """
    b, c, t = x.shape
    k_apply, k_num, k_len, k_start = jax.random.split(key, 4)
    apply = jax.random.bernoulli(k_apply, mask_ratio, (b,))          # [B]
    num_masks = jax.random.randint(k_num, (b,), 1, 3)                # 1..2
    lens = jax.random.randint(k_len, (b, 2), mask_len_range[0],
                              mask_len_range[1])                     # 5..9
    u = jax.random.uniform(k_start, (b, 2))
    starts = jnp.floor(u * (t - lens)).astype(jnp.int32)  # [0, T-len)

    pos = jnp.arange(t)[None, None, :]                               # [1,1,T]
    span = (pos >= starts[..., None]) & (pos < (starts + lens)[..., None])
    active = jnp.arange(2)[None, :] < num_masks[:, None]             # [B,2]
    masked = jnp.any(span & active[..., None], axis=1)               # [B,T]
    masked &= apply[:, None]

    mean_per_c = jnp.mean(x, axis=2, keepdims=True)                  # [B,C,1]
    return jnp.where(masked[:, None, :], mean_per_c, x)


def add_noise(x: jax.Array, key: jax.Array, noise_level: float = 0.05
              ) -> jax.Array:
    """x + N(0,1) * noise_level * std(x)  (global unbiased std, like torch)."""
    n = x.size
    std = jnp.sqrt(jnp.var(x) * n / max(n - 1, 1))
    return x + jax.random.normal(key, x.shape, x.dtype) * noise_level * std


def random_scaling(x: jax.Array, key: jax.Array,
                   scale_range: Tuple[float, float] = (0.9, 1.1)) -> jax.Array:
    k_apply, k_scale = jax.random.split(key)
    scale = jax.random.uniform(k_scale, (), x.dtype,
                               scale_range[0], scale_range[1])
    apply = jax.random.bernoulli(k_apply, 0.5)
    return jnp.where(apply, x * scale, x)


def augment_batch(x: jax.Array, key: jax.Array) -> jax.Array:
    """The train.py:187-193 policy: masking p=.6, noise p=.6, scaling p=.5.

    Caller gates on epoch > 0 (the reference skips epoch 0).
    """
    k1, k2, k3, k1p, k2p, k3p = jax.random.split(key, 6)
    x = jnp.where(jax.random.bernoulli(k1p, 0.6),
                  time_masking(x, k1, mask_ratio=0.3), x)
    x = jnp.where(jax.random.bernoulli(k2p, 0.6),
                  add_noise(x, k2, noise_level=0.02), x)
    x = jnp.where(jax.random.bernoulli(k3p, 0.5),
                  random_scaling(x, k3, (0.9, 1.1)), x)
    return x
