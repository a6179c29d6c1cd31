"""On-device CSI augmentation, PRNG-keyed and fully jittable.

Rebuild of ref /root/reference/utils/augmentation.py:3-35 plus the calling
policy of train.py:187-193 (probabilities 0.6 / 0.6 / 0.5, active from
epoch 1 on).  The reference mutates batches on the GPU with Python loops
per sample; here everything is vectorized ``jnp`` so it fuses into the
jitted train step — augmentation costs ~nothing on TPU.

IMPORTANT axis note: ``time_masking`` itself masks spans along the LAST
axis of a ``[B, C, T]`` input (ref utils/augmentation.py:3-19), but the
trunk invokes it through a permute — ``time_masking(batch_x.permute(0, 2,
1), mask_ratio=0.3).permute(0, 2, 1)`` at train.py:188 — so on the real
``[B, S=540, T=20]`` batches the masked axis is the SUBCARRIER axis
(1-2 spans of 5-9 of 540 subcarriers, ~1.5% of the axis), and the fill
value is each *time step's* mean over subcarriers.  ``augment_batch``
reproduces that composite exactly.

Torch-fidelity details preserved:
  * span starts ~ ``torch.randint(0, T - mask_len)`` (uniform over
    ``[0, T - len)``, never clamped);
  * the fill mean is recomputed from the PARTIALLY-MASKED tensor for each
    successive span (ref utils/augmentation.py:16-18 reads
    ``masked_x[i, c, :].mean()`` inside the per-mask loop), so a sample
    drawing 2 overlapping spans fills the second with a slightly different
    value — replicated here by applying the two spans sequentially;
  * add_noise: gaussian scaled by ``noise_level * std(batch)`` (global,
    unbiased std like ``torch.std``);
  * random_scaling: with prob 0.5, one global scale ~ U(0.9, 1.1).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def time_masking(x: jax.Array, key: jax.Array, mask_ratio: float = 0.3,
                 mask_len_range: Tuple[int, int] = (5, 10)) -> jax.Array:
    """Span masking along the LAST axis of ``[B, C, T]``.

    Torch-exact semantics (ref utils/augmentation.py:3-19): per sample
    with prob ``mask_ratio``, 1-2 spans of ``len ~ randint(5, 10)`` steps
    are replaced by each channel's mean over the last axis; span starts
    are uniform over ``[0, T - len)`` like ``torch.randint(0, T - len)``.
    Spans are applied sequentially with the fill mean recomputed from the
    partially-masked tensor, matching the reference's in-place loop.

    NOTE: the trunk's train loop calls this through a permute so that the
    masked axis is the subcarrier axis — use :func:`augment_batch` (or
    transpose yourself) for call-site-faithful behavior on CSI windows.
    """
    b, c, t = x.shape
    k_apply, k_num, k_len, k_start = jax.random.split(key, 4)
    apply = jax.random.bernoulli(k_apply, mask_ratio, (b,))          # [B]
    num_masks = jax.random.randint(k_num, (b,), 1, 3)                # 1..2
    lens = jax.random.randint(k_len, (b, 2), mask_len_range[0],
                              mask_len_range[1])                     # 5..9
    u = jax.random.uniform(k_start, (b, 2))
    starts = jnp.floor(u * (t - lens)).astype(jnp.int32)  # [0, T-len)
    return apply_mask_spans(x, apply, num_masks, lens, starts)


def apply_mask_spans(x: jax.Array, apply: jax.Array, num_masks: jax.Array,
                     lens: jax.Array, starts: jax.Array) -> jax.Array:
    """Deterministic core of :func:`time_masking`: apply up to 2 mask spans
    per sample along the last axis of ``[B, C, T]``.

    ``apply [B] bool``, ``num_masks [B] int (1..2)``, ``lens/starts [B, 2]``.
    Spans are applied in order with the fill mean recomputed from the
    partially-masked tensor (ref utils/augmentation.py:9-18's in-place
    loop).  Split out so parity tests can feed torch and JAX the exact
    same randomness.
    """
    _, _, t = x.shape
    pos = jnp.arange(t)[None, :]                                     # [1,T]
    for j in range(2):
        span = (pos >= starts[:, j:j + 1]) & \
               (pos < (starts[:, j] + lens[:, j])[:, None])          # [B,T]
        active = apply & (j < num_masks)                             # [B]
        masked = span & active[:, None]                              # [B,T]
        # Mean over the CURRENT (possibly already span-0-masked) tensor,
        # per channel — ref utils/augmentation.py:16-18.
        mean_per_c = jnp.mean(x, axis=2, keepdims=True)              # [B,C,1]
        x = jnp.where(masked[:, None, :], mean_per_c, x)
    return x


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


def subcarrier_masking(x: jax.Array, key: jax.Array, mask_ratio: float = 0.3,
                       mask_len_range: Tuple[int, int] = (5, 10)) -> jax.Array:
    """The call-site composite of ref train.py:188 on ``[B, S, T]`` CSI:
    ``time_masking(x.permute(0, 2, 1), ...).permute(0, 2, 1)`` — masks 1-2
    spans of 5-9 consecutive SUBCARRIERS, filling with each time step's
    mean over subcarriers."""
    return jnp.swapaxes(
        time_masking(jnp.swapaxes(x, 1, 2), key, mask_ratio, mask_len_range),
        1, 2)


def augment_batch(x: jax.Array, key: jax.Array) -> jax.Array:
    """The train.py:187-193 policy on ``[B, S=540, T=20]`` batches:
    subcarrier-span masking p=.6 (via the permute at train.py:188),
    noise p=.6, scaling p=.5.  Caller gates on epoch > 0 (the reference
    skips epoch 0)."""
    k1, k2, k3, k1p, k2p, k3p = jax.random.split(key, 6)
    x = jnp.where(jax.random.bernoulli(k1p, 0.6),
                  subcarrier_masking(x, k1, mask_ratio=0.3), x)
    x = jnp.where(jax.random.bernoulli(k2p, 0.6),
                  add_noise(x, k2, noise_level=0.02), x)
    x = jnp.where(jax.random.bernoulli(k3p, 0.5),
                  random_scaling(x, k3, (0.9, 1.1)), x)
    return x
