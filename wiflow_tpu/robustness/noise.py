"""Noise injection for robustness studies (fault injection as data
corruption — SURVEY.md §5).

Rebuild of ref /root/reference/cross_dataset_test/HPE-Li/utils/noise.py:
  * AWGN with std = noise_level * dynamic range (:12-29),
  * salt-and-pepper: noise_level * size entries split 50/50 to 1 / 0,
    sampled with replacement like the reference (:31-53).

Both numpy (host-side, reference-exact) and jittable jnp variants.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def add_awgn(signal: np.ndarray, noise_level: float,
             rng: np.random.Generator | None = None) -> np.ndarray:
    rng = rng or np.random.default_rng()
    std = noise_level * (np.max(signal) - np.min(signal))
    return signal + rng.normal(0.0, std, signal.shape).astype(signal.dtype)


def add_salt_and_pepper_noise(signal: np.ndarray, noise_level: float,
                              rng: np.random.Generator | None = None
                              ) -> np.ndarray:
    rng = rng or np.random.default_rng()
    out = np.copy(signal)
    num = int(np.floor(noise_level * signal.size * 0.5))
    for value in (1.0, 0.0):
        coords = tuple(rng.integers(0, dim, num) for dim in signal.shape)
        out[coords] = value
    return out


def add_awgn_jax(x: jax.Array, noise_level: float, key: jax.Array) -> jax.Array:
    std = noise_level * (jnp.max(x) - jnp.min(x))
    return x + jax.random.normal(key, x.shape, x.dtype) * std


def add_salt_and_pepper_jax(x: jax.Array, noise_level: float,
                            key: jax.Array) -> jax.Array:
    """Vectorized S&P: each entry independently flips to 1 or 0 with
    probability noise_level/2 each (the dense-equivalent of the
    reference's index sampling)."""
    u = jax.random.uniform(key, x.shape)
    half = noise_level / 2.0
    x = jnp.where(u < half, jnp.ones_like(x), x)
    x = jnp.where((u >= half) & (u < noise_level), jnp.zeros_like(x), x)
    return x
