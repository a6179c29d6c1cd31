"""Traditional time-axis denoising filters.

Rebuild of ref /root/reference/cross_dataset_test/HPE-Li/
traditional_filter/{gaussian_filter,mean_filter}.py: smoothing along the
time axis of ``[B, C, S, T]`` CSI with edge padding.  The Gaussian
kernel's sigma is the std of the *input data* (a quirk of the reference —
kept).  Implemented as vectorized correlation (jnp) rather than the
reference's python loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _smooth_time(x: jax.Array, kernel: jax.Array) -> jax.Array:
    k = kernel.shape[0]
    pad = k // 2
    xp = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (pad, pad)), mode="edge")
    t = x.shape[-1]
    out = jnp.zeros_like(x)
    for j in range(k):
        out = out + kernel[j] * jax.lax.slice_in_dim(xp, j, j + t, axis=-1)
    return out


def gaussian_filter(data, kernel_size: int = 3):
    """Gaussian time smoothing; sigma = std(data) (ref gaussian_filter.py)."""
    x = jnp.asarray(data, jnp.float32)
    pad = kernel_size // 2
    sigma = jnp.std(x)
    grid = jnp.linspace(-pad, pad, kernel_size)
    kernel = jnp.exp(-0.5 * (grid / sigma) ** 2)
    kernel = kernel / jnp.sum(kernel)
    return _smooth_time(x, kernel)


def mean_filter(data, kernel_size: int = 3):
    """Moving-average time smoothing (ref mean_filter.py)."""
    x = jnp.asarray(data, jnp.float32)
    kernel = jnp.full((kernel_size,), 1.0 / kernel_size, jnp.float32)
    return _smooth_time(x, kernel)
