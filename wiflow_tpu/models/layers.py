"""Shared flax.linen building blocks with torch-compatible parameter trees.

Param/stat names deliberately mirror torch's ``state_dict`` leaves
(``weight``/``bias``/``running_mean``/``running_var``) so the checkpoint
import shim (models/torch_compat.py) is a pure name+transpose mapping.
"""

from __future__ import annotations

import math
from typing import Callable

import jax
import jax.numpy as jnp
from flax import linen as nn

from wiflow_tpu.ops.norm import batch_norm_eval, batch_norm_train, dropout, dropout2d


def kaiming_normal_fan_out(fan_out: int) -> Callable:
    """torch ``kaiming_normal_(mode='fan_out', nonlinearity='relu')``.

    Used for every Conv1d in the reference via the model-level init sweep
    (ref: /root/reference/models/pose_model.py:57-62).  ``fan_out`` follows
    torch's convention: total output channels x receptive-field size.
    """
    std = math.sqrt(2.0 / fan_out)

    def init(key, shape, dtype=jnp.float32):
        return std * jax.random.normal(key, shape, dtype)

    return init


def torch_conv_default(fan_in: int) -> Callable:
    """torch's default Conv init: ``kaiming_uniform_(a=sqrt(5))``.

    Applies to the Conv2d weights, which the reference's init sweep skips
    (it only handles Conv1d/BatchNorm1d/LayerNorm/Linear).
    Bound = sqrt(1 / fan_in) with fan_in = (in_ch / groups) * kh * kw.
    """
    bound = math.sqrt(1.0 / fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def torch_bias_default(fan_in: int) -> Callable:
    """torch's default conv bias init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    bound = 1.0 / math.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class TorchBatchNorm(nn.Module):
    """BatchNorm with torch numerics (eps 1e-5, momentum 0.1, unbiased
    running var).  Works for any rank via ``channel_axis``.

    ``perm`` (static channel permutation, len == features): normalize an
    activation whose channel at position ``i`` is *standard* channel
    ``perm[i]`` while keeping params/stats in standard (checkpoint) order.
    Only the [C]-sized param/stat vectors are gathered — never the
    activation — so a scrambled-layout caller (the fused attention path)
    pays nothing at tensor scale.  Running stats are written back through
    the inverse permutation.
    """

    features: int
    channel_axis: int = -1
    perm: tuple | None = None

    @nn.compact
    def __call__(self, x: jax.Array | None, *, train: bool,
                 moments: tuple | None = None, dtype=None):
        """Normalize ``x`` — or, when ``moments=(mean, var)`` is given
        (the fused stage path, ops/pallas/stage_fused.py), skip the
        tensor work: update the running stats from the supplied batch
        moments and return the per-channel apply vectors
        ``(m, a, b)`` such that ``y = (x - m) * a + b`` reproduces
        ops/norm.batch_norm_train bit for bit in ``dtype``."""
        gamma = self.param("weight", nn.initializers.ones, (self.features,))
        beta = self.param("bias", nn.initializers.zeros, (self.features,))
        ra_mean = self.variable(
            "batch_stats", "running_mean",
            lambda: jnp.zeros((self.features,), jnp.float32))
        ra_var = self.variable(
            "batch_stats", "running_var",
            lambda: jnp.ones((self.features,), jnp.float32))

        if moments is not None:
            assert train and self.perm is None
            from wiflow_tpu.ops.norm import EPS, MOMENTUM
            mean, var, count = moments
            inv = jax.lax.rsqrt(var + EPS)
            a = (gamma.astype(jnp.float32) * inv).astype(dtype)
            if not self.is_initializing():
                unbiased = var * (count / max(count - 1, 1))
                ra_mean.value = ((1.0 - MOMENTUM) * ra_mean.value
                                 + MOMENTUM * mean)
                ra_var.value = ((1.0 - MOMENTUM) * ra_var.value
                                + MOMENTUM * unbiased)
            return mean.astype(dtype), a, beta.astype(dtype)

        if self.perm is not None:
            import numpy as np
            p = np.asarray(self.perm, dtype=np.int32)
            inv = np.argsort(p)
            gamma, beta = gamma[p], beta[p]
            run_mean, run_var = ra_mean.value[p], ra_var.value[p]
        else:
            inv = None
            run_mean, run_var = ra_mean.value, ra_var.value

        if train:
            y, new_mean, new_var = batch_norm_train(
                x, gamma, beta, run_mean, run_var,
                channel_axis=self.channel_axis)
            if not self.is_initializing():
                if inv is not None:
                    new_mean, new_var = new_mean[inv], new_var[inv]
                ra_mean.value = new_mean
                ra_var.value = new_var
            return y
        return batch_norm_eval(
            x, run_mean, run_var, gamma, beta,
            channel_axis=self.channel_axis)


class TorchDropout(nn.Module):
    """Elementwise dropout (torch ``nn.Dropout``)."""

    rate: float

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool) -> jax.Array:
        if not train or self.rate <= 0.0:
            return x
        return dropout(x, self.rate, self.make_rng("dropout"))


class TorchDropout2d(nn.Module):
    """Channel dropout (torch ``nn.Dropout2d``) for ``[B,H,W,C]`` inputs."""

    rate: float

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool) -> jax.Array:
        if not train or self.rate <= 0.0:
            return x
        return dropout2d(x, self.rate, self.make_rng("dropout"))


def silu(x: jax.Array) -> jax.Array:
    return jax.nn.silu(x)
