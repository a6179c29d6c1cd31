"""Per-stage train-step (fwd+bwd) timing on the real TPU chip.

Times K data-chained optimizer-ish steps (p -= 1e-6 * grad) inside one
jitted lax.scan at two K values and takes the slope — the same timing
discipline as bench.py (block_until_ready is unreliable under axon).

Usage: python measured/profile_train_r03.py [batch]
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

sys.path.insert(0, ".")

from wiflow_tpu.core.config import ModelConfig
from wiflow_tpu.models.wiflow import (
    ConvBlock, DualAxialAttention, TCNStack, WiFlowPoseModel,
)

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 256
CFG = ModelConfig()


class TCNOnly(nn.Module):
    @nn.compact
    def __call__(self, x, *, train=False):
        x = x.astype(jnp.bfloat16)
        x = jnp.transpose(x, (0, 2, 1))
        x = TCNStack(CFG.num_subcarriers, tuple(CFG.tcn_channels),
                     CFG.tcn_kernel_size, CFG.tcn_groups, CFG.dropout,
                     name="tcn")(x, train=train)
        return jnp.mean(x.astype(jnp.float32))


class ConvOnly(nn.Module):
    @nn.compact
    def __call__(self, x, *, train=False):
        x = x.astype(jnp.bfloat16)[..., None]     # [B, 20, 240, 1]
        x = ConvBlock(1, CFG.conv_channels[0], stride_w=1,
                      dropout=CFG.conv_dropout, name="up")(x, train=train)
        n_in = CFG.conv_channels[0]
        for j, n_out in enumerate(CFG.conv_channels):
            x = ConvBlock(n_in, n_out, stride_w=2, dropout=CFG.conv_dropout,
                          name=f"residual_blocks_{j}")(x, train=train)
            n_in = n_out
        return jnp.mean(x.astype(jnp.float32))


class AttnOnly(nn.Module):
    @nn.compact
    def __call__(self, x, *, train=False):
        x = x.astype(jnp.bfloat16)
        x = DualAxialAttention(CFG.conv_channels[-1],
                               groups=CFG.attention_groups,
                               name="attention")(x, train=train)
        return jnp.mean(x.astype(jnp.float32))


class FullModel(nn.Module):
    @nn.compact
    def __call__(self, x, *, train=False):
        return jnp.mean(WiFlowPoseModel(CFG, name="m")(x, train=train))


def time_train_step(model, x_shape, label):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((BATCH,) + x_shape)
                    .astype(np.float32))
    variables = jax.jit(functools.partial(model.init, train=False))(
        {"params": jax.random.key(0)}, x[:1])
    params, stats = variables["params"], variables.get("batch_stats", {})

    def step(params, stats):
        def loss_fn(p):
            out, mut = model.apply(
                {"params": p, "batch_stats": stats}, x, train=True,
                mutable=["batch_stats"],
                rngs={"dropout": jax.random.key(1)})
            return out, mut["batch_stats"]
        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        new_p = jax.tree.map(lambda p, g: p - 1e-6 * g, params, grads)
        return new_p, new_stats, loss

    def timed(k):
        @jax.jit
        def run(params, stats):
            def body(c, _):
                p, s, _ = step(c[0], c[1])
                return (p, s), None
            (p, s), _ = jax.lax.scan(body, (params, stats), None, length=k)
            return jax.tree.map(lambda t: jnp.sum(t) * 0,
                                jax.tree.leaves(p)[0])
        float(run(params, stats))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(params, stats))
            best = min(best, time.perf_counter() - t0)
        return best

    k_lo, k_hi = 4, 16
    slope = (timed(k_hi) - timed(k_lo)) / (k_hi - k_lo)
    print(f"{label:18s} {slope * 1e3:8.2f} ms/step  (batch {BATCH})",
          flush=True)
    return slope


RUN_BASE = not (len(sys.argv) > 2 and sys.argv[2] == "variants")
if __name__ == "__main__" and RUN_BASE:
    time_train_step(FullModel(), (540, 20), "full")
    time_train_step(TCNOnly(), (540, 20), "tcn")
    time_train_step(ConvOnly(), (20, 240), "conv_stack")
    time_train_step(AttnOnly(), (15, 20, 64), "attention")


CFG_ND = ModelConfig(dropout=0.0, conv_dropout=0.0)


class FullNoDrop(nn.Module):
    @nn.compact
    def __call__(self, x, *, train=False):
        return jnp.mean(WiFlowPoseModel(CFG_ND, name="m")(x, train=train))


class TCNNoDrop(nn.Module):
    @nn.compact
    def __call__(self, x, *, train=False):
        x = x.astype(jnp.bfloat16)
        x = jnp.transpose(x, (0, 2, 1))
        x = TCNStack(CFG.num_subcarriers, tuple(CFG.tcn_channels),
                     CFG.tcn_kernel_size, CFG.tcn_groups, 0.0,
                     name="tcn")(x, train=train)
        return jnp.mean(x.astype(jnp.float32))


class ConvNoDrop(nn.Module):
    @nn.compact
    def __call__(self, x, *, train=False):
        x = x.astype(jnp.bfloat16)[..., None]
        x = ConvBlock(1, CFG.conv_channels[0], stride_w=1,
                      dropout=0.0, name="up")(x, train=train)
        n_in = CFG.conv_channels[0]
        for j, n_out in enumerate(CFG.conv_channels):
            x = ConvBlock(n_in, n_out, stride_w=2, dropout=0.0,
                          name=f"residual_blocks_{j}")(x, train=train)
            n_in = n_out
        return jnp.mean(x.astype(jnp.float32))


if len(sys.argv) > 2 and sys.argv[2] == "variants":
    time_train_step(FullNoDrop(), (540, 20), "full_nodrop")
    time_train_step(TCNNoDrop(), (540, 20), "tcn_nodrop")
    time_train_step(ConvNoDrop(), (20, 240), "conv_nodrop")
