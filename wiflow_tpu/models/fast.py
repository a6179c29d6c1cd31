"""Deployment-grade inference path: BN-folded forward with fused attention.

``fast_forward(variables, x)`` computes exactly what
``WiFlowPoseModel.apply(variables, x, train=False)`` computes, but:

  * every eval-mode BatchNorm is folded into the preceding conv as a
    per-channel affine (one matmul instead of matmul + 2-pass normalize),
  * the dual axial attention runs as the fused Pallas kernel
    (ops/pallas/axial_attention.py) — logits never touch HBM,
  * dropout disappears entirely.

This is the serving path (bench.py, continuous-stream inference); training
and train-time validation use the flax module.  Equivalence is tested in
tests/test_fast_path.py.
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp

from wiflow_tpu.core.config import ModelConfig
from wiflow_tpu.ops.conv import (
    causal_grouped_conv1d, conv1x1_2d, conv1xk_w, conv3x3_2d,
    pointwise_conv1d,
)
from wiflow_tpu.ops.pallas.axial_attention import (
    bn_affine, dual_axial_attention_eval, dual_axial_attention_eval_fused,
    dual_axial_attention_eval_v2, scramble_perm,
)
from wiflow_tpu.ops.pallas.conv_stack import (
    fused_conv_stack_eval, pack_conv_stack,
)
from wiflow_tpu.ops.pallas.tcn_level import fused_tcn_eval, pack_tcn_levels


def _aff(params, stats, name):
    """(scale, bias) for an eval-mode TorchBatchNorm submodule."""
    return bn_affine(params[name]["weight"], params[name]["bias"],
                     stats[name]["running_mean"], stats[name]["running_var"])


def _block_diagonal(w: jax.Array) -> jax.Array:
    """[K, G, Ci, Co] grouped-conv weights -> dense [K, G*Ci, G*Co].

    A grouped conv with 12-27 channels per group pads its 27-wide matmuls
    to 128 lanes (4.7x waste); the dense block-diagonal form spends 20x
    the FLOPs (trivial here) on perfectly tiled 540x540-class matmuls —
    measured 1.8x faster end to end for the TCN.
    """
    k, g, ci, co = w.shape
    out = jnp.zeros((k, g * ci, g * co), w.dtype)
    for gi in range(g):
        out = out.at[:, gi * ci:(gi + 1) * ci, gi * co:(gi + 1) * co].set(
            w[:, gi])
    return out


def _tcn_level(p, s, x, *, dilation: int, groups: int, dtype,
               block_diag: bool = True):
    b, t, _ = x.shape
    n_in = p["conv1_group_weight"].shape[1] * p["conv1_group_weight"].shape[2]
    n_out = p["conv1_pw_weight"].shape[1]

    if "downsample_weight" in p:
        sc, bi = _aff(p, s, "downsample_bn")
        wd = p["downsample_weight"] * sc[None, :]
        res = pointwise_conv1d(x, wd.astype(dtype)) + bi.astype(dtype)
    else:
        res = x

    def grouped(x, wkey, bnkey, dil):
        sc, bi = _aff(p, s, bnkey)
        w = p[wkey]
        k, g, ci, co = w.shape
        wf = w * sc.reshape(g, co)[None, :, None, :]
        if block_diag:
            wbd = _block_diagonal(wf).astype(dtype)
            xp = jnp.pad(x, ((0, 0), (2 * dil, 0), (0, 0)))
            acc = None
            for j in range(k):
                seg = jax.lax.slice_in_dim(xp, j * dil, j * dil + t, axis=1)
                y = jnp.einsum("btc,co->bto", seg, wbd[j],
                               preferred_element_type=jnp.float32)
                acc = y if acc is None else acc + y
            return acc.astype(dtype) + bi.astype(dtype)
        out = causal_grouped_conv1d(
            x.reshape(b, t, g, ci), wf.astype(dtype), dilation=dil)
        return out.reshape(b, t, g * co) + bi.astype(dtype)

    def pw(x, wkey, bnkey):
        sc, bi = _aff(p, s, bnkey)
        w = p[wkey] * sc[None, :]
        return pointwise_conv1d(x, w.astype(dtype)) + bi.astype(dtype)

    out = jax.nn.silu(grouped(x, "conv1_group_weight", "bn1_group", dilation))
    out = jax.nn.silu(pw(out, "conv1_pw_weight", "bn1_pw"))
    out = jax.nn.silu(grouped(out, "conv2_group_weight", "bn2_group", dilation))
    out = jax.nn.silu(pw(out, "conv2_pw_weight", "bn2_pw"))
    return jax.nn.silu(out + res)


def _conv_block(p, s, x, *, stride_w: int, dtype):
    sc, bi = _aff(p, s, "downsample_bn")
    wd = p["downsample_weight"] * sc[None, :]
    identity = conv1x1_2d(x, wd.astype(dtype), stride_w=stride_w) \
        + bi.astype(dtype)

    out = x
    for idx, stride in ((1, stride_w), (2, 1), (3, 1)):
        sc, bi = _aff(p, s, f"bn{idx}")
        w = p[f"conv{idx}_weight"] * sc[None, None, :]
        b = sc * p[f"conv{idx}_bias"] + bi
        out = conv1xk_w(out, w.astype(dtype), b.astype(dtype),
                        stride=stride, padding=1)
        if idx < 3:
            out = jax.nn.silu(out)
    return jax.nn.silu(out + identity)


@functools.partial(jax.jit, static_argnames=("config", "attention_block",
                                              "interpret", "fuse_conv_stack",
                                              "attention_impl"))
def fast_forward(variables: Dict[str, Any], x: jax.Array,
                 config: ModelConfig = ModelConfig(),
                 attention_block: int = 128,
                 interpret: bool = False,
                 fuse_conv_stack: bool = True,
                 attention_impl: str = "v2",
                 fuse_tcn: bool = True) -> jax.Array:
    """[B, 540, 20] -> [B, 15, 2], eval semantics, fused/folded."""
    cfg = config
    p, s = variables["params"], variables["batch_stats"]
    dtype = jnp.dtype(cfg.compute_dtype)
    b = x.shape[0]
    x = x.astype(dtype)

    x = jnp.transpose(x, (0, 2, 1))                    # [B, T, C]
    n_levels = len(cfg.tcn_channels)
    if fuse_tcn:
        packed_levels = pack_tcn_levels(p["tcn"], s["tcn"], n_levels, _aff,
                                        dtype=dtype)
        x = fused_tcn_eval(x, packed_levels,
                           dilations=tuple(2 ** i for i in range(n_levels)),
                           interpret=interpret)
    else:
        for i in range(n_levels):
            x = _tcn_level(p["tcn"][f"network_{i}"], s["tcn"][f"network_{i}"],
                           x, dilation=2 ** i, groups=cfg.tcn_groups,
                           dtype=dtype)

    t = cfg.window_size
    if fuse_conv_stack:
        packed, widths, strides = pack_conv_stack(
            p, s, cfg.conv_channels, _aff)
        rows = x.reshape(b * t, cfg.tcn_channels[-1])
        y = fused_conv_stack_eval(rows, packed, widths=widths,
                                  strides=strides,
                                  interpret=interpret)   # [R, C, W_last]
        w_last = y.shape[-1]
        c_last = cfg.conv_channels[-1]
        # [B*T, C, W] -> [B, W(=15), T, C]
        x = y.reshape(b, t, c_last, w_last).transpose(0, 3, 1, 2)
    else:
        x = x[..., None]                               # [B, 20, 240, 1]
        x = _conv_block(p["up"], s["up"], x, stride_w=1, dtype=dtype)
        for j in range(len(cfg.conv_channels)):
            x = _conv_block(p[f"residual_blocks_{j}"],
                            s[f"residual_blocks_{j}"], x, stride_w=2,
                            dtype=dtype)
        x = jnp.transpose(x, (0, 2, 1, 3))             # [B, 15, 20, 64]

    if attention_impl in ("v2", "dual"):
        # v2/dual return channels in scrambled (cc, g) order; the
        # unscramble is folded into decoder_conv1's input-channel axis
        # below — zero runtime permutation.
        attn = (dual_axial_attention_eval_fused if attention_impl == "dual"
                else dual_axial_attention_eval_v2)
        x = attn(
            x, p["attention"], s["attention"], groups=cfg.attention_groups,
            block=attention_block, interpret=interpret).astype(dtype)
        chan_perm = scramble_perm(cfg.conv_channels[-1], cfg.attention_groups)
    else:
        x = dual_axial_attention_eval(
            x, p["attention"], s["attention"], groups=cfg.attention_groups,
            block=attention_block, interpret=interpret).astype(dtype)
        chan_perm = None

    sc, bi = _aff(p, s, "decoder_bn1")
    w1 = p["decoder_conv1_weight"] * sc[None, None, None, :]
    if chan_perm is not None:
        w1 = w1[:, :, chan_perm, :]
    b1 = sc * p["decoder_conv1_bias"] + bi
    x = jax.nn.silu(conv3x3_2d(x, w1.astype(dtype), b1.astype(dtype)))

    sc, bi = _aff(p, s, "decoder_bn2")
    w2 = p["decoder_conv2_weight"] * sc[None, :]
    b2 = sc * p["decoder_conv2_bias"] + bi
    x = jax.nn.silu(conv1x1_2d(x, w2.astype(dtype)) + b2.astype(dtype))

    return jnp.mean(x.astype(jnp.float32), axis=2)     # [B, 15, 2]


@functools.partial(jax.jit, static_argnames=("config", "attention_block",
                                              "interpret"))
def fast_forward_mmfi(variables: Dict[str, Any], x: jax.Array,
                      config=None, attention_block: int = 128,
                      interpret: bool = False) -> jax.Array:
    """MM-Fi serving path: [B, 3, 114, 10] -> [B, 17, 3], eval semantics.

    Same kernel lineup as :func:`fast_forward` re-dimensioned for the
    cross-dataset model (models/wiflow_mmfi.py; ref cross_dataset_test/
    WiFlow/wiflow.py:441-530): 3-level TCN groups=18, 1x1 projection to
    272, conv stack 272->17, dual attention on [B, 17, 10, 64], decoder on
    the last timestep.
    """
    from wiflow_tpu.models.wiflow_mmfi import MMFiModelConfig
    cfg = config or MMFiModelConfig()
    p, s = variables["params"], variables["batch_stats"]
    dtype = jnp.dtype(cfg.compute_dtype)
    b = x.shape[0]
    x = x.astype(dtype)

    x = x.reshape(b, cfg.input_channels, cfg.window_size)
    x = jnp.transpose(x, (0, 2, 1))                    # [B, T=10, 342]
    n_levels = len(cfg.tcn_channels)
    packed_levels = pack_tcn_levels(p["tcn"], s["tcn"], n_levels, _aff,
                                    dtype=dtype)
    x = fused_tcn_eval(x, packed_levels,
                       dilations=tuple(2 ** i for i in range(n_levels)),
                       interpret=interpret)            # [B, 10, 288]

    sc, bi = _aff(p, s, "tcn_proj_bn")
    wproj = p["tcn_proj_weight"] * sc[None, :]
    x = jax.nn.silu(pointwise_conv1d(x, wproj.astype(dtype))
                    + bi.astype(dtype))                # [B, 10, 272]

    t = cfg.window_size
    packed, widths, strides = pack_conv_stack(
        p, s, cfg.conv_channels, _aff, w0=cfg.tcn_proj_channels)
    rows = x.reshape(b * t, cfg.tcn_proj_channels)
    y = fused_conv_stack_eval(rows, packed, widths=widths, strides=strides,
                              interpret=interpret)     # [R, 64, 17]
    w_last = y.shape[-1]
    c_last = cfg.conv_channels[-1]
    x = y.reshape(b, t, c_last, w_last).transpose(0, 3, 1, 2)

    x = dual_axial_attention_eval_v2(
        x, p["attention"], s["attention"], groups=cfg.attention_groups,
        block=attention_block, interpret=interpret).astype(dtype)
    chan_perm = scramble_perm(c_last, cfg.attention_groups)

    x = x[:, :, -1:, :]                                # last timestep
    sc, bi = _aff(p, s, "final_bn")
    w1 = (p["final_conv1_weight"] * sc[None, :])[chan_perm, :]
    b1 = sc * p["final_conv1_bias"] + bi
    x = jax.nn.silu(conv1x1_2d(x, w1.astype(dtype)) + b1.astype(dtype))

    x = conv1x1_2d(x, p["final_conv2_weight"].astype(dtype)) \
        + p["final_conv2_bias"].astype(dtype)
    return x[:, :, 0, :].astype(jnp.float32)           # [B, 17, 3]
