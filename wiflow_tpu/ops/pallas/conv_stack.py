"""Fused conv-block-stack Pallas kernel (inference path).

The WiFlow conv stack (ConvBlock1 + 4 stride-2 AsymmetricConvBlocks, ref
/root/reference/models/convnet.py) runs on activations with 8-64 channels.
Any XLA lowering leaves a <=64-wide minor dim that pads 2-16x against the
TPU's (8, 128) tiles — measured at ~60 ms of a ~120 ms batch-4096 forward.

This kernel processes blocks of Nb=256 rows (row = one (sample, time)
pair) entirely in VMEM using a 2-D ``[C, W*Nb]`` activation layout:

  * channels in sublanes (8/16/32/64 — all tile-aligned),
  * the W axis major within lanes at Nb granularity, so a conv tap shift
    is a 128-aligned contiguous lane slice, and stride-2 is a reshape to
    ``[C, W/2, 2Nb]`` + first-half lane slice,
  * each conv is 3 MXU dots ``[C_out, C_in] x [C_in, W*Nb]``.

Eval-mode BN is folded into the conv weights by the caller; SiLU and the
residual shortcut run in-kernel.  HBM traffic collapses to the stack's
input + output.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _conv1x3(x2d, w_ref, b_ref, c_in, c_out, w_len, stride, nb, dtype):
    """One (1,3) conv, pad 1: x2d [C_in, W*Nb] -> [C_out, W_out*Nb]."""
    zeros = jnp.zeros((c_in, nb), dtype)
    xp = jnp.concatenate([zeros, x2d, zeros], axis=1)     # [C_in, (W+2)*Nb]
    w_out = (w_len + 2 - 3) // stride + 1
    acc = None
    for j in range(3):
        seg = xp[:, j * nb:(j + w_len) * nb]              # [C_in, W*Nb]
        if stride == 2:
            seg = seg.reshape(c_in, w_out, 2 * nb)[:, :, :nb]
            seg = seg.reshape(c_in, w_out * nb)
        wj = w_ref[j * c_in:(j + 1) * c_in, :]            # [C_in, C_out]
        y = jax.lax.dot_general(
            wj.astype(dtype).T, seg, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc = y if acc is None else acc + y
    return acc + b_ref[:, :1]                             # [C_out, W_out*Nb]


def _conv1x1(x2d, w_ref, b_ref, c_in, c_out, w_len, stride, nb, dtype):
    """1x1 (optionally stride-2) conv: [C_in, W*Nb] -> [C_out, W_out*Nb]."""
    if stride == 2:
        w_out = w_len // 2
        x2d = x2d.reshape(c_in, w_out, 2 * nb)[:, :, :nb]
        x2d = x2d.reshape(c_in, w_out * nb)
    y = jax.lax.dot_general(
        w_ref[...].astype(dtype).T, x2d, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return y + b_ref[:, :1]


def _make_kernel(plan: Sequence[Dict], nb: int, dtype):
    """plan: per block {'c_in', 'c_out', 'w_in', 'stride'}."""

    def kernel(x_ref, *refs):
        out_ref = refs[-1]
        wrefs = refs[:-1]
        x = x_ref[0].astype(dtype)                        # [W0, Nb] -> 2D?
        c = 1
        x2d = x.reshape(1, -1)                            # [1, W0*Nb]
        ri = 0
        for blk in plan:
            ci, co, w_in, s = (blk["c_in"], blk["c_out"], blk["w_in"],
                               blk["stride"])
            w1, b1, w2, b2, w3, b3, wd, bd = wrefs[ri:ri + 8]
            ri += 8
            identity = _conv1x1(x2d, wd, bd, ci, co, w_in, s, nb, dtype)
            y = _conv1x3(x2d, w1, b1, ci, co, w_in, s, nb, dtype)
            y = jax.nn.silu(y).astype(dtype)
            w_mid = (w_in + 2 - 3) // s + 1
            y = _conv1x3(y, w2, b2, co, co, w_mid, 1, nb, dtype)
            y = jax.nn.silu(y).astype(dtype)
            y = _conv1x3(y, w3, b3, co, co, w_mid, 1, nb, dtype)
            x2d = jax.nn.silu(y + identity).astype(dtype)
            # next block input
        out_ref[0] = x2d.astype(out_ref.dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=("widths", "strides", "block",
                                              "interpret"))
def fused_conv_stack_eval(x, packed, *, widths, strides, block: int = 256,
                          interpret: bool = False):
    """Run the folded conv stack.

    Args:
      x: ``[R, W0]`` rows (R = B * time), any float dtype.
      packed: flat list of folded arrays, 8 per block:
        w1 [3*Ci, Co], b1 [Co, 1], w2 [3*Co, Co], b2, w3 [3*Co, Co], b3,
        wd [Ci, Co], bd [Co, 1].
      widths: per-block (c_in, c_out) pairs.
      strides: per-block stride along W.
    Returns ``[R, C_last, W_last]``.
    """
    r, w0 = x.shape
    nb = block
    pad = (-r) % nb
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
    rp = r + pad
    ng = rp // nb
    # [R, W0] -> [ng, W0, Nb] -> [ng, 1, W0*Nb] lane layout (W-major / Nb)
    xb = x.reshape(ng, nb, w0).transpose(0, 2, 1).reshape(ng, 1, w0 * nb)

    plan = []
    w_cur = w0
    for (ci, co), s in zip(widths, strides):
        plan.append({"c_in": ci, "c_out": co, "w_in": w_cur, "stride": s})
        w_cur = (w_cur + 2 - 3) // s + 1
    plan = tuple(plan)
    c_last = widths[-1][1]
    w_last = w_cur

    in_specs = [pl.BlockSpec((1, 1, w0 * nb), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)]
    for arr in packed:
        in_specs.append(pl.BlockSpec(arr.shape, lambda i: (0,) * arr.ndim,
                                     memory_space=pltpu.VMEM))

    out = pl.pallas_call(
        _make_kernel(plan, nb, x.dtype),
        grid=(ng,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, c_last, w_last * nb),
                               lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ng, c_last, w_last * nb), x.dtype),
        interpret=interpret,
    )(xb.reshape(ng, 1, w0 * nb), *packed)

    # [ng, C, W_last*Nb] -> [R, C, W_last]
    out = out.reshape(ng, c_last, w_last, nb).transpose(0, 3, 1, 2)
    return out.reshape(rp, c_last, w_last)[:r]


def pack_conv_stack(params, stats, conv_channels, bn_affine_fn) -> tuple:
    """Fold BN into the conv-block params and pack for the kernel.

    ``params``/``stats``: flax trees holding ``up`` + ``residual_blocks_j``
    (models/wiflow.py::ConvBlock layout).  Returns (packed, widths,
    strides) for ``fused_conv_stack_eval``.
    """
    packed: List[Any] = []
    widths, strides = [], []
    names = ["up"] + [f"residual_blocks_{j}"
                      for j in range(len(conv_channels))]
    blk_strides = [1] + [2] * len(conv_channels)
    w_in = None
    for name, s in zip(names, blk_strides):
        p, st = params[name], stats[name]
        ci = p["conv1_weight"].shape[1]
        co = p["conv1_weight"].shape[2]
        for idx in (1, 2, 3):
            sc, bi = bn_affine_fn(p, st, f"bn{idx}")
            w = p[f"conv{idx}_weight"] * sc[None, None, :]   # [3, Ci, Co]
            b = sc * p[f"conv{idx}_bias"] + bi
            packed.append(w.reshape(-1, w.shape[-1]))        # [3*Ci, Co]
            packed.append(b[:, None])                        # [Co, 1]
        sc, bi = bn_affine_fn(p, st, "downsample_bn")
        packed.append(p["downsample_weight"] * sc[None, :])  # [Ci, Co]
        packed.append(bi[:, None])
        widths.append((ci, co))
        strides.append(s)
    return packed, tuple(widths), tuple(strides)
