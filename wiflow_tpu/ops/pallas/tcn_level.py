"""Fused TCN-level Pallas kernels (inference path).

One kernel per dilated grouped TCN level (ref /root/reference/models/tcn.py
:51-74): causal grouped conv -> BN -> SiLU -> pointwise -> BN -> SiLU,
twice, plus the 1x1 residual and final SiLU — all in VMEM.

The XLA lowering (models/fast.py::_tcn_level) already runs the grouped
convs as block-diagonal dense matmuls (20x FLOPs, perfectly tiled), but
each of the ~5 matmuls per level round-trips an [B*T, 540]-class activation
through HBM (~20 x 176 MB over the stack — measured ~half the 11.7 ms TCN
stage).  Here a level's whole chain runs on one [C, T*Nb] VMEM block:

  * lanes are (time, batch) at Nb granularity, so a causal dilated tap is
    a 128-aligned lane slice of a zero-front-padded copy (== pad+chomp,
    ref tcn.py:6-12),
  * every matmul contracts over 240-540 channels — full MXU depth,
  * BN (eval) is folded into the weights by the caller; SiLU, the tap
    accumulation, and the residual all stay in VMEM.

HBM traffic per level collapses to input + output.
"""

from __future__ import annotations

import functools
from typing import Any, List, Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _block_diag(w: jax.Array) -> jax.Array:
    """[G, Ci, Co] grouped weights -> dense [G*Ci, G*Co]."""
    g, ci, co = w.shape
    out = jnp.zeros((g * ci, g * co), w.dtype)
    for gi in range(g):
        out = out.at[gi * ci:(gi + 1) * ci, gi * co:(gi + 1) * co].set(w[gi])
    return out


def _make_level_kernel(ci: int, dil: int, t: int, nb: int, has_ds: bool,
                       dtype):
    def kernel(x_ref, *refs):
        out_ref = refs[-1]
        wrefs = refs[:-1]
        (g1a, g1b, g1c, bg1, wp1, bp1,
         g2a, g2b, g2c, bg2, wp2, bp2) = wrefs[:12]
        x = x_ref[0].astype(dtype)                         # [Ci, T*Nb]

        def tapconv(x2d, taps, b_ref):
            cin = x2d.shape[0]
            xp = jnp.concatenate(
                [jnp.zeros((cin, 2 * dil * nb), dtype), x2d], axis=1)
            acc = None
            for j, wr in enumerate(taps):
                seg = xp[:, j * dil * nb:(j * dil + t) * nb]
                y = jax.lax.dot_general(
                    wr[...].astype(dtype).T, seg, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                acc = y if acc is None else acc + y
            return acc + b_ref[:, :1]

        def pw(x2d, w_ref, b_ref):
            y = jax.lax.dot_general(
                w_ref[...].astype(dtype).T, x2d, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return y + b_ref[:, :1]

        y = jax.nn.silu(tapconv(x, (g1a, g1b, g1c), bg1)).astype(dtype)
        y = jax.nn.silu(pw(y, wp1, bp1)).astype(dtype)
        y = jax.nn.silu(tapconv(y, (g2a, g2b, g2c), bg2)).astype(dtype)
        y = jax.nn.silu(pw(y, wp2, bp2))
        if has_ds:
            res = pw(x, wrefs[12], wrefs[13])
        else:
            res = x.astype(jnp.float32)
        out_ref[0] = jax.nn.silu(y + res).astype(out_ref.dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=("dilations", "block",
                                              "interpret"))
def fused_tcn_eval(x, packed_levels, *, dilations, block: int = 64,
                   interpret: bool = False):
    """Run the folded TCN stack on ``[B, T, C0]`` -> ``[B, T, C_last]``.

    ``packed_levels``: per level, the flat tuple from
    :func:`pack_tcn_levels` (12 or 14 arrays).
    """
    b, t, c0 = x.shape
    nb = block
    pad = (-b) % nb
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0), (0, 0)))
    bp = b + pad
    ng = bp // nb
    # [B, T, C] -> [ng, C, T*Nb]: rows channels, lanes (time, batch)
    xb = x.reshape(ng, nb, t, c0).transpose(0, 3, 2, 1).reshape(ng, c0, t * nb)

    for packed, dil in zip(packed_levels, dilations):
        ci = packed[0].shape[0]
        co = packed[10].shape[1]                           # wp2 cols
        has_ds = len(packed) == 14
        in_specs = [pl.BlockSpec((1, ci, t * nb), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM)]
        for arr in packed:
            in_specs.append(pl.BlockSpec(arr.shape,
                                         lambda i: (0,) * arr.ndim,
                                         memory_space=pltpu.VMEM))
        xb = pl.pallas_call(
            _make_level_kernel(ci, dil, t, nb, has_ds, x.dtype),
            grid=(ng,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, co, t * nb), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((ng, co, t * nb), x.dtype),
            interpret=interpret,
        )(xb, *packed)

    c_last = xb.shape[1]
    out = xb.reshape(ng, c_last, t, nb).transpose(0, 3, 2, 1)
    return out.reshape(bp, t, c_last)[:b]


def pack_tcn_levels(tcn_params, tcn_stats, n_levels, bn_affine_fn,
                    dtype=None) -> List[tuple]:
    """Fold eval BN into each level's weights; block-diag the grouped taps.

    Returns per level a flat tuple: (g1_tap0, g1_tap1, g1_tap2, bg1 [Co,1],
    wp1, bp1, g2_tap0.., bg2, wp2, bp2[, wds, bds]).
    """
    levels = []
    for i in range(n_levels):
        p = tcn_params[f"network_{i}"]
        s = tcn_stats[f"network_{i}"]
        flat: List[Any] = []

        for wkey, bnkey in (("conv1_group_weight", "bn1_group"),
                            ("conv1_pw_weight", "bn1_pw"),
                            ("conv2_group_weight", "bn2_group"),
                            ("conv2_pw_weight", "bn2_pw")):
            sc, bi = bn_affine_fn(p, s, bnkey)
            w = p[wkey]
            if w.ndim == 4:                                # grouped [K,G,Ci,Co]
                k, g, ci, co = w.shape
                wf = w * sc.reshape(g, co)[None, :, None, :]
                for j in range(k):
                    flat.append(_block_diag(wf[j]))        # [G*Ci, G*Co]
                flat.append(bi[:, None])
            else:                                          # pointwise [Ci,Co]
                flat.append(w * sc[None, :])
                flat.append(bi[:, None])

        if "downsample_weight" in p:
            sc, bi = bn_affine_fn(p, s, "downsample_bn")
            flat.append(p["downsample_weight"] * sc[None, :])
            flat.append(bi[:, None])
        if dtype is not None:
            flat = [a.astype(dtype) if a.ndim == 2 and a.shape[1] > 1 else a
                    for a in flat]
        levels.append(tuple(flat))
    return levels
