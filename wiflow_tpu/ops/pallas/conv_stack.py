"""Fused conv-block-stack Pallas kernel (inference path).

The WiFlow conv stack (ConvBlock1 + 4 stride-2 AsymmetricConvBlocks, ref
/root/reference/models/convnet.py) runs on activations with 1-64 channels
over a 240->15 subcarrier axis.  Two structural problems for the TPU:

  * any XLA lowering leaves a <=64-wide minor dim that pads 2-16x against
    the (8, 128) tiles (measured ~60 ms of a ~120 ms batch-4096 forward);
  * even with activations laid out [C, W*Nb] in VMEM, the MXU dots have
    8-64-deep contractions and 8-64 output rows — the 128x128 systolic
    array streams 85% of its lane-passes nearly empty through the wide
    early blocks (W=240, C=8).

This kernel therefore uses a **space-to-depth chunked layout**: S adjacent
W-positions fold into the sublane (channel) axis, activations live as
``[C*S, n_chunks*Nb]`` with rows ordered (c, w_in_chunk) and lanes ordered
(chunk, batch).  Every (1,3) conv — any stride — becomes an im2col over 3
chunk-shifted lane slices plus ONE MXU dot against a banded weight matrix
``[3*S_in*C_in, S_out*C_out]`` expanded at pack time; 1x1 downsamples are
the K=1 analog.  The chunk size shrinks with W (8 -> 8 -> 4 -> 2 -> 1), so
every dot has a 96-192-deep contraction and 32-64 output rows, and the
last block lands exactly in the plain ``[C, W*Nb]`` output layout.

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


# ---------------------------------------------------------------------------
# banded chunked-conv weight expansion (pack time, host/XLA)
# ---------------------------------------------------------------------------


def _chunk_matrix_map(k: int, ci: int, co: int, stride: int,
                      s_in: int, s_out: int):
    """(idx, mask) expanding taps w[k, ci, co] to [nseg*ci*s_in, s_out*co].

    Row (j, c_i, wi) of the im2col'd activation holds input chunk
    ``cs*chunk_out + j - (1 if k==3 else 0)`` position ``wi`` of channel
    ``c_i``; column (c_o, wo) is output position wo of chunk_out.  For the
    padded (1,3) conv the global input position is ``stride*wo + d - 1``
    relative to the output chunk's input base, i.e. selector
    ``j*s_in + wi == stride*wo + d + s_in - 1``; for the 1x1 downsample
    ``j*s_in + wi == stride*wo``.
    """
    nseg = 3 if k == 3 else max(1, (stride * s_out) // s_in)
    rows, cols = nseg * ci * s_in, s_out * co
    idx = np.zeros((rows, cols), np.int32)
    msk = np.zeros((rows, cols), np.float32)
    for j in range(nseg):
        for c_i in range(ci):
            for wi in range(s_in):
                r = j * ci * s_in + c_i * s_in + wi
                for c_o in range(co):
                    for wo in range(s_out):
                        col = c_o * s_out + wo
                        if k == 3:
                            d = j * s_in + wi - stride * wo - (s_in - 1)
                            if 0 <= d < 3:
                                idx[r, col] = (d * ci + c_i) * co + c_o
                                msk[r, col] = 1.0
                        else:
                            if j * s_in + wi == stride * wo:
                                idx[r, col] = c_i * co + c_o
                                msk[r, col] = 1.0
    return idx, msk


def _expand(w, b, k, stride, s_in, s_out):
    """w [k, ci, co] (or [ci, co] for k=1), b [co] -> banded (W, b_chunk)."""
    if k == 1 and w.ndim == 2:
        w = w[None]
    _, ci, co = w.shape
    idx, msk = _chunk_matrix_map(k, ci, co, stride, s_in, s_out)
    wm = w.reshape(-1)[idx] * msk
    return wm, jnp.repeat(b, s_out)[:, None]


# ---------------------------------------------------------------------------
# kernel
# ---------------------------------------------------------------------------


def _chunk_segs(x2d, rows, n_in, n_out, cs, k, nb, dtype):
    """im2col lane slices: list of [rows, n_out*Nb] chunk-shifted views."""
    if k == 3:
        zeros = jnp.zeros((rows, nb), dtype)
        xp = jnp.concatenate([zeros, x2d, zeros], axis=1)   # pad 1 chunk/side
        segs = []
        for j in range(3):
            if cs == 1:
                segs.append(xp[:, j * nb:(j + n_out) * nb])
            else:
                seg = xp[:, j * nb:(j + cs * n_out) * nb]
                seg = seg.reshape(rows, n_out, cs * nb)[:, :, :nb]
                segs.append(seg.reshape(rows, n_out * nb))
        return segs
    if cs == 1:
        return [x2d]
    xr = x2d.reshape(rows, n_out, cs * nb)
    return [xr[:, :, j * nb:(j + 1) * nb].reshape(rows, n_out * nb)
            for j in range(cs)]


def _chunk_conv(x2d, w_ref, b_ref, rows, n_in, n_out, cs, k, nb, dtype):
    segs = _chunk_segs(x2d, rows, n_in, n_out, cs, k, nb, dtype)
    xcat = segs[0] if len(segs) == 1 else jnp.concatenate(segs, axis=0)
    y = jax.lax.dot_general(
        w_ref[...].astype(dtype).T, xcat, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return y + b_ref[:, :1]


def _make_kernel(plan: Sequence[Dict], nb: int, dtype):
    """plan: per block {'ci','co','s_in','s_out','n_in','n_out','cs'}."""

    def kernel(x_ref, *refs):
        out_ref = refs[-1]
        wrefs = refs[:-1]
        x2d = x_ref[0].astype(dtype)                       # [Ci*S_in, n*Nb]
        ri = 0
        for blk in plan:
            ci, co = blk["ci"], blk["co"]
            s_in, s_out = blk["s_in"], blk["s_out"]
            n_in, n_out, cs = blk["n_in"], blk["n_out"], blk["cs"]
            w1, b1, w2, b2, w3, b3, wd, bd = wrefs[ri:ri + 8]
            ri += 8
            identity = _chunk_conv(x2d, wd, bd, ci * s_in, n_in, n_out, cs,
                                   1, nb, dtype)
            y = _chunk_conv(x2d, w1, b1, ci * s_in, n_in, n_out, cs, 3, nb,
                            dtype)
            y = jax.nn.silu(y).astype(dtype)
            y = _chunk_conv(y, w2, b2, co * s_out, n_out, n_out, 1, 3, nb,
                            dtype)
            y = jax.nn.silu(y).astype(dtype)
            y = _chunk_conv(y, w3, b3, co * s_out, n_out, n_out, 1, 3, nb,
                            dtype)
            x2d = jax.nn.silu(y + identity).astype(dtype)
        out_ref[0] = x2d.astype(out_ref.dtype)

    return kernel


def _plan_chunks(widths, strides, w0: int):
    """Chunk-size schedule: keep S=8 while >16 chunks, then shrink S with W
    so the chunk count stays fixed and the final block is plain (S=1)."""
    plan = []
    s_in, w_cur = 8, w0
    n_in = w0 // s_in
    for (ci, co), stride in zip(widths, strides):
        if stride > 1 and n_in > 16 and n_in % stride == 0:
            cs, s_out = stride, s_in
        elif stride > 1:
            assert s_in % stride == 0, (s_in, stride)
            cs, s_out = 1, s_in // stride
        else:
            cs, s_out = 1, s_in
        n_out = n_in // cs
        plan.append({"ci": ci, "co": co, "s_in": s_in, "s_out": s_out,
                     "n_in": n_in, "n_out": n_out, "cs": cs,
                     "stride": stride})
        s_in, n_in, w_cur = s_out, n_out, w_cur // stride
    return tuple(plan)


@functools.partial(jax.jit, static_argnames=("widths", "strides", "block",
                                              "interpret"))
def fused_conv_stack_eval(x, packed, *, widths, strides, block: int = 256,
                          interpret: bool = False):
    """Run the folded conv stack.

    Args:
      x: ``[R, W0]`` rows (R = B * time), any float dtype.
      packed: flat list from :func:`pack_conv_stack` — 8 banded arrays per
        block: w1, b1, w2, b2, w3, b3 (the three (1,3) convs) and wd, bd
        (the 1x1 downsample), already chunk-expanded and BN-folded.
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

    plan = _plan_chunks(widths, strides, w0)
    s0, n0 = plan[0]["s_in"], plan[0]["n_in"]
    c_last = widths[-1][1]
    s_last, n_last = plan[-1]["s_out"], plan[-1]["n_out"]
    w_last = s_last * n_last

    # [R, W0] -> [ng, Ci0*S0, n0*Nb]: rows (ci=1, w_in_chunk), lanes
    # (chunk, batch) — w = S0*chunk + w_in_chunk.
    xb = x.reshape(ng, nb, n0, s0).transpose(0, 3, 2, 1)
    xb = xb.reshape(ng, s0, n0 * nb)

    in_specs = [pl.BlockSpec((1, s0, n0 * nb), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)]
    for arr in packed:
        in_specs.append(pl.BlockSpec(arr.shape, lambda i: (0,) * arr.ndim,
                                     memory_space=pltpu.VMEM))

    out = pl.pallas_call(
        _make_kernel(plan, nb, x.dtype),
        grid=(ng,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, c_last * s_last, n_last * nb),
                               lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ng, c_last * s_last, n_last * nb),
                                       x.dtype),
        interpret=interpret,
    )(xb, *packed)

    # rows (c, w_in_chunk), lanes (chunk, batch) -> [R, C, W_last]
    out = out.reshape(ng, c_last, s_last, n_last, nb)
    out = out.transpose(0, 4, 1, 3, 2).reshape(rp, c_last, w_last)
    return out[:r]


def pack_conv_stack(params, stats, conv_channels, bn_affine_fn,
                    w0: int = 240) -> tuple:
    """Fold BN into the conv-block params and chunk-expand for the kernel.

    ``params``/``stats``: flax trees holding ``up`` + ``residual_blocks_j``
    (models/wiflow.py::ConvBlock layout).  Returns (packed, widths,
    strides) for ``fused_conv_stack_eval``.
    """
    names = ["up"] + [f"residual_blocks_{j}"
                      for j in range(len(conv_channels))]
    blk_strides = [1] + [2] * len(conv_channels)
    widths = []
    for name in names:
        p = params[name]
        widths.append((p["conv1_weight"].shape[1],
                       p["conv1_weight"].shape[2]))
    widths = tuple(widths)
    strides = tuple(blk_strides)
    plan = _plan_chunks(widths, strides, w0)

    packed: List[Any] = []
    for name, blk in zip(names, plan):
        p, st = params[name], stats[name]
        for idx, stride, s_in, s_out in (
                (1, blk["stride"], blk["s_in"], blk["s_out"]),
                (2, 1, blk["s_out"], blk["s_out"]),
                (3, 1, blk["s_out"], blk["s_out"])):
            sc, bi = bn_affine_fn(p, st, f"bn{idx}")
            w = p[f"conv{idx}_weight"] * sc[None, None, :]   # [3, Ci, Co]
            b = sc * p[f"conv{idx}_bias"] + bi
            wm, bm = _expand(w, b, 3, stride, s_in, s_out)
            packed.extend([wm, bm])
        sc, bi = bn_affine_fn(p, st, "downsample_bn")
        wm, bm = _expand(p["downsample_weight"] * sc[None, :], bi, 1,
                         blk["stride"], blk["s_in"], blk["s_out"])
        packed.extend([wm, bm])
    return packed, widths, strides
