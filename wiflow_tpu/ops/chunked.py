"""Chunked (space-to-depth) conv-stack ops for the TRAINING path.

The conv stack's activations have 1-64 channels (ref /root/reference/
models/convnet.py); on TPU a channel-minor [B, H, W, C] layout pads the
lane axis 2-16x against the (8, 128) tile, and that padding — not FLOPs —
dominates the train-path cost of the stack (profiled 3.8 ms of the
10.6 ms step at batch 256).  The serving kernel (ops/pallas/conv_stack.py)
already solves this with a space-to-depth chunked layout; this module
expresses the SAME banded-matmul math as plain differentiable XLA so the
training forward gets the layout win and autodiff gives the backward for
free:

  * activations live as ``[B, H, n_chunks, C*S]`` with the minor dim
    ordered (c, w_in_chunk) — 64-128 wide, no tile padding;
  * every (1,3) conv (any stride) is an im2col over <=3 chunk-shifted
    slices plus ONE matmul against a banded weight
    ``[nseg*S_in*C_in, S_out*C_out]`` built by ``conv_stack._expand``
    from the plain ``[3, Ci, Co]`` parameters (a gather+mask — fully
    differentiable, so gradients land on the original weights);
  * the chunk-size schedule is ``conv_stack._plan_chunks`` — S shrinks
    8 -> 8 -> 4 -> 2 -> 1 as W halves, and the last block lands in the
    plain ``[B, H, W, C]`` layout.

Numerics are identical to ops/conv.conv1xk_w / conv1x1_2d modulo fp
summation order (the banded matrix contains exactly the conv taps).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

import functools

import numpy as np

from wiflow_tpu.ops.pallas.conv_stack import _expand, _plan_chunks  # noqa: F401


@functools.lru_cache(maxsize=None)
def _tap_masks(k: int, stride: int, s_in: int, s_out: int):
    """Constant 0/1 selectors ``[k, nseg, s_in, s_out]`` of the banded
    weight map (same geometry as conv_stack._chunk_matrix_map)."""
    nseg = 3 if k == 3 else max(1, (stride * s_out) // s_in)
    md = np.zeros((k, nseg, s_in, s_out), np.float32)
    for j in range(nseg):
        for wi in range(s_in):
            for wo in range(s_out):
                if k == 3:
                    d = j * s_in + wi - stride * wo - (s_in - 1)
                    if 0 <= d < 3:
                        md[d, j, wi, wo] = 1.0
                elif j * s_in + wi == stride * wo:
                    md[0, j, wi, wo] = 1.0
    return md


def expand_banded(w: jax.Array, b: jax.Array, k: int, stride: int,
                  s_in: int, s_out: int):
    """Gather-free banded expansion: identical output to
    ``conv_stack._expand`` but built as a tiny einsum against constant
    tap masks — the ``w_flat[idx]`` gather there costs milliseconds per
    step on TPU when run inside the train loop."""
    if k == 1 and w.ndim == 2:
        w = w[None]
    kk, ci, co = w.shape
    md = jnp.asarray(_tap_masks(kk, stride, s_in, s_out))
    nseg = md.shape[1]
    wm = jnp.einsum("tjxw,tco->jcxow", md.astype(w.dtype), w)
    wm = wm.reshape(nseg * ci * s_in, co * s_out)
    return wm, jnp.repeat(b, s_out)[:, None]


def to_chunked(x: jax.Array, s: int) -> jax.Array:
    """``[B, H, W]`` single-channel input -> ``[B, H, W//s, s]``."""
    b, h, w = x.shape
    return x.reshape(b, h, w // s, s)


def from_chunked(x: jax.Array, c: int, s: int) -> jax.Array:
    """``[B, H, n, C*S]`` (c-major minor) -> ``[B, H, n*S, C]``."""
    b, h, n, _ = x.shape
    y = x.reshape(b, h, n, c, s)             # minor (c, w_in_chunk)
    y = jnp.transpose(y, (0, 1, 2, 4, 3))    # [B, H, n, S, C]
    return y.reshape(b, h, n * s, c)


def _segs(x: jax.Array, k: int, cs: int, n_out: int) -> jax.Array:
    """im2col chunk-shifted slices of ``[B, H, n_in, CS]``, concatenated
    on the minor axis in (j, c, w) row order — matching the banded-weight
    rows of ``conv_stack._chunk_matrix_map``."""
    b, h, n_in, csz = x.shape
    if k == 3:
        zeros = jnp.zeros((b, h, 1, csz), x.dtype)
        xp = jnp.concatenate([zeros, x, zeros], axis=2)   # pad 1 chunk/side
        segs = []
        for j in range(3):
            if cs == 1:
                segs.append(xp[:, :, j:j + n_out])
            else:
                seg = xp[:, :, j:j + cs * n_out]
                segs.append(seg.reshape(b, h, n_out, cs, csz)[:, :, :, 0])
        return jnp.concatenate(segs, axis=-1)
    if cs == 1:
        return x
    xr = x.reshape(b, h, n_out, cs * csz)
    return xr


def chunked_conv(x: jax.Array, w: jax.Array, bias: jax.Array | None, *,
                 k: int, stride: int, s_in: int, s_out: int, cs: int,
                 n_out: int) -> jax.Array:
    """Banded chunked conv: ``[B, H, n_in, C_in*S_in]`` ->
    ``[B, H, n_out, C_out*S_out]``.

    ``w``: plain tap weights ``[3, Ci, Co]`` (or ``[Ci, Co]`` for the 1x1
    downsample); the banded expansion happens here, differentiably.
    """
    wm, bm = expand_banded(w, bias if bias is not None
                           else jnp.zeros((w.shape[-1],), w.dtype),
                           k, stride, s_in, s_out)
    xi = _segs(x, k, cs, n_out)
    y = jnp.einsum("bhnj,jk->bhnk", xi, wm.astype(x.dtype),
                   preferred_element_type=jnp.result_type(x.dtype, jnp.float32),
                   precision=jax.lax.Precision.HIGHEST)
    y = y + bm[:, 0].astype(y.dtype)
    return y.astype(x.dtype)


def plan_for(conv_channels, w0: int = 240) -> tuple:
    """Chunk plan for the WiFlow stack: ConvBlock1 + len(conv_channels)
    stride-2 blocks (models/wiflow.py layout)."""
    widths = [(1, conv_channels[0])]
    prev = conv_channels[0]
    for c in conv_channels:
        widths.append((prev, c))
        prev = c
    strides = tuple([1] + [2] * len(conv_channels))
    return _plan_chunks(tuple(widths), strides, w0)
