"""Convolution primitives, lowered as tap-wise matmuls for the TPU MXU.

The reference model is built from three conv flavours (all torch modules):

  * causal dilated *grouped* Conv1d + pointwise Conv1d pairs inside the TCN
    (ref: /root/reference/models/tcn.py:20-43 — groups=20 over 540/440/340/240
    channels, pad (k-1)*d then right-chomp),
  * asymmetric (1,3) Conv2d blocks that convolve only the subcarrier axis,
    optionally with stride (1,2) (ref: /root/reference/models/convnet.py:10-29),
  * a single 3x3 Conv2d in the decoder (ref: models/pose_model.py:45).

Grouped convs with 27/22/17/12 channels per group lower poorly to TPU conv
instructions (SURVEY.md §7 hard-part 3), so every conv here is expressed as a
small sum over kernel taps of plain batched matmuls: for tap ``j`` we shift
the input along the convolved axis and contract the channel dimension on the
MXU.  XLA fuses the shifts (static slices of a zero-padded array) into the
surrounding elementwise ops, and the matmuls are large in the batch*length
dimension, which is where all the data lives for this workload.

All activations are channel-last: ``[B, T, C]`` for 1-D, ``[B, H, W, C]``
for 2-D (time = H, subcarrier = W).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def block_diagonal_weights(w: jax.Array) -> jax.Array:
    """[K, G, Ci, Co] grouped weights -> dense [K, G*Ci, G*Co].

    Grouped matmuls with 12-27 channels per group pad their contractions
    to 128 MXU lanes (4.7x waste); the dense block-diagonal form spends
    more FLOPs (trivial at these sizes) on perfectly tiled 240-540-wide
    matmuls — measured 1.8x faster for the TCN on v5e (DESIGN.md).
    Differentiable (gradients flow through the scatter), so usable in the
    training forward, not just the BN-folded serving path.
    """
    k, g, ci, co = w.shape
    out = jnp.zeros((k, g * ci, g * co), w.dtype)
    for gi in range(g):
        out = out.at[:, gi * ci:(gi + 1) * ci, gi * co:(gi + 1) * co].set(
            w[:, gi])
    return out


def super_block_diagonal_weights(w: jax.Array, m: int) -> jax.Array:
    """[K, G, Ci, Co] grouped weights -> [K, G//m, m*Ci, m*Co]: dense
    block-diagonal within super-blocks of ``m`` groups.

    Middle ground between the per-group einsum (27-channel contractions
    pad MXU lanes 4.7x) and the fully dense form (20x FLOP waste): m=5
    gives 110-135-deep contractions at only 5x FLOPs.  Differentiable.
    """
    k, g, ci, co = w.shape
    nsb = g // m
    out = jnp.zeros((k, nsb, m * ci, m * co), w.dtype)
    for j in range(m):
        out = out.at[:, :, j * ci:(j + 1) * ci, j * co:(j + 1) * co].set(
            w.reshape(k, nsb, m, ci, co)[:, :, j])
    return out


def causal_grouped_conv1d(x: jax.Array, w: jax.Array, *, dilation: int,
                          impl: str = "grouped") -> jax.Array:
    """Causal dilated grouped 1-D conv.

    Numerically identical to torch ``Conv1d(C, C', k, padding=(k-1)*d,
    dilation=d, groups=G, bias=False)`` followed by ``Chomp1d((k-1)*d)``
    (ref: /root/reference/models/tcn.py:6-12,20-23): symmetric pad + right
    chomp == left pad only.

    Args:
      x: ``[B, T, G, Ci]`` input (channels split into ``G`` contiguous groups,
         matching torch's grouped-channel layout).
      w: ``[K, G, Ci, Co]`` weights (tap-major).
      dilation: dilation ``d``; left padding is ``(K-1)*d``.
      impl: 'grouped' (per-group einsum), 'block_diag' (one dense matmul
         on block-diagonal weights — same math, MXU-tile-friendly), or
         'block_diag_sg<m>' (dense within super-blocks of m groups —
         m-fold instead of G-fold FLOP waste at still-deep contractions).

    Returns:
      ``[B, T, G, Co]``.
    """
    w = w.astype(x.dtype)
    k = w.shape[0]
    t = x.shape[1]
    pad = (k - 1) * dilation

    if impl.startswith("block_diag_sg"):
        m = int(impl[len("block_diag_sg"):])
        b, _, g, ci = x.shape
        co = w.shape[-1]
        if g % m:
            return causal_grouped_conv1d(x, w, dilation=dilation,
                                         impl="block_diag")
        nsb = g // m
        wsb = super_block_diagonal_weights(w, m)     # [K, nsb, mCi, mCo]
        xf = x.reshape(b, t, nsb, m * ci)
        xp = jnp.pad(xf, ((0, 0), (pad, 0), (0, 0), (0, 0)))
        out = None
        for j in range(k):
            seg = jax.lax.slice_in_dim(xp, j * dilation, j * dilation + t,
                                       axis=1)
            y = jnp.einsum("btsc,sco->btso", seg, wsb[j],
                           preferred_element_type=jnp.result_type(
                               x.dtype, jnp.float32),
                           precision=jax.lax.Precision.HIGHEST)
            out = y if out is None else out + y
        return out.astype(x.dtype).reshape(b, t, g, co)

    if impl == "block_diag":
        b, _, g, ci = x.shape
        co = w.shape[-1]
        wbd = block_diagonal_weights(w)
        xf = x.reshape(b, t, g * ci)
        xp = jnp.pad(xf, ((0, 0), (pad, 0), (0, 0)))
        out = None
        for j in range(k):
            seg = jax.lax.slice_in_dim(xp, j * dilation, j * dilation + t,
                                       axis=1)
            y = jnp.einsum("btc,co->bto", seg, wbd[j],
                           preferred_element_type=jnp.result_type(x.dtype, jnp.float32),
                           precision=jax.lax.Precision.HIGHEST)
            out = y if out is None else out + y
        return out.astype(x.dtype).reshape(b, t, g, co)

    xp = jnp.pad(x, ((0, 0), (pad, 0), (0, 0), (0, 0)))
    out = None
    for j in range(k):
        seg = jax.lax.slice_in_dim(xp, j * dilation, j * dilation + t, axis=1)
        y = jnp.einsum("btgi,gio->btgo", seg, w[j],
                       preferred_element_type=jnp.result_type(x.dtype, jnp.float32),
                       precision=jax.lax.Precision.HIGHEST)
        out = y if out is None else out + y
    return out.astype(x.dtype)


def pointwise_conv1d(x: jax.Array, w: jax.Array, b: jax.Array | None = None) -> jax.Array:
    """1x1 Conv1d == channel matmul.  ``x [B, T, Ci]``, ``w [Ci, Co]``."""
    y = jnp.einsum("bti,io->bto", x, w.astype(x.dtype),
                       preferred_element_type=jnp.result_type(x.dtype, jnp.float32),
                       precision=jax.lax.Precision.HIGHEST)
    if b is not None:
        y = y + b
    return y.astype(x.dtype)


def conv1xk_w(x: jax.Array, w: jax.Array, b: jax.Array | None = None,
              *, stride: int = 1, padding: int = 1,
              impl: str = "taps") -> jax.Array:
    """(1, K) Conv2d over the last spatial axis (subcarriers), tap-matmul form.

    Matches torch ``Conv2d(Ci, Co, kernel_size=(1, K), stride=(1, s),
    padding=(0, P))`` (ref: /root/reference/models/convnet.py:11-23).

    Args:
      x: ``[B, H, W, Ci]``.
      w: ``[K, Ci, Co]``.
      b: optional ``[Co]`` bias.
      stride: stride along W.
      padding: symmetric zero padding along W.

    Returns:
      ``[B, H, W_out, Co]`` with ``W_out = (W + 2P - K)//s + 1``.
    """
    w = w.astype(x.dtype)
    k = w.shape[0]
    ci = x.shape[3]
    wlen = x.shape[2]
    out_w = (wlen + 2 * padding - k) // stride + 1
    xp = jnp.pad(x, ((0, 0), (0, 0), (padding, padding), (0, 0)))
    # NOTE: strided basic indexing (x[:, :, ::s]) lowers to a GATHER
    # whose transpose is a scatter-add (~0.28 ms/step across the conv
    # stack, measured/trace_train_r03_summary.md); a strided lax.slice
    # lowers to slice fwd / interior-pad bwd.
    segs = [
        jax.lax.slice_in_dim(
            xp, j, j + stride * (out_w - 1) + 1, stride=stride, axis=2)
        for j in range(k)
    ]
    if impl == "im2col":
        # one [.., K*Ci] x [K*Ci, Co] dot: K x larger contraction dim
        # fills the MXU far better than K summed [.., Ci] x [Ci, Co]
        # dots when Ci is small (the conv stack runs Ci in {1..64});
        # concat grad = slices, slice grads = pads — still gather-free
        xcat = jnp.concatenate(segs, axis=-1)
        out = jnp.einsum("bhwi,io->bhwo", xcat, w.reshape(k * ci, -1),
                         preferred_element_type=jnp.result_type(
                             x.dtype, jnp.float32),
                         precision=jax.lax.Precision.HIGHEST)
    else:
        out = None
        for j in range(k):
            y = jnp.einsum("bhwi,io->bhwo", segs[j], w[j],
                           preferred_element_type=jnp.result_type(
                               x.dtype, jnp.float32),
                           precision=jax.lax.Precision.HIGHEST)
            out = y if out is None else out + y
    if b is not None:
        out = out + b
    return out.astype(x.dtype)


def conv1x1_2d(x: jax.Array, w: jax.Array, b: jax.Array | None = None,
               *, stride_w: int = 1) -> jax.Array:
    """1x1 Conv2d (optionally strided along W).  ``x [B,H,W,Ci]``, ``w [Ci,Co]``."""
    if stride_w > 1:
        # strided lax.slice, not x[:, :, ::s, :]: basic strided indexing
        # lowers to gather (scatter-add in the bwd) on this jax version
        x = jax.lax.slice_in_dim(x, 0, x.shape[2], stride=stride_w, axis=2)
    y = jnp.einsum("bhwi,io->bhwo", x, w.astype(x.dtype),
                       preferred_element_type=jnp.result_type(x.dtype, jnp.float32),
                       precision=jax.lax.Precision.HIGHEST)
    if b is not None:
        y = y + b
    return y.astype(x.dtype)


def conv3x3_2d(x: jax.Array, w: jax.Array, b: jax.Array | None = None) -> jax.Array:
    """3x3 SAME Conv2d (decoder head, ref: models/pose_model.py:45).

    ``x [B, H, W, Ci]``, ``w [3, 3, Ci, Co]`` (HWIO).  Uses XLA's native conv,
    which tiles fine at these shapes (H=15, W=20, C=64).
    """
    # output dtype = input dtype (MXU still accumulates fp32 internally);
    # a float32 preferred_element_type here breaks the conv VJP on bf16
    # inputs (cotangent/operand dtype mismatch)
    y = jax.lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(1, 1),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST,
    )
    if b is not None:
        y = y + b
    return y.astype(x.dtype)
