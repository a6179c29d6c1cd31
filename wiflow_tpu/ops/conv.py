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

import functools

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


def _tap_dot(seg: jax.Array, wj: jax.Array, acc) -> jax.Array:
    """``[.., Ci] x [Ci, Co]`` minor-dim contraction for one conv tap.

    A 1-wide contraction on the MXU pads the 128-lane tile 128x, so the
    ``up`` block (Ci=1 -> Co=8) moved ~two orders of magnitude more tile
    than data.  Dispatch those degenerate shapes to VPU broadcasts:
    an outer product for Ci=1, a minor-axis mul-reduce for Co=1.
    """
    ci, co = wj.shape
    if ci == 1:
        return seg.astype(acc) * wj[0].astype(acc)
    if co == 1:
        return jnp.sum(seg.astype(acc) * wj[:, 0].astype(acc),
                       axis=-1, keepdims=True)
    return jnp.einsum("bhwi,io->bhwo", seg, wj,
                      preferred_element_type=acc,
                      precision=jax.lax.Precision.HIGHEST)


def _conv1xk_taps_impl(x: jax.Array, w: jax.Array, b: jax.Array | None,
                       stride: int, padding: int) -> jax.Array:
    """Tap-matmul (1, K) conv body (shared by fwd and the custom VJP)."""
    w = w.astype(x.dtype)
    k = w.shape[0]
    wlen = x.shape[2]
    out_w = (wlen + 2 * padding - k) // stride + 1
    acc = jnp.result_type(x.dtype, jnp.float32)
    xp = jnp.pad(x, ((0, 0), (0, 0), (padding, padding), (0, 0)))
    out = None
    for j in range(k):
        # NOTE: strided basic indexing (x[:, :, ::s]) lowers to a GATHER
        # whose transpose is a scatter-add; a strided lax.slice lowers to
        # slice fwd / interior-pad bwd (and the custom VJP below avoids
        # even the pads).
        seg = jax.lax.slice_in_dim(
            xp, j, j + stride * (out_w - 1) + 1, stride=stride, axis=2)
        y = _tap_dot(seg, w[j], acc)
        out = y if out is None else out + y
    if b is not None:
        out = out + b
    return out.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _conv1xk_taps(x, w, b, stride, padding):
    return _conv1xk_taps_impl(x, w, b, stride, padding)


def _conv1xk_taps_fwd(x, w, b, stride, padding):
    return _conv1xk_taps_impl(x, w, b, stride, padding), (x, w, b is None)


def _conv1xk_taps_bwd(stride, padding, res, g):
    """Pad-free transpose of the tap-matmul conv.

    XLA's autodiff of the strided forward emits one interior-pad per tap
    (~0.78 ms/step across the conv stack, round-3 trace).  Here the
    input grad is built as (a) stride 1: the same tap-matmul conv of g
    with the flipped/transposed weights — slices, not pads; (b) the
    stride-2 / K=3 / pad-1 case used by every strided block: an
    even/odd interleave (stack + reshape, one fused pass).
    """
    x, w, b_none = res
    k, ci, co = w.shape
    wlen = x.shape[2]
    out_w = g.shape[2]
    wc = w.astype(x.dtype)
    acc = jnp.result_type(x.dtype, jnp.float32)

    gb = None if b_none else jnp.sum(
        g.astype(jnp.float32), axis=(0, 1, 2)).astype(jnp.float32)

    # weight grad: one big-contraction dot per tap (mul-reduce when the
    # non-contracted Ci axis is 1 — fuses with the gb reduction's g read)
    xp = jnp.pad(x, ((0, 0), (0, 0), (padding, padding), (0, 0)))
    gws = []
    for j in range(k):
        seg = jax.lax.slice_in_dim(
            xp, j, j + stride * (out_w - 1) + 1, stride=stride, axis=2)
        if ci == 1:
            gws.append(jnp.sum(seg.astype(jnp.float32) *
                               g.astype(jnp.float32), axis=(0, 1, 2))[None])
        else:
            gws.append(jnp.einsum("bhwi,bhwo->io", seg, g,
                                  preferred_element_type=jnp.float32,
                                  precision=jax.lax.Precision.HIGHEST))
    gw = jnp.stack(gws).astype(w.dtype)

    def tap_dot_t(gj_, wj):
        # "bhwo,io->bhwi" with the same degenerate-shape VPU dispatch
        if co == 1:
            return gj_.astype(acc) * wj[:, 0].astype(acc)
        if ci == 1:
            return jnp.sum(gj_.astype(acc) * wj[0].astype(acc),
                           axis=-1, keepdims=True)
        return jnp.einsum("bhwo,io->bhwi", gj_, wj,
                          preferred_element_type=acc,
                          precision=jax.lax.Precision.HIGHEST)

    if stride == 1 and padding <= k - 1:
        # transpose conv == conv of g with flipped, transposed taps
        wt = jnp.flip(wc, axis=0).transpose(0, 2, 1)     # [k, co, ci]
        gx = _conv1xk_taps_impl(g, wt, None, 1, k - 1 - padding)
    elif stride == 2 and k == 3 and padding == 1:
        # x index i receives tap j from output o where i = 2o + j - 1:
        # even i=2o <- tap 1; odd i=2o+1 <- tap 2 at o and tap 0 at o+1
        gj = [tap_dot_t(g, wc[j]) for j in range(3)]
        g0s = jnp.concatenate(
            [gj[0][:, :, 1:, :], jnp.zeros_like(gj[0][:, :, :1, :])], axis=2)
        even, odd = gj[1], gj[2] + g0s
        bsz, h = g.shape[:2]
        gx = jnp.stack([even, odd], axis=3).reshape(bsz, h, 2 * out_w, ci)
        gx = jax.lax.slice_in_dim(gx, 0, wlen, axis=2).astype(x.dtype)
    else:
        # uncommon geometry: fall back to XLA's transpose
        _, vjp = jax.vjp(
            lambda xx: _conv1xk_taps_impl(xx, wc, None, stride, padding), x)
        (gx,) = vjp(g.astype(acc))
    return gx.astype(x.dtype), gw, gb


_conv1xk_taps.defvjp(_conv1xk_taps_fwd, _conv1xk_taps_bwd)


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
    if impl == "taps":
        # custom-VJP core: slice-based fwd, pad-free transpose.  The
        # interleave backward is a TPU win (kills interior-pads) but
        # measurably SLOWER on XLA:CPU — slow enough to trip the
        # virtual-mesh rendezvous timeout in the 8-device dryrun — so
        # off-TPU the plain impl (XLA autodiff) runs instead.
        if jax.default_backend() == "tpu":
            return _conv1xk_taps(x, w, b, stride, padding)
        return _conv1xk_taps_impl(x, w, b, stride, padding)
    if impl == "taps_vjp":
        # forced custom-VJP path (grad-parity tests)
        return _conv1xk_taps(x, w, b, stride, padding)
    # impl == "im2col": one [.., K*Ci] x [K*Ci, Co] dot — K x larger
    # contraction dim fills the MXU better when Ci is tiny, but the
    # concat materialization made it SLOWER on-chip for the conv stack
    # (4.18 vs 3.08 ms/step measured); kept as a documented alternative.
    w = w.astype(x.dtype)
    k = w.shape[0]
    ci = x.shape[3]
    wlen = x.shape[2]
    out_w = (wlen + 2 * padding - k) // stride + 1
    xp = jnp.pad(x, ((0, 0), (0, 0), (padding, padding), (0, 0)))
    segs = [
        jax.lax.slice_in_dim(
            xp, j, j + stride * (out_w - 1) + 1, stride=stride, axis=2)
        for j in range(k)
    ]
    xcat = jnp.concatenate(segs, axis=-1)
    out = jnp.einsum("bhwi,io->bhwo", xcat, w.reshape(k * ci, -1),
                     preferred_element_type=jnp.result_type(
                         x.dtype, jnp.float32),
                     precision=jax.lax.Precision.HIGHEST)
    if b is not None:
        out = out + b
    return out.astype(x.dtype)


def _conv1x1_s2_impl(x: jax.Array, w: jax.Array) -> jax.Array:
    xs = jax.lax.slice_in_dim(x, 0, x.shape[2], stride=2, axis=2)
    y = jnp.einsum("bhwi,io->bhwo", xs, w.astype(x.dtype),
                   preferred_element_type=jnp.result_type(
                       x.dtype, jnp.float32),
                   precision=jax.lax.Precision.HIGHEST)
    return y.astype(x.dtype)


@jax.custom_vjp
def _conv1x1_s2(x, w):
    return _conv1x1_s2_impl(x, w)


def _conv1x1_s2_fwd(x, w):
    return _conv1x1_s2_impl(x, w), (x, w)


def _conv1x1_s2_bwd(res, g):
    """Interleave-with-zeros input grad (no interior pad)."""
    x, w = res
    wlen = x.shape[2]
    bsz, h, out_w, _ = g.shape
    gh = jnp.einsum("bhwo,io->bhwi", g, w.astype(x.dtype),
                    preferred_element_type=jnp.result_type(
                        x.dtype, jnp.float32),
                    precision=jax.lax.Precision.HIGHEST)
    gx = jnp.stack([gh, jnp.zeros_like(gh)], axis=3)
    gx = gx.reshape(bsz, h, 2 * out_w, x.shape[3])
    gx = jax.lax.slice_in_dim(gx, 0, wlen, axis=2).astype(x.dtype)
    xs = jax.lax.slice_in_dim(x, 0, wlen, stride=2, axis=2)
    gw = jnp.einsum("bhwi,bhwo->io", xs, g,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST).astype(w.dtype)
    return gx, gw


_conv1x1_s2.defvjp(_conv1x1_s2_fwd, _conv1x1_s2_bwd)


def conv1x1_2d(x: jax.Array, w: jax.Array, b: jax.Array | None = None,
               *, stride_w: int = 1) -> jax.Array:
    """1x1 Conv2d (optionally strided along W).  ``x [B,H,W,Ci]``, ``w [Ci,Co]``."""
    if stride_w == 2 and jax.default_backend() == "tpu":
        # custom VJP (interleave-with-zeros input grad): TPU-only, see
        # the conv1xk_w 'taps' dispatch note
        y = _conv1x1_s2(x, w)
        if b is not None:
            y = (y + b).astype(x.dtype)
        return y
    if stride_w > 1:
        # strided lax.slice, not x[:, :, ::s, :]: basic strided indexing
        # lowers to gather (scatter-add in the bwd) on this jax version
        x = jax.lax.slice_in_dim(x, 0, x.shape[2], stride=stride_w, axis=2)
    y = _tap_dot(x, w.astype(x.dtype),
                 jnp.result_type(x.dtype, jnp.float32))
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
