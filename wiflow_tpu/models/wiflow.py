"""WiFlow pose model — TPU-native rebuild of the reference architecture.

Maps ``[B, 540, 20]`` CSI amplitude windows to ``[B, 15, 2]`` keypoints,
matching the torch reference layer-for-layer in math while using
channel-last layouts and tap-matmul convs throughout:

  TCN 540->[540,440,340,240] dilations 1/2/4/8
      (ref: /root/reference/models/tcn.py, pose_model.py:16-22)
  -> reshape to a 2-D time x feature map           (pose_model.py:79)
  -> ConvBlock1(1->8) + 4 AsymmetricConvBlocks 8/16/32/64, subcarrier axis
     halved 240->15                                 (convnet.py, pose_model.py:25-36)
  -> DualAxialAttention (groups=8, BN on logits)    (attention.py)
  -> conv decoder 64->32->2 + mean over time        (pose_model.py:44-53)

Checkpoint parity with ``best_pose_model.pth`` is provided by
models/torch_compat.py; numerics parity is tested in
tests/test_model_parity.py against the reference torch modules.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import functools
import jax
import jax.numpy as jnp
from flax import linen as nn

from wiflow_tpu.core.config import ModelConfig
from wiflow_tpu.models.layers import (
    TorchBatchNorm,
    TorchDropout,
    TorchDropout2d,
    kaiming_normal_fan_out,
    torch_bias_default,
    torch_conv_default,
    silu,
)
from wiflow_tpu.ops.conv import (
    causal_grouped_conv1d,
    conv1x1_2d,
    conv1xk_w,
    conv3x3_2d,
    pointwise_conv1d,
)


def conv_plan_dicts(conv_channels, w0: int):
    """Dict chunk plans for the stage-fused conv stack, or None when the
    schedule can't tile the width chain exactly."""
    from wiflow_tpu.ops.chunked import plan_for
    try:
        plans = plan_for(conv_channels, w0=w0)
    except AssertionError:
        return None
    w = w0
    ok = True
    for p in plans:
        ok &= p["s_in"] * p["n_in"] == w
        w = (w + 1) // 2 if p["stride"] == 2 else w
        ok &= p["s_out"] * p["n_out"] == w
    ok &= plans[-1]["s_out"] == 1
    return plans if ok else None


def fused_conv_gate(*, train: bool, impl: str, conv_channels, w0: int,
                    r_rows: int):
    """Shared gate for the stage-fused conv-stack train path: returns
    ``(dplans, nbv, interp)`` when the lowering should engage, else
    None.  One implementation for WiFlowPoseModel and WiFlowMMFiModel
    so the engagement conditions can't drift apart."""
    if not (train and impl != "xla"
            and (impl == "fused"
                 or (impl == "auto" and jax.default_backend() == "tpu"))):
        return None
    dplans = conv_plan_dicts(tuple(conv_channels), w0)
    nbv = next((c for c in (64, 32, 16, 8) if r_rows % c == 0), None)
    if dplans is None or nbv is None:
        return None
    return dplans, nbv, jax.default_backend() != "tpu"


def dropout2d_mask_blocks(key, keep: float, ng: int, nbv: int, hh: int,
                          co: int, s_out: int, n_out: int) -> jax.Array:
    """Dropout2d keep-mask in chunked-block layout ``[ng, co*s, n*nbv]``.

    One keep-bit per (sample, channel), shared over (H, W) (ref
    convnet.py:15,20): rows are (c, w_in_chunk), lanes are (chunk,
    B*H row) with rows b-major — row r of block g belongs to sample
    ``(g*nbv + r) // hh``."""
    bsz = ng * nbv // hh
    m = jax.random.bernoulli(key, keep, (bsz, co))
    m_r = jnp.repeat(m, hh, axis=0)                      # [R, co]
    m_t = m_r.reshape(ng, nbv, co).transpose(0, 2, 1)    # [ng, co, nbv]
    full = jnp.broadcast_to(m_t[:, :, None, None, :],
                            (ng, co, s_out, n_out, nbv))
    return full.reshape(ng, co * s_out, n_out * nbv)


def run_fused_conv_stack(x, *, conv_channels, conv_dropout, dplans, nbv,
                         interp, train):
    """Run the up + residual_blocks stack through the stage-fused train
    path (ops/pallas/stage_fused.py) on ``[ng, C*S, n*Nb]`` blocks —
    rows (c, w_in_chunk), lanes (chunk, B*H row).

    ``x``: ``[B, H, W0]``; returns ``[B, H, n_last, C_last]``.  Must be
    called from a parent module's compact ``__call__`` (the ConvBlock
    submodules bind to the caller's scope under the standard names)."""
    b_, t_ = x.shape[0], x.shape[1]
    r_rows = b_ * t_
    ngc = r_rows // nbv
    s0, n0 = dplans[0]["s_in"], dplans[0]["n_in"]
    xb = x.reshape(r_rows, n0 * s0)
    xb = xb.reshape(ngc, nbv, n0, s0).transpose(0, 3, 2, 1)
    xb = xb.reshape(ngc, s0, n0 * nbv)
    xb = ConvBlock(1, conv_channels[0], stride_w=1,
                   dropout=conv_dropout, name="up")(
        xb, train=train, fused=(dplans[0], nbv, t_, interp))
    n_in = conv_channels[0]
    for j, n_out in enumerate(conv_channels):
        xb = ConvBlock(n_in, n_out, stride_w=2, dropout=conv_dropout,
                       name=f"residual_blocks_{j}")(
            xb, train=train, fused=(dplans[j + 1], nbv, t_, interp))
        n_in = n_out
    c_last = conv_channels[-1]
    n_last = dplans[-1]["n_out"]                      # s_out == 1
    x = xb.reshape(ngc, c_last, n_last, nbv)
    x = x.transpose(0, 3, 1, 2).reshape(r_rows, c_last, n_last)
    return x.reshape(b_, t_, c_last, n_last).transpose(0, 1, 3, 2)


class TCNLevel(nn.Module):
    """One dilated grouped temporal block (ref: models/tcn.py:14-74).

    Two rounds of [grouped causal conv -> BN -> SiLU -> pointwise conv ->
    BN -> SiLU -> dropout], plus a 1x1+BN residual when channel counts
    differ, finished with SiLU(out + res).
    """

    n_in: int
    n_out: int
    kernel_size: int
    dilation: int
    groups: int
    dropout: float
    # ablation variants (ref README.md:244-247): 'grouped' (full model),
    # 'plain' (regular conv1d, groups=1), 'depthwise' (groups=channels)
    conv_kind: str = "grouped"
    # MXU lowering: 'grouped' per-group einsum or 'block_diag' dense matmul
    matmul_impl: str = "grouped"

    def _groups(self, channels: int) -> int:
        if self.conv_kind == "plain":
            return 1
        if self.conv_kind == "depthwise":
            return channels
        return self.groups

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool,
                 fused: tuple | None = None) -> jax.Array:
        k = self.kernel_size
        g1 = self._groups(self.n_in)
        g2 = self._groups(self.n_out)
        ci_in = self.n_in // g1
        ci_out = self.n_out // g2

        w1g = self.param("conv1_group_weight",
                         kaiming_normal_fan_out(self.n_in * k),
                         (k, g1, ci_in, ci_in))
        w1p = self.param("conv1_pw_weight",
                         kaiming_normal_fan_out(self.n_out * 1),
                         (self.n_in, self.n_out))
        w2g = self.param("conv2_group_weight",
                         kaiming_normal_fan_out(self.n_out * k),
                         (k, g2, ci_out, ci_out))
        w2p = self.param("conv2_pw_weight",
                         kaiming_normal_fan_out(self.n_out * 1),
                         (self.n_out, self.n_out))
        wd = None
        if self.n_in != self.n_out:
            wd = self.param("downsample_weight",
                            kaiming_normal_fan_out(self.n_out * 1),
                            (self.n_in, self.n_out))

        if fused is not None:
            return self._fused_blocks(x, (w1g, w1p, w2g, w2p, wd), fused)

        b, t, _ = x.shape
        if wd is not None:
            res = pointwise_conv1d(x, wd)
            res = TorchBatchNorm(self.n_out, name="downsample_bn")(res, train=train)
        else:
            res = x

        out = causal_grouped_conv1d(
            x.reshape(b, t, g1, ci_in), w1g, dilation=self.dilation,
            impl=self.matmul_impl if g1 > 1 else "grouped",
        ).reshape(b, t, self.n_in)
        out = TorchBatchNorm(self.n_in, name="bn1_group")(out, train=train)
        out = silu(out)
        out = pointwise_conv1d(out, w1p)
        out = TorchBatchNorm(self.n_out, name="bn1_pw")(out, train=train)
        out = silu(out)
        out = TorchDropout(self.dropout, name="dropout1")(out, train=train)

        out = causal_grouped_conv1d(
            out.reshape(b, t, g2, ci_out), w2g, dilation=self.dilation,
            impl=self.matmul_impl if g2 > 1 else "grouped",
        ).reshape(b, t, self.n_out)
        out = TorchBatchNorm(self.n_out, name="bn2_group")(out, train=train)
        out = silu(out)
        out = pointwise_conv1d(out, w2p)
        out = TorchBatchNorm(self.n_out, name="bn2_pw")(out, train=train)
        out = silu(out)
        out = TorchDropout(self.dropout, name="dropout2")(out, train=train)

        return silu(out + res)

    def _fused_blocks(self, xb: jax.Array, weights, fused) -> jax.Array:
        """Stage-fused train path on ``[ng, C, T*Nb]`` blocks.

        One Pallas call per BN-apply->SiLU->dropout->conv stage
        (ops/pallas/stage_fused.py); BatchNorm stat finalization and
        running updates stay in the TorchBatchNorm modules via the
        ``moments=`` entry, so param/stat trees and numerics are the
        XLA path's exactly."""
        from wiflow_tpu.ops.pallas.stage_fused import join, stage

        t, nb, interpret = fused
        w1g, w1p, w2g, w2p, wd = weights
        dil = self.dilation
        dtype = xb.dtype
        ng, _, l = xb.shape
        n = ng * l                               # BN count: B*T
        keep = 1.0 - self.dropout
        use_mask = self.dropout > 0.0

        def bd_pack(wg):
            # [K, G, Ci, Co] grouped taps -> [K*G*Ci, G*Co] block-diag
            # (constant-mask broadcast: differentiable, no scatters)
            kk, g, ci, co = wg.shape
            eye = jnp.eye(g, dtype=wg.dtype)
            bd = wg[:, :, :, None, :] * eye[None, :, None, :, None]
            return bd.reshape(kk * g * ci, g * co)

        def bn(name, feats, psum, psumsq):
            mean = psum / n
            var = psumsq / n - jnp.square(mean)
            return TorchBatchNorm(feats, name=name)(
                None, train=True, moments=(mean, var, n), dtype=dtype)

        def mask(shape):
            if not use_mask:
                return None
            return jax.random.bernoulli(self.make_rng("dropout"), keep,
                                        shape)

        st = functools.partial(stage, t=t, nb=nb, keep=keep,
                               interpret=interpret)

        h1, a, q = st(xb, None, None, None, None, bd_pack(w1g), None,
                      seg="causal3", dil=dil)
        m1, s1, b1 = bn("bn1_group", self.n_in, a, q)
        h2, a, q = st(h1, m1, s1, b1, None, w1p, None, seg="identity")
        m2, s2, b2 = bn("bn1_pw", self.n_out, a, q)
        h3, a, q = st(h2, m2, s2, b2, mask((ng, self.n_out, l)),
                      bd_pack(w2g), None, seg="causal3", dil=dil)
        m3, s3, b3 = bn("bn2_group", self.n_out, a, q)
        h4, a, q = st(h3, m3, s3, b3, None, w2p, None, seg="identity")
        m4, s4, b4 = bn("bn2_pw", self.n_out, a, q)
        mask2 = mask((ng, self.n_out, l))
        if wd is not None:
            resb, a, q = st(xb, None, None, None, None, wd, None,
                            seg="identity")
            mr, sr, br = bn("downsample_bn", self.n_out, a, q)
            return join(h4, m4, s4, b4, mask2, resb, mr, sr, br,
                        keep=keep, interpret=interpret)
        return join(h4, m4, s4, b4, mask2, xb, keep=keep,
                    interpret=interpret)


class TCNStack(nn.Module):
    """Stack of TCN levels with dilation 2**i (ref: models/tcn.py:76-97)."""

    num_inputs: int
    num_channels: Sequence[int]
    kernel_size: int
    groups: int
    dropout: float
    conv_kind: str = "grouped"
    matmul_impl: str = "grouped"
    # train-path lowering: 'auto' = stage-fused Pallas kernels on TPU
    # (ops/pallas/stage_fused.py), XLA elsewhere; 'fused' forces the
    # kernels (interpret mode off-TPU, for tests); 'xla' disables.
    # Default 'xla' until the fused path is chip-verified (next commit).
    train_impl: str = "xla"

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool) -> jax.Array:
        b, t, c0 = x.shape
        # lane-block size: the level-0 backward holds the 3-tap im2col
        # and its f32 cotangent (~25 * C * t * nb bytes) in VMEM — cap
        # nb so the widest level stays under ~12.5 MB of the ~16 MB/core
        max_c = max(c0, *self.num_channels)
        nb = next((c for c in (64, 32, 16, 8)
                   if b % c == 0 and 25 * max_c * t * c <= 12_500_000),
                  None)
        use_fused = (train and self.kernel_size == 3 and nb is not None
                     and (self.train_impl == "fused"
                          or (self.train_impl == "auto"
                              and jax.default_backend() == "tpu")))
        fused = None
        if use_fused:
            interpret = jax.default_backend() != "tpu"
            fused = (t, nb, interpret)
            ng = b // nb
            # [B, T, C] -> [ng, C, T*Nb], lanes (time, batch)
            x = x.reshape(ng, nb, t, -1).transpose(0, 3, 2, 1)
            x = x.reshape(ng, x.shape[1], t * nb)

        n_in = self.num_inputs
        for i, n_out in enumerate(self.num_channels):
            x = TCNLevel(
                n_in=n_in, n_out=n_out, kernel_size=self.kernel_size,
                dilation=2 ** i, groups=self.groups, dropout=self.dropout,
                conv_kind=self.conv_kind, matmul_impl=self.matmul_impl,
                name=f"network_{i}",
            )(x, train=train, fused=fused)
            n_in = n_out

        if use_fused:
            ng, c_last, _ = x.shape
            x = x.reshape(ng, c_last, t, nb).transpose(0, 3, 2, 1)
            x = x.reshape(b, t, c_last)
        return x


class ChunkedDropout2d(nn.Module):
    """torch ``nn.Dropout2d`` on the chunked ``[B, H, n, C, S]`` view.

    Draws the SAME mask bits as ops/norm.dropout2d under the same rng
    path (bernoulli over b*c values), so the chunked and taps conv-stack
    paths are dropout-identical per seed."""

    rate: float
    channels: int

    @nn.compact
    def __call__(self, x5: jax.Array, *, train: bool) -> jax.Array:
        if not train or self.rate <= 0.0:
            return x5
        keep = 1.0 - self.rate
        mask = jax.random.bernoulli(
            self.make_rng("dropout"), keep,
            (x5.shape[0], 1, 1, self.channels, 1))
        return jnp.where(mask, x5 / keep, 0.0).astype(x5.dtype)


class ConvBlock(nn.Module):
    """(1,3) residual conv block over the subcarrier axis.

    ``stride_w=2`` gives the reference's ``AsymmetricConvBlock``
    (ref: models/convnet.py:4-38); ``stride_w=1`` gives ``ConvBlock1``
    (convnet.py:41-74).  Three (1,3) convs with BN/SiLU/Dropout2d plus a
    strided 1x1+BN shortcut.

    Two numerically-equivalent lowerings share one parameter tree:

      * ``plan=None`` (default): tap-matmuls on ``[B, H, W, C]`` — but a
        1-64-channel minor dim pads the TPU lane axis up to 16x;
      * ``plan=(s_in, s_out, cs, n_in, n_out)``: the space-to-depth
        chunked layout of ops/chunked.py on ``[B, H, n, C*S]`` inputs —
        banded-matmul convs, no tile padding, autodiff-friendly (the
        train-path analog of ops/pallas/conv_stack.py).
    """

    n_in: int
    n_out: int
    stride_w: int = 1
    dropout: float = 0.3   # torch-module default; pose_model.py never overrides
    plan: Optional[Tuple[int, int, int, int, int]] = None

    def _params(self):
        def conv_params(idx: int, ci: int, co: int):
            fan_in = ci * 3
            w = self.param(f"conv{idx}_weight", torch_conv_default(fan_in),
                           (3, ci, co))
            b = self.param(f"conv{idx}_bias", torch_bias_default(fan_in), (co,))
            return w, b

        w1, b1 = conv_params(1, self.n_in, self.n_out)
        w2, b2 = conv_params(2, self.n_out, self.n_out)
        w3, b3 = conv_params(3, self.n_out, self.n_out)
        wd = self.param("downsample_weight",
                        torch_conv_default(self.n_in), (self.n_in, self.n_out))
        return w1, b1, w2, b2, w3, b3, wd

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool,
                 fused: tuple | None = None) -> jax.Array:
        w1, b1, w2, b2, w3, b3, wd = self._params()
        if fused is not None:
            return self._fused_stage(x, (w1, b1, w2, b2, w3, b3, wd), fused)
        if self.plan is not None:
            return self._chunked(x, (w1, b1, w2, b2, w3, b3, wd), train)

        identity = conv1x1_2d(x, wd, stride_w=self.stride_w)
        identity = TorchBatchNorm(self.n_out, name="downsample_bn")(
            identity, train=train)

        out = conv1xk_w(x, w1, b1, stride=self.stride_w, padding=1)
        out = TorchBatchNorm(self.n_out, name="bn1")(out, train=train)
        out = silu(out)
        out = TorchDropout2d(self.dropout, name="drop1")(out, train=train)

        out = conv1xk_w(out, w2, b2, stride=1, padding=1)
        out = TorchBatchNorm(self.n_out, name="bn2")(out, train=train)
        out = silu(out)
        out = TorchDropout2d(self.dropout, name="drop2")(out, train=train)

        out = conv1xk_w(out, w3, b3, stride=1, padding=1)
        out = TorchBatchNorm(self.n_out, name="bn3")(out, train=train)

        return silu(out + identity)

    def _fused_stage(self, xb: jax.Array, params, fused) -> jax.Array:
        """Stage-fused train path on chunked ``[ng, C*S, n*Nb]`` blocks.

        The conv-stack analog of TCNLevel._fused_blocks: rows are
        (channel, w_in_chunk) in the space-to-depth layout of
        ops/chunked.py, every (1,3)/1x1 conv is one banded matmul
        (expand_banded) inside a stage kernel that also emits the next
        BN's partials, and the block tail (bn3 + shortcut-BN + add +
        SiLU) is the act_h=False join."""
        from wiflow_tpu.ops.chunked import expand_banded
        from wiflow_tpu.ops.pallas.stage_fused import join, stage

        blk, nbv, hh, interpret = fused
        w1, b1, w2, b2, w3, b3, wd = params
        s_in, s_out, cs = blk["s_in"], blk["s_out"], blk["cs"]
        n_out = blk["n_out"]
        stride = self.stride_w
        co = self.n_out
        dtype = xb.dtype
        ng = xb.shape[0]
        count = ng * n_out * nbv * s_out        # B * H * W_out
        keep = 1.0 - self.dropout

        def expand(w, b, k, strd, si, so):
            wm, _ = expand_banded(
                w, jnp.zeros((w.shape[-1],), w.dtype), k, strd, si, so)
            return wm, (None if b is None else jnp.repeat(b, so))

        def bnv(name, psum, psumsq):
            mean = psum.reshape(co, s_out).sum(1) / count
            var = psumsq.reshape(co, s_out).sum(1) / count - jnp.square(mean)
            m, a, b_ = TorchBatchNorm(co, name=name)(
                None, train=True, moments=(mean, var, count), dtype=dtype)
            return (jnp.repeat(m, s_out), jnp.repeat(a, s_out),
                    jnp.repeat(b_, s_out))

        def mask2d():
            if self.dropout <= 0.0:
                return None
            return dropout2d_mask_blocks(self.make_rng("dropout"), keep,
                                         ng, nbv, hh, co, s_out, n_out)

        seg1 = "sym3" if cs == 1 else f"chunk3:{cs}"
        nseg_d = max(1, (stride * s_out) // s_in)
        segd = "identity" if nseg_d == 1 else f"chunk1:{cs}"
        st = functools.partial(stage, nb=nbv, keep=keep, interpret=interpret)

        w1m, b1m = expand(w1, b1, 3, stride, s_in, s_out)
        h1, a, q = st(xb, None, None, None, None, w1m, b1m, seg=seg1)
        m1, s1, t1 = bnv("bn1", a, q)
        w2m, b2m = expand(w2, b2, 3, 1, s_out, s_out)
        h2, a, q = st(h1, m1, s1, t1, mask2d(), w2m, b2m, seg="sym3")
        m2, s2, t2 = bnv("bn2", a, q)
        w3m, b3m = expand(w3, b3, 3, 1, s_out, s_out)
        h3, a, q = st(h2, m2, s2, t2, mask2d(), w3m, b3m, seg="sym3")
        m3, s3, t3 = bnv("bn3", a, q)
        wdm, _ = expand(wd, None, 1, stride, s_in, s_out)
        resb, a, q = st(xb, None, None, None, None, wdm, None, seg=segd)
        mr, sr, tr = bnv("downsample_bn", a, q)
        return join(h3, m3, s3, t3, None, resb, mr, sr, tr, keep=keep,
                    interpret=interpret, act_h=False)

    def _chunked(self, x: jax.Array, params, train: bool) -> jax.Array:
        from wiflow_tpu.ops.chunked import chunked_conv

        w1, b1, w2, b2, w3, b3, wd = params
        s_in, s_out, cs, n_in, n_out = self.plan
        co = self.n_out
        b, h = x.shape[:2]

        def view5(y):
            return y.reshape(b, h, n_out, co, s_out)

        def flat(y5):
            return y5.reshape(b, h, n_out, co * s_out)

        identity = chunked_conv(x, wd, None, k=1, stride=self.stride_w,
                                s_in=s_in, s_out=s_out, cs=cs, n_out=n_out)
        id5 = TorchBatchNorm(co, channel_axis=3, name="downsample_bn")(
            view5(identity), train=train)

        out = chunked_conv(x, w1, b1, k=3, stride=self.stride_w,
                           s_in=s_in, s_out=s_out, cs=cs, n_out=n_out)
        o5 = TorchBatchNorm(co, channel_axis=3, name="bn1")(view5(out),
                                                            train=train)
        o5 = ChunkedDropout2d(self.dropout, co, name="drop1")(silu(o5),
                                                              train=train)

        out = chunked_conv(flat(o5), w2, b2, k=3, stride=1, s_in=s_out,
                           s_out=s_out, cs=1, n_out=n_out)
        o5 = TorchBatchNorm(co, channel_axis=3, name="bn2")(view5(out),
                                                            train=train)
        o5 = ChunkedDropout2d(self.dropout, co, name="drop2")(silu(o5),
                                                              train=train)

        out = chunked_conv(flat(o5), w3, b3, k=3, stride=1, s_in=s_out,
                           s_out=s_out, cs=1, n_out=n_out)
        o5 = TorchBatchNorm(co, channel_axis=3, name="bn3")(view5(out),
                                                            train=train)

        return flat(silu(o5 + id5))


class LogitsBNScale(nn.Module):
    """BatchNorm-on-logits reduced to its softmax-visible part.

    Declares the SAME variables as ``TorchBatchNorm`` (weight/bias params,
    running_mean/running_var stats — checkpoint- and spec-compatible with
    the ref ``bn_similarity`` BatchNorm2d, attention.py:26) and updates the
    running stats with torch semantics, but returns only the per-group
    multiplicative scale ``gamma / sqrt(var + eps)``: the mean/bias terms
    are constant along the softmax axis and cancel exactly, so no
    normalize pass over the [G, L, L, n] logits tensor is ever needed.
    Input layout: ``[G, ..., ...]`` with groups leading (channel_axis=0).
    """

    features: int

    @nn.compact
    def __call__(self, moments, *, train: bool, count: int = 2) -> jax.Array:
        """``moments``: (mean [G], var [G]) f32 batch moments of the raw
        logits (ignored in eval mode); ``count``: elements per group, for
        torch's unbiased running-var update."""
        gamma = self.param("weight", nn.initializers.ones, (self.features,))
        self.param("bias", nn.initializers.zeros, (self.features,))
        ra_mean = self.variable(
            "batch_stats", "running_mean",
            lambda: jnp.zeros((self.features,), jnp.float32))
        ra_var = self.variable(
            "batch_stats", "running_var",
            lambda: jnp.ones((self.features,), jnp.float32))
        if train:
            mean, var = moments
            if not self.is_initializing():
                unbiased = var * (count / max(count - 1, 1))
                m = 0.1   # torch BatchNorm momentum
                ra_mean.value = (1 - m) * ra_mean.value + m * mean
                ra_var.value = (1 - m) * ra_var.value + m * unbiased
        else:
            var = ra_var.value
        return (gamma * jax.lax.rsqrt(var + 1e-5)).astype(jnp.float32)


class AxialAttention(nn.Module):
    """Grouped single-axis self-attention with BN on logits.

    Faithful to ref models/attention.py:7-80: 1x1 QKV projection + BN1d,
    grouped dot-product logits -> BatchNorm2d(groups) -> softmax -> weighted
    sum -> BN1d on the output.  No positional terms.

    Input is channel-last ``[B, H, W, C]``.  ``width=True`` attends along W
    (folding H into batch); ``width=False`` attends along H (folding W).
    """

    in_planes: int
    out_planes: int
    groups: int = 8
    width: bool = False
    # attention lowering inside the module: 'xla' decomposition, 'fused'
    # Pallas core (custom VJP), or 'auto' (fused on TPU backends)
    train_impl: str = "auto"
    # fused-path layout chaining (no effect on the XLA path): when the
    # fused kernels run, the channel scramble they want is folded into the
    # qkv WEIGHT columns (a [Cin, 3C] param gather) instead of gathering
    # the [n, L, C] activations — whose transpose is the scatter-add the
    # round-3 trace billed at ~0.3 ms/step.  `fused_scrambled_input` says
    # the incoming activation is already in scrambled order (fold the
    # matching row permutation too); `fused_unscramble_output=False`
    # leaves the output scrambled for the next fused module to absorb.
    fused_scrambled_input: bool = False
    fused_unscramble_output: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool) -> jax.Array:
        b, h, w, c = x.shape
        gp = self.out_planes // self.groups

        # qkv_transform is a Conv1d, so the reference's model-level init
        # sweep overwrites its custom init with kaiming fan_out
        # (pose_model.py:57-62 runs after attention.py:34-35).
        wqkv = self.param("qkv_weight",
                          kaiming_normal_fan_out(self.out_planes * 3),
                          (self.in_planes, self.out_planes * 3))

        if self.width:
            xr = x.reshape(b * h, w, c)           # attend along W per row
        else:
            xr = jnp.transpose(x, (0, 2, 1, 3)).reshape(b * w, h, c)
        n, length, _ = xr.shape

        # BatchNorm2d(groups) on the logits followed by softmax over j
        # (ref attention.py:62-63).  Softmax is invariant to additive
        # shifts along j, and the BN's mean/bias terms are constant along
        # j — so BN-then-softmax equals softmax(gamma/sigma * logits)
        # POINTWISE, for every input; gradients are automatically correct
        # (equal functions have equal derivatives).  The batch variance is
        # computed exactly, without materializing logits, via the Gram
        # identity in ops/pallas/axial_attention_train.logits_moments.
        from wiflow_tpu.ops.pallas.axial_attention_train import (
            axial_core, logits_moments, logits_moments_fused,
        )
        c_out = self.out_planes
        count = n * length * length
        # fused kernels only where they pay: the TRAIN step (22.6->8.3ms
        # measured).  Eval keeps the XLA decomposition — its runtime cost
        # is small and the kernels' Mosaic compile (~1-2 min per entry
        # point) would tax every eval-only caller.
        use_fused = (self.train_impl == "fused" or (
            self.train_impl == "auto" and jax.default_backend() == "tpu")) \
            and train and not self.is_initializing()

        if use_fused:
            # fused Pallas path (custom-VJP kernels): logits never touch
            # HBM, neither in the attention core nor in the BN moments.
            # Channels live in the kernels' scrambled (cc, g) order, but
            # the scramble is folded into the qkv weight COLUMNS (and the
            # BN param vectors, via TorchBatchNorm's `perm`), so no
            # activation-sized gather — hence no bwd scatter-add — exists
            # on the q/k/v side.  The output is unscrambled once per
            # module chain (`fused_unscramble_output`).
            from wiflow_tpu.ops.pallas.axial_attention import scramble_perm
            import numpy as _np
            perm = scramble_perm(c_out, self.groups)
            perm3 = _np.concatenate([perm, perm + c_out, perm + 2 * c_out])
            w_eff = wqkv
            if self.fused_scrambled_input:
                if self.in_planes != self.out_planes:
                    raise ValueError(
                        "fused_scrambled_input requires in_planes == "
                        "out_planes (same scramble on both sides)")
                w_eff = w_eff[_np.asarray(perm), :]
            w_eff = w_eff[:, _np.asarray(perm3)]
            # produce qkv directly in the kernels' [L, C, N] layout: the
            # dot's output order does the relayout once, in its epilogue
            # (previously: dot -> split -> THREE [n,L,C]->[L,C,n]
            # transposes, each with a backward twin)
            qkvT = jnp.einsum("nlc,co->lon", xr, w_eff.astype(xr.dtype),
                              preferred_element_type=jnp.result_type(
                                  xr.dtype, jnp.float32),
                              precision=jax.lax.Precision.HIGHEST
                              ).astype(xr.dtype)
            qkvT = TorchBatchNorm(self.out_planes * 3, channel_axis=1,
                                  name="bn_qkv",
                                  perm=tuple(int(i) for i in perm3))(
                qkvT, train=train)
            qT, kT, vT = jnp.split(qkvT, 3, axis=1)   # [L, C, n] scrambled
            interp = jax.default_backend() != "tpu"   # CPU: interpret mode
            moments = logits_moments_fused(qT, kT, self.groups, count,
                                           128, interp)
            scale = LogitsBNScale(self.groups, name="bn_similarity")(
                moments, train=train, count=count)
            outT = axial_core(qT, kT, vT, scale, self.groups, 128, interp)
            out = jnp.transpose(outT, (2, 0, 1))   # [n, L, C] scrambled
            out = TorchBatchNorm(self.out_planes, name="bn_output",
                                 perm=tuple(int(i) for i in perm))(
                out, train=train)
            if self.fused_unscramble_output:
                out = out[..., _np.argsort(perm)]
        else:
            qkv = pointwise_conv1d(xr, wqkv)
            qkv = TorchBatchNorm(self.out_planes * 3, name="bn_qkv")(
                qkv, train=train)
            q, k, v = jnp.split(qkv, 3, axis=-1)
            q = q.reshape(n, length, self.groups, gp)
            k = k.reshape(n, length, self.groups, gp)
            v = v.reshape(n, length, self.groups, gp)
            moments = None
            if train:
                moments = logits_moments(q.reshape(n, length, c_out),
                                         k.reshape(n, length, c_out),
                                         self.groups)
            scale = LogitsBNScale(self.groups, name="bn_similarity")(
                moments, train=train, count=count)
            # XLA fallback: batch-minor [G, L, L, n] logits tile the
            # (8, 128) layout; torch order pads the 20x20 dims 7.7x.
            logits = jnp.einsum("bigc,bjgc->gijb", q, k,
                                preferred_element_type=jnp.float32,
                                precision=jax.lax.Precision.HIGHEST)
            sim = jax.nn.softmax(
                logits.astype(jnp.float32) * scale[:, None, None, None],
                axis=2).astype(x.dtype)
            out = jnp.einsum("gijb,bjgc->bigc", sim, v,
                             preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.HIGHEST
                             ).astype(x.dtype)
            out = out.reshape(n, length, self.out_planes)
            out = TorchBatchNorm(self.out_planes, name="bn_output")(
                out, train=train)

        if self.width:
            return out.reshape(b, h, w, self.out_planes)
        return jnp.transpose(
            out.reshape(b, w, h, self.out_planes), (0, 2, 1, 3))


class DualAxialAttention(nn.Module):
    """Width-axis then height-axis attention (ref: attention.py:83-98)."""

    planes: int
    groups: int = 8
    train_impl: str = "auto"
    # When True and the fused path runs, the output stays in the
    # kernels' scrambled channel order — the caller must fold the
    # inverse permutation into its consumer's weights (see
    # fused_output_scrambled for the matching predicate).  Kills the
    # last activation-sized gather (+ its bwd) of the attention chain.
    fused_keep_scrambled: bool = False

    def fused_output_scrambled(self, train: bool,
                               initializing: bool) -> bool:
        """Whether __call__(train=...) will return scrambled channels.

        ``initializing`` must be the CALLER's is_initializing() (the
        same flax trace, so it matches the child modules' predicate)."""
        return (self.fused_keep_scrambled and train and not initializing
                and (self.train_impl == "fused"
                     or (self.train_impl == "auto"
                         and jax.default_backend() == "tpu")))

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool) -> jax.Array:
        # When both modules run fused, the width module hands its output
        # to the height module in the kernels' scrambled channel order
        # (the permutations are folded into params, see AxialAttention);
        # only the height module unscrambles, once — or not at all when
        # the caller absorbs the permutation (fused_keep_scrambled).
        # Both modules share the use_fused predicate (same backend /
        # train flag / impl), so the layouts always agree.
        keep = self.fused_output_scrambled(train, self.is_initializing())
        x = AxialAttention(self.planes, self.planes, self.groups,
                           width=True, train_impl=self.train_impl,
                           fused_unscramble_output=False,
                           name="width_axis")(x, train=train)
        x = AxialAttention(self.planes, self.planes, self.groups,
                           width=False, train_impl=self.train_impl,
                           fused_scrambled_input=True,
                           fused_unscramble_output=not keep,
                           name="height_axis")(x, train=train)
        return x


class Conv2dResEncoder(nn.Module):
    """Ablation encoder: 'TCN + asym conv -> 2D res conv' (README.md:246).

    The reference publishes the result row only (83.55/95.69 PCK@10/20)
    with no code, so the design is ours: a pointwise projection
    540 -> tcn_channels[-1] replaces the temporal TCN, then plain
    symmetric 3x3 2-D residual blocks (both spatial axes, stride (1, 2))
    with the WiFlow channel/stride schedule produce the same
    [B, 20, 15, C_last] feature map the trunk hands to attention.
    """

    cfg: ModelConfig

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool) -> jax.Array:
        cfg = self.cfg
        w0 = cfg.tcn_channels[-1]
        wp = self.param("proj_weight", kaiming_normal_fan_out(w0),
                        (cfg.num_subcarriers, w0))
        x = pointwise_conv1d(x, wp)             # [B, T, 240]
        x = TorchBatchNorm(w0, name="proj_bn")(x, train=train)
        x = silu(x)[..., None]                  # [B, T, 240, 1]

        n_in = 1
        chans = (cfg.conv_channels[0],) + tuple(cfg.conv_channels)
        strides = (1,) + (2,) * len(cfg.conv_channels)
        for j, (n_out, st) in enumerate(zip(chans, strides)):
            wa = self.param(f"block{j}_conv1_weight",
                            torch_conv_default(n_in * 9), (3, 3, n_in, n_out))
            ba = self.param(f"block{j}_conv1_bias",
                            torch_bias_default(n_in * 9), (n_out,))
            wb = self.param(f"block{j}_conv2_weight",
                            torch_conv_default(n_out * 9),
                            (3, 3, n_out, n_out))
            bb = self.param(f"block{j}_conv2_bias",
                            torch_bias_default(n_out * 9), (n_out,))
            wd = self.param(f"block{j}_down_weight",
                            torch_conv_default(n_in), (n_in, n_out))
            identity = conv1x1_2d(x, wd, stride_w=st)
            identity = TorchBatchNorm(n_out, name=f"block{j}_down_bn")(
                identity, train=train)
            y = jax.lax.conv_general_dilated(
                x, wa.astype(x.dtype), window_strides=(1, st),
                padding=((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC")) + ba
            y = TorchBatchNorm(n_out, name=f"block{j}_bn1")(y, train=train)
            y = silu(y.astype(x.dtype))
            y = conv3x3_2d(y, wb, bb)
            y = TorchBatchNorm(n_out, name=f"block{j}_bn2")(y, train=train)
            x = silu(y + identity)
            n_in = n_out
        return x                                # [B, 20, 15, C_last]


class WiFlowPoseModel(nn.Module):
    """Full WiFlow encoder-decoder (ref: models/pose_model.py:9-97)."""

    config: ModelConfig = ModelConfig()

    @staticmethod
    def _chunk_plans(cfg: ModelConfig):
        """Chunk plans for the conv stack, or None for the taps path.

        'auto' falls back to taps whenever the chunk schedule can't tile
        the width chain exactly (odd widths, non-multiple-of-8 input) —
        the taps path handles any shape."""
        if cfg.conv_stack_impl == "taps":
            return None
        w0 = cfg.tcn_channels[-1]
        # single validation implementation: conv_plan_dicts owns the
        # width-chain tiling check (the chunked and fused lowerings must
        # agree on when they engage)
        plans = conv_plan_dicts(cfg.conv_channels, w0)
        if plans is None:
            if cfg.conv_stack_impl == "chunked":
                raise ValueError(
                    f"conv_stack_impl='chunked' cannot tile w0={w0} with "
                    f"conv_channels={tuple(cfg.conv_channels)}")
            return None
        return tuple((p["s_in"], p["s_out"], p["cs"], p["n_in"], p["n_out"])
                     for p in plans)

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        cfg = self.config
        if x.ndim != 3 or x.shape[1:] != (cfg.num_subcarriers, cfg.window_size):
            raise ValueError(
                f"WiFlowPoseModel expects [B, {cfg.num_subcarriers}, "
                f"{cfg.window_size}] CSI windows, got {x.shape}")
        # architecture invariant: the stride-2 conv stack must reduce the
        # TCN feature axis exactly to num_keypoints (240 -> 15 in the
        # reference; the keypoint axis IS the downsampled feature axis)
        w_out = cfg.tcn_channels[-1]
        for _ in cfg.conv_channels:
            w_out = (w_out + 1) // 2
        if w_out != cfg.num_keypoints:
            raise ValueError(
                f"tcn_channels[-1]={cfg.tcn_channels[-1]} downsampled by "
                f"{len(cfg.conv_channels)} stride-2 blocks gives {w_out} "
                f"rows, but num_keypoints={cfg.num_keypoints}")
        dtype = jnp.dtype(cfg.compute_dtype)
        x = x.astype(dtype)

        # [B, 540, 20] -> channel-last [B, T=20, C=540]
        x = jnp.transpose(x, (0, 2, 1))
        if cfg.encoder_kind == "conv2d":
            # ablation 'TCN + asym conv -> 2D res conv' (README.md:246;
            # the reference publishes the row but ships no code): a
            # pointwise projection stands in for the TCN, then plain
            # symmetric 3x3 residual blocks with the same stride schedule
            x = Conv2dResEncoder(cfg, name="encoder2d")(x, train=train)
        else:
            x = TCNStack(
                num_inputs=cfg.num_subcarriers,
                num_channels=tuple(cfg.tcn_channels),
                kernel_size=cfg.tcn_kernel_size,
                groups=cfg.tcn_groups,
                dropout=cfg.dropout,
                conv_kind=cfg.tcn_conv,
                matmul_impl=cfg.tcn_matmul,
                train_impl=cfg.tcn_train_impl,
                name="tcn",
            )(x, train=train)                   # [B, 20, 240]

            # 2-D map: H = time (20), W = TCN features (240), C = 1
            # (ref: pose_model.py:79 builds [B, 1, 20, 240])
            b_, t_ = x.shape[0], x.shape[1]
            r_rows = b_ * t_
            fused_cv = fused_conv_gate(
                train=train, impl=cfg.conv_train_impl,
                conv_channels=cfg.conv_channels,
                w0=cfg.tcn_channels[-1], r_rows=r_rows)

            if fused_cv is not None:
                dplans, nbv, interp = fused_cv
                x = run_fused_conv_stack(
                    x, conv_channels=tuple(cfg.conv_channels),
                    conv_dropout=cfg.conv_dropout, dplans=dplans,
                    nbv=nbv, interp=interp, train=train)
            else:
                plans = self._chunk_plans(cfg)
                if plans is not None:
                    from wiflow_tpu.ops.chunked import to_chunked
                    # chunked layout: [B, 20, n0, S0] (C=1, minor=w_in_chunk)
                    x = to_chunked(x, plans[0][0])
                else:
                    x = x[..., None]                # [B, 20, 240, 1]

                def plan_of(i):
                    return None if plans is None else plans[i]

                x = ConvBlock(1, cfg.conv_channels[0], stride_w=1,
                              dropout=cfg.conv_dropout, plan=plan_of(0),
                              name="up")(x, train=train)
                n_in = cfg.conv_channels[0]
                for j, n_out in enumerate(cfg.conv_channels):
                    x = ConvBlock(n_in, n_out, stride_w=2,
                                  dropout=cfg.conv_dropout, plan=plan_of(j + 1),
                                  name=f"residual_blocks_{j}")(x, train=train)
                    n_in = n_out
                if plans is not None:
                    # last plan ends at S=1 -> already plain [B, 20, 15, C]
                    assert plans[-1][1] == 1, plans[-1]
        # [B, 20, 15, 64] -> [B, H=15, W=20, C=64]  (ref: pose_model.py:87)
        x = jnp.transpose(x, (0, 2, 1, 3))

        att_scrambled = False
        if cfg.use_attention:   # ablation '- axial attention' (README:248)
            att = DualAxialAttention(cfg.conv_channels[-1],
                                     groups=cfg.attention_groups,
                                     train_impl=cfg.attention_module_impl,
                                     fused_keep_scrambled=True,
                                     name="attention")
            att_scrambled = att.fused_output_scrambled(
                train, self.is_initializing())
            x = att(x, train=train)

        # decoder (ref: pose_model.py:44-51): 3x3 conv -> BN -> SiLU ->
        # 1x1 conv -> BN -> SiLU
        c = cfg.conv_channels[-1]
        wd1 = self.param("decoder_conv1_weight",
                         torch_conv_default(c * 9), (3, 3, c, 32))
        bd1 = self.param("decoder_conv1_bias", torch_bias_default(c * 9), (32,))
        wd2 = self.param("decoder_conv2_weight",
                         torch_conv_default(32), (32, cfg.keypoint_dims))
        bd2 = self.param("decoder_conv2_bias", torch_bias_default(32),
                         (cfg.keypoint_dims,))

        if att_scrambled:
            # the fused attention chain left channels in the kernels'
            # scrambled (cc, g) order — absorb the inverse permutation
            # into the decoder weight's input rows (a [3,3,C,32] gather)
            # instead of unscrambling the activation
            from wiflow_tpu.ops.pallas.axial_attention import scramble_perm
            perm = scramble_perm(c, cfg.attention_groups)
            wd1 = wd1[:, :, perm, :]
        x = conv3x3_2d(x, wd1, bd1)
        x = TorchBatchNorm(32, name="decoder_bn1")(x, train=train)
        x = silu(x)
        x = conv1x1_2d(x, wd2, bd2)
        x = TorchBatchNorm(cfg.keypoint_dims, name="decoder_bn2")(x, train=train)
        x = silu(x)                             # [B, 15, 20, 2]

        # AdaptiveAvgPool2d((15, 1)) on H=15 input == mean over W
        # (ref: pose_model.py:53,94-96)
        x = jnp.mean(x.astype(jnp.float32), axis=2)   # [B, 15, 2]
        return x
