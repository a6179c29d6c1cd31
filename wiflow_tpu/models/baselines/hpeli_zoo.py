"""HPE-Li sub-project model zoo, part 2: the SKNet variants and pose
models the round-1 build left out (VERDICT r1 missing #4).

Rebuilds of ref /root/reference/cross_dataset_test/HPE-Li/model/:
  * utils/SKNet.py:9-173      — SKConv/SKUnit with pool_dim
    'freq'/'freq-time'/'freq-chan' branch attention, used by OriginalHPE,
    the denoiser HPE variants and HPEWiPoseModel,
  * utils/SKNet_v2.py:1-162   — SKConv/SKUnit v2 (channel + frequency
    attention summed),
  * HPE_no_denoiser.py:9-73   — OriginalHPE (MM-Fi [B,3,114,10]->[B,17,2]),
  * HPE_basic_cnn.py:9-50     — BasicCnnHPE,
  * HPE_Wipose.py:9-100       — HPEWiPoseModel (WiPose [B,9,30,5]->[B,18,2]),
  * sknet_trans_mmfi.py:10-207 / sknet_trans_wipose.py:10-205 —
    SKConv-with-ChannelTransformer and the faithful DSKNetTransMMFi /
    DSKNetTransWipose models (width-concat of channel/frequency attention
    outputs -> BN -> ChannelTransformer -> (1,2) avg-pool).

Design note (TPU + parity): these are ablation-zoo models, not the
serving hot path, so fidelity wins over layout tuning — tensors stay in
torch's NCHW memory order and weights in torch OIHW layout, because the
reference relies on ``.view()`` reinterpretations of NCHW buffers that
only reproduce exactly in that order.  Three such quirks are preserved
deliberately (verified against the torch modules in
tests/test_hpeli_zoo.py):

  1. SKNet.py:84 views concatenated branch maps [B, M*C, H, W] as
     [B, M, H, C, W] — a channel/height scramble, not a transpose.
  2. SKNet.py:103 views the [B, H, C] descriptor as [B, C, H].
  3. SKNet.py:110-111 softmaxes attention in [B, M, C, H, 1] layout and
     views it back as [B, M, H, C, 1].

Also preserved: utils/SKNet.py:138 *hardcodes* M=4, G=1, r=4 in the
SKConv it builds, silently ignoring the M/G/r the caller passed (so
OriginalHPE's "M=2, G=64" is cosmetic), and SKUnit's conv3/shortcut are
dead code (params exist in torch checkpoints but are never applied).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from wiflow_tpu.models.baselines.sknet_trans import RegressionHead
from wiflow_tpu.models.baselines.wpformer import ChannelTransformer
from wiflow_tpu.models.layers import (
    TorchBatchNorm, torch_bias_default, torch_conv_default,
)


def conv_nchw(x, w, b=None, *, stride=(1, 1), padding="SAME",
              dilation=(1, 1), groups=1):
    """NCHW conv with torch OIHW weights (zoo models keep torch layout)."""
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=stride, padding=padding,
        rhs_dilation=dilation, feature_group_count=groups,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=jax.lax.Precision.HIGHEST)
    if b is not None:
        y = y + b.astype(x.dtype)[None, :, None, None]
    return y


def avg_pool_nchw(x, kh: int, kw: int):
    """torch ``AvgPool2d((kh, kw))``: stride = kernel, floor mode.

    The init value must be a Python literal (a traced init breaks
    reverse-mode autodiff of ``reduce_window``).
    """
    y = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 1, kh, kw), (1, 1, kh, kw), "VALID")
    return y / (kh * kw)


class _BranchConvs(nn.Module):
    """M dilated 3x3 conv->BN->ReLU branches (shared by all SKConvs)."""

    out_dim: int
    m: int
    groups: int = 1

    @nn.compact
    def __call__(self, x, *, train: bool) -> List[jax.Array]:
        cin = x.shape[1]
        feats = []
        for i in range(self.m):
            w = self.param(f"convs_{i}_weight",
                           torch_conv_default(cin // self.groups * 9),
                           (self.out_dim, cin // self.groups, 3, 3))
            y = conv_nchw(x, w, padding=[(1 + i, 1 + i)] * 2,
                          dilation=(1 + i, 1 + i), groups=self.groups)
            y = TorchBatchNorm(self.out_dim, channel_axis=1,
                               name=f"convs_{i}_bn")(y, train=train)
            feats.append(nn.relu(y))
        return feats


class SKConvSelective(nn.Module):
    """utils/SKNet.py:9-117 SKConv (pool_dim branch attention).

    The caller-facing M/G/r of the reference's SKUnit are ignored there
    (SKNet.py:138 hardcodes M=4, G=1, r=4); this module exposes the real
    values as defaults.
    """

    out_dim: int
    pool_dim: str = "freq-chan"       # 'freq' | 'freq-time' | 'freq-chan'
    m: int = 4
    r: int = 4

    @nn.compact
    def __call__(self, x, *, train: bool) -> jax.Array:
        b, _, h, w = x.shape
        c = self.out_dim
        feats = jnp.concatenate(
            _BranchConvs(c, self.m, name="branches")(x, train=train), axis=1)
        # torch view quirk #1: [B, M*C, H, W] -> [B, M, H, C, W]
        feats = feats.reshape(b, self.m, h, c, w)
        feats_u = jnp.sum(feats, axis=1)                     # [B, H, C, W]

        if self.pool_dim == "freq-chan":
            d = c // self.r
            s = jnp.mean(feats_u, axis=3)                    # [B, H, C]
            s = s.reshape(b, c, h)                           # view quirk #2
            wfc = self.param("fc_weight", torch_conv_default(c), (d, c))
            bfc = self.param("fc_bias", torch_bias_default(c), (d,))
            z = jnp.einsum("dc,bch->bdh", wfc.astype(x.dtype), s) \
                + bfc.astype(x.dtype)[None, :, None]
            z = TorchBatchNorm(d, channel_axis=1, name="fc_bn")(z,
                                                                train=train)
            z = nn.relu(z)                                   # [B, d, H]
            atts = []
            for i in range(self.m):
                wa = self.param(f"fcs_{i}_weight", torch_conv_default(d),
                                (c, d))
                ba = self.param(f"fcs_{i}_bias", torch_bias_default(d), (c,))
                atts.append(jnp.einsum("cd,bdh->bch", wa.astype(x.dtype), z)
                            + ba.astype(x.dtype)[None, :, None])
            att = jnp.concatenate(atts, axis=1)              # [B, M*C, H]
            att = jax.nn.softmax(att.reshape(b, self.m, c, h, 1), axis=1)
            att = att.reshape(b, self.m, h, c, 1)            # view quirk #3
        elif self.pool_dim == "freq":
            d = h // self.r
            s = jnp.mean(feats_u, axis=(2, 3))               # [B, H]
            wfc = self.param("fc_weight", torch_conv_default(h), (d, h))
            bfc = self.param("fc_bias", torch_bias_default(h), (d,))
            z = s @ wfc.astype(x.dtype).T + bfc.astype(x.dtype)
            z = TorchBatchNorm(d, name="fc_bn")(z, train=train)
            z = nn.relu(z)                                   # [B, d]
            atts = []
            for i in range(self.m):
                wa = self.param(f"fcs_{i}_weight", torch_conv_default(d),
                                (h, d))
                ba = self.param(f"fcs_{i}_bias", torch_bias_default(d), (h,))
                atts.append(z @ wa.astype(x.dtype).T + ba.astype(x.dtype))
            att = jnp.stack(atts, axis=1)                    # [B, M, H]
            att = jax.nn.softmax(att[..., None, None], axis=1)
        else:  # 'freq-time'
            hw = h * w
            d = hw // self.r
            s = jnp.mean(feats_u, axis=2).reshape(b, hw)     # [B, H*W]
            wfc = self.param("fc_weight", torch_conv_default(hw), (d, hw))
            bfc = self.param("fc_bias", torch_bias_default(hw), (d,))
            z = s @ wfc.astype(x.dtype).T + bfc.astype(x.dtype)
            z = TorchBatchNorm(d, name="fc_bn")(z, train=train)
            z = nn.relu(z)
            atts = []
            for i in range(self.m):
                wa = self.param(f"fcs_{i}_weight", torch_conv_default(d),
                                (hw, d))
                ba = self.param(f"fcs_{i}_bias", torch_bias_default(d),
                                (hw,))
                atts.append(z @ wa.astype(x.dtype).T + ba.astype(x.dtype))
            att = jnp.stack(atts, axis=1)                    # [B, M, H*W]
            att = jax.nn.softmax(att[..., None, None], axis=1)
            att = att.reshape(b, self.m, h, 1, w)

        out = jnp.sum(feats * att, axis=1)                   # [B, H, C, W]
        return jnp.transpose(out, (0, 2, 1, 3))              # [B, C, H, W]


class SKUnitSelective(nn.Module):
    """utils/SKNet.py:119-173 SKUnit: 1x1 conv -> SKConv -> BN -> ReLU.

    conv3/shortcut params exist in torch checkpoints but are dead code
    (forward returns after conv2_sk) — not materialized here.
    """

    mid: int
    out: int
    pool_dim: str = "freq-chan"

    @nn.compact
    def __call__(self, x, *, train: bool) -> jax.Array:
        cin = x.shape[1]
        w1 = self.param("conv1_weight", torch_conv_default(cin),
                        (self.mid, cin, 1, 1))
        y = conv_nchw(x, w1)
        y = TorchBatchNorm(self.mid, channel_axis=1, name="conv1_bn")(
            y, train=train)
        y = nn.relu(y)
        y = SKConvSelective(self.out, self.pool_dim, name="sk")(y,
                                                                train=train)
        y = TorchBatchNorm(self.out, channel_axis=1, name="sk_bn")(
            y, train=train)
        return nn.relu(y)


class OriginalHPE(nn.Module):
    """HPE_no_denoiser.py:9-73 — the faithful MM-Fi HPE-Li model.

    [B, 3, 114, 10] -> SKUnit(3->64) -> AvgPool2 -> SKUnit(64->128)
    -> AvgPool2 -> regression(7168->34) -> [B, 17, 2].
    (The TPU-idiomatic variant with the clean SKConv lives in
    ``hpeli.HPELiMMFi``; this one is numerics-parity with torch.)
    """

    num_keypoints: int = 17

    @nn.compact
    def __call__(self, x, *, train: bool = False) -> jax.Array:
        b = x.shape[0]
        x = x.astype(jnp.float32)
        x = SKUnitSelective(64, 64, name="skunit1")(x, train=train)
        x = avg_pool_nchw(x, 2, 2)
        x = SKUnitSelective(128, 128, name="skunit2")(x, train=train)
        x = avg_pool_nchw(x, 2, 2)
        out = RegressionHead(self.num_keypoints * 2, 32,
                             name="regression")(x, train=train)
        return out.reshape(b, self.num_keypoints, 2)


class HPEWiPoseModel(nn.Module):
    """HPE_Wipose.py:9-100 — WiPose pose model.

    [B, 9, 30, 5] -> SKUnit(9->64) -> AvgPool2 -> SKUnit(64->128)
    -> AvgPool2 -> SKUnit(128->256) -> regression(1792->36) -> [B,18,2].
    (skunit4 is constructed but never used in the reference forward.)
    """

    @nn.compact
    def __call__(self, x, *, train: bool = False) -> jax.Array:
        b = x.shape[0]
        x = x.astype(jnp.float32)
        x = SKUnitSelective(64, 64, name="skunit1")(x, train=train)
        x = avg_pool_nchw(x, 2, 2)
        x = SKUnitSelective(128, 128, name="skunit2")(x, train=train)
        x = avg_pool_nchw(x, 2, 2)
        x = SKUnitSelective(256, 256, name="skunit3")(x, train=train)
        out = RegressionHead(36, 32, name="regression")(x, train=train)
        return out.reshape(b, 18, 2)


class BasicCnnHPE(nn.Module):
    """HPE_basic_cnn.py:9-50 — plain-CNN ablation.

    [B, 3, 114, 10] -> Conv2d(3->64, k7, valid) -> AvgPool2 -> BN -> ReLU
    -> AvgPool2 -> regression(1728->34) -> [B, 17, 2].
    """

    @nn.compact
    def __call__(self, x, *, train: bool = False) -> jax.Array:
        b, cin = x.shape[0], x.shape[1]
        x = x.astype(jnp.float32)
        w = self.param("cnn1_weight", torch_conv_default(cin * 49),
                       (64, cin, 7, 7))
        bias = self.param("cnn1_bias", torch_bias_default(cin * 49), (64,))
        x = conv_nchw(x, w, bias, padding="VALID")
        x = avg_pool_nchw(x, 2, 2)
        x = TorchBatchNorm(64, channel_axis=1, name="bn")(x, train=train)
        x = nn.relu(x)
        x = avg_pool_nchw(x, 2, 2)
        out = RegressionHead(34, 32, name="regression")(x, train=train)
        return out.reshape(b, 17, 2)


class SKConvV2(nn.Module):
    """utils/SKNet_v2.py:10-105 — channel + frequency attention, summed.

    Unlike SKNet.py, no view scrambles: branches stack on a clean M axis,
    channel attention from a GAP descriptor, frequency attention from a
    time-pooled branch-sum; output is the sum of the two fused maps.
    """

    features: int
    m: int = 2
    groups: int = 32
    r: int = 16
    l_min: int = 32

    @nn.compact
    def __call__(self, x, *, train: bool) -> jax.Array:
        c = self.features
        d = max(c // self.r, self.l_min)
        feats = jnp.stack(
            _BranchConvs(c, self.m, self.groups, name="branches")(
                x, train=train), axis=1)                     # [B, M, C, H, W]
        feats_u = jnp.sum(feats, axis=1)

        # channel attention
        s = jnp.mean(feats_u, axis=(2, 3))                   # [B, C]
        wfc = self.param("fc_weight", torch_conv_default(c), (d, c))
        z = s @ wfc.astype(x.dtype).T                        # Conv2d 1x1 no bias
        z = TorchBatchNorm(d, name="fc_bn")(z, train=train)
        z = nn.relu(z)                                       # [B, d]
        atts = []
        for i in range(self.m):
            wa = self.param(f"fcs_{i}_weight", torch_conv_default(d), (c, d))
            ba = self.param(f"fcs_{i}_bias", torch_bias_default(d), (c,))
            atts.append(z @ wa.astype(x.dtype).T + ba.astype(x.dtype))
        att = jax.nn.softmax(jnp.stack(atts, axis=1), axis=1)  # [B, M, C]
        feats_channel = jnp.sum(feats * att[..., None, None], axis=1)

        # frequency attention
        ff = jnp.sum(feats, axis=2)                          # [B, M, H, W]
        fs = jnp.mean(ff, axis=3, keepdims=True)             # [B, M, H, 1]
        attf = jax.nn.softmax(fs, axis=1)
        feats_freq = jnp.sum(feats * attf[:, :, None], axis=1)
        return feats_channel + feats_freq


class SKUnitV2(nn.Module):
    """utils/SKNet_v2.py:107-173 SKUnit: 1x1 -> SKConvV2 -> 1x1 + residual.

    Requires ``mid == out`` for the residual add (as in every reference
    instantiation).  The defined-but-unused ``shortcut`` params are not
    materialized.
    """

    mid: int
    out: int
    m: int = 2
    groups: int = 32
    r: int = 16

    @nn.compact
    def __call__(self, x, *, train: bool) -> jax.Array:
        cin = x.shape[1]
        w1 = self.param("conv1_weight", torch_conv_default(cin),
                        (self.mid, cin, 1, 1))
        y = conv_nchw(x, w1)
        y = TorchBatchNorm(self.mid, channel_axis=1, name="conv1_bn")(
            y, train=train)
        y = nn.relu(y)
        y = SKConvV2(self.mid, self.m, self.groups, self.r, name="sk")(
            y, train=train)
        residual = y
        w3 = self.param("conv3_weight", torch_conv_default(self.mid),
                        (self.out, self.mid, 1, 1))
        y = conv_nchw(y, w3)
        y = TorchBatchNorm(self.out, channel_axis=1, name="conv3_bn")(
            y, train=train)
        y = TorchBatchNorm(self.out, channel_axis=1, name="norm")(
            y + residual, train=train)
        return nn.relu(y)


class SKConvTrans(nn.Module):
    """sknet_trans_mmfi.py:10-113 SKConv: V2-style channel + frequency
    attention, outputs concatenated on the width axis, BN, a 1-layer
    3-head ChannelTransformer over the doubled-width map, then (1,2)
    avg-pool back to the original width."""

    features: int
    img_size: Tuple[int, int]          # (H, 2*W) of the concatenated map
    m: int = 2
    groups: int = 32
    r: int = 16
    l_min: int = 32

    @nn.compact
    def __call__(self, x, *, train: bool) -> jax.Array:
        c = self.features
        d = max(c // self.r, self.l_min)
        feats = jnp.stack(
            _BranchConvs(c, self.m, self.groups, name="branches")(
                x, train=train), axis=1)
        feats_u = jnp.sum(feats, axis=1)

        s = jnp.mean(feats_u, axis=(2, 3))
        wfc = self.param("fc_weight", torch_conv_default(c), (d, c))
        z = s @ wfc.astype(x.dtype).T
        z = TorchBatchNorm(d, name="fc_bn")(z, train=train)
        z = nn.relu(z)
        atts = []
        for i in range(self.m):
            wa = self.param(f"fcs_{i}_weight", torch_conv_default(d), (c, d))
            ba = self.param(f"fcs_{i}_bias", torch_bias_default(d), (c,))
            atts.append(z @ wa.astype(x.dtype).T + ba.astype(x.dtype))
        att = jax.nn.softmax(jnp.stack(atts, axis=1), axis=1)
        feats_channel = jnp.sum(feats * att[..., None, None], axis=1)

        ff = jnp.sum(feats, axis=2)
        attf = jax.nn.softmax(jnp.mean(ff, axis=3, keepdims=True), axis=1)
        feats_freq = jnp.sum(feats * attf[:, :, None], axis=1)

        y = jnp.concatenate([feats_channel, feats_freq], axis=3)
        y = TorchBatchNorm(c, channel_axis=1, name="norm")(y, train=train)
        # ChannelTransformer operates NHWC; token order (h, w) matches
        # the reference's NCHW flatten(2).transpose(-1,-2)
        y = jnp.transpose(y, (0, 2, 3, 1))
        y = ChannelTransformer(c, self.img_size, num_layers=1, heads=3,
                               name="tf")(y, train=train)
        y = jnp.transpose(y, (0, 3, 1, 2))
        return avg_pool_nchw(y, 1, 2)


class SKUnitTrans(nn.Module):
    """sknet_trans_mmfi.py:116-154 SKUnit (``pool=True``) /
    sknet_trans_wipose.py same lines with the pool commented out."""

    mid: int
    out: int
    img_size: Tuple[int, int]
    m: int = 2
    groups: int = 32
    r: int = 16
    pool: bool = True

    @nn.compact
    def __call__(self, x, *, train: bool) -> jax.Array:
        cin = x.shape[1]
        w1 = self.param("conv1_weight", torch_conv_default(cin),
                        (self.mid, cin, 1, 1))
        y = conv_nchw(x, w1)
        y = TorchBatchNorm(self.mid, channel_axis=1, name="conv1_bn")(
            y, train=train)
        y = nn.relu(y)
        if self.pool:
            y = avg_pool_nchw(y, 2, 2)
        y = SKConvTrans(self.mid, self.img_size, self.m, self.groups,
                        self.r, name="sk")(y, train=train)
        y = TorchBatchNorm(self.mid, channel_axis=1, name="norm")(
            y, train=train)
        w3 = self.param("conv3_weight", torch_conv_default(self.mid),
                        (self.out, self.mid, 1, 1))
        y = conv_nchw(y, w3)
        return TorchBatchNorm(self.out, channel_axis=1, name="conv3_bn")(
            y, train=train)


class DSKNetTransMMFi(nn.Module):
    """sknet_trans_mmfi.py:156-207 DSKNetTransMMFI, faithful rebuild.

    [B, 3, 114, 10] -> SKUnitTrans(3->128, pool) -> BN ->
    SKUnitTrans(128->256, pool) -> AvgPool2 -> regression(3584->34)
    -> [B, 17, 2].  (The round-1 ``DSKNetTrans`` in sknet_trans.py is the
    TPU-idiomatic approximation; this one matches torch numerics.)
    """

    @nn.compact
    def __call__(self, x, *, train: bool = False) -> jax.Array:
        b = x.shape[0]
        x = x.astype(jnp.float32)
        x = SKUnitTrans(128, 128, (57, 10), m=3, groups=32, r=4, pool=True,
                        name="skunit1")(x, train=train)
        x = TorchBatchNorm(128, channel_axis=1, name="norm")(x, train=train)
        x = SKUnitTrans(256, 256, (28, 4), m=3, groups=32, r=4, pool=True,
                        name="skunit2")(x, train=train)
        x = avg_pool_nchw(x, 2, 2)
        out = RegressionHead(34, 32, name="regression")(x, train=train)
        return out.reshape(b, 17, 2)


class DSKNetTransWipose(nn.Module):
    """sknet_trans_wipose.py:156-205 DSKNetTransWipose, faithful rebuild.

    [B, 9, 30, 5] -> SKUnitTrans(9->64, no pool) -> BN -> AvgPool2 ->
    SKUnitTrans(64->128, no pool) -> regression(3840->36) -> [B, 18, 2].
    """

    @nn.compact
    def __call__(self, x, *, train: bool = False) -> jax.Array:
        b = x.shape[0]
        x = x.astype(jnp.float32)
        x = SKUnitTrans(64, 64, (30, 10), m=2, groups=64, r=4, pool=False,
                        name="skunit1")(x, train=train)
        x = TorchBatchNorm(64, channel_axis=1, name="norm")(x, train=train)
        x = avg_pool_nchw(x, 2, 2)
        x = SKUnitTrans(128, 128, (15, 4), m=2, groups=64, r=4, pool=False,
                        name="skunit2")(x, train=train)
        out = RegressionHead(36, 32, name="regression")(x, train=train)
        return out.reshape(b, 18, 2)


# ---------------------------------------------------------------------------
# torch state_dict interop specs (torch_compat.Spec format), so reference
# checkpoints of these zoo models load directly and parity is testable.
# ---------------------------------------------------------------------------

from wiflow_tpu.models.torch_compat import Spec, _bn_specs, _ident  # noqa: E402


def _t(w):
    return w.T


def _sq1(w):                 # Conv1d k=1 [out, in, 1] -> [out, in]
    return w[:, :, 0]


def _sq1_inv(w):
    return w[:, :, None]


def _sq2(w):                 # Conv2d 1x1 [out, in, 1, 1] -> [out, in]
    return w[:, :, 0, 0]


def _sq2_inv(w):
    return w[:, :, None, None]


def _hwio(w):                # OIHW -> HWIO
    return w.transpose(2, 3, 1, 0)


def _hwio_inv(w):
    return w.transpose(3, 2, 0, 1)


def regression_spec(tp: str, fp: Tuple[str, ...]) -> List[Spec]:
    """utils/regression.py regression -> RegressionHead."""
    s: List[Spec] = []
    for fc in ("fc1", "fc2", "fc3"):
        s.append((f"{tp}.{fc}.weight", "params", fp + (fc, "kernel"), _t, _t))
        s.append((f"{tp}.{fc}.bias", "params", fp + (fc, "bias"),
                  _ident, _ident))
    s += _bn_specs(f"{tp}.bn", fp + ("bn",))
    return s


def _branch_specs(tp: str, fp: Tuple[str, ...], m: int) -> List[Spec]:
    s: List[Spec] = []
    for i in range(m):
        s.append((f"{tp}.convs.{i}.0.weight", "params",
                  fp + ("branches", f"convs_{i}_weight"), _ident, _ident))
        s += _bn_specs(f"{tp}.convs.{i}.1",
                       fp + ("branches", f"convs_{i}_bn"))
    return s


def sk_unit_selective_spec(tp: str, fp: Tuple[str, ...],
                           m: int = 4) -> List[Spec]:
    """utils/SKNet.py SKUnit ('freq-chan' fc layout).  conv3/shortcut are
    dead code in the reference forward and intentionally unmapped."""
    s: List[Spec] = [(f"{tp}.conv1.0.weight", "params",
                      fp + ("conv1_weight",), _ident, _ident)]
    s += _bn_specs(f"{tp}.conv1.1", fp + ("conv1_bn",))
    sk = f"{tp}.conv2_sk.0"
    s += _branch_specs(sk, fp + ("sk",), m)
    s.append((f"{sk}.fc.0.weight", "params", fp + ("sk", "fc_weight"),
              _sq1, _sq1_inv))
    s.append((f"{sk}.fc.0.bias", "params", fp + ("sk", "fc_bias"),
              _ident, _ident))
    s += _bn_specs(f"{sk}.fc.1", fp + ("sk", "fc_bn"))
    for i in range(m):
        s.append((f"{sk}.fcs.{i}.weight", "params",
                  fp + ("sk", f"fcs_{i}_weight"), _sq1, _sq1_inv))
        s.append((f"{sk}.fcs.{i}.bias", "params",
                  fp + ("sk", f"fcs_{i}_bias"), _ident, _ident))
    s += _bn_specs(f"{tp}.conv2_sk.1", fp + ("sk_bn",))
    return s


def original_hpe_spec() -> List[Spec]:
    return (sk_unit_selective_spec("skunit1", ("skunit1",))
            + sk_unit_selective_spec("skunit2", ("skunit2",))
            + regression_spec("regression", ("regression",)))


def hpe_wipose_spec() -> List[Spec]:
    return (sk_unit_selective_spec("skunit1", ("skunit1",))
            + sk_unit_selective_spec("skunit2", ("skunit2",))
            + sk_unit_selective_spec("skunit3", ("skunit3",))
            + regression_spec("regression", ("regression",)))


def basic_cnn_spec() -> List[Spec]:
    return ([("CNN1.weight", "params", ("cnn1_weight",), _ident, _ident),
             ("CNN1.bias", "params", ("cnn1_bias",), _ident, _ident)]
            + _bn_specs("bn", ("bn",))
            + regression_spec("regression", ("regression",)))


def sk_conv_v2_spec(tp: str, fp: Tuple[str, ...], m: int = 2) -> List[Spec]:
    """utils/SKNet_v2.py SKConv (its unused ``norm`` BN is unmapped)."""
    s = _branch_specs(tp, fp, m)
    s.append((f"{tp}.fc.0.weight", "params", fp + ("fc_weight",),
              _sq2, _sq2_inv))
    s += _bn_specs(f"{tp}.fc.1", fp + ("fc_bn",))
    for i in range(m):
        s.append((f"{tp}.fcs.{i}.weight", "params",
                  fp + (f"fcs_{i}_weight",), _sq2, _sq2_inv))
        s.append((f"{tp}.fcs.{i}.bias", "params",
                  fp + (f"fcs_{i}_bias",), _ident, _ident))
    return s


def sk_unit_v2_spec(tp: str, fp: Tuple[str, ...], m: int = 2) -> List[Spec]:
    s: List[Spec] = [(f"{tp}.conv1.0.weight", "params",
                      fp + ("conv1_weight",), _ident, _ident)]
    s += _bn_specs(f"{tp}.conv1.1", fp + ("conv1_bn",))
    s += sk_conv_v2_spec(f"{tp}.conv2_sk", fp + ("sk",), m)
    s.append((f"{tp}.conv3.0.weight", "params", fp + ("conv3_weight",),
              _ident, _ident))
    s += _bn_specs(f"{tp}.conv3.1", fp + ("conv3_bn",))
    s += _bn_specs(f"{tp}.norm", fp + ("norm",))
    return s


def channel_transformer_spec(tp: str, fp: Tuple[str, ...],
                             num_layers: int = 1,
                             heads: int = 3) -> List[Spec]:
    """utils/ChanFreqTrans.py ChannelTransformer -> wpformer's flax one."""
    s: List[Spec] = [(f"{tp}.embeddings_1.position_embeddings", "params",
                      fp + ("position_embeddings",), _ident, _ident)]
    for l in range(num_layers):
        lt = f"{tp}.encoder.layer.{l}"
        s += [(f"{lt}.attn_norm1.weight", "params",
               fp + (f"attn_norm_{l}", "scale"), _ident, _ident),
              (f"{lt}.attn_norm1.bias", "params",
               fp + (f"attn_norm_{l}", "bias"), _ident, _ident)]
        for h in range(heads):
            for tname, fname in (("query1", "wq"), ("key", "wk"),
                                 ("value", "wv")):
                s.append((f"{lt}.channel_attn.{tname}.{h}.weight", "params",
                          fp + (f"attn_{l}", f"{fname}{h}"), _t, _t))
        s.append((f"{lt}.channel_attn.out1.weight", "params",
                  fp + (f"attn_{l}", "wo"), _t, _t))
        s += [(f"{lt}.ffn_norm1.weight", "params",
               fp + (f"ffn_norm_{l}", "scale"), _ident, _ident),
              (f"{lt}.ffn_norm1.bias", "params",
               fp + (f"ffn_norm_{l}", "bias"), _ident, _ident)]
        for tname, fname in (("fc1", f"mlp_in_{l}"), ("fc2", f"mlp_out_{l}")):
            s.append((f"{lt}.ffn1.{tname}.weight", "params",
                      fp + (fname, "kernel"), _t, _t))
            s.append((f"{lt}.ffn1.{tname}.bias", "params",
                      fp + (fname, "bias"), _ident, _ident))
    s += [(f"{tp}.encoder.encoder_norm1.weight", "params",
           fp + ("encoder_norm", "scale"), _ident, _ident),
          (f"{tp}.encoder.encoder_norm1.bias", "params",
           fp + ("encoder_norm", "bias"), _ident, _ident)]
    s.append((f"{tp}.reconstruct_1.conv.weight", "params",
              fp + ("rec_weight",), _hwio, _hwio_inv))
    s.append((f"{tp}.reconstruct_1.conv.bias", "params",
              fp + ("rec_bias",), _ident, _ident))
    s += _bn_specs(f"{tp}.reconstruct_1.norm", fp + ("rec_bn",))
    return s


def sk_unit_trans_spec(tp: str, fp: Tuple[str, ...],
                       m: int) -> List[Spec]:
    s: List[Spec] = [(f"{tp}.conv1.0.weight", "params",
                      fp + ("conv1_weight",), _ident, _ident)]
    s += _bn_specs(f"{tp}.conv1.1", fp + ("conv1_bn",))
    sk = f"{tp}.conv2_sk"
    s += _branch_specs(sk, fp + ("sk",), m)
    s.append((f"{sk}.fc.0.weight", "params", fp + ("sk", "fc_weight"),
              _sq2, _sq2_inv))
    s += _bn_specs(f"{sk}.fc.1", fp + ("sk", "fc_bn"))
    for i in range(m):
        s.append((f"{sk}.fcs.{i}.weight", "params",
                  fp + ("sk", f"fcs_{i}_weight"), _sq2, _sq2_inv))
        s.append((f"{sk}.fcs.{i}.bias", "params",
                  fp + ("sk", f"fcs_{i}_bias"), _ident, _ident))
    s += _bn_specs(f"{sk}.norm", fp + ("sk", "norm"))
    s += channel_transformer_spec(f"{sk}.tf", fp + ("sk", "tf"))
    s += _bn_specs(f"{tp}.norm", fp + ("norm",))
    s.append((f"{tp}.conv3.0.weight", "params", fp + ("conv3_weight",),
              _ident, _ident))
    s += _bn_specs(f"{tp}.conv3.1", fp + ("conv3_bn",))
    return s


def dsknet_trans_mmfi_spec() -> List[Spec]:
    return (sk_unit_trans_spec("skunit1", ("skunit1",), m=3)
            + sk_unit_trans_spec("skunit2", ("skunit2",), m=3)
            + _bn_specs("norm", ("norm",))
            + regression_spec("regression", ("regression",)))


def dsknet_trans_wipose_spec() -> List[Spec]:
    return (sk_unit_trans_spec("skunit1", ("skunit1",), m=2)
            + sk_unit_trans_spec("skunit2", ("skunit2",), m=2)
            + _bn_specs("norm", ("norm",))
            + regression_spec("regression", ("regression",)))
