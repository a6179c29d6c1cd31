"""WPformer baseline: multi-stream ResNet34 + channel transformer.

Rebuild of ref /root/reference/baseline/WPformer/model.py:281-452 and
ChannelTrans.py:24-291:

  [B, 540, 20] -> 18 chunks of 30 subcarriers, each resized to 60x32
  shared ResNet34 stem + layers1-3 (1-ch 3x3 stem, no maxpool)
  concat on width -> [B, 256, 15, 144] -> BN
  ChannelTransformer (channel-wise attention, 3 heads, 1 layer,
  InstanceNorm on scores) with learned positional embeddings
  conv decode -> AvgPool over width -> BN1d -> [B, 15, 2]

The reference optionally warm-starts from ImageNet ResNet34 weights
(model.py:302-328); the rebuild's ``resnet34_warm_start`` below maps a
torchvision-format ResNet34 state_dict onto the trunk the same way.  MM-Fi variant: 2 antenna-
pair streams of 114x10 CSI, ChannelTransformer img [17,12] ch 512 ->
[B, 17, 3] (ref cross_dataset_test/WPformer/metafi.py:39-207).
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from wiflow_tpu.models.baselines.hpeli import conv2d
from wiflow_tpu.models.layers import TorchBatchNorm, TorchDropout


class ResBasicBlock(nn.Module):
    cout: int
    stride: int = 1

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool) -> jax.Array:
        cin = x.shape[-1]
        w1 = self.param("conv1_weight", nn.initializers.he_normal(),
                        (3, 3, cin, self.cout))
        # explicit (1,1) padding: XLA "SAME" pads asymmetrically under
        # stride 2, torch Conv2d(padding=1) does not — parity requires
        # torch's placement
        y = conv2d(x, w1, stride=(self.stride, self.stride),
                   padding=[(1, 1), (1, 1)])
        y = TorchBatchNorm(self.cout, name="bn1")(y, train=train)
        y = nn.relu(y)
        w2 = self.param("conv2_weight", nn.initializers.he_normal(),
                        (3, 3, self.cout, self.cout))
        y = conv2d(y, w2, padding=[(1, 1), (1, 1)])
        y = TorchBatchNorm(self.cout, name="bn2")(y, train=train)
        if self.stride != 1 or cin != self.cout:
            wd = self.param("down_weight", nn.initializers.he_normal(),
                            (1, 1, cin, self.cout))
            x = conv2d(x, wd, stride=(self.stride, self.stride),
                       padding="VALID")
            x = TorchBatchNorm(self.cout, name="down_bn")(x, train=train)
        return nn.relu(y + x)


class ResNet34Trunk(nn.Module):
    """ResNet34 stem + layers, 3x3/stride-1 1-channel stem, no maxpool
    (ref model.py:335-344, 403-415; MM-Fi variant adds layer4)."""

    widths: Sequence[int] = (64, 128, 256)
    blocks: Sequence[int] = (3, 4, 6)

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool) -> jax.Array:
        w0 = self.param("stem_weight", nn.initializers.he_normal(),
                        (3, 3, x.shape[-1], 64))
        x = conv2d(x, w0)
        x = TorchBatchNorm(64, name="stem_bn")(x, train=train)
        x = nn.relu(x)
        for li, (width, n) in enumerate(zip(self.widths, self.blocks)):
            stride = 1 if li == 0 else 2
            for bi in range(n):
                x = ResBasicBlock(width, stride=stride if bi == 0 else 1,
                                  name=f"layer{li + 1}_{bi}")(x, train=train)
        return x


class ChannelAttention(nn.Module):
    """Channel-wise attention (ref ChannelTrans.py:82-168): per-head
    linear Q/K/V over channels, scores [C, C] InstanceNorm'd per head,
    softmax, mean over heads."""

    channels: int
    heads: int = 3
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool) -> jax.Array:
        c, h = self.channels, self.heads
        qs, ks, vs = [], [], []
        for i in range(h):
            wq = self.param(f"wq{i}", nn.initializers.xavier_uniform(), (c, c))
            wk = self.param(f"wk{i}", nn.initializers.xavier_uniform(), (c, c))
            wv = self.param(f"wv{i}", nn.initializers.xavier_uniform(), (c, c))
            qs.append(x @ wq.astype(x.dtype))
            ks.append(x @ wk.astype(x.dtype))
            vs.append(x @ wv.astype(x.dtype))
        q = jnp.stack(qs, axis=1)                    # [B, H, N, C]
        k = jnp.stack(ks, axis=1)
        v = jnp.stack(vs, axis=1)

        scores = jnp.einsum("bhnc,bhnd->bhcd", q, k,
                            preferred_element_type=jnp.float32)
        scores = scores / math.sqrt(c)
        # InstanceNorm2d(heads), affine=False: normalize per (b, h) over
        # the [C, C] map (ref ChannelTrans.py:103,137)
        mean = jnp.mean(scores, axis=(-2, -1), keepdims=True)
        var = jnp.var(scores, axis=(-2, -1), keepdims=True)
        scores = (scores - mean) * jax.lax.rsqrt(var + 1e-5)
        probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
        probs = TorchDropout(self.dropout, name="attn_drop")(
            probs, train=train)

        ctx = jnp.einsum("bhcd,bhnd->bhcn", probs, v,
                         preferred_element_type=jnp.float32).astype(x.dtype)
        ctx = jnp.mean(jnp.transpose(ctx, (0, 3, 2, 1)), axis=3)  # [B, N, C]
        wo = self.param("wo", nn.initializers.xavier_uniform(), (c, c))
        out = ctx @ wo.astype(x.dtype)
        return TorchDropout(self.dropout, name="proj_drop")(out, train=train)


class ChannelTransformer(nn.Module):
    """Positional embed -> encoder block(s) -> reconstruct + residual
    (ref ChannelTrans.py:193-291)."""

    channels: int
    spatial: Sequence[int]                 # (H, W)
    num_layers: int = 1
    heads: int = 3

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool) -> jax.Array:
        b = x.shape[0]
        h, w = self.spatial
        n = h * w
        tokens = x.reshape(b, n, self.channels)
        pos = self.param("position_embeddings", nn.initializers.zeros,
                         (1, n, self.channels))
        tokens = tokens + pos.astype(x.dtype)
        tokens = TorchDropout(0.1, name="emb_drop")(tokens, train=train)

        for i in range(self.num_layers):
            y = nn.LayerNorm(epsilon=1e-6, name=f"attn_norm_{i}")(tokens)
            y = ChannelAttention(self.channels, self.heads,
                                 name=f"attn_{i}")(y, train=train)
            tokens = tokens + y
            y = nn.LayerNorm(epsilon=1e-6, name=f"ffn_norm_{i}")(tokens)
            y = nn.Dense(self.channels * 4, name=f"mlp_in_{i}")(y)
            y = nn.gelu(y)
            y = TorchDropout(0.1, name=f"mlp_drop1_{i}")(y, train=train)
            y = nn.Dense(self.channels, name=f"mlp_out_{i}")(y)
            y = TorchDropout(0.1, name=f"mlp_drop2_{i}")(y, train=train)
            tokens = tokens + y
        tokens = nn.LayerNorm(epsilon=1e-6, name="encoder_norm")(tokens)

        # reconstruct: 1x1 conv + BN + ReLU, then residual (ref :51-81, 267)
        y = tokens.reshape(b, h, w, self.channels)
        wr = self.param("rec_weight", nn.initializers.he_normal(),
                        (1, 1, self.channels, self.channels))
        br = self.param("rec_bias", nn.initializers.zeros, (self.channels,))
        y = conv2d(y, wr, br)
        y = TorchBatchNorm(self.channels, name="rec_bn")(y, train=train)
        y = nn.relu(y)
        return y + x


class WPformer(nn.Module):
    """posenet rebuild (ref model.py:281-452).

    ``input_mode='wiflow'``: [B, 540, 20] -> 18 subcarrier chunks resized
    to 60x32, ResNet34 layers 1-3.  ``input_mode='mmfi'``: [B, 3, 114, 10]
    -> 3 antenna streams resized to 136x32, layers 1-4 (512 ch), 17x3-D
    output (ref cross_dataset_test/WPformer/metafi.py:95-205)."""

    num_chunks: int = 18                 # 540 / 30 subcarriers per stream
    resize_to: Sequence[int] = (60, 32)
    num_keypoints: int = 15
    keypoint_dims: int = 2
    trunk_widths: Sequence[int] = (64, 128, 256)
    trunk_blocks: Sequence[int] = (3, 4, 6)
    heads: int = 3
    input_mode: str = "wiflow"
    compute_dtype: str = "bfloat16"

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        b = x.shape[0]
        x = x.astype(jnp.dtype(self.compute_dtype))
        # chunk into streams and run the SHARED trunk over all streams as
        # one big batch (the reference loops in python — model.py:398-415)
        if self.input_mode == "mmfi":
            xs = x.reshape(b * self.num_chunks, x.shape[2], x.shape[3])
        else:
            chunk = x.shape[1] // self.num_chunks
            xs = x.reshape(b * self.num_chunks, chunk, x.shape[2])
        xs = xs[..., None]
        xs = jax.image.resize(
            xs, (xs.shape[0], *self.resize_to, 1), "bilinear")
        feats = ResNet34Trunk(widths=self.trunk_widths,
                              blocks=self.trunk_blocks,
                              name="trunk")(xs, train=train)
        fh, fw, fc = feats.shape[1:]
        # concat the 18 streams along width (model.py:421)
        feats = feats.reshape(b, self.num_chunks, fh, fw, fc)
        feats = jnp.transpose(feats, (0, 2, 1, 3, 4)).reshape(
            b, fh, self.num_chunks * fw, fc)

        feats = TorchBatchNorm(fc, name="pre_tf_bn")(feats, train=train)
        feats = ChannelTransformer(
            fc, (fh, self.num_chunks * fw), heads=self.heads,
            name="tf")(feats, train=train)

        # decode: 3x3 conv 256->32 + BN + ReLU, 1x1 -> D + BN + ReLU
        w1 = self.param("decode_conv1_weight", nn.initializers.he_normal(),
                        (3, 3, fc, 32))
        y = conv2d(feats, w1)
        y = TorchBatchNorm(32, name="decode_bn1")(y, train=train)
        y = nn.relu(y)
        w2 = self.param("decode_conv2_weight", nn.initializers.he_normal(),
                        (1, 1, 32, self.keypoint_dims))
        y = conv2d(y, w2)
        y = TorchBatchNorm(self.keypoint_dims, name="decode_bn2")(
            y, train=train)
        y = nn.relu(y)                                 # [B, 15, 144, D]

        y = jnp.mean(y.astype(jnp.float32), axis=2)    # AvgPool over width
        # final BatchNorm1d(D) over [B, D, K] (model.py:365,440)
        y = jnp.transpose(y, (0, 2, 1))                # [B, D, K]
        y = TorchBatchNorm(self.keypoint_dims, channel_axis=1,
                           name="final_bn")(y, train=train)
        return jnp.transpose(y, (0, 2, 1))             # [B, K, D]


def wpformer_mmfi(compute_dtype: str = "bfloat16") -> WPformer:
    """WPformer on MM-Fi: 3 antenna streams, ResNet34 layers 1-4, [B,17,3]
    (ref cross_dataset_test/WPformer/metafi.py:39-207)."""
    return WPformer(num_chunks=3, resize_to=(136, 32), num_keypoints=17,
                    keypoint_dims=3, trunk_widths=(64, 128, 256, 512),
                    trunk_blocks=(3, 4, 6, 3), input_mode="mmfi",
                    compute_dtype=compute_dtype)


def resnet34_warm_start(state_dict, widths: Sequence[int] = (64, 128, 256),
                        blocks: Sequence[int] = (3, 4, 6)):
    """Map a torchvision ``resnet34`` state_dict onto the WPformer trunk.

    Rebuild of the reference's ImageNet warm-start (ref
    baseline/WPformer/model.py:302-344): the torch code adopts the
    pretrained ``bn1`` and ``layer1..layer3`` (``layer4`` too for the
    MM-Fi variant, metafi.py) while replacing ``conv1`` with a fresh
    1-channel 3x3 stem — so the stem conv is deliberately NOT mapped.

    Returns ``{'params': {'trunk': ...}, 'batch_stats': {'trunk': ...}}``
    to pass as ``train_pose_model(init_variables=...)`` or merge into
    ``WPformer`` variables under the ``trunk`` submodule.
    """
    import numpy as np

    def arr(key):
        v = state_dict[key]
        v = v.detach().cpu().numpy() if hasattr(v, "detach") else v
        return np.asarray(v, np.float32)

    def conv_hwio(key):
        return arr(key).transpose(2, 3, 1, 0)          # OIHW -> HWIO

    params = {"stem_bn": {"weight": arr("bn1.weight"),
                          "bias": arr("bn1.bias")}}
    stats = {"stem_bn": {"running_mean": arr("bn1.running_mean"),
                         "running_var": arr("bn1.running_var")}}

    for li, (width, n) in enumerate(zip(widths, blocks)):
        for bi in range(n):
            tp = f"layer{li + 1}.{bi}"
            name = f"layer{li + 1}_{bi}"
            p = {"conv1_weight": conv_hwio(f"{tp}.conv1.weight"),
                 "conv2_weight": conv_hwio(f"{tp}.conv2.weight"),
                 "bn1": {"weight": arr(f"{tp}.bn1.weight"),
                         "bias": arr(f"{tp}.bn1.bias")},
                 "bn2": {"weight": arr(f"{tp}.bn2.weight"),
                         "bias": arr(f"{tp}.bn2.bias")}}
            s = {"bn1": {"running_mean": arr(f"{tp}.bn1.running_mean"),
                         "running_var": arr(f"{tp}.bn1.running_var")},
                 "bn2": {"running_mean": arr(f"{tp}.bn2.running_mean"),
                         "running_var": arr(f"{tp}.bn2.running_var")}}
            if f"{tp}.downsample.0.weight" in state_dict:
                p["down_weight"] = conv_hwio(f"{tp}.downsample.0.weight")
                p["down_bn"] = {"weight": arr(f"{tp}.downsample.1.weight"),
                                "bias": arr(f"{tp}.downsample.1.bias")}
                s["down_bn"] = {
                    "running_mean": arr(f"{tp}.downsample.1.running_mean"),
                    "running_var": arr(f"{tp}.downsample.1.running_var")}
            params[name] = p
            stats[name] = s
    return {"params": {"trunk": params}, "batch_stats": {"trunk": stats}}


def merge_warm_start(variables, warm):
    """Deep-merge ``resnet34_warm_start`` output into model variables
    (handles FrozenDict trees by converting to plain dicts)."""
    def to_dict(t):
        if hasattr(t, "items"):
            return {k: to_dict(v) for k, v in t.items()}
        return t

    def deep(dst, src):
        for k, v in src.items():
            if isinstance(v, dict) and isinstance(dst.get(k), dict):
                deep(dst[k], v)
            else:
                dst[k] = v
    out = to_dict(variables)
    for coll in warm:
        deep(out.setdefault(coll, {}), warm[coll])
    return out
