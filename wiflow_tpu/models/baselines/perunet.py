"""PerUnet baseline: UNet + Performer-denoised skip connection.

Rebuild of ref /root/reference/baseline/PerUnet/perunet.py:342-461:

  [B, 540, 20] -> view (30, 18, 20) -> permute -> [B, 600, 3, 6] (:422-426)
  bilinear 24x24 -> 3-level UNet (600/1200/2400 channels, MaxPool2d)
  Performer (dim 600, depth 3) on the first skip connection  (:383-391)
  ConvTranspose decoders with skip concat
  scale-match convs -> AdaptiveAvgPool(15,15) -> [B, 2, 15, 15] PAM

MM-Fi variant (ref cross_dataset_test/PerUnet/perunet.py:124-241):
input [B, 3, 114, 10] -> [B, 1140, 1, 3] -> 24x24, same UNet scaled,
global pool + Linear -> [B, 17, 3] direct keypoints.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from wiflow_tpu.models.baselines.hpeli import conv2d
from wiflow_tpu.models.baselines.performer import Performer
from wiflow_tpu.models.layers import TorchBatchNorm


class DoubleConv(nn.Module):
    """(3x3 conv + BN + ReLU) x2 (ref perunet.py:342-357)."""

    cout: int

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool) -> jax.Array:
        for i in range(2):
            w = self.param(f"conv{i}_weight", nn.initializers.he_normal(),
                           (3, 3, x.shape[-1], self.cout))
            b = self.param(f"conv{i}_bias", nn.initializers.zeros,
                           (self.cout,))
            x = conv2d(x, w, b)
            x = TorchBatchNorm(self.cout, name=f"bn{i}")(x, train=train)
            x = nn.relu(x)
        return x


def conv_transpose2x2(x: jax.Array, w: jax.Array, b: jax.Array) -> jax.Array:
    """torch ConvTranspose2d(k=2, s=2) == 2x upsample (NHWC, HWIO w)."""
    y = jax.lax.conv_transpose(
        x, w.astype(x.dtype), strides=(2, 2), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST)
    return y + b


class PerUnet(nn.Module):
    """UNet + Performer PAM regressor (ref perunet.py:361-460)."""

    base: int = 600                       # encoder widths base, 1200, 2400
    pam_channels: int = 2
    pam_size: int = 15
    input_converter: str = "wiflow"       # 'wiflow' | 'mmfi'
    performer_exact: bool = False
    compute_dtype: str = "bfloat16"

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        b = x.shape[0]
        x = x.astype(jnp.dtype(self.compute_dtype))
        if self.input_converter == "wiflow":
            # [B, 540, 20] -> [B, 30, 18, 20] -> [B, 20, 30, 18]
            # -> [B, 600, 3, 6] (ref :416-426)
            x = x.reshape(b, 30, 18, 20)
            x = jnp.transpose(x, (0, 3, 1, 2))
            x = x.reshape(b, 600, 3, 6)
        else:
            x = jnp.transpose(x, (0, 3, 2, 1)).reshape(b, 1140, 1, 3)

        cin = x.shape[1]
        x = jnp.transpose(x, (0, 2, 3, 1))             # NHWC
        x = jax.image.resize(x, (b, 24, 24, cin), "bilinear")
        if cin != self.base:
            w_in = self.param("in_proj_weight", nn.initializers.he_normal(),
                              (1, 1, cin, self.base))
            x = conv2d(x, w_in)

        c1, c2, c3 = self.base, self.base * 2, self.base * 4
        x1 = DoubleConv(c1, name="inc")(x, train=train)        # [24,24,600]
        x2 = DoubleConv(c2, name="down1")(
            nn.max_pool(x1, (2, 2), strides=(2, 2)), train=train)   # 12x12
        x3 = DoubleConv(c3, name="down2")(
            nn.max_pool(x2, (2, 2), strides=(2, 2)), train=train)   # 6x6
        bot = DoubleConv(c3, name="bot")(
            nn.max_pool(x3, (2, 2), strides=(2, 2)), train=train)   # 3x3

        # Performer-denoised skip 1 (ref :437-441)
        h, w = x1.shape[1], x1.shape[2]
        tokens = x1.reshape(b, h * w, c1)
        tokens = Performer(dim=c1, depth=3, heads=4, dim_head=64,
                           exact=self.performer_exact,
                           name="performer_sc1")(tokens)
        x1_att = tokens.reshape(b, h, w, c1)

        def up(x, skip, cout, name):
            wt = self.param(f"{name}_weight", nn.initializers.he_normal(),
                            (2, 2, x.shape[-1], cout))
            bt = self.param(f"{name}_bias", nn.initializers.zeros, (cout,))
            x = conv_transpose2x2(x, wt, bt)
            return jnp.concatenate([x, skip], axis=-1)

        u = DoubleConv(c2, name="up_conv1")(
            up(bot, x3, c2, "up1"), train=train)                 # 6x6
        u = DoubleConv(c1, name="up_conv2")(
            up(u, x2, c1, "up2"), train=train)                   # 12x12
        u = DoubleConv(c1, name="up_conv3")(
            up(u, x1_att, c1, "up3"), train=train)               # 24x24

        # scale matching (ref :408-414)
        ws1 = self.param("scale1_weight", nn.initializers.he_normal(),
                         (3, 3, c1, 150))
        bs1 = self.param("scale1_bias", nn.initializers.zeros, (150,))
        u = nn.relu(conv2d(u, ws1, bs1))
        ws2 = self.param("scale2_weight", nn.initializers.he_normal(),
                         (3, 3, 150, self.pam_channels))
        bs2 = self.param("scale2_bias", nn.initializers.zeros,
                         (self.pam_channels,))
        u = conv2d(u, ws2, bs2)                                  # [24,24,C]

        u = jnp.transpose(u, (0, 3, 1, 2)).astype(jnp.float32)
        # AdaptiveAvgPool2d((15, 15)) on a 24x24 map
        return _adaptive_avg_pool(u, self.pam_size)


class PerUnetMMFi(nn.Module):
    """MM-Fi PerUnet: UNet trunk -> global pool -> Linear -> [B, 17, 3]
    (ref cross_dataset_test/PerUnet/perunet.py:182-241)."""

    num_keypoints: int = 17
    keypoint_dims: int = 3
    base: int = 600
    performer_exact: bool = False
    compute_dtype: str = "bfloat16"

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        trunk = PerUnet(base=self.base, pam_channels=self.base // 4,
                        pam_size=1, input_converter="mmfi",
                        performer_exact=self.performer_exact,
                        compute_dtype=self.compute_dtype, name="trunk")
        feats = trunk(x, train=train)                  # [B, base//4, 1, 1]
        feats = feats.reshape(x.shape[0], -1)
        wl = self.param("head_weight", nn.initializers.xavier_normal(),
                        (feats.shape[-1],
                         self.num_keypoints * self.keypoint_dims))
        bl = self.param("head_bias", nn.initializers.zeros,
                        (self.num_keypoints * self.keypoint_dims,))
        out = feats @ wl + bl
        return out.reshape(x.shape[0], self.num_keypoints,
                           self.keypoint_dims).astype(jnp.float32)


def _adaptive_avg_pool(x: jax.Array, out_size: int) -> jax.Array:
    """torch AdaptiveAvgPool2d semantics on [B, C, H, W]."""
    b, c, h, w = x.shape
    def pool_axis(arr, n_in, n_out, axis):
        segs = []
        for i in range(n_out):
            s = (i * n_in) // n_out
            e = ((i + 1) * n_in + n_out - 1) // n_out
            segs.append(jnp.mean(
                jax.lax.slice_in_dim(arr, s, e, axis=axis), axis=axis,
                keepdims=True))
        return jnp.concatenate(segs, axis=axis)
    x = pool_axis(x, h, out_size, 2)
    return pool_axis(x, w, out_size, 3)
