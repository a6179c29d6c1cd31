"""HPE-Li baseline: selective-kernel CNN pose regressor.

Rebuild of ref /root/reference/baseline/HPELI/hpeli.py:478-633 — the
ECCV'24 HPE-Li method adapted to the WiFlow dataset:

  [B, 540, 20] -> view [B, 3, 180, 20]
  SKUnit(3 -> 64)  -> AvgPool2d(2)     [B, 64, 90, 10]
  SKUnit(64 -> 128) -> AvgPool2d(2)    [B, 128, 45, 5]
  conv regression head ((3,1) strided convs) -> Flatten
  Linear(16*8*5 -> 30) -> [B, 15, 2]

SKConv: M dilated 3x3 branches fused by frequency-axis attention (the
attention pools over time, keeping the frequency axis — hpeli.py:517-537).
Channel-last layouts; convs via XLA (3x3 dilated convs tile fine at
64-128 channels).

The MM-Fi variant of HPE-Li (OriginalHPE with M=2, G=64 — ref
cross_dataset_test/HPE-Li/model/HPE_no_denoiser.py:9-73) is the
``HPELiMMFi`` configuration below.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from wiflow_tpu.models.layers import TorchBatchNorm


def _xavier_normal():
    return nn.initializers.xavier_normal()


def conv2d(x, w, b=None, *, stride=(1, 1), padding="SAME", dilation=(1, 1),
           groups=1):
    """NHWC conv wrapper (HWIO weights)."""
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=stride, padding=padding,
        rhs_dilation=dilation, feature_group_count=groups,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST)
    if b is not None:
        y = y + b
    return y


class SKConv(nn.Module):
    """Selective-kernel conv (ref hpeli.py:478-537).

    M dilated 3x3 branches; fuse by sum; per-(channel, frequency) attention
    from a time-pooled descriptor; softmax over branches; weighted sum.
    """

    out_dim: int
    m: int = 4
    groups: int = 1
    r: int = 4

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool) -> jax.Array:
        cin = x.shape[-1]
        feats = []
        for i in range(self.m):
            w = self.param(f"conv{i}_weight", _xavier_normal(),
                           (3, 3, cin // self.groups, self.out_dim))
            y = conv2d(x, w, padding=[(1 + i, 1 + i)] * 2,
                       dilation=(1 + i, 1 + i), groups=self.groups)
            y = TorchBatchNorm(self.out_dim, name=f"bn{i}")(y, train=train)
            feats.append(nn.relu(y))
        feats = jnp.stack(feats, axis=1)              # [B, M, H, W, C]
        fused = jnp.sum(feats, axis=1)                # [B, H, W, C]

        # time-pooled descriptor keeps the frequency axis (hpeli.py:520)
        desc = jnp.mean(fused, axis=2)                # [B, H, C]
        d = max(self.out_dim // self.r, 32)
        wfc = self.param("fc_weight", _xavier_normal(), (self.out_dim, d))
        z = jnp.einsum("bhc,cd->bhd", desc, wfc.astype(x.dtype))
        bfc = self.param("fc_bias", nn.initializers.zeros, (d,))
        z = TorchBatchNorm(d, name="fc_bn")(z + bfc, train=train)
        z = nn.relu(z)                                # [B, H, d]

        att = []
        for i in range(self.m):
            wa = self.param(f"att{i}_weight", _xavier_normal(),
                            (d, self.out_dim))
            ba = self.param(f"att{i}_bias", nn.initializers.zeros,
                            (self.out_dim,))
            att.append(jnp.einsum("bhd,dc->bhc", z, wa.astype(x.dtype)) + ba)
        att = jax.nn.softmax(jnp.stack(att, axis=1), axis=1)  # [B, M, H, C]
        return jnp.sum(feats * att[:, :, :, None, :], axis=1)


class SKUnit(nn.Module):
    """1x1 conv + BN + ReLU -> SKConv + BN + ReLU (ref hpeli.py:540-559)."""

    mid: int
    out: int
    m: int = 4
    groups: int = 1
    r: int = 4

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool) -> jax.Array:
        w1 = self.param("conv1_weight", _xavier_normal(),
                        (1, 1, x.shape[-1], self.mid))
        y = conv2d(x, w1)
        y = TorchBatchNorm(self.mid, name="bn1")(y, train=train)
        y = nn.relu(y)
        y = SKConv(self.out, m=self.m, groups=self.groups, r=self.r,
                   name="sk")(y, train=train)
        y = TorchBatchNorm(self.out, name="bn2")(y, train=train)
        return nn.relu(y)


class HPELiNet(nn.Module):
    """HPE-Li on the WiFlow dataset (ref hpeli.py:562-633)."""

    num_keypoints: int = 15
    keypoint_dims: int = 2
    compute_dtype: str = "bfloat16"

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        b = x.shape[0]
        x = x.astype(jnp.dtype(self.compute_dtype))
        # [B, 540, 20] -> [B, 3(ch), 180, 20] -> NHWC [B, 180, 20, 3]
        x = x.reshape(b, 3, 180, 20).transpose(0, 2, 3, 1)

        x = SKUnit(64, 64, m=4, name="skunit1")(x, train=train)
        x = nn.avg_pool(x, (2, 2), strides=(2, 2))    # [B, 90, 10, 64]
        x = SKUnit(128, 128, m=4, name="skunit2")(x, train=train)
        x = nn.avg_pool(x, (2, 2), strides=(2, 2))    # [B, 45, 5, 128]

        # regression head: (3,1) convs strided along frequency
        for i, (cout, stride) in enumerate(((64, 2), (32, 2), (16, 1))):
            w = self.param(f"reg_conv{i}_weight", _xavier_normal(),
                           (3, 1, x.shape[-1], cout))
            bias = self.param(f"reg_conv{i}_bias", nn.initializers.zeros,
                              (cout,))
            x = conv2d(x, w, bias, stride=(stride, 1), padding="VALID")
            x = nn.relu(x)                             # -> [B, 8, 5, 16]

        x = x.transpose(0, 3, 1, 2).reshape(b, -1)     # torch Flatten order
        wl = self.param("linear_weight", _xavier_normal(),
                        (x.shape[-1], self.num_keypoints * self.keypoint_dims))
        bl = self.param("linear_bias", nn.initializers.zeros,
                        (self.num_keypoints * self.keypoint_dims,))
        x = x @ wl.astype(x.dtype) + bl
        return x.reshape(b, self.num_keypoints,
                         self.keypoint_dims).astype(jnp.float32)


class HPELiMMFi(nn.Module):
    """OriginalHPE for MM-Fi (ref cross_dataset_test/HPE-Li/model/
    HPE_no_denoiser.py:9-73): [B, 3, 114, 10] -> [B, 17, 2] with 2 SKUnits
    (M=2, G=64) and the same regression-head shape family."""

    num_keypoints: int = 17
    keypoint_dims: int = 2
    compute_dtype: str = "bfloat16"

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        b = x.shape[0]
        x = x.astype(jnp.dtype(self.compute_dtype))
        x = x.transpose(0, 2, 3, 1)                    # [B, 114, 10, 3]

        x = SKUnit(64, 64, m=2, name="skunit1")(x, train=train)
        x = nn.avg_pool(x, (2, 2), strides=(2, 2))     # [B, 57, 5, 64]
        x = SKUnit(128, 128, m=2, groups=1, name="skunit2")(x, train=train)
        x = nn.avg_pool(x, (2, 2), strides=(2, 2))     # [B, 28, 2, 128]

        for i, (cout, stride) in enumerate(((64, 2), (32, 2), (16, 1))):
            w = self.param(f"reg_conv{i}_weight", _xavier_normal(),
                           (3, 1, x.shape[-1], cout))
            bias = self.param(f"reg_conv{i}_bias", nn.initializers.zeros,
                              (cout,))
            x = conv2d(x, w, bias, stride=(stride, 1), padding="VALID")
            x = nn.relu(x)
        x = x.transpose(0, 3, 1, 2).reshape(b, -1)
        wl = self.param("linear_weight", _xavier_normal(),
                        (x.shape[-1], self.num_keypoints * self.keypoint_dims))
        bl = self.param("linear_bias", nn.initializers.zeros,
                        (self.num_keypoints * self.keypoint_dims,))
        x = x @ wl.astype(x.dtype) + bl
        return x.reshape(b, self.num_keypoints,
                         self.keypoint_dims).astype(jnp.float32)
