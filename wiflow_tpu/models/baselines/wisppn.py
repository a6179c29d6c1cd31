"""WiSPPN baseline: ResNet PAM regressor.

Rebuild of ref /root/reference/baseline/WiSPPN/wisppn.py:269-418:

  convert_csi_format: [B, 540, 20] -> [B, 600, 3, 6]   (:269-298)
  bilinear upsample to 120x120                          (:378)
  custom ResNet (BasicBlocks, layers [2,2,2,2], widths 600/600/1024/1024)
  conv decode -> [B, 2, 15, 15] pose-adjacency matrix   (:352-394)
  keypoints live on the PAM diagonal                    (:396-413)

Trained with confidence-weighted MSE against PAM labels (:988-1000).
The MM-Fi variant reshapes [B, 3, 114, 10] -> [B, 1140, 1, 3] and emits a
3x17x17 PAM (ref cross_dataset_test/WiSPPN/wisppn.py:36-61, 98-158).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from wiflow_tpu.models.layers import TorchBatchNorm
from wiflow_tpu.models.baselines.hpeli import conv2d


def convert_csi_format(x: jax.Array) -> jax.Array:
    """[B, 540, 20] -> [B, 600, 3, 6] '(time x subcarrier, tx, rx)' view
    (ref wisppn.py:269-298)."""
    b = x.shape[0]
    x = x.reshape(b, 2, 30, 3, 3, 20)
    x = jnp.transpose(x, (0, 1, 5, 2, 3, 4))   # [B, 2, 20, 30, 3, 3]
    return x.reshape(b, 600, 3, 6)             # contiguous regroup, as ref


def convert_csi_format_mmfi(x: jax.Array) -> jax.Array:
    """[B, 3, 114, 10] -> [B, 1140, 1, 3] (ref cross_dataset_test/
    WiSPPN/wisppn.py:36-61)."""
    b = x.shape[0]
    x = jnp.transpose(x, (0, 3, 2, 1))          # [B, 10, 114, 3]
    return x.reshape(b, 1140, 1, 3)


class BasicBlock(nn.Module):
    """3x3-3x3 residual block (ref wisppn.py:309-333)."""

    cout: int
    stride: int = 1

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool) -> jax.Array:
        cin = x.shape[-1]
        w1 = self.param("conv1_weight", nn.initializers.he_normal(),
                        (3, 3, cin, self.cout))
        y = conv2d(x, w1, stride=(self.stride, self.stride))
        y = TorchBatchNorm(self.cout, name="bn1")(y, train=train)
        y = nn.relu(y)
        w2 = self.param("conv2_weight", nn.initializers.he_normal(),
                        (3, 3, self.cout, self.cout))
        y = conv2d(y, w2)
        y = TorchBatchNorm(self.cout, name="bn2")(y, train=train)
        if self.stride != 1 or cin != self.cout:
            wd = self.param("down_weight", nn.initializers.he_normal(),
                            (3, 3, cin, self.cout))
            x = conv2d(x, wd, stride=(self.stride, self.stride))
            x = TorchBatchNorm(self.cout, name="down_bn")(x, train=train)
        return nn.relu(y + x)


class WiSPPN(nn.Module):
    """PAM-regressing ResNet (ref wisppn.py:335-394)."""

    layers: Sequence[int] = (2, 2, 2, 2)
    widths: Sequence[int] = (600, 600, 1024, 1024)
    input_converter: str = "wiflow"       # 'wiflow' | 'mmfi'
    pam_channels: int = 2                 # 3 for MM-Fi (x, y, z)
    pam_size: int = 15                    # 17 for MM-Fi
    compute_dtype: str = "bfloat16"

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        x = x.astype(jnp.dtype(self.compute_dtype))
        x = (convert_csi_format(x) if self.input_converter == "wiflow"
             else convert_csi_format_mmfi(x))
        cin = x.shape[1]
        x = jnp.transpose(x, (0, 2, 3, 1))             # NHWC
        x = jax.image.resize(x, (x.shape[0], 120, 120, cin), "bilinear")

        w0 = self.param("conv1_weight", nn.initializers.he_normal(),
                        (3, 3, cin, cin))
        x = conv2d(x, w0)
        x = TorchBatchNorm(cin, name="bn1")(x, train=train)
        x = nn.relu(x)

        for li, (n, width) in enumerate(zip(self.layers, self.widths)):
            stride = 1 if li == 0 else 2
            for bi in range(n):
                x = BasicBlock(width, stride=stride if bi == 0 else 1,
                               name=f"layer{li + 1}_{bi}")(x, train=train)

        # decode: 1024 -> 256 -> 64 -> pam_channels (ref :364-372)
        for i, cout in enumerate((256, 64)):
            w = self.param(f"decode_conv{i}_weight",
                           nn.initializers.he_normal(),
                           (3, 3, x.shape[-1], cout))
            x = conv2d(x, w)
            x = TorchBatchNorm(cout, name=f"decode_bn{i}")(x, train=train)
            x = nn.relu(x)
        wf = self.param("decode_out_weight", nn.initializers.he_normal(),
                        (1, 1, 64, self.pam_channels))
        x = conv2d(x, wf)                              # [B, 15, 15, C]

        # final [B, C, 15, 15]: adaptive mean-pool from 15x15 (the ResNet
        # output is already 15x15 after 3 stride-2 stages: 120/8 = 15)
        x = jnp.transpose(x, (0, 3, 1, 2)).astype(jnp.float32)
        if x.shape[-1] != self.pam_size:
            x = jax.image.resize(
                x, (*x.shape[:2], self.pam_size, self.pam_size), "bilinear")
        return x


def extract_keypoints_from_pam(pam: jax.Array) -> jax.Array:
    """PAM diagonal -> keypoints [B, K, C] (ref wisppn.py:396-413)."""
    diag = jnp.diagonal(pam, axis1=-2, axis2=-1)       # [B, C, K]
    return jnp.swapaxes(diag, -1, -2)                   # [B, K, C]


def keypoints_to_pam(kp: jax.Array, confidence: float = 1.0) -> jax.Array:
    """Build a PAM label tensor from keypoints (for synthetic data):
    diagonal = coords, off-diagonal = pairwise midpoints, plus constant
    confidence channels.  [B, K, C] -> [B, 2C, K, K]."""
    b, k, c = kp.shape
    mid = 0.5 * (kp[:, :, None, :] + kp[:, None, :, :])   # [B, K, K, C]
    eye = jnp.eye(k)[None, :, :, None]
    pam = mid * (1 - eye) + kp[:, :, None, :] * eye
    pam = jnp.transpose(pam, (0, 3, 1, 2))                 # [B, C, K, K]
    conf = jnp.full((b, c, k, k), confidence, pam.dtype)
    return jnp.concatenate([pam, conf], axis=1)
