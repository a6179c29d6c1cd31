"""WiFlow re-dimensioned for MM-Fi: [B, 3, 114, 10] CSI -> [B, 17, 3] pose.

Rebuild of ref /root/reference/cross_dataset_test/WiFlow/wiflow.py:441-530:

  flatten antennas: [B, 3, 114, 10] -> [B, 342, 10]          (:501)
  TCN 342 -> [342, 306, 288], groups=18                      (:445-451, :167)
  1x1 projection 288 -> 272 + BN + SiLU                      (:453-457)
  ConvBlock1(1->8) + 4 stride-2 blocks -> [B, 64, 10, 17]    (:459-467)
  DualAxialAttention (groups 8) on [B, 64, 17, 10]           (:469, :518)
  take the LAST timestep, 1x1 conv 64->32 + BN + SiLU,
  1x1 conv 32->3 (no BN) -> [B, 17, 3]                        (:471-476, :523-530)

Reuses the trunk building blocks; only the assembly differs.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import linen as nn

from wiflow_tpu.core.config import ModelConfig
from wiflow_tpu.models.layers import (
    TorchBatchNorm, kaiming_normal_fan_out, torch_bias_default,
    torch_conv_default, silu,
)
from wiflow_tpu.models.wiflow import ConvBlock, DualAxialAttention, TCNStack
from wiflow_tpu.ops.conv import conv1x1_2d, pointwise_conv1d


@dataclasses.dataclass(frozen=True)
class MMFiModelConfig:
    num_antennas: int = 3
    num_subcarriers: int = 114
    window_size: int = 10
    num_keypoints: int = 17
    keypoint_dims: int = 3
    tcn_channels = (342, 306, 288)
    tcn_proj_channels: int = 272
    tcn_kernel_size: int = 3
    tcn_groups: int = 18                     # ref wiflow.py:167
    conv_channels = (8, 16, 32, 64)
    attention_groups: int = 8
    dropout: float = 0.3                     # ref wiflow.py:1185
    conv_dropout: float = 0.3
    compute_dtype: str = "bfloat16"
    tcn_matmul: str = "block_diag"           # see ModelConfig.tcn_matmul
    attention_module_impl: str = "auto"      # see ModelConfig
    # stage-fused train-path lowering switches (see ModelConfig; default
    # 'xla' until the fused path is chip-verified)
    tcn_train_impl: str = "xla"
    conv_train_impl: str = "xla"

    @property
    def input_channels(self) -> int:
        return self.num_antennas * self.num_subcarriers   # 342


class WiFlowMMFiModel(nn.Module):
    """CSIPoseEstimationModel rebuild (ref wiflow.py:441-530)."""

    config: MMFiModelConfig = MMFiModelConfig()

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        cfg = self.config
        b = x.shape[0]
        if x.shape[1:] != (cfg.num_antennas, cfg.num_subcarriers,
                           cfg.window_size):
            raise ValueError(
                f"expected [B, {cfg.num_antennas}, {cfg.num_subcarriers}, "
                f"{cfg.window_size}] MM-Fi CSI, got {x.shape}")
        dtype = jnp.dtype(cfg.compute_dtype)
        x = x.astype(dtype)

        # [B, 3, 114, 10] -> channel-last [B, T=10, C=342]
        x = x.reshape(b, cfg.input_channels, cfg.window_size)
        x = jnp.transpose(x, (0, 2, 1))
        x = TCNStack(
            num_inputs=cfg.input_channels,
            num_channels=tuple(cfg.tcn_channels),
            kernel_size=cfg.tcn_kernel_size,
            groups=cfg.tcn_groups,
            dropout=cfg.dropout,
            matmul_impl=cfg.tcn_matmul,
            train_impl=cfg.tcn_train_impl,
            name="tcn",
        )(x, train=train)                                  # [B, 10, 288]

        # tcn_proj: 1x1 conv (no bias) + BN + SiLU (ref :453-457)
        wproj = self.param("tcn_proj_weight",
                           kaiming_normal_fan_out(cfg.tcn_proj_channels),
                           (cfg.tcn_channels[-1], cfg.tcn_proj_channels))
        x = pointwise_conv1d(x, wproj)
        x = TorchBatchNorm(cfg.tcn_proj_channels, name="tcn_proj_bn")(
            x, train=train)
        x = silu(x)                                        # [B, 10, 272]

        from wiflow_tpu.models.wiflow import (
            fused_conv_gate, run_fused_conv_stack)
        fused_cv = fused_conv_gate(
            train=train, impl=cfg.conv_train_impl,
            conv_channels=cfg.conv_channels, w0=cfg.tcn_proj_channels,
            r_rows=b * cfg.window_size)

        if fused_cv is not None:
            dplans, nbv, interp = fused_cv
            x = run_fused_conv_stack(
                x, conv_channels=tuple(cfg.conv_channels),
                conv_dropout=cfg.conv_dropout, dplans=dplans, nbv=nbv,
                interp=interp, train=train)
        else:
            x = x[..., None]                               # [B, 10, 272, 1]
            x = ConvBlock(1, cfg.conv_channels[0], stride_w=1,
                          dropout=cfg.conv_dropout, name="up")(x, train=train)
            n_in = cfg.conv_channels[0]
            for j, n_out in enumerate(cfg.conv_channels):
                x = ConvBlock(n_in, n_out, stride_w=2,
                              dropout=cfg.conv_dropout,
                              name=f"residual_blocks_{j}")(x, train=train)
                n_in = n_out
        # [B, 10, 17, 64] -> [B, H=17, W=10, C=64] (ref :518)
        x = jnp.transpose(x, (0, 2, 1, 3))

        x = DualAxialAttention(cfg.conv_channels[-1],
                               groups=cfg.attention_groups,
                               train_impl=cfg.attention_module_impl,
                               name="attention")(x, train=train)

        # decoder on the LAST timestep (ref :523): [B, 17, 1, 64]
        x = x[:, :, -1:, :]
        w1 = self.param("final_conv1_weight", torch_conv_default(64),
                        (cfg.conv_channels[-1], 32))
        b1 = self.param("final_conv1_bias", torch_bias_default(64), (32,))
        x = conv1x1_2d(x, w1, b1)
        x = TorchBatchNorm(32, name="final_bn")(x, train=train)
        x = silu(x)
        w2 = self.param("final_conv2_weight", torch_conv_default(32),
                        (32, cfg.keypoint_dims))
        b2 = self.param("final_conv2_bias", torch_bias_default(32),
                        (cfg.keypoint_dims,))
        x = conv1x1_2d(x, w2, b2)                          # [B, 17, 1, 3]
        return x[:, :, 0, :].astype(jnp.float32)           # [B, 17, 3]
