"""Configuration tree for the framework.

Replaces the reference's loosely coupled trio of argparse flags,
``config.py::Config`` class constants (ref: /root/reference/config.py:1-50,
several of which are stale — see SURVEY.md §8.9) and per-script dict
configs.  One dataclass tree, consumed everywhere, CLI-overridable.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple


# 14-edge skeleton over the 15 retained OpenPose keypoints
# (ref: /root/reference/config.py:30-34 and losses/pose_loss.py:20-24).
SKELETON_CONNECTIONS: Tuple[Tuple[int, int], ...] = (
    (0, 1), (1, 8), (1, 2), (2, 3), (3, 4),
    (1, 5), (5, 6), (6, 7), (8, 9), (8, 12),
    (9, 10), (10, 11), (12, 13), (13, 14),
)

# Keypoint index -> name (ref: /root/reference/config.py:37-41).
KEYPOINT_NAMES = {
    0: "Neck", 1: "Chest", 2: "L_Shoulder", 3: "L_Elbow", 4: "L_Wrist",
    5: "R_Shoulder", 6: "R_Elbow", 7: "R_Wrist", 8: "Pelvis", 9: "L_Hip",
    10: "L_Knee", 11: "L_Ankle", 12: "R_Hip", 13: "R_Knee", 14: "R_Ankle",
}

# MM-Fi 17-keypoint skeleton: spine/head, legs from bottom torso, arms
# from neck base (ref: /root/reference/cross_dataset_test/WiFlow/
# wiflow.py:544-551).
MMFI_SKELETON_CONNECTIONS: Tuple[Tuple[int, int], ...] = (
    (0, 7), (7, 8), (8, 9), (9, 10),
    (0, 1), (1, 2), (2, 3),
    (0, 4), (4, 5), (5, 6),
    (9, 14), (14, 15), (15, 16),
    (9, 11), (11, 12), (12, 13),
)


@dataclasses.dataclass(frozen=True)
class DataConfig:
    """Dataset / preprocessing contract (ref: /root/reference/dataset.py)."""

    data_dir: str = "preprocessed_csi_data"
    keypoint_scale: float = 1000.0          # ref: config.py:6
    window_size: int = 20                   # ref: config.py:7
    stride: int = 1
    num_keypoints: int = 15                 # ref: config.py:8
    num_subcarriers: int = 540              # ref: config.py:9
    enable_temporal_clean: bool = True      # zero-keypoint repair
    # file-level random split ratios (ref: dataset.py:269-276)
    train_ratio: float = 0.7
    val_ratio: float = 0.15
    split_seed: int = 42


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """WiFlow model hyperparameters (ref: /root/reference/models/pose_model.py:16-53)."""

    num_subcarriers: int = 540
    window_size: int = 20
    num_keypoints: int = 15
    keypoint_dims: int = 2
    tcn_channels: Sequence[int] = (540, 440, 340, 240)  # ref: pose_model.py:18
    tcn_kernel_size: int = 3
    tcn_groups: int = 20                    # ref: models/tcn.py:19
    conv_channels: Sequence[int] = (8, 16, 32, 64)      # ref: pose_model.py:30
    attention_groups: int = 8               # ref: pose_model.py:40
    dropout: float = 0.5                    # train.py:88 passes 0.5
    conv_dropout: float = 0.3               # convnet.py module default
    # ablation switches (ref README.md:240-248): TCN conv flavour and
    # the axial-attention stage
    tcn_conv: str = "grouped"               # 'grouped'|'plain'|'depthwise'
    # encoder ablation (README.md:246 'TCN + asym conv -> 2D res conv',
    # code-less upstream): 'wiflow' = TCN + asymmetric (1,3) blocks;
    # 'conv2d' = pointwise projection + plain symmetric 3x3 2-D residual
    # blocks with the same stride schedule
    encoder_kind: str = "wiflow"
    # MXU lowering of the grouped convs in the MODULE (train + module
    # eval).  Measured fwd+bwd at batch 256 on v5e: 'grouped' per-group
    # einsum 1.56 ms/step, 'block_diag_sg5' (dense within 5-group
    # super-blocks) 1.69, fully dense 'block_diag' 2.29 — the dense
    # form's 20x FLOP padding loses in the train path even though it
    # wins inside the BN-folded serving kernels (which keep their own
    # block-diagonal packing, ops/pallas/tcn_level.py).
    tcn_matmul: str = "grouped"
    # attention lowering in the flax module (train + module eval):
    # 'auto' = fused Pallas core on TPU, XLA decomposition elsewhere
    attention_module_impl: str = "auto"
    # TCN train-path lowering: 'auto' = stage-fused Pallas kernels on
    # TPU (ops/pallas/stage_fused.py), XLA elsewhere; 'fused' forces
    # them (interpret off-TPU, for tests); 'xla' disables.
    # Default 'xla' is the chip-MEASURED winner (v5e, batch 256,
    # measured/train_impls_r04.md): full train epoch 1.94 s XLA vs
    # 2.10 s tcn-fused vs 2.96 s both-fused — XLA's fusion pipeline
    # beat the hand-fused stages once the custom conv VJPs landed, so
    # the stage kernels stay an opt-in experiment path (compiled,
    # parity-tested, and timed on hardware — not dark code).
    tcn_train_impl: str = "xla"
    # conv-stack train-path lowering, same switch semantics as
    # tcn_train_impl: stage-fused Pallas kernels on the chunked
    # space-to-depth layout (banded-matmul convs, Dropout2d masks,
    # act_h=False residual join). Measured 2.80 s/epoch vs 1.94 s XLA
    # (same probe) — default 'xla'.
    conv_train_impl: str = "xla"
    # conv-stack lowering in the flax module: 'taps' = plain [B,H,W,C]
    # tap matmuls (default — measured 3.2 ms/step fwd+bwd at batch 256 on
    # v5e), 'chunked' = space-to-depth banded matmuls (ops/chunked.py;
    # numerically identical and fully tested, but the banded form's 8x
    # FLOP padding made it 4.3 ms/step — XLA handles the taps layout
    # better than its tile geometry suggests at this batch), 'auto' =
    # chunked when the width schedule tiles exactly, else taps
    conv_stack_impl: str = "taps"
    use_attention: bool = True
    # compute dtype for the forward pass; params stay fp32
    compute_dtype: str = "bfloat16"


@dataclasses.dataclass(frozen=True)
class LossConfig:
    """Pose loss (ref: /root/reference/losses/pose_loss.py:8-17, train.py:99-103)."""

    position_weight: float = 1.0
    bone_weight: float = 0.2
    loss_type: str = "smooth_l1"            # 'mse' | 'l1' | 'smooth_l1'
    position_beta: float = 0.1              # ref: pose_loss.py:59
    bone_beta: float = 0.05                 # ref: pose_loss.py:73


@dataclasses.dataclass(frozen=True)
class OptimConfig:
    """AdamW + plateau LR schedule (ref: /root/reference/train.py:105-121)."""

    lr: float = 1e-4
    weight_decay: float = 5e-5              # train.py:108 hardcodes 5e-5
    betas: Tuple[float, float] = (0.9, 0.999)
    # None (or <=0) disables clipping — HPE-Li main.py:67 never clips
    grad_clip_norm: Optional[float] = 1.0   # train.py:235
    # optimizer family: 'adamw' (trunk), 'adam' (WiSPPN/PerUnet),
    # 'sgd' (WPformer, momentum 0.9 — model.py:930-935; HPE-Li main.py:67
    # uses torch SGD defaults: momentum 0)
    kind: str = "adamw"
    momentum: float = 0.9
    # schedule: 'plateau' (trunk), 'linear_decay' (WPformer LambdaLR),
    # 'multistep' (WiSPPN)
    schedule: str = "plateau"
    decay_start: int = 20
    decay_end: int = 50
    milestones: Tuple[int, ...] = (20, 40)
    gamma: float = 0.1
    # ReduceLROnPlateau semantics, matched to torch defaults + train.py:112-121
    plateau_factor: float = 0.5
    plateau_patience: int = 3
    plateau_threshold: float = 1e-4         # threshold_mode='rel' (torch default)
    plateau_cooldown: int = 1
    min_lr_ratio: float = 1e-3              # min_lr = lr / 1000
    # Plateau patience expressed in optimizer STEPS.  The torch-faithful
    # BN eval-lag warmup is step-counted, not epoch-counted, so a fixed
    # 3-EPOCH patience mis-scales at demo size (a 46-step epoch cuts lr
    # to the floor before the running stats warm — the round-4 failure
    # hand-patched three separate times).  Per run the engine uses
    #   max(plateau_patience, ceil(plateau_patience_steps / steps_per_epoch))
    # Fixed point = the reference recipe: 252k train windows / batch 64
    # (ref config.py:18) = 3937 steps/epoch, x3 epochs -> at reference
    # scale the effective patience is exactly plateau_patience.
    # None or 0 disables scaling (raw epoch-counted patience).
    plateau_patience_steps: Optional[int] = 3 * 3937


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    batch_size: int = 64                    # ref: config.py:18
    grad_accum_steps: int = 1               # effective = batch * accum
    num_epochs: int = 50                    # ref: config.py:19
    patience: int = 5                       # early stop on val MPE, train.py:382
    # early-stop patience in optimizer STEPS — same mechanism and fixed
    # point as OptimConfig.plateau_patience_steps (5 x 3937 at reference
    # scale); per run: max(patience, ceil(patience_steps / steps_per_epoch)).
    # None or 0 disables scaling.
    patience_steps: Optional[int] = 5 * 3937
    use_augmentation: bool = False
    seed: int = 42                          # ref: run.py:55
    # val/test loaders use batch//2 and drop_last (ref: train.py:145,155-161,
    # 402-408) — mirrored because it affects reported metrics (SURVEY §8.8).
    drop_last_eval: bool = True
    # PRNG for the training key stream (dropout masks, shuffles,
    # augmentation): 'rbg' uses the TPU hardware generator — threefry
    # dropout masks alone measured 1.7 ms of the 10.6 ms step at batch
    # 256.  Same-seed runs are deterministic per impl; distributions are
    # identical.  CAVEAT: rbg's bit stream is NOT guaranteed stable
    # across JAX versions or backends (and fold_in under rbg has weaker
    # statistical guarantees than threefry) — same-seed reproducibility
    # holds within one environment only.  Set 'threefry2x32' for
    # cross-version/cross-backend reproducible streams (and to reproduce
    # pre-round-3 streams).
    rng_impl: str = "rbg"
    optim: OptimConfig = dataclasses.field(default_factory=OptimConfig)
    loss: LossConfig = dataclasses.field(default_factory=LossConfig)
    # HBM storage dtype for the staged CSI (labels stay fp32); bf16 fits
    # the full 360k-window dataset on one chip (SURVEY §7)
    data_dtype: str = "float32"
    # run the epoch as one jitted lax.scan over batches (fast path) instead
    # of a per-batch python loop
    scan_epochs: bool = True
    # 0 = whole epoch in one lax.scan execution.  For giant models
    # (WiSPPN: 338 GFLOP/sample) a single multi-minute device execution
    # can trip backend/relay watchdogs ("TPU worker process crashed");
    # a bound splits the epoch into several scan calls of at most this
    # many steps (per-segment RNG streams, step-weighted metric means)
    max_steps_per_call: int = 0
    checkpoint_every_epoch: bool = True     # full-resume bundle


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Device-mesh layout for GSPMD data parallelism."""

    data_axis: str = "data"
    num_devices: Optional[int] = None       # None = all available


@dataclasses.dataclass(frozen=True)
class Config:
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)
    mesh: MeshConfig = dataclasses.field(default_factory=MeshConfig)
    output_dir: str = "outputs"
