from wiflow_tpu.core.config import (
    Config, DataConfig, LossConfig, MeshConfig, ModelConfig, OptimConfig,
    TrainConfig, SKELETON_CONNECTIONS, KEYPOINT_NAMES,
    MMFI_SKELETON_CONNECTIONS,
)
