from wiflow_tpu.robustness.denoiser import (
    AEStage, DenoiserHPE, StackedDenoisingAE, frozen_denoiser_labels,
    train_denoiser_stage,
)
from wiflow_tpu.robustness.evaluate import evaluate_robustness
from wiflow_tpu.robustness.filters import gaussian_filter, mean_filter
from wiflow_tpu.robustness.noise import (
    add_awgn, add_awgn_jax, add_salt_and_pepper_jax,
    add_salt_and_pepper_noise,
)
