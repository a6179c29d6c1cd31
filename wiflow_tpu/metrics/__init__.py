from wiflow_tpu.metrics.metrics import (
    calculate_mpjpe, calculate_pck, mpjpe, pck_correct_fractions,
)
