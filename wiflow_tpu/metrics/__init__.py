from wiflow_tpu.metrics.metrics import (
    calculate_mpjpe, calculate_pck, compute_pck_pckh, compute_pck_pckh_15,
    compute_pck_pckh_18, compute_pck_pckh_hpeli, mpjpe,
    pck_correct_fractions, pck_per_keypoint,
)
