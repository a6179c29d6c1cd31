"""Noise-robustness evaluation driver.

Rebuild of the experiment harness in ref /root/reference/
cross_dataset_test/HPE-Li/main.py:52-105: sweep noise levels, optionally
pass the corrupted CSI through a denoiser (mode 1: stacked AE encoder) or
a traditional filter (mode 2: gaussian/mean), evaluate PCK/MPJPE/PA-MPJPE
of a trained pose model on the cleaned input.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from wiflow_tpu.metrics.metrics import pck_correct_fractions, mpjpe
from wiflow_tpu.metrics.mmfi_metrics import pa_mpjpe
from wiflow_tpu.robustness.filters import gaussian_filter, mean_filter
from wiflow_tpu.robustness.noise import add_awgn, add_salt_and_pepper_noise

FILTERS = {"gaussian": gaussian_filter, "mean": mean_filter,
           "none": lambda x: x}
NOISES = {"awgn": add_awgn, "salt_pepper": add_salt_and_pepper_noise}


def evaluate_robustness(
    predict_fn: Callable[[jax.Array], jax.Array],
    csi: np.ndarray,
    keypoints: np.ndarray,
    noise_levels: Sequence[float] = (0.0, 0.1, 0.2, 0.4),
    noise_kind: str = "awgn",
    cleaner: str = "none",
    denoise_fn: Optional[Callable] = None,
    pck_fn=None,
    batch_size: int = 256,
    seed: int = 0,
) -> Dict[float, Dict[str, float]]:
    """Returns {noise_level: {'pck@t': ..., 'mpjpe': ..., 'pa_mpjpe': ...}}.

    ``predict_fn`` maps a CSI batch to keypoints; ``denoise_fn`` (mode 1)
    maps corrupted CSI to cleaned CSI; ``cleaner`` picks a traditional
    filter (mode 2) applied to [B, C, S, T]-shaped input.
    """
    pck_fn = pck_fn or pck_correct_fractions
    noise = NOISES[noise_kind]
    filt = FILTERS[cleaner]
    rng = np.random.default_rng(seed)
    results: Dict[float, Dict[str, float]] = {}

    for level in noise_levels:
        preds = []
        for i in range(0, len(csi) - batch_size + 1, batch_size):
            xb = csi[i:i + batch_size]
            if level > 0:
                xb = noise(xb, level, rng)
            if cleaner != "none":
                shaped = xb if xb.ndim == 4 else xb[:, None]
                xb = np.asarray(filt(shaped), xb.dtype).reshape(xb.shape)
            xj = jnp.asarray(xb, jnp.float32)
            if denoise_fn is not None:
                xj = denoise_fn(xj)
            preds.append(np.asarray(predict_fn(xj)))
        pred = np.concatenate(preds)
        target = keypoints[: len(pred)]
        fr = np.asarray(pck_fn(jnp.asarray(pred), jnp.asarray(target),
                               (0.1, 0.2, 0.3, 0.4, 0.5)))
        row = {f"pck@{t}": float(v)
               for t, v in zip((0.1, 0.2, 0.3, 0.4, 0.5), fr)}
        row["mpjpe"] = float(mpjpe(jnp.asarray(pred), jnp.asarray(target)))
        if pred.shape[-1] >= 2:
            row["pa_mpjpe"] = float(pa_mpjpe(jnp.asarray(pred),
                                             jnp.asarray(target)))
        results[level] = row
    return results
