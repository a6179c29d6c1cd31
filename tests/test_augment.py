"""On-device augmentation tests (semantics of ref utils/augmentation.py +
train.py:187-193 policy)."""

import jax
import jax.numpy as jnp
import numpy as np

from wiflow_tpu.data.augment import (
    add_noise, augment_batch, random_scaling, time_masking,
)


def test_time_masking_replaces_spans_with_per_channel_mean():
    """Torch-exact semantics (ref utils/augmentation.py:3-19): spans are
    on the TIME axis; masked steps take each channel's mean over time."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((32, 64, 20)).astype(np.float32))
    out = time_masking(x, jax.random.key(0), mask_ratio=1.0)
    changed = np.asarray(jnp.any(out != x, axis=(1, 2)))
    assert changed.all()      # mask_ratio=1 -> every sample masked
    diff_mask = np.asarray(jnp.any(out != x, axis=1))   # [B, T]
    mean = np.asarray(jnp.mean(x, axis=2))              # [B, C]
    out_np = np.asarray(out)
    b, t = np.nonzero(diff_mask)
    np.testing.assert_allclose(out_np[b[0], :, t[0]], mean[b[0]], rtol=1e-5)
    # 1-2 spans of 5-9 steps on the 20-step axis (overlaps allowed)
    per_sample = diff_mask.sum(axis=1)
    assert per_sample.max() <= 18 and per_sample.min() >= 5
    # start positions stay in [0, T - len): the last step can only be
    # masked by a span that fits, never by clamping artifacts
    starts_ok = diff_mask[:, 0].sum() + diff_mask[:, -1].sum()
    assert starts_ok >= 0  # smoke: both edges reachable but not forced


def test_time_masking_zero_ratio_is_identity():
    x = jnp.ones((4, 16, 20))
    out = time_masking(x, jax.random.key(1), mask_ratio=0.0)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))


def test_add_noise_scale():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((64, 32, 20)).astype(np.float32) * 2)
    out = add_noise(x, jax.random.key(0), noise_level=0.05)
    resid = np.asarray(out - x)
    assert 0.05 * 2 * 0.8 < resid.std() < 0.05 * 2 * 1.2


def test_random_scaling_bounds():
    x = jnp.ones((4, 8, 20))
    seen_identity = seen_scaled = False
    for i in range(20):
        out = np.asarray(random_scaling(x, jax.random.key(i)))
        if np.allclose(out, 1.0):
            seen_identity = True
        else:
            assert 0.9 <= out.mean() <= 1.1
            seen_scaled = True
    assert seen_identity and seen_scaled


def test_augment_batch_jits_and_preserves_shape():
    x = jnp.ones((8, 540, 20))
    out = jax.jit(augment_batch)(x, jax.random.key(0))
    assert out.shape == x.shape and bool(jnp.all(jnp.isfinite(out)))
