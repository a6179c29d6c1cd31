"""On-device augmentation tests — golden against the ACTUAL reference
module (/root/reference/utils/augmentation.py) *as invoked by the trunk*
(train.py:188 permutes to [B, 20, 540] before masking, so the masked axis
on CSI windows is the SUBCARRIER axis)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from wiflow_tpu.data.augment import (
    add_noise, apply_mask_spans, augment_batch, random_scaling,
    subcarrier_masking, time_masking,
)

from reference_loader import load_reference_augmentation, reference_available

requires_reference = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not present")


class _FeedRandint:
    """Deterministic stand-in for torch.randint feeding a scripted queue,
    so the reference's per-sample RNG draws are fully controlled."""

    def __init__(self, values):
        self.values = list(values)

    def __call__(self, low, high, size):
        v = self.values.pop(0)
        assert low <= v < high, (low, v, high)
        return torch.tensor([v])


# Scripted spans: (num_masks, [(len, start), ...]).  Sample 2 has two
# DISJOINT spans — exercising the reference's sequential mean
# recomputation (utils/augmentation.py:16-18 recomputes masked_x.mean()
# after span 0 is already filled).
def _scripted_spans(t):
    return [
        (1, [(5, 0)]),
        (2, [(9, 3), (5, 3)]),          # overlapping
        (2, [(6, 0), (7, 15)]),         # disjoint -> differing fill values
        (1, [(8, t - 9)]),
        (2, [(5, 10), (9, 12)]),        # partial overlap
        (1, [(9, 4)]),
    ]


def _spans_to_arrays(spans):
    b = len(spans)
    num = np.array([n for n, _ in spans], np.int32)
    lens = np.full((b, 2), 5, np.int32)
    starts = np.zeros((b, 2), np.int32)
    queue = []
    for i, (n, pairs) in enumerate(spans):
        queue.append(n)
        for j, (ln, st) in enumerate(pairs):
            lens[i, j], starts[i, j] = ln, st
            queue.extend([ln, st])
    return num, lens, starts, queue


@requires_reference
def test_time_masking_golden_vs_torch(monkeypatch):
    """apply_mask_spans == reference time_masking given identical spans."""
    ref = load_reference_augmentation()
    rng = np.random.default_rng(0)
    spans = _scripted_spans(t=30)
    x = rng.standard_normal((len(spans), 7, 30)).astype(np.float32)
    num, lens, starts, queue = _spans_to_arrays(spans)

    monkeypatch.setattr(torch, "randint", _FeedRandint(queue))
    ref_out = ref.time_masking(torch.from_numpy(x), mask_ratio=1.0).numpy()

    jax_out = np.asarray(apply_mask_spans(
        jnp.asarray(x), jnp.ones(len(spans), bool), jnp.asarray(num),
        jnp.asarray(lens), jnp.asarray(starts)))
    np.testing.assert_allclose(jax_out, ref_out, atol=1e-5)
    # the disjoint-span sample really does get two distinct fill values
    # (second span filled with the mean of the span-0-masked tensor)
    s2 = jax_out[2]
    fills0 = s2[:, 0:6]     # span 0: channels x 6 masked steps
    fills1 = s2[:, 15:22]   # span 1
    assert not np.allclose(fills0[:, 0], fills1[:, 0])
    np.testing.assert_allclose(fills0[:, 0], x[2].mean(axis=1), atol=1e-5)


@requires_reference
def test_subcarrier_masking_call_site_golden(monkeypatch):
    """The trunk composite (ref train.py:188):
    ``time_masking(batch_x.permute(0, 2, 1), ...).permute(0, 2, 1)`` on
    [B, 540, 20] CSI — masked axis = subcarriers, fill = per-time-step
    mean.  Golden vs the imported reference functions as called."""
    ref = load_reference_augmentation()
    rng = np.random.default_rng(1)
    s, t = 540, 20
    spans = _scripted_spans(t=s)        # spans live on the subcarrier axis
    x = rng.standard_normal((len(spans), s, t)).astype(np.float32)
    num, lens, starts, queue = _spans_to_arrays(spans)

    monkeypatch.setattr(torch, "randint", _FeedRandint(queue))
    ref_out = ref.time_masking(
        torch.from_numpy(x).permute(0, 2, 1), mask_ratio=1.0
    ).permute(0, 2, 1).numpy()

    jax_out = np.asarray(jnp.swapaxes(apply_mask_spans(
        jnp.swapaxes(jnp.asarray(x), 1, 2), jnp.ones(len(spans), bool),
        jnp.asarray(num), jnp.asarray(lens), jnp.asarray(starts)), 1, 2))
    np.testing.assert_allclose(jax_out, ref_out, atol=1e-5)

    # structural: whole subcarrier rows change, never isolated time cells
    changed = jax_out != x                              # [B, S, T]
    rows = changed.any(axis=2)
    assert (changed.all(axis=2) == rows).all()
    # 1-2 spans of 5-9 of 540 subcarriers (~1.5% of the axis, NOT 25-45%
    # of the 20-step time axis — the round-2 regression)
    frac = rows.sum(axis=1) / s
    assert frac.max() <= 18 / s + 1e-9 and frac.min() >= 5 / s - 1e-9


@requires_reference
def test_subcarrier_masking_distribution_matches_torch():
    """Free-running RNG: masked-subcarrier-count distribution of
    subcarrier_masking matches the reference composite over many draws."""
    ref = load_reference_augmentation()
    rng = np.random.default_rng(2)
    x = rng.standard_normal((16, 540, 20)).astype(np.float32)

    torch.manual_seed(0)
    ref_counts = []
    for _ in range(8):
        out = ref.time_masking(torch.from_numpy(x).permute(0, 2, 1),
                               mask_ratio=1.0).permute(0, 2, 1).numpy()
        ref_counts.append(((out != x).any(axis=2)).sum(axis=1))
    jax_counts = []
    for i in range(8):
        out = np.asarray(subcarrier_masking(jnp.asarray(x),
                                            jax.random.key(i),
                                            mask_ratio=1.0))
        jax_counts.append(((out != x).any(axis=2)).sum(axis=1))
    ref_mean = np.concatenate(ref_counts).mean()
    jax_mean = np.concatenate(jax_counts).mean()
    # E[masked] ~ 10.5 of 540; generous tolerance for 128 draws/side
    assert abs(ref_mean - jax_mean) < 1.5, (ref_mean, jax_mean)
    assert np.concatenate(jax_counts).max() <= 18
    assert np.concatenate(jax_counts).min() >= 5


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


def test_augment_batch_jits_and_masks_subcarrier_axis():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((8, 540, 20)).astype(np.float32))
    out = jax.jit(augment_batch)(x, jax.random.key(0))
    assert out.shape == x.shape and bool(jnp.all(jnp.isfinite(out)))
