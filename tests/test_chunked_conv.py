"""Chunked (space-to-depth) conv-stack lowering == taps lowering.

The train path runs the conv stack in the banded-matmul chunked layout
(ops/chunked.py, models/wiflow.py ConvBlock(plan=...)); these tests pin
it element-for-element against the plain taps path — same params, same
dropout bits, eval AND train mode (batch stats included)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wiflow_tpu.core.config import ModelConfig
from wiflow_tpu.models.wiflow import WiFlowPoseModel

CFG_KW = dict(compute_dtype="float32", dropout=0.0)


def _mk(impl, conv_dropout=0.0):
    return WiFlowPoseModel(ModelConfig(conv_stack_impl=impl,
                                       conv_dropout=conv_dropout, **CFG_KW))


@pytest.fixture(scope="module")
def x():
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.standard_normal((4, 540, 20)).astype(np.float32))


def test_plan_matches_default_geometry():
    plans = WiFlowPoseModel._chunk_plans(
        ModelConfig(conv_stack_impl="chunked"))
    assert plans is not None and plans[-1][1] == 1
    # widths 240 -> 120 -> 60 -> 30 -> 15
    assert [p[1] * p[4] for p in plans] == [240, 120, 60, 30, 15]


def test_auto_falls_back_on_untileable_widths():
    cfg = ModelConfig(num_subcarriers=40, tcn_channels=(40, 60),
                      tcn_groups=4, conv_channels=(4, 8))
    assert WiFlowPoseModel._chunk_plans(cfg) is None   # 15 not 8-tileable


def test_chunked_eval_matches_taps(x):
    taps, chunked = _mk("taps"), _mk("chunked")
    v = jax.jit(functools.partial(taps.init, train=False))(
        {"params": jax.random.key(0)}, x[:1])
    v2 = jax.jit(functools.partial(chunked.init, train=False))(
        {"params": jax.random.key(0)}, x[:1])
    # identical parameter trees from the same seed
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(v["params"]),
            jax.tree_util.tree_leaves_with_path(v2["params"])):
        assert str(pa) == str(pb)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    ya = taps.apply(v, x, train=False)
    yb = chunked.apply(v, x, train=False)
    np.testing.assert_allclose(np.asarray(yb), np.asarray(ya),
                               rtol=1e-5, atol=1e-5)


def test_chunked_train_matches_taps_with_dropout(x):
    """Train mode: batch stats AND Dropout2d mask bits must agree."""
    taps, chunked = _mk("taps", 0.3), _mk("chunked", 0.3)
    v = jax.jit(functools.partial(taps.init, train=False))(
        {"params": jax.random.key(0)}, x[:1])
    rngs = {"dropout": jax.random.key(7)}
    ya, ma = taps.apply(v, x, train=True, mutable=["batch_stats"],
                        rngs=rngs)
    yb, mb = chunked.apply(v, x, train=True, mutable=["batch_stats"],
                           rngs=rngs)
    np.testing.assert_allclose(np.asarray(yb), np.asarray(ya),
                               rtol=2e-5, atol=2e-5)
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(ma["batch_stats"]),
            jax.tree_util.tree_leaves_with_path(mb["batch_stats"])):
        assert str(pa) == str(pb)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5, err_msg=str(pa))


@pytest.mark.slow
def test_chunked_gradients_match_taps(x):
    taps, chunked = _mk("taps"), _mk("chunked")
    v = jax.jit(functools.partial(taps.init, train=False))(
        {"params": jax.random.key(0)}, x[:1])

    def loss(model, params):
        out, _ = model.apply(
            {"params": params, "batch_stats": v["batch_stats"]}, x,
            train=True, mutable=["batch_stats"])
        return jnp.sum(out ** 2)

    ga = jax.grad(functools.partial(loss, taps))(v["params"])
    gb = jax.grad(functools.partial(loss, chunked))(v["params"])
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(ga),
            jax.tree_util.tree_leaves_with_path(gb)):
        assert str(pa) == str(pb)
        # the two lowerings are EXACTLY equivalent (verified at f64:
        # max diff ~7e-15); at fp32 the batch-4 BN chains amplify
        # summation-order noise into ~0.3% on a few gradient elements
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-3, atol=2e-3, err_msg=str(pa))
