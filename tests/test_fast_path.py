"""Fast inference path == flax module in eval mode (fp32, CPU interpret)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wiflow_tpu.core.config import ModelConfig
from wiflow_tpu.models.fast import fast_forward
from wiflow_tpu.models.wiflow import DualAxialAttention, WiFlowPoseModel
from wiflow_tpu.ops.pallas.axial_attention import dual_axial_attention_eval

CFG = ModelConfig(compute_dtype="float32")


def _nontrivial_stats(variables, scale=0.2):
    """Perturb running stats so BN folding is actually exercised."""
    def bump(path, a):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if name == "running_mean":
            return a + scale * jnp.sin(jnp.arange(a.size, dtype=a.dtype))
        if name == "running_var":
            return a * (1.0 + 0.5 * jnp.cos(jnp.arange(a.size, dtype=a.dtype)) ** 2)
        return a
    bs = jax.tree_util.tree_map_with_path(bump, variables["batch_stats"])
    return {"params": variables["params"], "batch_stats": bs}


def test_fused_attention_matches_module():
    att = DualAxialAttention(64, groups=8)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((4, 15, 20, 64)).astype(np.float32))
    v = _nontrivial_stats(att.init({"params": jax.random.key(0)}, x,
                                   train=False))
    ref = att.apply(v, x, train=False)
    out = dual_axial_attention_eval(x, v["params"], v["batch_stats"],
                                    groups=8, block=8, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fused_attention_v2_matches_module():
    """v2 kernel (in-kernel QKV, scrambled channels) == flax module."""
    from wiflow_tpu.ops.pallas.axial_attention import (
        dual_axial_attention_eval_v2, scramble_perm,
    )
    att = DualAxialAttention(64, groups=8)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((4, 15, 20, 64)).astype(np.float32))
    v = _nontrivial_stats(att.init({"params": jax.random.key(0)}, x,
                                   train=False))
    ref = att.apply(v, x, train=False)
    out = dual_axial_attention_eval_v2(x, v["params"], v["batch_stats"],
                                       groups=8, block=8, interpret=True)
    out = out[..., scramble_perm(64, 8)]          # back to standard order
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_fused_attention_dual_matches_v2():
    """Single-kernel dual attention == chained v2 kernels (interpret)."""
    from wiflow_tpu.ops.pallas.axial_attention import (
        dual_axial_attention_eval_fused, dual_axial_attention_eval_v2,
    )
    att = DualAxialAttention(64, groups=8)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((2, 15, 20, 64)).astype(np.float32))
    v = _nontrivial_stats(att.init({"params": jax.random.key(0)}, x,
                                   train=False))
    ref = dual_axial_attention_eval_v2(x, v["params"], v["batch_stats"],
                                       groups=8, block=4, interpret=True)
    out = dual_axial_attention_eval_fused(x, v["params"], v["batch_stats"],
                                          groups=8, block=4, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.slow
def test_fast_forward_matches_module():
    # batch 2: interpret-mode kernel time scales with rows on 1 CPU core
    model = WiFlowPoseModel(CFG)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 540, 20)).astype(np.float32))
    v = _nontrivial_stats(jax.jit(functools.partial(model.init, train=False))(
        {"params": jax.random.key(0)}, x[:1]))
    ref = model.apply(v, x, train=False)
    out = fast_forward(v, x, CFG, attention_block=8, interpret=True)
    assert out.shape == (2, 15, 2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_fused_tcn_matches_reference():
    """Pallas TCN-level kernels == folded XLA block-diag path (interpret)."""
    from wiflow_tpu.models import fast as F
    from wiflow_tpu.ops.pallas.tcn_level import fused_tcn_eval, pack_tcn_levels

    model = WiFlowPoseModel(CFG)
    rng = np.random.default_rng(4)
    v = _nontrivial_stats(jax.jit(functools.partial(model.init, train=False))(
        {"params": jax.random.key(0)}, jnp.zeros((1, 540, 20))))
    p, s = v["params"], v["batch_stats"]
    xt = jnp.asarray(rng.standard_normal((6, 20, 540)).astype(np.float32))

    ref = xt
    for i in range(4):
        ref = F._tcn_level(p["tcn"][f"network_{i}"], s["tcn"][f"network_{i}"],
                           ref, dilation=2 ** i, groups=20,
                           dtype=jnp.float32)

    packed = pack_tcn_levels(p["tcn"], s["tcn"], 4, F._aff)
    out = fused_tcn_eval(xt, packed, dilations=(1, 2, 4, 8), block=8,
                         interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_fast_forward_mmfi_matches_module():
    """MM-Fi serving path == WiFlowMMFiModel in eval mode (interpret)."""
    import dataclasses
    from wiflow_tpu.models.fast import fast_forward_mmfi
    from wiflow_tpu.models.wiflow_mmfi import MMFiModelConfig, WiFlowMMFiModel

    cfg = dataclasses.replace(MMFiModelConfig(), compute_dtype="float32")
    model = WiFlowMMFiModel(cfg)
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.standard_normal((2, 3, 114, 10)).astype(np.float32))
    v = _nontrivial_stats(jax.jit(functools.partial(model.init, train=False))(
        {"params": jax.random.key(0)}, x[:1]))
    ref = model.apply(v, x, train=False)
    out = fast_forward_mmfi(v, x, cfg, attention_block=8, interpret=True)
    assert out.shape == (2, 17, 3)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_fused_conv_stack_matches_reference():
    """Pallas conv-stack kernel == folded XLA conv blocks (interpret)."""
    from wiflow_tpu.models import fast as F
    from wiflow_tpu.ops.pallas.conv_stack import (
        fused_conv_stack_eval, pack_conv_stack,
    )

    model = WiFlowPoseModel(CFG)
    rng = np.random.default_rng(2)
    v = _nontrivial_stats(jax.jit(functools.partial(model.init, train=False))(
        {"params": jax.random.key(0)}, jnp.zeros((1, 540, 20))))
    p, s = v["params"], v["batch_stats"]
    xb = jnp.asarray(rng.standard_normal((16, 20, 240)).astype(np.float32))

    def ref_blocks(xb):
        y = xb[..., None]
        y = F._conv_block(p["up"], s["up"], y, stride_w=1, dtype=jnp.float32)
        for j in range(4):
            y = F._conv_block(p[f"residual_blocks_{j}"],
                              s[f"residual_blocks_{j}"], y, stride_w=2,
                              dtype=jnp.float32)
        return y
    ref = ref_blocks(xb)                                  # [B, 20, 15, 64]

    packed, widths, strides = pack_conv_stack(p, s, CFG.conv_channels, F._aff)
    out = fused_conv_stack_eval(xb.reshape(-1, 240), packed, widths=widths,
                                strides=strides, block=32, interpret=True)
    out = out.reshape(16, 20, 64, 15).transpose(0, 1, 3, 2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
