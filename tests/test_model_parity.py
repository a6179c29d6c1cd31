"""Numerics parity of the flax WiFlow model vs the reference torch model.

Same weights -> same outputs within fp32 tolerance, in eval mode and in
train mode (dropout disabled), including BatchNorm running-stat updates.
This is the strongest correctness anchor for the rebuild (SURVEY.md §4).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from tests.reference_loader import load_reference_model_modules, reference_available
from wiflow_tpu.core.config import ModelConfig
from wiflow_tpu.models.torch_compat import from_torch_state_dict, to_torch_state_dict
from wiflow_tpu.models.wiflow import WiFlowPoseModel

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted")

CFG = ModelConfig(compute_dtype="float32")


_CACHE = {}


def _build_pair(dropout=0.5, seed=0):
    key = (dropout, seed)
    if key not in _CACHE:
        torch.manual_seed(seed)
        *_, pose_model = load_reference_model_modules()
        tmodel = pose_model.WiFlowPoseModel(dropout=dropout)
        variables = from_torch_state_dict(tmodel.state_dict(), CFG)
        jmodel = WiFlowPoseModel(CFG)
        _CACHE[key] = (tmodel, jmodel, variables)
    return _CACHE[key]


def test_eval_forward_parity():
    tmodel, jmodel, variables = _build_pair()
    tmodel.eval()
    rng = np.random.default_rng(0)
    x = rng.standard_normal((4, 540, 20)).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x)).numpy()
    out = jmodel.apply(variables, jnp.asarray(x), train=False)
    assert out.shape == (4, 15, 2)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_train_forward_and_batchstats_parity():
    """Train mode with dropout off: outputs + BN running stats must match."""
    tmodel, jmodel, variables = _build_pair()
    for m in tmodel.modules():
        if isinstance(m, (torch.nn.Dropout, torch.nn.Dropout2d)):
            m.p = 0.0
    cfg = ModelConfig(compute_dtype="float32", dropout=0.0, conv_dropout=0.0)
    jmodel = WiFlowPoseModel(cfg)

    tmodel.train()
    rng = np.random.default_rng(1)
    x = rng.standard_normal((8, 540, 20)).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x)).numpy()

    out, mutated = jmodel.apply(
        variables, jnp.asarray(x), train=True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.key(0)})
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-3, atol=2e-3)

    # spot-check running stats across depths against the torch buffers
    tsd = tmodel.state_dict()
    bs = mutated["batch_stats"]
    checks = {
        "tcn.network.0.bn1_group.running_mean":
            bs["tcn"]["network_0"]["bn1_group"]["running_mean"],
        "tcn.network.3.bn2_pw.running_var":
            bs["tcn"]["network_3"]["bn2_pw"]["running_var"],
        "residual_blocks.3.block.1.running_mean":
            bs["residual_blocks_3"]["bn1"]["running_mean"],
        "attention.width_axis.bn_similarity.running_var":
            bs["attention"]["width_axis"]["bn_similarity"]["running_var"],
        "decoder.4.running_mean":
            bs["decoder_bn2"]["running_mean"],
    }
    for key, ours in checks.items():
        np.testing.assert_allclose(
            np.asarray(ours), tsd[key].numpy(), rtol=1e-3, atol=1e-4,
            err_msg=key)


def test_state_dict_roundtrip():
    tmodel, _, variables = _build_pair(seed=3)
    exported = to_torch_state_dict(variables, CFG)
    tsd = tmodel.state_dict()
    for key, val in exported.items():
        np.testing.assert_allclose(val, tsd[key].numpy(), rtol=0, atol=0,
                                   err_msg=key)


def test_init_shapes_match_torch():
    """Fresh flax init produces exactly the torch param tree (via export)."""
    tmodel, jmodel, _ = _build_pair()
    variables = jmodel.init(
        {"params": jax.random.key(0)},
        jnp.zeros((1, 540, 20), jnp.float32), train=False)
    exported = to_torch_state_dict(variables, CFG)
    tsd = tmodel.state_dict()
    torch_keys = {k for k in tsd if not k.endswith("num_batches_tracked")}
    assert set(exported) == torch_keys
    for key in exported:
        assert exported[key].shape == tuple(tsd[key].shape), key


def test_param_count_matches_reference():
    """2.23M params (ref README.md:118)."""
    _, jmodel, variables = _build_pair()
    n = sum(np.size(p) for p in jax.tree.leaves(variables["params"]))
    assert 2_200_000 < n < 2_260_000, n
