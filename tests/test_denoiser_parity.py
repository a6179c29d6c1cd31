"""Numerics parity for the denoiser-HPE family (VERDICT r2 missing #3):
same torch weights -> same eval outputs as the reference
HPE_{one..five}_denoiser.py modules and their *StageAE autoencoders."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from reference_loader import load_denoiser_modules, reference_available
from wiflow_tpu.models.torch_compat import from_torch_state_dict
from wiflow_tpu.robustness.denoiser import (
    STAGE_CHANNELS, AEStage, DenoiserHPE, ae_stage_specs, denoiser_hpe_spec,
)

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="reference not present")

TOL = dict(rtol=2e-4, atol=2e-4)


@pytest.fixture(scope="module")
def mods():
    return load_denoiser_modules()


def _ae_classes(mods):
    return (mods[0].OneStageAE, mods[1].TwoStageAE, mods[2].ThreeStageAE,
            mods[3].FourStageAE, mods[4].FiveStageAE)


def _hpe_classes(mods):
    return (mods[0].OneLayerDenoiserHPE, mods[1].TwoLayerDenoiserHPE,
            mods[2].ThreeLayerDenoiserHPE, mods[3].FourLayerDenoiserHPE,
            mods[4].FiveLayerDenoiserHPE)


def _build_torch_ae_chain(mods, n):
    classes = _ae_classes(mods)
    ae = classes[0]()
    for i in range(1, n):
        ae = classes[i](ae.getEncoder())
    return ae


# stage-input spatial sizes for [*, 114, 10] MM-Fi CSI: pools at stages
# 1-3 only (see denoiser.STAGE_CHANNELS)
STAGE_IN_HW = ((114, 10), (57, 5), (28, 2), (14, 1), (14, 1))


@pytest.mark.parametrize("stage", [0, 1, 4])
def test_ae_stage_forward_parity(mods, stage):
    """Standalone *StageAE forward (encoder + transposed-conv decoder +
    bilinear resize for stages >= 2) matches torch element-for-element."""
    torch.manual_seed(10 + stage)
    classes = _ae_classes(mods)
    tm = classes[stage](None) if stage else classes[stage]()
    tm.eval()
    cin, cout, pool = STAGE_CHANNELS[stage]
    h, w = STAGE_IN_HW[stage]
    x = np.random.default_rng(stage).standard_normal(
        (2, cin, h, w)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()

    model = AEStage(cin, cout, pool=pool, resize_decode=(stage > 0))
    variables = from_torch_state_dict(tm.state_dict(),
                                      spec=ae_stage_specs())
    got = model.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)),
                      train=False)
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), ref, **TOL)


@pytest.mark.parametrize("n", [1, 2, 3, 4, 5])
def test_denoiser_hpe_parity(mods, n, monkeypatch):
    """*LayerDenoiserHPE (nested getEncoder chain + SKUnits + regression)
    matches torch for every stage count.

    Reference latent bug: for n >= 3 the shipped models CRASH on MM-Fi
    [3, 114, 10] input — SKConv returns a transposed (non-contiguous)
    tensor, the next SKUnit's convs propagate a channels-last layout at
    the 14x1 spatial size, and the hardcoded ``.view`` at SKNet.py:82
    raises.  The intended math is the ``.reshape`` equivalent (exactly
    what every working call site computes on contiguous tensors), so the
    rebuild implements that; to RUN the torch side here we patch ``view``
    to fall back to ``reshape`` — a pure layout fix, not a math change.
    """
    orig_view = torch.Tensor.view

    def safe_view(self, *shape):
        try:
            return orig_view(self, *shape)
        except RuntimeError:
            return self.reshape(*shape)

    monkeypatch.setattr(torch.Tensor, "view", safe_view)
    torch.manual_seed(20 + n)
    ae = _build_torch_ae_chain(mods, n)
    tm = _hpe_classes(mods)[n - 1](ae.getEncoder())
    tm.eval()
    x = np.random.default_rng(n).standard_normal(
        (2, 3, 114, 10)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x))[0].numpy()   # (pred, fwd_time)

    model = DenoiserHPE(num_stages=n, compute_dtype="float32")
    variables = from_torch_state_dict(tm.state_dict(),
                                      spec=denoiser_hpe_spec(n))
    got = model.apply(variables, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(got), ref, **TOL)


def test_denoiser_hpe_train_mode_finite():
    model = DenoiserHPE(num_stages=2, compute_dtype="float32")
    x = jnp.asarray(np.random.default_rng(9).standard_normal(
        (4, 3, 114, 10)).astype(np.float32))
    v = model.init({"params": jax.random.key(0)}, x, train=False)
    out, mut = model.apply(
        v, x, train=True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.key(1)})
    assert np.isfinite(np.asarray(out)).all()
    # the encoder fine-tunes end-to-end: its BN batch stats update too
    rm0 = v["batch_stats"]["denoiser"]["stage_0"]["enc_bn"]["running_mean"]
    rm1 = mut["batch_stats"]["denoiser"]["stage_0"]["enc_bn"]["running_mean"]
    assert not np.allclose(np.asarray(rm0), np.asarray(rm1))
