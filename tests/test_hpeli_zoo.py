"""Numerics-parity tests for the HPE-Li zoo part 2 (hpeli_zoo.py):
same torch weights -> same eval-mode outputs as the reference modules."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from reference_loader import load_hpeli_zoo_modules, reference_available
from wiflow_tpu.models.baselines import hpeli_zoo as zoo
from wiflow_tpu.models.torch_compat import from_torch_state_dict

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="reference not present")

TOL = dict(rtol=2e-4, atol=2e-4)


def _parity(torch_model, flax_model, spec, x_np):
    torch_model.eval()
    with torch.no_grad():
        ref = torch_model(torch.from_numpy(x_np))
    if isinstance(ref, tuple):
        ref = ref[0]
    variables = from_torch_state_dict(torch_model.state_dict(), spec=spec)
    got = flax_model.apply(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]},
        jnp.asarray(x_np), train=False)
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), **TOL)
    return variables


@pytest.fixture(scope="module")
def ref_mods():
    return load_hpeli_zoo_modules()


def test_original_hpe_parity(ref_mods):
    no_denoiser = ref_mods[0]
    torch.manual_seed(0)
    tm = no_denoiser.OriginalHPE()
    x = np.random.default_rng(0).standard_normal(
        (3, 3, 114, 10)).astype(np.float32)
    _parity(tm, zoo.OriginalHPE(), zoo.original_hpe_spec(), x)


def test_hpe_wipose_parity(ref_mods):
    wipose = ref_mods[1]
    torch.manual_seed(1)
    tm = wipose.HPEWiPoseModel()
    x = np.random.default_rng(1).standard_normal(
        (3, 9, 30, 5)).astype(np.float32)
    _parity(tm, zoo.HPEWiPoseModel(), zoo.hpe_wipose_spec(), x)


def test_basic_cnn_parity(ref_mods):
    basic = ref_mods[2]
    torch.manual_seed(2)
    tm = basic.BasicCnnHPE()
    x = np.random.default_rng(2).standard_normal(
        (3, 3, 114, 10)).astype(np.float32)
    _parity(tm, zoo.BasicCnnHPE(), zoo.basic_cnn_spec(), x)


def _strip_root(spec):
    """Spec builders take a torch prefix; for a bare module the torch keys
    have no prefix — drop the 'root.' marker."""
    return [(k.replace("root.", "", 1), coll, path, f, i)
            for (k, coll, path, f, i) in spec]


def test_sknet_v2_unit_parity(ref_mods):
    sknet_v2 = ref_mods[3]
    torch.manual_seed(3)
    tm = sknet_v2.SKUnit(48, 64, 64)      # M=2, G=32, r=16 defaults
    x = np.random.default_rng(3).standard_normal(
        (2, 48, 20, 10)).astype(np.float32)
    _parity(tm, zoo.SKUnitV2(64, 64),
            _strip_root(zoo.sk_unit_v2_spec("root", ())), x)


def test_dsknet_trans_mmfi_parity(ref_mods):
    trans_mmfi = ref_mods[4]
    torch.manual_seed(4)
    tm = trans_mmfi.DSKNetTransMMFI()
    x = np.random.default_rng(4).standard_normal(
        (2, 3, 114, 10)).astype(np.float32)
    _parity(tm, zoo.DSKNetTransMMFi(), zoo.dsknet_trans_mmfi_spec(), x)


def test_dsknet_trans_wipose_parity(ref_mods):
    trans_wipose = ref_mods[5]
    torch.manual_seed(5)
    tm = trans_wipose.DSKNetTransWipose()
    x = np.random.default_rng(5).standard_normal(
        (2, 9, 30, 5)).astype(np.float32)
    _parity(tm, zoo.DSKNetTransWipose(), zoo.dsknet_trans_wipose_spec(), x)


def test_zoo_models_train_mode_finite():
    """Train-mode apply with batch_stats mutation stays finite."""
    model = zoo.BasicCnnHPE()
    x = jnp.asarray(np.random.default_rng(7).standard_normal(
        (4, 3, 114, 10)).astype(np.float32))
    v = model.init({"params": jax.random.key(0), "dropout": jax.random.key(1)},
                   x, train=True)
    out, updated = model.apply(
        v, x, train=True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.key(2)})
    assert np.isfinite(np.asarray(out)).all()
    rm = updated["batch_stats"]["bn"]["running_mean"]
    assert not np.allclose(np.asarray(rm), 0.0)
