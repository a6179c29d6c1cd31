"""Fused train-mode attention kernels (custom VJP) vs the XLA path:
values, gradients (incl. the BN-variance chain), and batch stats."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wiflow_tpu.models.wiflow import AxialAttention, DualAxialAttention


@pytest.mark.parametrize("width", [True, False])
def test_axis_fused_matches_xla(width):
    rng = np.random.default_rng(0 if width else 1)
    x = jnp.asarray(rng.standard_normal((3, 5, 6, 16)).astype(np.float32))
    ax_x = AxialAttention(16, 16, groups=4, width=width, train_impl="xla")
    ax_f = AxialAttention(16, 16, groups=4, width=width, train_impl="fused")
    v = ax_x.init({"params": jax.random.key(0)}, x, train=False)

    # eval values
    np.testing.assert_allclose(
        np.asarray(ax_f.apply(v, x, train=False)),
        np.asarray(ax_x.apply(v, x, train=False)), rtol=2e-5, atol=2e-5)

    def loss(params, mod):
        out, mut = mod.apply(
            {"params": params, "batch_stats": v["batch_stats"]}, x,
            train=True, mutable=["batch_stats"])
        return jnp.sum(out.astype(jnp.float32) ** 2), mut["batch_stats"]

    (l1, s1), g1 = jax.value_and_grad(loss, has_aux=True)(v["params"], ax_x)
    (l2, s2), g2 = jax.value_and_grad(loss, has_aux=True)(v["params"], ax_f)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    gd = jax.tree.map(lambda a, b: np.abs(np.asarray(a, np.float32)
                                          - np.asarray(b, np.float32)).max(),
                      g1, g2)
    assert max(jax.tree.leaves(gd)) < 2e-3, gd
    sd = jax.tree.map(lambda a, b: np.abs(np.asarray(a)
                                          - np.asarray(b)).max(), s1, s2)
    assert max(jax.tree.leaves(sd)) < 1e-5, sd


def test_dual_fused_matches_xla_train_forward():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 5, 4, 16)).astype(np.float32))
    d_x = DualAxialAttention(16, groups=4, train_impl="xla")
    d_f = DualAxialAttention(16, groups=4, train_impl="fused")
    v = d_x.init({"params": jax.random.key(0)}, x, train=False)
    o1, _ = d_x.apply(v, x, train=True, mutable=["batch_stats"])
    o2, _ = d_f.apply(v, x, train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2),
                               rtol=3e-5, atol=3e-5)


def test_logits_moments_identity():
    """Gram-identity moments == brute-force logits moments."""
    from wiflow_tpu.ops.pallas.axial_attention_train import logits_moments

    rng = np.random.default_rng(3)
    n, l, c, g = 7, 5, 12, 4
    q = jnp.asarray(rng.standard_normal((n, l, c)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((n, l, c)).astype(np.float32))
    mean, var = logits_moments(q, k, g)
    lg = np.einsum("bigc,bjgc->gijb", np.asarray(q).reshape(n, l, g, c // g),
                   np.asarray(k).reshape(n, l, g, c // g))
    np.testing.assert_allclose(np.asarray(mean), lg.mean(axis=(1, 2, 3)),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(var), lg.var(axis=(1, 2, 3)),
                               rtol=1e-4, atol=1e-5)
