"""Unit tests for the tap-matmul conv primitives against torch ground truth."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn

from wiflow_tpu.ops.conv import (
    causal_grouped_conv1d, conv1x1_2d, conv1xk_w, conv3x3_2d, pointwise_conv1d,
)
from wiflow_tpu.ops.norm import batch_norm_eval, batch_norm_train

RTOL = 1e-5
ATOL = 1e-5


@pytest.mark.parametrize("cin,cout,dilation,groups", [
    (540, 540, 1, 20), (440, 440, 2, 20), (40, 40, 4, 4),
])
def test_causal_grouped_conv1d_matches_torch(cin, cout, dilation, groups):
    """Grouped conv + chomp (ref tcn.py:20-23,6-12) == left-pad tap matmuls."""
    rng = np.random.default_rng(0)
    b, t, k = 3, 20, 3
    x = rng.standard_normal((b, cin, t)).astype(np.float32)

    conv = nn.Conv1d(cin, cout, k, padding=(k - 1) * dilation,
                     dilation=dilation, groups=groups, bias=False)
    with torch.no_grad():
        ref = conv(torch.from_numpy(x))[:, :, :-(k - 1) * dilation].numpy()

    w = conv.weight.detach().numpy()  # (Co, Ci/g, K)
    co_g = cout // groups
    w_ours = w.reshape(groups, co_g, cin // groups, k).transpose(3, 0, 2, 1)

    x_ours = x.transpose(0, 2, 1).reshape(b, t, groups, cin // groups)
    out = causal_grouped_conv1d(jnp.asarray(x_ours), jnp.asarray(w_ours),
                                dilation=dilation)
    out = np.asarray(out).reshape(b, t, cout).transpose(0, 2, 1)
    np.testing.assert_allclose(out, ref, rtol=RTOL, atol=ATOL)


@pytest.mark.parametrize("channels,dilation", [(540, 1), (40, 4)])
def test_causal_depthwise_conv1d_fwd_and_grad_match_torch(channels, dilation):
    """groups == channels (the tcn_conv='depthwise' ablation, ref
    README.md:247) — fwd AND grads vs torch.  Round-3's depthwise
    ablation collapse motivated this: the primitive is verified correct
    at ci=co=1, so the collapse is an optimization property of the
    synthetic-data recipe, not a lowering bug."""
    rng = np.random.default_rng(7)
    b, t, k, c = 2, 20, 3, channels
    x = rng.standard_normal((b, c, t)).astype(np.float32)
    conv = nn.Conv1d(c, c, k, padding=(k - 1) * dilation,
                     dilation=dilation, groups=c, bias=False)
    xt = torch.from_numpy(x).requires_grad_(True)
    out_t = conv(xt)[:, :, :-(k - 1) * dilation]
    loss_t = out_t.square().sum()
    loss_t.backward()
    ref = out_t.detach().numpy()
    gx_ref = xt.grad.numpy()
    gw_ref = conv.weight.grad.numpy()          # [C, 1, K]

    w_ours = jnp.asarray(
        conv.weight.detach().numpy()[:, 0, :].T[:, :, None, None])  # [K,C,1,1]
    x_ours = jnp.asarray(x.transpose(0, 2, 1).reshape(b, t, c, 1))

    def f(xx, ww):
        return causal_grouped_conv1d(xx, ww, dilation=dilation)

    out = f(x_ours, w_ours)
    np.testing.assert_allclose(
        np.asarray(out).reshape(b, t, c).transpose(0, 2, 1), ref,
        rtol=RTOL, atol=ATOL)
    gx, gw = jax.grad(lambda xx, ww: jnp.sum(jnp.square(f(xx, ww))),
                      argnums=(0, 1))(x_ours, w_ours)
    np.testing.assert_allclose(
        np.asarray(gx).reshape(b, t, c).transpose(0, 2, 1), gx_ref,
        rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(gw)[:, :, 0, 0].T[:, None, :], gw_ref,
        rtol=1e-4, atol=1e-4)


def test_pointwise_conv1d_matches_torch():
    rng = np.random.default_rng(1)
    b, t, ci, co = 4, 20, 540, 440
    x = rng.standard_normal((b, ci, t)).astype(np.float32)
    conv = nn.Conv1d(ci, co, 1, bias=False)
    with torch.no_grad():
        ref = conv(torch.from_numpy(x)).numpy()
    w = conv.weight.detach().numpy()[:, :, 0].T
    out = pointwise_conv1d(jnp.asarray(x.transpose(0, 2, 1)), jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(out).transpose(0, 2, 1), ref,
                               rtol=RTOL, atol=ATOL)


@pytest.mark.parametrize("stride,w_in,ci,co", [
    (1, 240, 8, 16), (2, 240, 8, 16), (2, 30, 8, 16),
    (1, 240, 1, 8),   # the `up` block: VPU outer-product lowering
    (1, 240, 8, 1),   # mul-reduce lowering (bwd of the above)
])
def test_conv1xk_matches_torch(stride, w_in, ci, co):
    """(1,3) conv with stride (1,s) pad (0,1) (ref convnet.py:11-17)."""
    rng = np.random.default_rng(2)
    b, h = 2, 20
    x = rng.standard_normal((b, ci, h, w_in)).astype(np.float32)
    conv = nn.Conv2d(ci, co, kernel_size=(1, 3), stride=(1, stride),
                     padding=(0, 1))
    with torch.no_grad():
        ref = conv(torch.from_numpy(x)).numpy()
    w = conv.weight.detach().numpy()[:, :, 0, :].transpose(2, 1, 0)
    bias = conv.bias.detach().numpy()
    out = conv1xk_w(jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(w),
                    jnp.asarray(bias), stride=stride, padding=1)
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2), ref,
                               rtol=RTOL, atol=1e-4)


def test_conv1x1_2d_strided_matches_torch():
    rng = np.random.default_rng(3)
    b, h, w_in, ci, co = 2, 20, 240, 8, 16
    x = rng.standard_normal((b, ci, h, w_in)).astype(np.float32)
    conv = nn.Conv2d(ci, co, kernel_size=1, stride=(1, 2), bias=False)
    with torch.no_grad():
        ref = conv(torch.from_numpy(x)).numpy()
    w = conv.weight.detach().numpy()[:, :, 0, 0].T
    out = conv1x1_2d(jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(w),
                     stride_w=2)
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2), ref,
                               rtol=RTOL, atol=ATOL)


def test_conv3x3_matches_torch():
    rng = np.random.default_rng(4)
    b, h, w_in, ci, co = 2, 15, 20, 64, 32
    x = rng.standard_normal((b, ci, h, w_in)).astype(np.float32)
    conv = nn.Conv2d(ci, co, kernel_size=3, padding=1)
    with torch.no_grad():
        ref = conv(torch.from_numpy(x)).numpy()
    w = conv.weight.detach().numpy().transpose(2, 3, 1, 0)
    out = conv3x3_2d(jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(w),
                     jnp.asarray(conv.bias.detach().numpy()))
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2), ref,
                               rtol=RTOL, atol=1e-4)


def test_batch_norm_train_matches_torch():
    """Training BN: normalization + running-stat update (unbiased var)."""
    rng = np.random.default_rng(5)
    b, t, c = 16, 20, 32
    x = rng.standard_normal((b, c, t)).astype(np.float32) * 3 + 1
    bn = nn.BatchNorm1d(c)
    bn.train()
    with torch.no_grad():
        ref = bn(torch.from_numpy(x)).numpy()
    y, new_mean, new_var = batch_norm_train(
        jnp.asarray(x.transpose(0, 2, 1)),
        jnp.ones(c), jnp.zeros(c), jnp.zeros(c), jnp.ones(c))
    np.testing.assert_allclose(np.asarray(y).transpose(0, 2, 1), ref,
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(new_mean),
                               bn.running_mean.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(new_var),
                               bn.running_var.numpy(), rtol=1e-4, atol=1e-5)


def test_batch_norm_eval_matches_torch():
    rng = np.random.default_rng(6)
    b, t, c = 8, 20, 16
    x = rng.standard_normal((b, c, t)).astype(np.float32)
    bn = nn.BatchNorm1d(c)
    with torch.no_grad():
        bn.running_mean.copy_(torch.from_numpy(
            rng.standard_normal(c).astype(np.float32)))
        bn.running_var.copy_(torch.from_numpy(
            rng.uniform(0.5, 2.0, c).astype(np.float32)))
        bn.weight.copy_(torch.from_numpy(
            rng.standard_normal(c).astype(np.float32)))
        bn.bias.copy_(torch.from_numpy(
            rng.standard_normal(c).astype(np.float32)))
    bn.eval()
    with torch.no_grad():
        ref = bn(torch.from_numpy(x)).numpy()
    y = batch_norm_eval(
        jnp.asarray(x.transpose(0, 2, 1)),
        jnp.asarray(bn.running_mean.numpy()), jnp.asarray(bn.running_var.numpy()),
        jnp.asarray(bn.weight.detach().numpy()),
        jnp.asarray(bn.bias.detach().numpy()))
    np.testing.assert_allclose(np.asarray(y).transpose(0, 2, 1), ref,
                               rtol=1e-5, atol=1e-5)


def test_super_block_diagonal_grouped_conv_equivalence():
    """block_diag_sg<m> == grouped == block_diag for the TCN conv."""
    from wiflow_tpu.ops.conv import causal_grouped_conv1d

    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal((2, 20, 20, 27)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 20, 27, 27)).astype(np.float32))
    ref = causal_grouped_conv1d(x, w, dilation=4, impl="grouped")
    for impl in ("block_diag", "block_diag_sg5", "block_diag_sg4",
                 "block_diag_sg3"):   # sg3 doesn't divide 20 -> falls back
        got = causal_grouped_conv1d(x, w, dilation=4, impl=impl)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5, err_msg=impl)


def test_expand_banded_matches_gather_expansion():
    """The gather-free banded-weight expansion (ops/chunked.py) equals
    the serving kernels' conv_stack._expand for every geometry the plan
    uses."""
    from wiflow_tpu.ops.chunked import _expand, expand_banded

    rng = np.random.default_rng(12)
    cases = [(3, 1, 8, 8, 1, 8), (3, 2, 8, 8, 8, 8), (3, 2, 8, 4, 8, 16),
             (3, 1, 4, 4, 16, 32), (3, 1, 2, 2, 32, 64),
             (1, 2, 8, 8, 8, 8), (1, 2, 8, 4, 8, 16), (1, 1, 8, 8, 1, 8)]
    for (k, stride, s_in, s_out, ci, co) in cases:
        shape = (3, ci, co) if k == 3 else (ci, co)
        w = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
        b = jnp.asarray(rng.standard_normal((co,)).astype(np.float32))
        w1, b1 = _expand(w, b, k, stride, s_in, s_out)
        w2, b2 = expand_banded(w, b, k, stride, s_in, s_out)
        np.testing.assert_array_equal(np.asarray(w1), np.asarray(w2))
        np.testing.assert_array_equal(np.asarray(b1), np.asarray(b2))


@pytest.mark.parametrize("stride,padding,k,bias,ci,co", [
    (1, 1, 3, True, 4, 6), (2, 1, 3, True, 4, 6), (2, 1, 3, False, 4, 6),
    (1, 0, 1, True, 4, 6), (2, 2, 5, True, 4, 6),  # uncommon -> fallback
    (1, 1, 3, True, 1, 8), (2, 1, 3, True, 1, 8),  # ci=1 VPU lowering
    (1, 1, 3, True, 8, 1), (2, 1, 3, True, 8, 1),  # co=1 VPU lowering
])
def test_conv1xk_custom_vjp_matches_autodiff(stride, padding, k, bias, ci, co):
    """The pad-free custom VJP of conv1xk_w == XLA autodiff of the same
    forward (the interleave/flip constructions are exact transposes)."""
    from wiflow_tpu.ops.conv import _conv1xk_taps_impl

    rng = np.random.default_rng(7)
    b_, h, wlen = 2, 5, 20
    x = jnp.asarray(rng.standard_normal((b_, h, wlen, ci)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((k, ci, co)).astype(np.float32))
    b = (jnp.asarray(rng.standard_normal((co,)).astype(np.float32))
         if bias else None)
    g_out = jnp.asarray(rng.standard_normal(
        ((wlen + 2 * padding - k) // stride + 1,)).astype(np.float32))

    def loss_custom(*args):
        y = conv1xk_w(*args, stride=stride, padding=padding,
                      impl="taps_vjp")
        return jnp.sum(y * g_out[None, None, :, None])

    def loss_plain(*args):
        y = _conv1xk_taps_impl(*args, stride, padding)
        return jnp.sum(y * g_out[None, None, :, None])

    args = (x, w, b) if bias else (x, w, None)
    argnums = (0, 1, 2) if bias else (0, 1)
    gc = jax.grad(loss_custom, argnums)(*args)
    gp = jax.grad(loss_plain, argnums)(*args)
    for a, e in zip(gc, gp):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                   rtol=1e-4, atol=1e-4)


def test_conv1x1_s2_custom_vjp_matches_autodiff():
    """Strided-1x1 interleave-with-zeros input grad == autodiff."""
    from wiflow_tpu.ops.conv import _conv1x1_s2, _conv1x1_s2_impl

    rng = np.random.default_rng(8)
    for wlen in (20, 21):  # even and odd lengths hit both slice tails
        x = jnp.asarray(rng.standard_normal((2, 5, wlen, 4)).astype(np.float32))
        w = jnp.asarray(rng.standard_normal((4, 6)).astype(np.float32))

        def loss_custom(x, w):
            return jnp.sum(jnp.sin(_conv1x1_s2(x, w)))

        def loss_plain(x, w):
            return jnp.sum(jnp.sin(_conv1x1_s2_impl(x, w)))

        gc = jax.grad(loss_custom, (0, 1))(x, w)
        gp = jax.grad(loss_plain, (0, 1))(x, w)
        for a, e in zip(gc, gp):
            np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                       rtol=1e-4, atol=1e-4)
