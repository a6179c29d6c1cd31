"""Fused axial-attention core for the TRAINING path (custom VJP).

Round-1 measured the train step at 22.6 ms (batch 256, v5e) with 65% of
it in the XLA decomposition of the dual axial attention: the
[G, L, L, N]-shaped logits/softmax chain materializes ~150 MB per axis
and re-lays-out between ops (models/wiflow.py::AxialAttention; ref torch
semantics /root/reference/models/attention.py:37-80).

This module brings the serving kernel's structure (axial_attention.py v2:
scrambled (cc, g) channel layout, batch as the lane axis, everything for a
block in VMEM) to training:

  * the BatchNorm2d on logits reduces to a per-group SCALE before the
    softmax — the mean and bias terms are constant along the softmax axis
    and cancel pointwise (see models/wiflow.py::LogitsBNScale), and the
    batch variance it needs is computed exactly WITHOUT materializing
    logits via the Gram identity
        sum_ij l_ij^2 = sum_cd (q^T q)[c,d] (k^T k)[c,d]
    in plain differentiable XLA (moments helper below),
  * the core  softmax(scale_g * q k^T) v  runs as one Pallas kernel
    forward and one backward (custom_vjp), logits never touching HBM;
    the backward recomputes logits/softmax in VMEM (flash-style).

Layouts: q, k, v and the output are ``[L, C, N]`` with channels in the
scrambled (cc, g) order of ``axial_attention.scramble_perm`` so every
per-cc slice is one contiguous [G, Nb] tile.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def logits_moments(q: jax.Array, k: jax.Array, groups: int):
    """Exact per-group (mean, var) of the attention logits, no logits.

    Args: ``q``, ``k``: [N, L, C] standard (group-major) channel order.
    Returns (mean [G], var [G]) in f32, differentiable.
    """
    n, l, c = q.shape
    gc = c // groups
    qf = q.astype(jnp.float32).reshape(n, l, groups, gc)
    kf = k.astype(jnp.float32).reshape(n, l, groups, gc)
    cnt = n * l * l
    sq = jnp.sum(qf, axis=1)                       # [N, G, gc]
    sk = jnp.sum(kf, axis=1)
    mean = jnp.einsum("bgc,bgc->g", sq, sk,
                      preferred_element_type=jnp.float32) / cnt
    gq = jnp.einsum("bigc,bigd->bgcd", qf, qf,
                    preferred_element_type=jnp.float32)
    gk = jnp.einsum("bigc,bigd->bgcd", kf, kf,
                    preferred_element_type=jnp.float32)
    ex2 = jnp.einsum("bgcd,bgcd->g", gq, gk,
                     preferred_element_type=jnp.float32) / cnt
    return mean, ex2 - mean * mean


def _softmax_rows(lg_scaled):
    """Unrolled softmax over the leading (j) axis of [L, G, Nb]."""
    l = lg_scaled.shape[0]
    m = lg_scaled[0]
    for j in range(1, l):
        m = jnp.maximum(m, lg_scaled[j])
    e = jnp.exp(lg_scaled - m[None])
    den = e[0]
    for j in range(1, l):
        den = den + e[j]
    return e * (1.0 / den)[None]


def _logits_row(q_i, k, gc, g):
    """Raw logits for one query position: [L_j, G, Nb]."""
    lg = None
    for cc in range(gc):
        term = q_i[cc * g:(cc + 1) * g][None] * k[:, cc * g:(cc + 1) * g]
        lg = term if lg is None else lg + term
    return lg


def _core_fwd_kernel(qT_ref, kT_ref, vT_ref, scale_ref, out_ref,
                     *, groups: int):
    l, c, nb = qT_ref.shape
    g = groups
    gc = c // g
    q = qT_ref[...].astype(jnp.float32)
    k = kT_ref[...].astype(jnp.float32)
    v = vT_ref[...].astype(jnp.float32)
    scale = scale_ref[0, :].reshape(g, 1)

    rows = []
    for i in range(l):
        sim = _softmax_rows(_logits_row(q[i], k, gc, g) * scale[None])
        outs = []
        for cc in range(gc):
            vp = v[:, cc * g:(cc + 1) * g]
            acc = None
            for j in range(l):
                term = sim[j] * vp[j]
                acc = term if acc is None else acc + term
            outs.append(acc)
        rows.append(jnp.concatenate(outs, axis=0))
    out_ref[...] = jnp.stack(rows).astype(out_ref.dtype)


def _core_bwd_kernel(qT_ref, kT_ref, vT_ref, scale_ref, doutT_ref,
                     dq_ref, dk_ref, dv_ref, dscale_ref, *, groups: int):
    l, c, nb = qT_ref.shape
    g = groups
    gc = c // g
    q = qT_ref[...].astype(jnp.float32)
    k = kT_ref[...].astype(jnp.float32)
    v = vT_ref[...].astype(jnp.float32)
    dout = doutT_ref[...].astype(jnp.float32)
    scale = scale_ref[0, :].reshape(g, 1)

    i0 = pl.program_id(0)

    @pl.when(i0 == 0)
    def _():
        dscale_ref[...] = jnp.zeros_like(dscale_ref)

    lg_rows = []      # raw logits per i: [L_j, G, Nb]
    sim_rows = []
    dz_rows = []      # softmax-backward dz per i
    dscale_acc = jnp.zeros((g, nb), jnp.float32)
    dq_rows = []
    for i in range(l):
        lg = _logits_row(q[i], k, gc, g)
        sim = _softmax_rows(lg * scale[None])
        # dsim[j] = sum_cc dout_i(cc-plane) * v_j(cc-plane)
        dsim = None
        for cc in range(gc):
            term = dout[i, cc * g:(cc + 1) * g][None] \
                * v[:, cc * g:(cc + 1) * g]
            dsim = term if dsim is None else dsim + term
        t = sim[0] * dsim[0]
        for j in range(1, l):
            t = t + sim[j] * dsim[j]
        dz = sim * (dsim - t[None])                 # [L, G, Nb]
        for j in range(l):
            dscale_acc = dscale_acc + dz[j] * lg[j]
        dlg = dz * scale[None]
        # dq_i(cc,g) = sum_j dlg[j] * k_j(cc,g)
        outs = []
        for cc in range(gc):
            kp = k[:, cc * g:(cc + 1) * g]
            acc = None
            for j in range(l):
                term = dlg[j] * kp[j]
                acc = term if acc is None else acc + term
            outs.append(acc)
        dq_rows.append(jnp.concatenate(outs, axis=0))
        lg_rows.append(lg)
        sim_rows.append(sim)
        dz_rows.append(dlg)

    dq_ref[...] = jnp.stack(dq_rows).astype(dq_ref.dtype)

    # dk_j(cc,g) = sum_i dlg[i][j] * q_i(cc,g)
    # dv_j(cc,g) = sum_i sim[i][j] * dout_i(cc,g)
    dk_rows, dv_rows = [], []
    for j in range(l):
        k_outs, v_outs = [], []
        for cc in range(gc):
            acc_k = None
            acc_v = None
            for i in range(l):
                qp = q[i, cc * g:(cc + 1) * g]
                dp = dout[i, cc * g:(cc + 1) * g]
                tk = dz_rows[i][j] * qp
                tv = sim_rows[i][j] * dp
                acc_k = tk if acc_k is None else acc_k + tk
                acc_v = tv if acc_v is None else acc_v + tv
            k_outs.append(acc_k)
            v_outs.append(acc_v)
        dk_rows.append(jnp.concatenate(k_outs, axis=0))
        dv_rows.append(jnp.concatenate(v_outs, axis=0))
    dk_ref[...] = jnp.stack(dk_rows).astype(dk_ref.dtype)
    dv_ref[...] = jnp.stack(dv_rows).astype(dv_ref.dtype)

    # per-group dscale, accumulated across the (sequential) grid
    dscale_ref[0, :] = dscale_ref[0, :] + jnp.sum(dscale_acc, axis=-1)


def _pad_lanes(x, block):
    n = x.shape[-1]
    pad = (-n) % block
    if pad:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, pad)))
    return x, n + pad


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def axial_core(qT, kT, vT, scale, groups: int, block: int = 128,
               interpret: bool = False):
    """``softmax_j(scale_g * q_i . k_j) @ v`` on ``[L, C, N]`` inputs.

    Channels must be in scrambled (cc, g) order; returns the same layout.
    ``scale``: [G] f32.  Fully differentiable (custom VJP below).
    """
    out, _ = _axial_core_fwd(qT, kT, vT, scale, groups, block, interpret)
    return out


def _core_call(qT, kT, vT, scale, groups, block, interpret):
    l, c, n0 = qT.shape
    qp, ntot = _pad_lanes(qT, block)
    kp, _ = _pad_lanes(kT, block)
    vp, _ = _pad_lanes(vT, block)
    blk = lambda: pl.BlockSpec((l, c, block), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_core_fwd_kernel, groups=groups),
        grid=(ntot // block,),
        in_specs=[blk(), blk(), blk(),
                  pl.BlockSpec((1, groups), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=blk(),
        out_shape=jax.ShapeDtypeStruct((l, c, ntot), qT.dtype),
        interpret=interpret,
    )(qp, kp, vp, scale.reshape(1, groups).astype(jnp.float32))
    return out[:, :, :n0]


def _axial_core_fwd(qT, kT, vT, scale, groups, block, interpret):
    out = _core_call(qT, kT, vT, scale, groups, block, interpret)
    return out, (qT, kT, vT, scale)


def _axial_core_bwd(groups, block, interpret, res, dout):
    qT, kT, vT, scale = res
    l, c, n0 = qT.shape
    qp, ntot = _pad_lanes(qT, block)
    kp, _ = _pad_lanes(kT, block)
    vp, _ = _pad_lanes(vT, block)
    dp, _ = _pad_lanes(dout.astype(qT.dtype), block)
    blk = lambda: pl.BlockSpec((l, c, block), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM)
    dq, dk, dv, dscale = pl.pallas_call(
        functools.partial(_core_bwd_kernel, groups=groups),
        grid=(ntot // block,),
        in_specs=[blk(), blk(), blk(),
                  pl.BlockSpec((1, groups), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  blk()],
        out_specs=[blk(), blk(), blk(),
                   pl.BlockSpec((1, groups), lambda i: (0, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((l, c, ntot), qT.dtype),
                   jax.ShapeDtypeStruct((l, c, ntot), kT.dtype),
                   jax.ShapeDtypeStruct((l, c, ntot), vT.dtype),
                   jax.ShapeDtypeStruct((1, groups), jnp.float32)],
        interpret=interpret,
    )(qp, kp, vp, scale.reshape(1, groups).astype(jnp.float32), dp)
    return (dq[:, :, :n0], dk[:, :, :n0], dv[:, :, :n0],
            dscale.reshape(groups).astype(scale.dtype))


axial_core.defvjp(_axial_core_fwd, _axial_core_bwd)


# ---------------------------------------------------------------------------
# Pallas logits-moments: same (mean, var) as ``logits_moments`` but via the
# attention kernels' VMEM logits (custom VJP) — the XLA Gram-identity path
# costs ~1 ms/axis in backward at batch 256; these kernels cut it ~3x.
# Inputs are the kernel-layout [L, C, N] scrambled-channel tensors, so the
# module can share one layout with ``axial_core``.
# ---------------------------------------------------------------------------


def _moments_fwd_kernel(qT_ref, kT_ref, sums_ref, *, groups: int):
    l, c, nb = qT_ref.shape
    g = groups
    gc = c // g
    q = qT_ref[...].astype(jnp.float32)
    k = kT_ref[...].astype(jnp.float32)

    i0 = pl.program_id(0)

    @pl.when(i0 == 0)
    def _():
        sums_ref[...] = jnp.zeros_like(sums_ref)

    s1 = jnp.zeros((g, nb), jnp.float32)
    s2 = jnp.zeros((g, nb), jnp.float32)
    for i in range(l):
        lg = _logits_row(q[i], k, gc, g)       # [L_j, G, Nb]
        for j in range(l):
            s1 = s1 + lg[j]
            s2 = s2 + lg[j] * lg[j]
    sums_ref[0, :] = sums_ref[0, :] + jnp.sum(s1, axis=-1)
    sums_ref[1, :] = sums_ref[1, :] + jnp.sum(s2, axis=-1)


def _moments_bwd_kernel(qT_ref, kT_ref, dsums_ref, dq_ref, dk_ref,
                        *, groups: int):
    l, c, nb = qT_ref.shape
    g = groups
    gc = c // g
    q = qT_ref[...].astype(jnp.float32)
    k = kT_ref[...].astype(jnp.float32)
    d1 = dsums_ref[0, :].reshape(g, 1)
    d2 = dsums_ref[1, :].reshape(g, 1)

    dlg_rows = []
    dq_rows = []
    for i in range(l):
        lg = _logits_row(q[i], k, gc, g)
        dlg = d1[None] + 2.0 * lg * d2[None]    # [L_j, G, Nb]
        outs = []
        for cc in range(gc):
            kp = k[:, cc * g:(cc + 1) * g]
            acc = None
            for j in range(l):
                term = dlg[j] * kp[j]
                acc = term if acc is None else acc + term
            outs.append(acc)
        dq_rows.append(jnp.concatenate(outs, axis=0))
        dlg_rows.append(dlg)
    dq_ref[...] = jnp.stack(dq_rows).astype(dq_ref.dtype)

    dk_rows = []
    for j in range(l):
        outs = []
        for cc in range(gc):
            acc = None
            for i in range(l):
                term = dlg_rows[i][j] * q[i, cc * g:(cc + 1) * g]
                acc = term if acc is None else acc + term
            outs.append(acc)
        dk_rows.append(jnp.concatenate(outs, axis=0))
    dk_ref[...] = jnp.stack(dk_rows).astype(dk_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def logits_sums(qT, kT, groups: int, block: int = 128,
                interpret: bool = False):
    """(sum, sumsq) [2, G] of the raw logits over all (i, j, n)."""
    out, _ = _logits_sums_fwd(qT, kT, groups, block, interpret)
    return out


def _logits_sums_fwd(qT, kT, groups, block, interpret):
    l, c, n0 = qT.shape
    qp, ntot = _pad_lanes(qT, block)
    kp, _ = _pad_lanes(kT, block)
    blk = lambda: pl.BlockSpec((l, c, block), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM)
    sums = pl.pallas_call(
        functools.partial(_moments_fwd_kernel, groups=groups),
        grid=(ntot // block,),
        in_specs=[blk(), blk()],
        out_specs=pl.BlockSpec((2, groups), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, groups), jnp.float32),
        interpret=interpret,
    )(qp, kp)
    return sums, (qT, kT)


def _logits_sums_bwd(groups, block, interpret, res, dsums):
    qT, kT = res
    l, c, n0 = qT.shape
    qp, ntot = _pad_lanes(qT, block)
    kp, _ = _pad_lanes(kT, block)
    blk = lambda: pl.BlockSpec((l, c, block), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM)
    dq, dk = pl.pallas_call(
        functools.partial(_moments_bwd_kernel, groups=groups),
        grid=(ntot // block,),
        in_specs=[blk(), blk(),
                  pl.BlockSpec((2, groups), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[blk(), blk()],
        out_shape=[jax.ShapeDtypeStruct((l, c, ntot), qT.dtype),
                   jax.ShapeDtypeStruct((l, c, ntot), kT.dtype)],
        interpret=interpret,
    )(qp, kp, dsums.astype(jnp.float32))
    return dq[:, :, :n0], dk[:, :, :n0]


logits_sums.defvjp(_logits_sums_fwd, _logits_sums_bwd)


def logits_moments_fused(qT, kT, groups: int, count: int,
                         block: int = 128, interpret: bool = False):
    """(mean, var) from the Pallas sums; ``count`` = N * L * L."""
    sums = logits_sums(qT, kT, groups, block, interpret)
    mean = sums[0] / count
    var = sums[1] / count - mean * mean
    return mean, var
