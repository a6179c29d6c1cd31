"""Generic fused train-path stage kernel: prologue -> conv -> BN partials.

The round-3 op trace (measured/trace_train_r03_summary.md) shows the
train step is occupancy-bound, not bandwidth-bound: ~360 XLA fusions per
step at ~4.8 us fixed cost each, dots at 21% MXU utilisation, HBM at 6%.
Train-mode BatchNorm forces a serial structure (every stage's stats are a
full-batch reduction of the previous conv's output), so the fix is not a
monolithic megakernel but a *stage* granularity: one Pallas call per
``BN-apply -> SiLU -> dropout -> conv`` unit that

  * normalizes as ``(x - m) * a + b`` with per-channel vectors computed
    OUTSIDE from the previous stage's emitted partial sums — the exact
    op sequence of ops/norm.batch_norm_train, so the fused path matches
    the XLA module path bit for bit in bf16 (tiny [C]-sized stat math
    stays differentiable plain XLA),
  * applies the dropout keep-mask (drawn outside; bool, same marginal
    law as ops/norm.dropout), and
  * runs the conv as ONE dense dot against a packed weight matrix,
    emitting the next BN's partial sums/sumsqs in the same pass.

Layout follows ops/pallas/tcn_level.py: activations are ``[C, T*Nb]``
blocks — channels on sublanes, (time, batch) on lanes — so a causal
dilated tap (ref /root/reference/models/tcn.py:6-12,20-23) is a lane
slice of a zero-front-padded copy, and grouped convs are block-diagonal
dense taps packed into a single ``[3*Ci, Co]`` matrix.

Each stage carries a custom VJP (jax.custom_vjp): the backward kernel
recomputes the prologue from the saved input (flash-style), consumes the
output cotangent together with the partial-sum cotangents (the BN stats
path), and emits input/mean/scale/shift/weight/bias grads — weight
grads accumulated across the sequential TPU grid in the output ref.

Numerics match the XLA module path op for op: bf16 activations, f32 dot
accumulation, conv outputs rounded to bf16 BEFORE the stats reduction
(ops/norm.batch_norm_train reduces the bf16 tensor upcast to f32).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# ---------------------------------------------------------------------------
# segment geometry: how the packed weight's row blocks read the input
# ---------------------------------------------------------------------------


def _segments(x2d: jax.Array, seg: str, dil: int, t: int, nb: int):
    """Lane-sliced input views matching the packed weight's row blocks.

    ``'identity'``: one segment (pointwise / 1x1 conv; a strided 1x1
    with s_out = s_in/stride is also one segment — the stride lives in
    the banded weight, ops/chunked.expand_banded).
    ``'causal3'``: three dilated causal taps — tap j reads time
    ``tt - (2-j)*dil`` (zero before t=0), i.e. lane slices of a
    ``2*dil*nb``-front-padded copy (ref tcn.py:6-12 pad+chomp).
    ``'sym3'``: three symmetric (pad 1 chunk each side) taps over the
    chunk axis — the (1,3) conv of the conv stack in the space-to-depth
    layout with cs == 1 (ref convnet.py:11-17; ops/pallas/conv_stack.py
    _chunk_segs).
    ``'chunk3:<cs>'``: like sym3 but every cs-th chunk — the stride-2
    (1,3) conv where chunk pairs fold into the sublane axis.
    ``'chunk1:<cs>'``: k=1 downsample taking every cs-th chunk.
    """
    if seg == "identity":
        return [x2d]
    rows, l = x2d.shape
    n = l // nb
    if seg == "causal3":
        zeros = jnp.zeros((rows, 2 * dil * nb), x2d.dtype)
        xp = jnp.concatenate([zeros, x2d], axis=1)
        return [xp[:, j * dil * nb:(j * dil + t) * nb] for j in range(3)]
    if seg == "sym3":
        zeros = jnp.zeros((rows, nb), x2d.dtype)
        xp = jnp.concatenate([zeros, x2d, zeros], axis=1)
        return [xp[:, j * nb:(j + n) * nb] for j in range(3)]
    kind, cs = seg.split(":")
    cs = int(cs)
    n_out = n // cs
    if kind == "chunk3":
        zeros = jnp.zeros((rows, nb), x2d.dtype)
        xp = jnp.concatenate([zeros, x2d, zeros], axis=1)
        segs = []
        for j in range(3):
            s = xp[:, j * nb:(j + cs * n_out) * nb]
            s = s.reshape(rows, n_out, cs * nb)[:, :, :nb]
            segs.append(s.reshape(rows, n_out * nb))
        return segs
    assert kind == "chunk1", seg
    xr = x2d.reshape(rows, n_out, cs * nb)
    return [xr[:, :, j * nb:(j + 1) * nb].reshape(rows, n_out * nb)
            for j in range(cs)]


def _segments_t(gsegs, seg: str, dil: int, t: int, nb: int, l_in: int):
    """Transpose of :func:`_segments`: scatter per-tap grads back to x."""
    if seg == "identity":
        (g,) = gsegs
        return g
    rows = gsegs[0].shape[0]
    dt = gsegs[0].dtype
    if seg == "causal3":
        gx = gsegs[2]                                # tap 2 is aligned
        for j, sh in ((1, dil), (0, 2 * dil)):
            head = gsegs[j][:, sh * nb:]
            pad = jnp.zeros((rows, sh * nb), dt)
            gx = gx + jnp.concatenate([head, pad], axis=1)
        return gx
    if seg == "sym3":
        # x chunk c receives tap j's grad at seg position c + 1 - j
        pad = jnp.zeros((rows, nb), dt)
        gx = gsegs[1]
        gx = gx + jnp.concatenate([gsegs[0][:, nb:], pad], axis=1)
        gx = gx + jnp.concatenate([pad, gsegs[2][:, :-nb]], axis=1)
        return gx
    kind, cs = seg.split(":")
    cs = int(cs)
    n_in = l_in // nb
    n_out = n_in // cs
    if kind == "chunk3":
        # seg_j output chunk o sits at padded-x chunk j + cs*o
        gxp = jnp.zeros((rows, (n_in + 2) * nb), dt)
        for j in range(3):
            gi = gsegs[j].reshape(rows, n_out, 1, nb)
            gi = jnp.concatenate(
                [gi, jnp.zeros((rows, n_out, cs - 1, nb), dt)], axis=2)
            gi = gi.reshape(rows, cs * n_out * nb)
            left = jnp.zeros((rows, j * nb), dt)
            right = jnp.zeros((rows, (n_in + 2 - j - cs * n_out) * nb), dt)
            gxp = gxp + jnp.concatenate([left, gi, right], axis=1)
        return gxp[:, nb:(n_in + 1) * nb]
    assert kind == "chunk1", seg
    gi = jnp.stack([g.reshape(rows, n_out, nb) for g in gsegs], axis=2)
    return gi.reshape(rows, n_in * nb)


def _seg_info(seg: str):
    """(n_segments, lane-compression cs) for a segment kind."""
    if seg == "identity":
        return 1, 1
    if seg in ("causal3", "sym3"):
        return 3, 1
    kind, cs = seg.split(":")
    cs = int(cs)
    return (3, cs) if kind == "chunk3" else (cs, cs)


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------


def _fwd_kernel(*refs, seg: str, dil: int, t: int, nb: int, keep: float,
                has_prologue: bool, has_mask: bool, has_bias: bool,
                emit_stats: bool, dtype):
    it = iter(refs)
    x_ref = next(it)
    m_ref = next(it) if has_prologue else None
    s_ref = next(it) if has_prologue else None
    b2_ref = next(it) if has_prologue else None
    mask_ref = next(it) if has_mask else None
    w_ref = next(it)
    b_ref = next(it) if has_bias else None
    out_ref = next(it)
    ps_ref = next(it) if emit_stats else None
    pq_ref = next(it) if emit_stats else None

    x = x_ref[0].astype(dtype)
    a = x
    if has_prologue:
        u = (x - m_ref[...].astype(dtype)[:, :1]) \
            * s_ref[...].astype(dtype)[:, :1] \
            + b2_ref[...].astype(dtype)[:, :1]
        a = jax.nn.silu(u).astype(dtype)
    if mask_ref is not None:
        a = jnp.where(mask_ref[0], a / keep, jnp.zeros_like(a))
    segs = _segments(a, seg, dil, t, nb)
    xcat = segs[0] if len(segs) == 1 else jnp.concatenate(segs, axis=0)
    y = jax.lax.dot_general(
        w_ref[...].astype(dtype).T, xcat, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    if b_ref is not None:
        y = y + b_ref[...].astype(jnp.float32)[:, :1]
    o = y.astype(dtype)
    out_ref[0] = o
    if emit_stats:
        of = o.astype(jnp.float32)
        ps_ref[0, :, 0] = jnp.sum(of, axis=1)
        pq_ref[0, :, 0] = jnp.sum(of * of, axis=1)


def _bwd_kernel(*refs, seg: str, dil: int, t: int, nb: int, keep: float,
                has_prologue: bool, has_mask: bool, has_bias: bool,
                emit_stats: bool, dtype):
    it = iter(refs)
    x_ref = next(it)
    m_ref = next(it) if has_prologue else None
    s_ref = next(it) if has_prologue else None
    b2_ref = next(it) if has_prologue else None
    mask_ref = next(it) if has_mask else None
    w_ref = next(it)
    o_ref = next(it) if emit_stats else None
    go_ref = next(it)
    gps_ref = next(it) if emit_stats else None
    gpq_ref = next(it) if emit_stats else None
    gx_ref = next(it)
    gw_ref = next(it)
    ga_ref = next(it) if has_prologue else None   # sum(gu * x) per channel
    gt_ref = next(it) if has_prologue else None   # sum(gu) per channel
    gb_ref = next(it) if has_bias else None

    first = pl.program_id(0) == 0

    x = x_ref[0].astype(dtype)
    mask = mask_ref[0] if mask_ref is not None else None

    # recompute the prologue pieces we need (flash-style)
    if has_prologue:
        s_col = s_ref[...].astype(dtype)[:, :1]
        u = (x - m_ref[...].astype(dtype)[:, :1]) * s_col \
            + b2_ref[...].astype(dtype)[:, :1]
        sig = jax.nn.sigmoid(u.astype(jnp.float32))
        a = (u.astype(jnp.float32) * sig).astype(dtype)
    else:
        a = x
    ad = a if mask is None else jnp.where(mask, a / keep, jnp.zeros_like(a))
    segs = _segments(ad, seg, dil, t, nb)
    xcat = segs[0] if len(segs) == 1 else jnp.concatenate(segs, axis=0)

    # total conv-output cotangent: downstream grad + the stats terms
    go = go_ref[0].astype(jnp.float32)
    if emit_stats:
        o = o_ref[0].astype(jnp.float32)
        go = go + gps_ref[0].astype(jnp.float32) \
            + 2.0 * o * gpq_ref[0].astype(jnp.float32)
    gof = go.astype(dtype)

    # weight grad, accumulated across the sequential grid
    gw = jax.lax.dot_general(
        xcat, gof, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                 # [R, Co]
    if has_bias:
        gb = jnp.sum(go, axis=1, keepdims=True)             # [Co, 1]

    @pl.when(first)
    def _init():
        gw_ref[...] = gw
        if has_bias:
            gb_ref[...] = gb

    @pl.when(jnp.logical_not(first))
    def _acc():
        gw_ref[...] += gw
        if has_bias:
            gb_ref[...] += gb

    # input-side grad through the dot: g_xcat = W @ g_o
    gxcat = jax.lax.dot_general(
        w_ref[...].astype(dtype), gof, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                 # [R, L]
    nseg, _ = _seg_info(seg)
    if nseg == 1:
        gad = _segments_t([gxcat], seg, dil, t, nb, x.shape[1])
    else:
        r = gxcat.shape[0] // nseg
        gad = _segments_t([gxcat[j * r:(j + 1) * r] for j in range(nseg)],
                          seg, dil, t, nb, x.shape[1])

    if mask is not None:
        gad = jnp.where(mask, gad / keep, jnp.zeros_like(gad))
    if has_prologue:
        # d silu(u) = sig(u) * (1 + u*(1 - sig(u))), computed in f32
        dsilu = sig * (1.0 + u.astype(jnp.float32) * (1.0 - sig))
        gu = gad * dsilu
        gx_ref[0] = (gu * s_col.astype(jnp.float32)).astype(gx_ref.dtype)
        ga = jnp.sum(gu * x.astype(jnp.float32), axis=1, keepdims=True)
        gt = jnp.sum(gu, axis=1, keepdims=True)

        @pl.when(first)
        def _init_st():
            ga_ref[...] = ga
            gt_ref[...] = gt

        @pl.when(jnp.logical_not(first))
        def _acc_st():
            ga_ref[...] += ga
            gt_ref[...] += gt
    else:
        gx_ref[0] = gad.astype(gx_ref.dtype)


# ---------------------------------------------------------------------------
# jnp reference (CPU path and ground truth for the kernels)
# ---------------------------------------------------------------------------


def stage_ref(xb, mean, scale, shift, mask, w, bias, *, seg: str, dil: int,
              t: int, nb: int, keep: float, emit_stats: bool):
    """Plain-XLA stage, numerically the module path's composition."""
    dtype = xb.dtype
    a = xb
    if scale is not None:
        a = (xb - mean.astype(dtype)[None, :, None]) \
            * scale.astype(dtype)[None, :, None] \
            + shift.astype(dtype)[None, :, None]
        a = jax.nn.silu(a).astype(dtype)
    if mask is not None:
        a = jnp.where(mask, a / keep, jnp.zeros_like(a))
    segs = [_segments(a[i], seg, dil, t, nb) for i in range(a.shape[0])]
    xcat = jnp.stack([s[0] if len(s) == 1 else jnp.concatenate(s, axis=0)
                      for s in segs])
    y = jnp.einsum("ro,grl->gol", w.astype(dtype), xcat,
                   preferred_element_type=jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)[None, :, None]
    o = y.astype(dtype)
    if not emit_stats:
        return o, None, None
    of = o.astype(jnp.float32)
    return o, jnp.sum(of, axis=2), jnp.sum(of * of, axis=2)


# ---------------------------------------------------------------------------
# custom-VJP wrapper
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11, 12, 13))
def fused_stage(xb, mean, scale, shift, mask, w, bias,
                seg, dil, t, nb, keep, emit_stats, interpret):
    """One fused train stage.

    Args:
      xb: ``[ng, Ci, L]`` input blocks (L = t*nb lanes, (time, batch)).
      mean, scale, shift: ``[Ci]`` BN-apply vectors ``(x-m)*a+b``
        (or all None: no prologue — raw input stage).
      mask: ``[ng, Ci, L]`` bool keep-mask (or None: no dropout).
      w: packed dense weight ``[R, Co]`` (R = Ci or 3*Ci).
      bias: ``[Co]`` or None.
    Returns (out ``[ng, Co, L]``, psum ``[ng, Co]``, psumsq ``[ng, Co]``);
    the partials are ``[ng, 0]`` stubs when ``emit_stats`` is False.
    """
    outs, _ = _stage_fwd(xb, mean, scale, shift, mask, w, bias, seg, dil,
                         t, nb, keep, emit_stats, interpret)
    return outs


def _stage_specs(xb, mean, scale, shift, mask, w):
    """Shared operand/BlockSpec prefix of the fwd and bwd stage kernels:
    [xb, (mean, scale, shift), mask, w]."""
    ng, ci, l = xb.shape
    operands, in_specs = [], []

    def _blk(v, c, ll):
        operands.append(v)
        in_specs.append(pl.BlockSpec((1, c, ll), lambda i: (i, 0, 0),
                                     memory_space=pltpu.VMEM))

    def _vec(v):
        operands.append(v.reshape(-1, 1))
        in_specs.append(pl.BlockSpec((v.shape[0], 1), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))

    _blk(xb, ci, l)
    if scale is not None:
        _vec(mean)
        _vec(scale)
        _vec(shift)
    if mask is not None:
        _blk(mask, ci, l)
    operands.append(w)
    in_specs.append(pl.BlockSpec(w.shape, lambda i: (0, 0),
                                 memory_space=pltpu.VMEM))
    return operands, in_specs, _blk, _vec


def _stage_call(xb, mean, scale, shift, mask, w, bias, seg, dil, t, nb,
                keep, emit_stats, interpret):
    ng, ci, l = xb.shape
    nseg, cs = _seg_info(seg)
    assert (l // nb) % cs == 0, (
        f"seg={seg!r} needs the chunk count {l}//{nb}={l // nb} divisible "
        f"by cs={cs}")
    l_out = l // cs
    co = w.shape[1]
    dtype = xb.dtype
    has_prologue = scale is not None
    has_mask = mask is not None
    has_bias = bias is not None

    operands, in_specs, _blk, _vec = _stage_specs(
        xb, mean, scale, shift, mask, w)
    if has_bias:
        _vec(bias)

    out_shapes = [jax.ShapeDtypeStruct((ng, co, l_out), dtype)]
    out_specs = [pl.BlockSpec((1, co, l_out), lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM)]
    if emit_stats:
        for _ in range(2):
            out_shapes.append(jax.ShapeDtypeStruct((ng, co, 1), jnp.float32))
            out_specs.append(pl.BlockSpec((1, co, 1), lambda i: (i, 0, 0),
                                          memory_space=pltpu.VMEM))

    kern = functools.partial(
        _fwd_kernel, seg=seg, dil=dil, t=t, nb=nb, keep=keep,
        has_prologue=has_prologue, has_mask=has_mask, has_bias=has_bias,
        emit_stats=emit_stats, dtype=dtype)
    res = pl.pallas_call(
        kern, grid=(ng,), in_specs=in_specs, out_specs=out_specs,
        out_shape=out_shapes, interpret=interpret)(*operands)
    if emit_stats:
        out, ps, pq = res
        return out, ps[:, :, 0], pq[:, :, 0]
    return res[0], None, None


def _stage_fwd(xb, mean, scale, shift, mask, w, bias, seg, dil, t, nb,
               keep, emit_stats, interpret):
    out, ps, pq = _stage_call(xb, mean, scale, shift, mask, w, bias, seg,
                              dil, t, nb, keep, emit_stats, interpret)
    ng = xb.shape[0]
    if not emit_stats:
        ps = jnp.zeros((ng, 0), jnp.float32)
        pq = jnp.zeros((ng, 0), jnp.float32)
    return (out, ps, pq), (xb, mean, scale, shift, mask, w, bias, out)


def _stage_bwd(seg, dil, t, nb, keep, emit_stats, interpret, res, cts):
    xb, mean, scale, shift, mask, w, bias, out = res
    g_out, g_ps, g_pq = cts
    ng, ci, l = xb.shape
    l_out = l // _seg_info(seg)[1]
    co = w.shape[1]
    dtype = xb.dtype
    has_prologue = scale is not None
    has_mask = mask is not None
    has_bias = bias is not None

    operands, in_specs, _blk, _vec = _stage_specs(
        xb, mean, scale, shift, mask, w)
    if emit_stats:
        # the saved forward output is only read for the stats-cotangent
        # term — skip the per-block DMA otherwise
        _blk(out, co, l_out)
    _blk(g_out, co, l_out)
    if emit_stats:
        for g in (g_ps, g_pq):
            operands.append(g.reshape(ng, co, 1))
            in_specs.append(pl.BlockSpec((1, co, 1), lambda i: (i, 0, 0),
                                         memory_space=pltpu.VMEM))

    r_rows = w.shape[0]
    out_shapes = [jax.ShapeDtypeStruct((ng, ci, l), dtype),
                  jax.ShapeDtypeStruct((r_rows, co), jnp.float32)]
    out_specs = [pl.BlockSpec((1, ci, l), lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM),
                 pl.BlockSpec((r_rows, co), lambda i: (0, 0),
                              memory_space=pltpu.VMEM)]
    if has_prologue:
        for _ in range(2):
            out_shapes.append(jax.ShapeDtypeStruct((ci, 1), jnp.float32))
            out_specs.append(pl.BlockSpec((ci, 1), lambda i: (0, 0),
                                          memory_space=pltpu.VMEM))
    if has_bias:
        out_shapes.append(jax.ShapeDtypeStruct((co, 1), jnp.float32))
        out_specs.append(pl.BlockSpec((co, 1), lambda i: (0, 0),
                                      memory_space=pltpu.VMEM))

    kern = functools.partial(
        _bwd_kernel, seg=seg, dil=dil, t=t, nb=nb, keep=keep,
        has_prologue=has_prologue, has_mask=has_mask, has_bias=has_bias,
        emit_stats=emit_stats, dtype=dtype)
    res_b = pl.pallas_call(
        kern, grid=(ng,), in_specs=in_specs, out_specs=out_specs,
        out_shape=out_shapes, interpret=interpret)(*operands)

    it = iter(res_b)
    g_x = next(it)
    g_w = next(it).astype(w.dtype)
    g_mean = g_scale = g_shift = g_bias = None
    if has_prologue:
        # kernel emits A = sum(gu*x), B = sum(gu); chain rule for
        # u = (x-m)*s + b2: g_s = A - m*B, g_m = -s*B, g_b2 = B
        a_sum = next(it)[:, 0]
        b_sum = next(it)[:, 0]
        mf = mean.astype(jnp.float32)
        sf = scale.astype(jnp.float32)
        g_mean = (-sf * b_sum).astype(mean.dtype)
        g_scale = (a_sum - mf * b_sum).astype(scale.dtype)
        g_shift = b_sum.astype(shift.dtype)
    if has_bias:
        g_bias = next(it)[:, 0].astype(bias.dtype)
    return (g_x, g_mean, g_scale, g_shift, None, g_w, g_bias)


fused_stage.defvjp(_stage_fwd, _stage_bwd)


def stage(xb, mean, scale, shift, mask, w, bias, *, seg="identity", dil=1,
          t=20, nb=64, keep=1.0, emit_stats=True, interpret=False):
    """Keyword-friendly entry; returns (out, psum, psumsq) with the
    partials already summed over blocks (None when not emitted)."""
    out, ps, pq = fused_stage(xb, mean, scale, shift, mask, w, bias,
                              seg, dil, t, nb, keep, emit_stats, interpret)
    if not emit_stats:
        return out, None, None
    return out, jnp.sum(ps, axis=0), jnp.sum(pq, axis=0)


# ---------------------------------------------------------------------------
# join stage: out = silu( dropout(silu(norm(h))) + norm_res(res) )
# ---------------------------------------------------------------------------


def _join_fwd_kernel(*refs, keep: float, has_mask: bool, has_res_norm: bool,
                     act_h: bool, dtype):
    it = iter(refs)
    h_ref = next(it)
    mh_ref = next(it)
    sh_ref = next(it)
    th_ref = next(it)
    mask_ref = next(it) if has_mask else None
    r_ref = next(it)
    mr_ref = next(it) if has_res_norm else None
    sr_ref = next(it) if has_res_norm else None
    tr_ref = next(it) if has_res_norm else None
    out_ref = next(it)

    h = h_ref[0].astype(dtype)
    a = (h - mh_ref[...].astype(dtype)[:, :1]) \
        * sh_ref[...].astype(dtype)[:, :1] \
        + th_ref[...].astype(dtype)[:, :1]
    if act_h:
        a = jax.nn.silu(a).astype(dtype)
    if mask_ref is not None:
        a = jnp.where(mask_ref[0], a / keep, jnp.zeros_like(a))
    r = r_ref[0].astype(dtype)
    if has_res_norm:
        r = (r - mr_ref[...].astype(dtype)[:, :1]) \
            * sr_ref[...].astype(dtype)[:, :1] \
            + tr_ref[...].astype(dtype)[:, :1]
    out_ref[0] = jax.nn.silu(a + r).astype(out_ref.dtype)


def _join_bwd_kernel(*refs, keep: float, has_mask: bool, has_res_norm: bool,
                     act_h: bool, dtype):
    it = iter(refs)
    h_ref = next(it)
    mh_ref = next(it)
    sh_ref = next(it)
    th_ref = next(it)
    mask_ref = next(it) if has_mask else None
    r_ref = next(it)
    mr_ref = next(it) if has_res_norm else None
    sr_ref = next(it) if has_res_norm else None
    tr_ref = next(it) if has_res_norm else None
    go_ref = next(it)
    gh_ref = next(it)
    gah_ref = next(it)      # sum(guh * h)
    gth_ref = next(it)      # sum(guh)
    gr_ref = next(it)
    gar_ref = next(it) if has_res_norm else None   # sum(gv * r)
    gtr_ref = next(it) if has_res_norm else None   # sum(gv)

    first = pl.program_id(0) == 0

    h = h_ref[0].astype(dtype)
    sh_col = sh_ref[...].astype(dtype)[:, :1]
    uh = (h - mh_ref[...].astype(dtype)[:, :1]) * sh_col \
        + th_ref[...].astype(dtype)[:, :1]
    if act_h:
        sig_h = jax.nn.sigmoid(uh.astype(jnp.float32))
        a = (uh.astype(jnp.float32) * sig_h).astype(dtype)
    else:
        a = uh
    mask = mask_ref[0] if mask_ref is not None else None
    ad = a if mask is None else jnp.where(mask, a / keep, jnp.zeros_like(a))
    r = r_ref[0].astype(dtype)
    if has_res_norm:
        sr_col = sr_ref[...].astype(dtype)[:, :1]
        rn = (r - mr_ref[...].astype(dtype)[:, :1]) * sr_col \
            + tr_ref[...].astype(dtype)[:, :1]
    else:
        rn = r
    v = (ad + rn).astype(jnp.float32)
    sig_v = jax.nn.sigmoid(v)

    go = go_ref[0].astype(jnp.float32)
    gv = go * sig_v * (1.0 + v * (1.0 - sig_v))
    # residual branch
    if has_res_norm:
        gr_ref[0] = (gv * sr_col.astype(jnp.float32)).astype(gr_ref.dtype)
        gar = jnp.sum(gv * r.astype(jnp.float32), axis=1, keepdims=True)
        gtr = jnp.sum(gv, axis=1, keepdims=True)
    else:
        gr_ref[0] = gv.astype(gr_ref.dtype)
    # main branch
    ga = gv if mask is None else jnp.where(mask, gv / keep,
                                           jnp.zeros_like(gv))
    if act_h:
        guh = ga * sig_h * (1.0 + uh.astype(jnp.float32) * (1.0 - sig_h))
    else:
        guh = ga
    gh_ref[0] = (guh * sh_col.astype(jnp.float32)).astype(gh_ref.dtype)
    gah = jnp.sum(guh * h.astype(jnp.float32), axis=1, keepdims=True)
    gth = jnp.sum(guh, axis=1, keepdims=True)

    @pl.when(first)
    def _init():
        gah_ref[...] = gah
        gth_ref[...] = gth
        if has_res_norm:
            gar_ref[...] = gar
            gtr_ref[...] = gtr

    @pl.when(jnp.logical_not(first))
    def _acc():
        gah_ref[...] += gah
        gth_ref[...] += gth
        if has_res_norm:
            gar_ref[...] += gar
            gtr_ref[...] += gtr


def join_ref(hb, m_h, s_h, t_h, mask, resb, m_r, s_r, t_r, *, keep: float,
             act_h: bool = True):
    """Plain-XLA join, numerically the module path's composition."""
    dtype = hb.dtype
    a = (hb - m_h.astype(dtype)[None, :, None]) \
        * s_h.astype(dtype)[None, :, None] \
        + t_h.astype(dtype)[None, :, None]
    if act_h:
        a = jax.nn.silu(a).astype(dtype)
    if mask is not None:
        a = jnp.where(mask, a / keep, jnp.zeros_like(a))
    r = resb
    if s_r is not None:
        r = (resb - m_r.astype(dtype)[None, :, None]) \
            * s_r.astype(dtype)[None, :, None] \
            + t_r.astype(dtype)[None, :, None]
    return jax.nn.silu(a + r).astype(dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11))
def fused_join(hb, m_h, s_h, t_h, mask, resb, m_r, s_r, t_r,
               keep, interpret, act_h):
    out, _ = _join_fwd(hb, m_h, s_h, t_h, mask, resb, m_r, s_r, t_r,
                       keep, interpret, act_h)
    return out


def _join_specs(hb, m_h, s_h, t_h, mask, resb, m_r, s_r, t_r):
    ng, c, l = hb.shape
    operands, in_specs = [], []

    def _blk(v):
        operands.append(v)
        in_specs.append(pl.BlockSpec((1, c, l), lambda i: (i, 0, 0),
                                     memory_space=pltpu.VMEM))

    def _vec(v):
        operands.append(v.reshape(-1, 1))
        in_specs.append(pl.BlockSpec((v.shape[0], 1), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))

    _blk(hb)
    _vec(m_h)
    _vec(s_h)
    _vec(t_h)
    if mask is not None:
        _blk(mask)
    _blk(resb)
    if s_r is not None:
        _vec(m_r)
        _vec(s_r)
        _vec(t_r)
    return operands, in_specs


def _join_fwd(hb, m_h, s_h, t_h, mask, resb, m_r, s_r, t_r, keep,
              interpret, act_h=True):
    ng, c, l = hb.shape
    operands, in_specs = _join_specs(hb, m_h, s_h, t_h, mask, resb,
                                     m_r, s_r, t_r)
    kern = functools.partial(
        _join_fwd_kernel, keep=keep, has_mask=mask is not None,
        has_res_norm=s_r is not None, act_h=act_h, dtype=hb.dtype)
    out = pl.pallas_call(
        kern, grid=(ng,), in_specs=in_specs,
        out_specs=pl.BlockSpec((1, c, l), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ng, c, l), hb.dtype),
        interpret=interpret)(*operands)
    return out, (hb, m_h, s_h, t_h, mask, resb, m_r, s_r, t_r)


def _join_bwd(keep, interpret, act_h, res, g_out):
    hb, m_h, s_h, t_h, mask, resb, m_r, s_r, t_r = res
    ng, c, l = hb.shape
    has_res_norm = s_r is not None
    operands, in_specs = _join_specs(hb, m_h, s_h, t_h, mask, resb,
                                     m_r, s_r, t_r)
    operands.append(g_out)
    in_specs.append(pl.BlockSpec((1, c, l), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM))

    out_shapes = [jax.ShapeDtypeStruct((ng, c, l), hb.dtype),
                  jax.ShapeDtypeStruct((c, 1), jnp.float32),
                  jax.ShapeDtypeStruct((c, 1), jnp.float32),
                  jax.ShapeDtypeStruct((ng, c, l), resb.dtype)]
    out_specs = [pl.BlockSpec((1, c, l), lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM),
                 pl.BlockSpec((c, 1), lambda i: (0, 0),
                              memory_space=pltpu.VMEM),
                 pl.BlockSpec((c, 1), lambda i: (0, 0),
                              memory_space=pltpu.VMEM),
                 pl.BlockSpec((1, c, l), lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM)]
    if has_res_norm:
        for _ in range(2):
            out_shapes.append(jax.ShapeDtypeStruct((c, 1), jnp.float32))
            out_specs.append(pl.BlockSpec((c, 1), lambda i: (0, 0),
                                          memory_space=pltpu.VMEM))

    kern = functools.partial(
        _join_bwd_kernel, keep=keep, has_mask=mask is not None,
        has_res_norm=has_res_norm, act_h=act_h, dtype=hb.dtype)
    res_b = pl.pallas_call(
        kern, grid=(ng,), in_specs=in_specs, out_specs=out_specs,
        out_shape=out_shapes, interpret=interpret)(*operands)

    it = iter(res_b)
    g_h = next(it)
    ah = next(it)[:, 0]
    bh = next(it)[:, 0]
    g_r = next(it)
    shf = s_h.astype(jnp.float32)
    mhf = m_h.astype(jnp.float32)
    g_mh = (-shf * bh).astype(m_h.dtype)
    g_sh = (ah - mhf * bh).astype(s_h.dtype)
    g_th = bh.astype(t_h.dtype)
    g_mr = g_sr = g_tr = None
    if has_res_norm:
        ar = next(it)[:, 0]
        br = next(it)[:, 0]
        srf = s_r.astype(jnp.float32)
        mrf = m_r.astype(jnp.float32)
        g_mr = (-srf * br).astype(m_r.dtype)
        g_sr = (ar - mrf * br).astype(s_r.dtype)
        g_tr = br.astype(t_r.dtype)
    return (g_h, g_mh, g_sh, g_th, None, g_r, g_mr, g_sr, g_tr)


fused_join.defvjp(_join_fwd, _join_bwd)


def join(hb, m_h, s_h, t_h, mask, resb, m_r=None, s_r=None, t_r=None,
         *, keep=1.0, interpret=False, act_h=True):
    return fused_join(hb, m_h, s_h, t_h, mask, resb, m_r, s_r, t_r,
                      keep, interpret, act_h)
