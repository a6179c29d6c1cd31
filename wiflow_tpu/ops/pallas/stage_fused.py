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


def _hcat(parts):
    """Lane-axis concat that drops zero-width parts — Mosaic rejects
    zero-sized vectors ('vector types must have positive constant
    sizes'), so padding by an empty block must be a no-op, not a
    zero-width operand."""
    parts = [p for p in parts if p.shape[-1]]
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=-1)


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
            if cs > 1:
                gi = jnp.concatenate(
                    [gi, jnp.zeros((rows, n_out, cs - 1, nb), dt)], axis=2)
            gi = gi.reshape(rows, cs * n_out * nb)
            left = jnp.zeros((rows, j * nb), dt)
            right = jnp.zeros((rows, (n_in + 2 - j - cs * n_out) * nb), dt)
            gxp = gxp + _hcat([left, gi, right])
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


def _silu_f32(u, dtype):
    """silu computed in f32 inside a kernel.

    Mosaic rejects ``jax.nn.silu`` applied directly to a bf16 vector: the
    lowering broadcasts the f32 constant 1.0 into a bf16 vector operand
    ('vector.broadcast' element-type verification error on real TPU,
    observed on v5e). The bwd kernels already compute sigmoid in f32 for
    accuracy; this keeps the fwd kernels on the same path.
    """
    u32 = u.astype(jnp.float32)
    return (u32 * jax.nn.sigmoid(u32)).astype(dtype)


def _fwd_kernel(*refs, seg: str, dil: int, t: int, nb: int, keep: float,
                has_prologue: bool, has_mask: bool, has_bias: bool,
                emit_stats: bool, presplit: bool, dtype):
    nseg, _ = _seg_info(seg)
    it = iter(refs)
    if presplit:
        x_refs = [next(it) for _ in range(nseg)]
    else:
        x_ref = next(it)
    m_ref = next(it) if has_prologue else None
    s_ref = next(it) if has_prologue else None
    b2_ref = next(it) if has_prologue else None
    mask_ref = next(it) if has_mask else None
    w_refs = [next(it) for _ in range(nseg)]
    b_ref = next(it) if has_bias else None
    out_ref = next(it)
    ps_ref = next(it) if emit_stats else None
    pq_ref = next(it) if emit_stats else None

    if presplit:
        # chunk-kind stages (lane-subsampled segments) are pre-sliced in
        # XLA outside the kernel: the block-strided lane gather does not
        # lower in Mosaic ("unsupported shape cast"), and every chunk
        # stage in the model is prologue- and mask-free, so the split
        # commutes with the kernel body.
        segs = [r[0].astype(dtype) for r in x_refs]
    else:
        x = x_ref[0].astype(dtype)
        a = x
        if has_prologue:
            u = (x - m_ref[...].astype(dtype)[:, :1]) \
                * s_ref[...].astype(dtype)[:, :1] \
                + b2_ref[...].astype(dtype)[:, :1]
            a = _silu_f32(u, dtype)
        if mask_ref is not None:
            a = jnp.where(mask_ref[0], a / keep, jnp.zeros_like(a))
        # per-tap dot accumulation (tcn_level.py pattern): Mosaic cannot
        # concat lane-offset slices along the sublane axis ("result/input
        # offset mismatch on non-concat dimension"), so the packed weight
        # is split into per-tap refs outside and each tap is its own dot.
        segs = _segments(a, seg, dil, t, nb)
    y = None
    for wr, sg in zip(w_refs, segs):
        yj = jax.lax.dot_general(
            wr[...].astype(dtype).T, sg, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        y = yj if y is None else y + yj
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
                emit_stats: bool, presplit: bool, dtype):
    nseg, _ = _seg_info(seg)
    it = iter(refs)
    if presplit:
        x_refs = [next(it) for _ in range(nseg)]
    else:
        x_ref = next(it)
    m_ref = next(it) if has_prologue else None
    s_ref = next(it) if has_prologue else None
    b2_ref = next(it) if has_prologue else None
    mask_ref = next(it) if has_mask else None
    w_refs = [next(it) for _ in range(nseg)]
    o_ref = next(it) if emit_stats else None
    go_ref = next(it)
    gps_ref = next(it) if emit_stats else None
    gpq_ref = next(it) if emit_stats else None
    if presplit:
        gx_refs = [next(it) for _ in range(nseg)]  # per-tap segment grads
    else:
        gx_ref = next(it)
    gw_refs = [next(it) for _ in range(nseg)]     # per-tap [Ci, Co] blocks
    ga_ref = next(it) if has_prologue else None   # sum(gu * x) per channel
    gt_ref = next(it) if has_prologue else None   # sum(gu) per channel
    gb_ref = next(it) if has_bias else None

    first = pl.program_id(0) == 0

    if presplit:
        segs = [r[0].astype(dtype) for r in x_refs]
    else:
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
        ad = a if mask is None else jnp.where(mask, a / keep,
                                              jnp.zeros_like(a))
        segs = _segments(ad, seg, dil, t, nb)

    # total conv-output cotangent: downstream grad + the stats terms
    go = go_ref[0].astype(jnp.float32)
    if emit_stats:
        o = o_ref[0].astype(jnp.float32)
        go = go + gps_ref[0].astype(jnp.float32) \
            + 2.0 * o * gpq_ref[0].astype(jnp.float32)
    gof = go.astype(dtype)

    # per-tap weight grads, accumulated across the sequential grid
    # (per-tap rather than one packed [R, Co] dot: see _fwd_kernel)
    gws = [jax.lax.dot_general(sg, gof, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)
           for sg in segs]                                  # nseg x [Ci, Co]
    if has_bias:
        gb = jnp.sum(go, axis=1, keepdims=True)             # [Co, 1]

    @pl.when(first)
    def _init():
        for r, v in zip(gw_refs, gws):
            r[...] = v
        if has_bias:
            gb_ref[...] = gb

    @pl.when(jnp.logical_not(first))
    def _acc():
        for r, v in zip(gw_refs, gws):
            r[...] += v
        if has_bias:
            gb_ref[...] += gb

    # input-side grad through the dots: g_seg_j = W_j @ g_o
    gsegs = [jax.lax.dot_general(wr[...].astype(dtype), gof,
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
             for wr in w_refs]                              # nseg x [Ci, L']
    if presplit:
        # the lane scatter back to x happens in XLA outside (_stage_bwd)
        for r, g in zip(gx_refs, gsegs):
            r[0] = g.astype(r.dtype)
        return
    gad = _segments_t(gsegs, seg, dil, t, nb, x.shape[1])

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


def _split_w(w, ci: int, seg: str):
    """Split the packed ``[R, Co]`` weight into per-tap ``[Ci, Co]``
    blocks (R = nseg*Ci) — the kernels take one ref per tap because
    Mosaic cannot sublane-concat the lane-offset input segments."""
    nseg, _ = _seg_info(seg)
    assert w.shape[0] == nseg * ci, (w.shape, nseg, ci, seg)
    return [w[j * ci:(j + 1) * ci] for j in range(nseg)]


def _is_chunk(seg: str) -> bool:
    """Chunk-kind segments (block-strided lane gathers) are pre-split in
    XLA outside the kernel — Mosaic has no lowering for the gather."""
    return seg.startswith("chunk")


def _segments_b(xb, seg: str, dil: int, t: int, nb: int):
    """Batched (XLA-side) :func:`_segments` over ``[ng, Ci, L]`` blocks."""
    return jax.vmap(lambda x2: tuple(_segments(x2, seg, dil, t, nb)))(xb)


def _prologue_xla(xb, mean, scale, shift, mask, keep):
    """The stage prologue (BN-apply -> SiLU -> dropout) in plain XLA —
    the presplit path's substitute for the in-kernel prologue, numerics
    matching :func:`stage_ref` exactly."""
    a = xb
    if scale is not None:
        dt = xb.dtype
        a = (xb - mean.astype(dt)[None, :, None]) \
            * scale.astype(dt)[None, :, None] \
            + shift.astype(dt)[None, :, None]
        a = jax.nn.silu(a).astype(dt)
    if mask is not None:
        a = jnp.where(mask, a / keep, jnp.zeros_like(a))
    return a


def _stage_specs(xb, mean, scale, shift, mask, ws, seg, dil, t, nb, keep):
    """Shared operand/BlockSpec prefix of the fwd and bwd stage kernels:
    [xb | presplit segments, (mean, scale, shift), mask, *ws].

    For chunk-kind segments the prologue runs in XLA here and the
    pre-split segment blocks are the kernel inputs (presplit path)."""
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

    if _is_chunk(seg):
        a = _prologue_xla(xb, mean, scale, shift, mask, keep)
        _, cs = _seg_info(seg)
        for sgb in _segments_b(a, seg, dil, t, nb):
            _blk(sgb, ci, l // cs)
    else:
        _blk(xb, ci, l)
        if scale is not None:
            _vec(mean)
            _vec(scale)
            _vec(shift)
        if mask is not None:
            _blk(mask, ci, l)
    for wj in ws:
        operands.append(wj)
        in_specs.append(pl.BlockSpec(wj.shape, lambda i: (0, 0),
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
    presplit = _is_chunk(seg)
    has_prologue = scale is not None and not presplit
    has_mask = mask is not None and not presplit
    has_bias = bias is not None

    operands, in_specs, _blk, _vec = _stage_specs(
        xb, mean, scale, shift, mask, _split_w(w, ci, seg), seg, dil, t,
        nb, keep)
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
        emit_stats=emit_stats, presplit=presplit, dtype=dtype)
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
    nseg, _ = _seg_info(seg)
    presplit = _is_chunk(seg)

    operands, in_specs, _blk, _vec = _stage_specs(
        xb, mean, scale, shift, mask, _split_w(w, ci, seg), seg, dil, t,
        nb, keep)
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

    out_shapes, out_specs = [], []
    if presplit:
        # per-tap segment grads, scattered back to x in XLA below (f32:
        # overlapping taps add, keep the adds in the accumulation dtype)
        for _ in range(nseg):
            out_shapes.append(
                jax.ShapeDtypeStruct((ng, ci, l_out), jnp.float32))
            out_specs.append(pl.BlockSpec((1, ci, l_out),
                                          lambda i: (i, 0, 0),
                                          memory_space=pltpu.VMEM))
    else:
        out_shapes.append(jax.ShapeDtypeStruct((ng, ci, l), dtype))
        out_specs.append(pl.BlockSpec((1, ci, l), lambda i: (i, 0, 0),
                                      memory_space=pltpu.VMEM))
    for _ in range(nseg):
        out_shapes.append(jax.ShapeDtypeStruct((ci, co), jnp.float32))
        out_specs.append(pl.BlockSpec((ci, co), lambda i: (0, 0),
                                      memory_space=pltpu.VMEM))
    if has_prologue and not presplit:
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
        has_prologue=has_prologue and not presplit,
        has_mask=has_mask and not presplit, has_bias=has_bias,
        emit_stats=emit_stats, presplit=presplit, dtype=dtype)
    res_b = pl.pallas_call(
        kern, grid=(ng,), in_specs=in_specs, out_specs=out_specs,
        out_shape=out_shapes, interpret=interpret)(*operands)

    it = iter(res_b)
    a_sum = b_sum = None
    if presplit:
        # scatter the per-tap segment grads back to the prologue output,
        # then chain the prologue/mask grads in XLA (the presplit mirror
        # of the in-kernel epilogue)
        gseg_blocks = [next(it) for _ in range(nseg)]
        gad = jax.vmap(
            lambda *g: _segments_t(list(g), seg, dil, t, nb, l)
        )(*gseg_blocks)
        if has_mask:
            gad = jnp.where(mask, gad / keep, jnp.zeros_like(gad))
        if has_prologue:
            u = (xb - mean.astype(dtype)[None, :, None]) \
                * scale.astype(dtype)[None, :, None] \
                + shift.astype(dtype)[None, :, None]
            sig = jax.nn.sigmoid(u.astype(jnp.float32))
            dsilu = sig * (1.0 + u.astype(jnp.float32) * (1.0 - sig))
            gu = gad * dsilu
            g_x = (gu * scale.astype(jnp.float32)[None, :, None]) \
                .astype(dtype)
            a_sum = jnp.sum(gu * xb.astype(jnp.float32), axis=(0, 2))
            b_sum = jnp.sum(gu, axis=(0, 2))
        else:
            g_x = gad.astype(dtype)
    else:
        g_x = next(it)
    gw_blocks = [next(it) for _ in range(nseg)]
    g_w = (gw_blocks[0] if nseg == 1
           else jnp.concatenate(gw_blocks, axis=0)).astype(w.dtype)
    g_mean = g_scale = g_shift = g_bias = None
    if has_prologue:
        # kernel emits A = sum(gu*x), B = sum(gu); chain rule for
        # u = (x-m)*s + b2: g_s = A - m*B, g_m = -s*B, g_b2 = B
        if a_sum is None:
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
        a = _silu_f32(a, dtype)
    if mask_ref is not None:
        a = jnp.where(mask_ref[0], a / keep, jnp.zeros_like(a))
    r = r_ref[0].astype(dtype)
    if has_res_norm:
        r = (r - mr_ref[...].astype(dtype)[:, :1]) \
            * sr_ref[...].astype(dtype)[:, :1] \
            + tr_ref[...].astype(dtype)[:, :1]
    out_ref[0] = _silu_f32(a + r, out_ref.dtype)


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
