"""Fused axial-attention Pallas kernel (inference path).

The dual axial attention is the model's hot spot: the XLA decomposition
materializes logits/softmax tensors with 15-20-sized trailing dims that pad
7-16x against the TPU's (8, 128) tiles (measured: ~100 ms of a ~200 ms
batch-4096 forward).  This kernel keeps the whole attention for a block of
the folded batch in VMEM, with the huge batch dim as the *lane* axis —
logits [L, L, G, Nb] never touch HBM.

Eval-mode BatchNorms become affine transforms with running statistics
(exactly what torch eval does):
  * bn_qkv folds into the QKV projection (done by the caller in XLA),
  * bn_similarity is a per-group scale/bias applied to logits in-kernel,
  * bn_output is a per-channel scale/bias applied to the result in-kernel.

Math identical to models/wiflow.py::AxialAttention in eval mode
(ref torch semantics: /root/reference/models/attention.py:37-80).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(qkvT_ref, sim_aff_ref, out_aff_ref, out_ref, *, groups: int):
    """One block of Nb folded-batch elements.

    qkvT_ref: [L, 3C, Nb]   (bf16/f32) — q, k, v stacked on axis 1
    sim_aff_ref: [2, G]      f32 — (scale, bias) per group
    out_aff_ref: [2, C]      f32 — (scale, bias) per channel
    out_ref:  [L, C, Nb]
    """
    l, c3, nb = qkvT_ref.shape
    c = c3 // 3
    g = groups
    gc = c // g

    qkv = qkvT_ref[...].astype(jnp.float32)
    # [L, C, Nb] -> [L, G, gc, Nb]; gc == 8 keeps the sublane dim exact
    q = qkv[:, :c, :].reshape(l, g, gc, nb)
    k = qkv[:, c:2 * c, :].reshape(l, g, gc, nb)
    v = qkv[:, 2 * c:, :].reshape(l, g, gc, nb)

    # Reductions over the tiny static dims (L<=20, gc=8) can't use
    # jnp reductions directly (Mosaic rejects leading-dim reductions), so:
    # the gc contraction and the j-weighted sum unroll into elementwise ops
    # on multi-tile [L, G, Nb] / [G, gc, Nb] arrays, and the softmax runs
    # as a 2-D [L, G*Nb] sublane reduction.
    sim_scale = sim_aff_ref[0, :].reshape(g, 1)
    sim_bias = sim_aff_ref[1, :].reshape(g, 1)

    rows = []
    for i in range(l):
        # logits for query i: [L(j), G, Nb]
        lg_i = None
        for cc in range(gc):
            term = q[i, :, cc, :][None] * k[:, :, cc, :]
            lg_i = term if lg_i is None else lg_i + term
        lg_i = lg_i * sim_scale[None] + sim_bias[None]     # BN-eval affine

        # softmax over j (ref attention.py:63) as a sublane reduction
        lg2 = lg_i.reshape(l, g * nb)
        m = jnp.max(lg2, axis=0, keepdims=True)
        e = jnp.exp(lg2 - m)
        sm = (e / jnp.sum(e, axis=0, keepdims=True)).reshape(l, g, 1, nb)

        # weighted sum of v over j -> [G, gc, Nb]
        acc = None
        for j in range(l):
            term = sm[j] * v[j]
            acc = term if acc is None else acc + term
        rows.append(acc)

    out = jnp.stack(rows, axis=0).reshape(l, c, nb)        # g-major channels
    out = out * out_aff_ref[0, :].reshape(1, c, 1) \
        + out_aff_ref[1, :].reshape(1, c, 1)
    out_ref[...] = out.astype(out_ref.dtype)


def bn_affine(gamma, beta, mean, var, eps: float = 1e-5):
    """Eval-mode BN as (scale, bias): y = scale * x + bias."""
    scale = gamma * jax.lax.rsqrt(var.astype(jnp.float32) + eps)
    return scale, beta - mean * scale


@functools.partial(jax.jit, static_argnames=("groups", "block", "interpret"))
def axial_attention_eval(x, wqkv, qkv_bn, sim_bn, out_bn,
                         *, groups: int = 8, block: int = 128,
                         interpret: bool = False):
    """Fused eval-mode axial attention along the middle axis of ``x``.

    Args:
      x: ``[N, L, C]`` folded input (attend along L for each n).
      wqkv: ``[C, 3C]`` projection.
      qkv_bn / sim_bn / out_bn: dicts with gamma/beta/mean/var arrays of
        sizes 3C / G / C (torch BN buffers).
    Returns ``[N, L, C]``.
    """
    n, l, c = x.shape
    # fold bn_qkv into the projection; matmul + transpose in the input
    # dtype (bf16 in serving) to halve HBM traffic
    s, b = bn_affine(qkv_bn["gamma"], qkv_bn["beta"],
                     qkv_bn["mean"], qkv_bn["var"])
    wq = (wqkv.astype(jnp.float32) * s[None, :]).astype(x.dtype)
    qkv = jnp.einsum("nlc,co->nlo", x, wq,
                     preferred_element_type=jnp.float32)
    qkv = (qkv + b).astype(x.dtype)

    pad = (-n) % block
    if pad:
        qkv = jnp.pad(qkv, ((0, pad), (0, 0), (0, 0)))
    qkvT = jnp.transpose(qkv, (1, 2, 0))                   # [L, 3C, N+pad]

    sim_aff = jnp.stack(bn_affine(sim_bn["gamma"], sim_bn["beta"],
                                  sim_bn["mean"], sim_bn["var"]))
    out_aff = jnp.stack(bn_affine(out_bn["gamma"], out_bn["beta"],
                                  out_bn["mean"], out_bn["var"]))

    ntot = n + pad
    outT = pl.pallas_call(
        functools.partial(_kernel, groups=groups),
        grid=(ntot // block,),
        in_specs=[
            pl.BlockSpec((l, 3 * c, block), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, groups), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((l, c, block), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((l, c, ntot), x.dtype),
        interpret=interpret,
    )(qkvT, sim_aff.astype(jnp.float32), out_aff.astype(jnp.float32))

    out = jnp.transpose(outT, (2, 0, 1))                   # [N+pad, L, C]
    return out[:n]


# ---------------------------------------------------------------------------
# v2 kernel: QKV projection fused in-kernel (MXU) + tile-aligned channel
# layout.  v1 spends most of its time on sublane-strided relayouts: slicing
# channel cc out of g-major channels [L, (g, gc), Nb] gathers every 8th
# sublane.  v2 instead orders channels (cc, g) — "scrambled" — so every
# per-cc slice is one contiguous [G, Nb] tile, and the softmax/AV run as
# unrolled leading-dim tile ops.  The scramble is folded into the weights
# (QKV columns here, the consumer's input channels downstream), so no data
# permutation ever executes at runtime.
# ---------------------------------------------------------------------------


def scramble_perm(c: int, groups: int):
    """perm P with P[p] = standard channel at scrambled position p.

    Scrambled position p = cc * G + g holds standard channel g * gc + cc
    (standard = group-major, ref attention.py:42-47 reshape semantics).
    ``a_scrambled = a_standard[..., P]``; inverse is ``argsort(P)`` (equal
    to P itself when G == gc).
    """
    import numpy as np
    gc_ = c // groups
    p = np.empty(c, dtype=np.int32)
    for cc in range(gc_):
        for g in range(groups):
            p[cc * groups + g] = g * gc_ + cc
    return p


def _attend(xT, wq, bq, sim_aff, out_aff, *, groups: int, dtype):
    """Core fused attention on one VMEM block ``xT [L, C, Nb]``.

    ``wq [3C, C]``: folded QKV projection, output rows in (part, cc, g)
    scrambled order; ``bq [3C, 1]`` f32; ``sim_aff [2, G]``;
    ``out_aff [2, C]`` (scrambled cols).  Returns ``[L, C, Nb]`` with
    channels in scrambled (cc, g) order, dtype ``dtype``.
    """
    l, c, nb = xT.shape
    g = groups
    gc_ = c // g

    # Per-position QKV projection on the MXU: [3C, C] @ [C, Nb].
    qkv = []
    for i in range(l):
        y = jax.lax.dot_general(
            wq, xT[i],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        qkv.append(y + bq)

    # Contiguous [G, Nb] tile views per (part, cc); stacks over L are
    # leading-dim only (no relayout).
    def plane(part, cc):
        base = part * c + cc * g
        return jnp.stack([qkv[j][base:base + g] for j in range(l)])

    k_planes = [plane(1, cc) for cc in range(gc_)]
    v_planes = [plane(2, cc) for cc in range(gc_)]

    sim_s = sim_aff[0, :].reshape(g, 1)
    sim_b = sim_aff[1, :].reshape(g, 1)
    out_s = out_aff[0, :].reshape(c, 1)
    out_b = out_aff[1, :].reshape(c, 1)

    rows = []
    for i in range(l):
        # logits for query i: [L_j, G, Nb]
        lg = None
        for cc in range(gc_):
            q_icc = qkv[i][cc * g:(cc + 1) * g]
            term = q_icc[None] * k_planes[cc]
            lg = term if lg is None else lg + term
        lg = lg * sim_s[None] + sim_b[None]                # BN-eval affine

        # softmax over j (leading dim), fully unrolled — no relayouts
        m = lg[0]
        for j in range(1, l):
            m = jnp.maximum(m, lg[j])
        e = jnp.exp(lg - m[None])
        den = e[0]
        for j in range(1, l):
            den = den + e[j]
        r = 1.0 / den                                      # [G, Nb]

        # weighted sum of v over j, per cc -> [C(scrambled), Nb]
        outs = []
        for cc in range(gc_):
            acc = None
            vp = v_planes[cc]
            for j in range(l):
                term = e[j] * vp[j]
                acc = term if acc is None else acc + term
            outs.append(acc * r)
        o_i = jnp.concatenate(outs, axis=0)                # (cc, g) order
        rows.append(o_i * out_s + out_b)

    return jnp.stack(rows).astype(dtype)


def _kernel_v2(xT_ref, wq_ref, bq_ref, sim_aff_ref, out_aff_ref, out_ref,
               *, groups: int):
    """One block of Nb folded-batch elements, projection included."""
    out_ref[...] = _attend(
        xT_ref[...], wq_ref[...], bq_ref[...].astype(jnp.float32),
        sim_aff_ref[...], out_aff_ref[...],
        groups=groups, dtype=out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("groups", "block", "interpret",
                                              "in_scrambled"))
def axial_attention_eval_v2(x, wqkv, qkv_bn, sim_bn, out_bn,
                            *, groups: int = 8, block: int = 128,
                            interpret: bool = False,
                            in_scrambled: bool = False):
    """Fused eval-mode axial attention, v2 layout.

    Args/semantics as :func:`axial_attention_eval`, except the returned
    ``[N, L, C]`` array has channels in scrambled (cc, g) order — fold
    ``scramble_perm(C, groups)`` into the consumer's weights, or pass
    ``in_scrambled=True`` to a chained second call.
    """
    n, l, c = x.shape
    perm = scramble_perm(c, groups)

    s, b = bn_affine(qkv_bn["gamma"], qkv_bn["beta"],
                     qkv_bn["mean"], qkv_bn["var"])
    wq = wqkv.astype(jnp.float32) * s[None, :]             # [C, 3C]
    # reorder output columns to scrambled order within each part
    wq = wq.reshape(c, 3, c)[:, :, perm].reshape(c, 3 * c)
    bq = b.reshape(3, c)[:, perm].reshape(3 * c, 1)
    if in_scrambled:
        wq = wq[perm, :]                                   # match input order
    wqT = jnp.transpose(wq).astype(x.dtype)                # [3C, C]

    sim_aff = jnp.stack(bn_affine(sim_bn["gamma"], sim_bn["beta"],
                                  sim_bn["mean"], sim_bn["var"]))
    out_aff = jnp.stack(bn_affine(out_bn["gamma"], out_bn["beta"],
                                  out_bn["mean"], out_bn["var"]))[:, perm]

    pad = (-n) % block
    xT = jnp.transpose(x, (1, 2, 0))                       # [L, C, N]
    if pad:
        xT = jnp.pad(xT, ((0, 0), (0, 0), (0, pad)))
    ntot = n + pad

    outT = pl.pallas_call(
        functools.partial(_kernel_v2, groups=groups),
        grid=(ntot // block,),
        in_specs=[
            pl.BlockSpec((l, c, block), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * c, c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * c, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, groups), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((l, c, block), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((l, c, ntot), x.dtype),
        interpret=interpret,
    )(xT, wqT, bq.astype(jnp.float32), sim_aff.astype(jnp.float32),
      out_aff.astype(jnp.float32))

    return jnp.transpose(outT, (2, 0, 1))[:n]              # [N, L, C]


def _fold_qkv(wqkv, qkv_bn, perm, in_scrambled: bool, dtype):
    """Fold bn_qkv into the projection; reorder to scrambled layout."""
    c = wqkv.shape[0]
    s, b = bn_affine(qkv_bn["gamma"], qkv_bn["beta"],
                     qkv_bn["mean"], qkv_bn["var"])
    wq = wqkv.astype(jnp.float32) * s[None, :]             # [C, 3C]
    wq = wq.reshape(c, 3, c)[:, :, perm].reshape(c, 3 * c)
    bq = b.reshape(3, c)[:, perm].reshape(3 * c, 1)
    if in_scrambled:
        wq = wq[perm, :]
    return jnp.transpose(wq).astype(dtype), bq.astype(jnp.float32)


def _kernel_dual(x_ref, wq1_ref, bq1_ref, sim1_ref, oaff1_ref,
                 wq2_ref, bq2_ref, sim2_ref, oaff2_ref, out_ref, a1_ref,
                 *, groups: int):
    """Both attention axes for one block of Nb whole samples, all in VMEM.

    x_ref: [1, H, W, C, Nb]; out_ref: [1, W, H, C, Nb] (both axes' results,
    channels scrambled); a1_ref: [H, W, C, Nb] VMEM scratch.  H/W slices
    are untiled leading dims, so neither axis fold needs a relayout, and
    the inter-axis intermediate never touches HBM.
    """
    _, h, w, c, nb = x_ref.shape
    dtype = out_ref.dtype

    wq1, bq1 = wq1_ref[...], bq1_ref[...].astype(jnp.float32)
    sim1, oaff1 = sim1_ref[...], oaff1_ref[...]
    wq2, bq2 = wq2_ref[...], bq2_ref[...].astype(jnp.float32)
    sim2, oaff2 = sim2_ref[...], oaff2_ref[...]

    def body1(hh, carry):
        a1_ref[hh] = _attend(x_ref[0, hh], wq1, bq1, sim1, oaff1,
                             groups=groups, dtype=dtype)
        return carry

    jax.lax.fori_loop(0, h, body1, 0)

    def body2(ww, carry):
        out_ref[0, ww] = _attend(a1_ref[:, ww], wq2, bq2, sim2, oaff2,
                                 groups=groups, dtype=dtype)
        return carry

    jax.lax.fori_loop(0, w, body2, 0)


@functools.partial(jax.jit, static_argnames=("groups", "block", "interpret"))
def dual_axial_attention_eval_fused(x, params, batch_stats, *,
                                    groups: int = 8, block: int = 128,
                                    interpret: bool = False):
    """Single-kernel dual attention on ``[B, H, W, C]``.

    Same contract as :func:`dual_axial_attention_eval_v2` (returns
    scrambled channels), but width- and height-axis attention run in one
    Pallas kernel over blocks of whole samples — the inter-axis
    intermediate and its transposes never leave VMEM.

    NOTE: not the default. At block=128 the pipeline's double-buffered
    in/out blocks (4 x 4.9 MB) plus the scratch exceed the 16 MB VMEM
    scoped limit on v5e (measured 23.4 MB); block=64 fits but halves
    VPU/MXU lane utilization.  v2 (two kernels + XLA transposes) wins
    until VMEM grows or the pipeline can run single-buffered.
    """
    def bn(axis, name):
        return {"gamma": params[axis][name]["weight"],
                "beta": params[axis][name]["bias"],
                "mean": batch_stats[axis][name]["running_mean"],
                "var": batch_stats[axis][name]["running_var"]}

    b, h, w, c = x.shape
    perm = scramble_perm(c, groups)
    wq1, bq1 = _fold_qkv(params["width_axis"]["qkv_weight"],
                         bn("width_axis", "bn_qkv"), perm, False, x.dtype)
    wq2, bq2 = _fold_qkv(params["height_axis"]["qkv_weight"],
                         bn("height_axis", "bn_qkv"), perm, True, x.dtype)

    def affs(axis):
        d = bn(axis, "bn_similarity")
        sim = jnp.stack(bn_affine(d["gamma"], d["beta"], d["mean"],
                                  d["var"]))
        d = bn(axis, "bn_output")
        out = jnp.stack(bn_affine(d["gamma"], d["beta"], d["mean"],
                                  d["var"]))[:, perm]
        return sim.astype(jnp.float32), out.astype(jnp.float32)

    sim1, oaff1 = affs("width_axis")
    sim2, oaff2 = affs("height_axis")

    nb = block
    pad = (-b) % nb
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0), (0, 0), (0, 0)))
    bp = b + pad
    ng = bp // nb
    x5 = x.reshape(ng, nb, h, w, c).transpose(0, 2, 3, 4, 1)

    full = lambda arr: pl.BlockSpec(arr.shape, lambda i: (0,) * arr.ndim,
                                    memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel_dual, groups=groups),
        grid=(ng,),
        in_specs=[pl.BlockSpec((1, h, w, c, nb),
                               lambda i: (i, 0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
                  full(wq1), full(bq1), full(sim1), full(oaff1),
                  full(wq2), full(bq2), full(sim2), full(oaff2)],
        out_specs=pl.BlockSpec((1, w, h, c, nb), lambda i: (i, 0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ng, w, h, c, nb), x.dtype),
        scratch_shapes=[pltpu.VMEM((h, w, c, nb), x.dtype)],
        interpret=interpret,
    )(x5, wq1, bq1, sim1, oaff1, wq2, bq2, sim2, oaff2)

    out = out.transpose(0, 4, 2, 1, 3).reshape(bp, h, w, c)
    return out[:b]


def dual_axial_attention_eval_v2(x, params, batch_stats, *, groups: int = 8,
                                 block: int = 128, interpret: bool = False):
    """v2 dual attention on ``[B, H, W, C]``.

    Returns ``[B, H, W, C]`` with channels in scrambled (cc, g) order —
    the caller folds ``scramble_perm(C, groups)`` into the next layer's
    input-channel axis (see models/fast.py decoder fold).
    """
    def bn(axis, name):
        return {"gamma": params[axis][name]["weight"],
                "beta": params[axis][name]["bias"],
                "mean": batch_stats[axis][name]["running_mean"],
                "var": batch_stats[axis][name]["running_var"]}

    b, h, w, c = x.shape
    xr = x.reshape(b * h, w, c)
    xr = axial_attention_eval_v2(
        xr, params["width_axis"]["qkv_weight"],
        bn("width_axis", "bn_qkv"), bn("width_axis", "bn_similarity"),
        bn("width_axis", "bn_output"),
        groups=groups, block=block, interpret=interpret, in_scrambled=False)
    x = xr.reshape(b, h, w, c)

    xr = jnp.transpose(x, (0, 2, 1, 3)).reshape(b * w, h, c)
    xr = axial_attention_eval_v2(
        xr, params["height_axis"]["qkv_weight"],
        bn("height_axis", "bn_qkv"), bn("height_axis", "bn_similarity"),
        bn("height_axis", "bn_output"),
        groups=groups, block=block, interpret=interpret, in_scrambled=True)
    return jnp.transpose(xr.reshape(b, w, h, c), (0, 2, 1, 3))


def dual_axial_attention_eval(x, params, batch_stats, *, groups: int = 8,
                              block: int = 128, interpret: bool = False):
    """Width-axis then height-axis fused attention on ``[B, H, W, C]``.

    ``params``/``batch_stats``: the flax subtrees of
    models/wiflow.py::DualAxialAttention.
    """
    def bn(axis, name):
        return {"gamma": params[axis][name]["weight"],
                "beta": params[axis][name]["bias"],
                "mean": batch_stats[axis][name]["running_mean"],
                "var": batch_stats[axis][name]["running_var"]}

    b, h, w, c = x.shape
    xr = x.reshape(b * h, w, c)
    xr = axial_attention_eval(
        xr, params["width_axis"]["qkv_weight"],
        bn("width_axis", "bn_qkv"), bn("width_axis", "bn_similarity"),
        bn("width_axis", "bn_output"),
        groups=groups, block=block, interpret=interpret)
    x = xr.reshape(b, h, w, c)

    xr = jnp.transpose(x, (0, 2, 1, 3)).reshape(b * w, h, c)
    xr = axial_attention_eval(
        xr, params["height_axis"]["qkv_weight"],
        bn("height_axis", "bn_qkv"), bn("height_axis", "bn_similarity"),
        bn("height_axis", "bn_output"),
        groups=groups, block=block, interpret=interpret)
    return jnp.transpose(xr.reshape(b, w, h, c), (0, 2, 1, 3))
