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
