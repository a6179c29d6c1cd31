"""Parity tests for the stage-fused train-path kernels.

ops/pallas/stage_fused.py runs (in interpret mode here) against its
plain-XLA reference and against the module path:

  * stage/join forward + full grad parity vs XLA autodiff of stage_ref,
    over every geometry the TCN uses (identity/causal3, mask, bias,
    stats emission);
  * the whole TCNStack with ``train_impl='fused'`` vs ``'xla'``:
    forward, updated batch_stats, and every parameter gradient.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wiflow_tpu.models.wiflow import TCNStack
from wiflow_tpu.ops.pallas.stage_fused import join, join_ref, stage, stage_ref

KEEP = 0.7


@pytest.mark.parametrize("seg,dil", [
    ("identity", 1), ("causal3", 2), ("sym3", 1),
    ("chunk3:2", 1), ("chunk1:2", 1),
])
@pytest.mark.parametrize("has_pro,has_mask,has_bias,emit", [
    (True, True, True, True),
    (False, False, False, True),
    (True, False, True, False),
])
def test_stage_matches_reference(seg, dil, has_pro, has_mask, has_bias,
                                 emit):
    rng = np.random.default_rng(0)
    ng, ci, co, t, nb = 2, 24, 16, 20, 8
    l = t * nb
    from wiflow_tpu.ops.pallas.stage_fused import _seg_info
    r_rows = _seg_info(seg)[0] * ci
    xb = jnp.asarray(rng.standard_normal((ng, ci, l)), jnp.float32)
    mm = jnp.asarray(rng.standard_normal(ci), jnp.float32) if has_pro else None
    s = jnp.asarray(rng.standard_normal(ci), jnp.float32) if has_pro else None
    tt = jnp.asarray(rng.standard_normal(ci), jnp.float32) if has_pro else None
    m = jnp.asarray(rng.random((ng, ci, l)) < KEEP) if has_mask else None
    w = jnp.asarray(rng.standard_normal((r_rows, co)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal(co), jnp.float32) if has_bias else None
    kw = dict(seg=seg, dil=dil, t=t, nb=nb, keep=KEEP, emit_stats=emit)

    o1, p1, q1 = stage(xb, mm, s, tt, m, w, b, interpret=True, **kw)
    o2, p2, q2 = stage_ref(xb, mm, s, tt, m, w, b, **kw)
    np.testing.assert_allclose(o1, o2, rtol=2e-5, atol=2e-5)
    if emit:
        np.testing.assert_allclose(p1, jnp.sum(p2, axis=0), rtol=1e-4,
                                   atol=1e-4)
        np.testing.assert_allclose(q1, jnp.sum(q2, axis=0), rtol=1e-4,
                                   atol=1e-4)

    l_out = l // _seg_info(seg)[1]
    gvec = jnp.asarray(rng.standard_normal((ng, co, l_out)) * .1, jnp.float32)
    pv = jnp.asarray(rng.standard_normal(co), jnp.float32)
    qv = jnp.asarray(rng.standard_normal(co) * .01, jnp.float32)

    def make_loss(fn, reduce_partials):
        def loss(xb, mm, s, tt, w, b):
            o, p, q = fn(xb, mm, s, tt, m, w, b, **kw)
            r = jnp.sum(o * gvec)
            if emit:
                if reduce_partials:
                    p, q = jnp.sum(p, axis=0), jnp.sum(q, axis=0)
                r = r + jnp.sum(p * pv) + jnp.sum(q * qv)
            return r
        return loss

    argn = tuple(i for i, a in enumerate((xb, mm, s, tt, w, b))
                 if a is not None)
    loss_k = make_loss(
        lambda *a, **k: stage(*a, interpret=True, **k), False)
    gk = jax.grad(loss_k, argn)(xb, mm, s, tt, w, b)
    gr = jax.grad(make_loss(stage_ref, True), argn)(xb, mm, s, tt, w, b)
    for a, e in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                   rtol=3e-4, atol=3e-4)


@pytest.mark.parametrize("has_mask", [True, False])
@pytest.mark.parametrize("has_rn", [True, False])
@pytest.mark.parametrize("act_h", [True, False])
def test_join_matches_reference(has_mask, has_rn, act_h):
    rng = np.random.default_rng(1)
    ng, c, t, nb = 2, 24, 20, 8
    l = t * nb
    hb = jnp.asarray(rng.standard_normal((ng, c, l)), jnp.float32)
    rb = jnp.asarray(rng.standard_normal((ng, c, l)), jnp.float32)
    mh, sh, th = (jnp.asarray(rng.standard_normal(c), jnp.float32)
                  for _ in range(3))
    m = jnp.asarray(rng.random((ng, c, l)) < KEEP) if has_mask else None
    mr = sr = tr = None
    if has_rn:
        mr, sr, tr = (jnp.asarray(rng.standard_normal(c), jnp.float32)
                      for _ in range(3))

    o1 = join(hb, mh, sh, th, m, rb, mr, sr, tr, keep=KEEP, interpret=True,
              act_h=act_h)
    o2 = join_ref(hb, mh, sh, th, m, rb, mr, sr, tr, keep=KEEP, act_h=act_h)
    np.testing.assert_allclose(o1, o2, rtol=2e-5, atol=2e-5)

    gvec = jnp.asarray(rng.standard_normal((ng, c, l)) * .1, jnp.float32)
    args = [a for a in (hb, mh, sh, th, rb, mr, sr, tr) if a is not None]

    def unpack(a):
        ai = iter(a)
        hb_, mh_, sh_, th_, rb_ = (next(ai) for _ in range(5))
        mr_ = next(ai) if has_rn else None
        sr_ = next(ai) if has_rn else None
        tr_ = next(ai) if has_rn else None
        return hb_, mh_, sh_, th_, rb_, mr_, sr_, tr_

    def lk(*a):
        hb_, mh_, sh_, th_, rb_, mr_, sr_, tr_ = unpack(a)
        return jnp.sum(join(hb_, mh_, sh_, th_, m, rb_, mr_, sr_, tr_,
                            keep=KEEP, interpret=True, act_h=act_h) * gvec)

    def lr(*a):
        hb_, mh_, sh_, th_, rb_, mr_, sr_, tr_ = unpack(a)
        return jnp.sum(join_ref(hb_, mh_, sh_, th_, m, rb_, mr_, sr_, tr_,
                                keep=KEEP, act_h=act_h) * gvec)

    gk = jax.grad(lk, tuple(range(len(args))))(*args)
    gr = jax.grad(lr, tuple(range(len(args))))(*args)
    for a, e in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                   rtol=3e-4, atol=3e-4)


@pytest.mark.slow
def test_fused_tcn_stack_matches_xla_path():
    """TCNStack(train_impl='fused') == 'xla': fwd, batch_stats, grads.

    Dropout rate 0 so both paths are deterministic (the fused path draws
    its masks at level scope, the module path inside TorchDropout — same
    marginal law, different streams)."""
    rng = np.random.default_rng(0)
    b, t, c0 = 16, 20, 60
    chans = (60, 40, 30)
    x = jnp.asarray(rng.standard_normal((b, t, c0)), jnp.float32)

    def make(impl):
        return TCNStack(num_inputs=c0, num_channels=chans, kernel_size=3,
                        groups=10, dropout=0.0, train_impl=impl)

    mx, mf = make("xla"), make("fused")
    v = mx.init({"params": jax.random.key(0)}, x, train=False)
    yx, sx = mx.apply(v, x, train=True, mutable=["batch_stats"])
    yf, sf = mf.apply(v, x, train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(yf, yx, rtol=2e-5, atol=2e-5)

    fx = {jax.tree_util.keystr(k): a for k, a in
          jax.tree_util.tree_leaves_with_path(sx["batch_stats"])}
    ff = {jax.tree_util.keystr(k): a for k, a in
          jax.tree_util.tree_leaves_with_path(sf["batch_stats"])}
    assert fx.keys() == ff.keys()
    for k in fx:
        np.testing.assert_allclose(ff[k], fx[k], rtol=1e-5, atol=1e-5,
                                   err_msg=k)

    gv = jnp.asarray(rng.standard_normal((b, t, chans[-1])) * 0.1,
                     jnp.float32)

    def loss(params, m):
        y, _ = m.apply({"params": params,
                        "batch_stats": v["batch_stats"]},
                       x, train=True, mutable=["batch_stats"])
        return jnp.sum(y * gv)

    gx = jax.grad(loss)(v["params"], mx)
    gf = {jax.tree_util.keystr(k): a for k, a in
          jax.tree_util.tree_leaves_with_path(jax.grad(loss)(v["params"],
                                                             mf))}
    for k, a in jax.tree_util.tree_leaves_with_path(gx):
        e = gf[jax.tree_util.keystr(k)]
        np.testing.assert_allclose(
            np.asarray(e), np.asarray(a), rtol=3e-4, atol=3e-4,
            err_msg=jax.tree_util.keystr(k))


def test_fused_tcn_dropout_masks_behave():
    """With dropout on, the fused path stays finite, differs per rng key,
    and is deterministic per key."""
    rng = np.random.default_rng(2)
    b, t, c0 = 16, 20, 40
    x = jnp.asarray(rng.standard_normal((b, t, c0)), jnp.float32)
    m = TCNStack(num_inputs=c0, num_channels=(40, 30), kernel_size=3,
                 groups=10, dropout=0.3, train_impl="fused")
    v = m.init({"params": jax.random.key(0), "dropout": jax.random.key(1)},
               x, train=False)

    def run(seed):
        y, _ = m.apply(v, x, train=True, mutable=["batch_stats"],
                       rngs={"dropout": jax.random.key(seed)})
        return y

    y1, y1b, y2 = run(1), run(1), run(2)
    assert bool(jnp.all(jnp.isfinite(y1)))
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y1b))
    assert float(jnp.max(jnp.abs(y1 - y2))) > 1e-4


@pytest.mark.slow
def test_fused_conv_stack_matches_xla_path():
    """WiFlowPoseModel with conv_train_impl='fused' == 'xla' (fwd,
    batch_stats, grads) at f32, conv_dropout 0.

    Conv biases feed straight into train-mode BN, so their true gradient
    is ~0 (the batch-mean shift cancels); the comparison uses an
    absolute floor to ignore that noise."""
    import functools
    from wiflow_tpu.core.config import ModelConfig
    from wiflow_tpu.models.wiflow import WiFlowPoseModel

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((8, 540, 20)), jnp.float32)
    mk = lambda impl: WiFlowPoseModel(ModelConfig(
        conv_train_impl=impl, conv_dropout=0.0, dropout=0.0,
        compute_dtype="float32"))
    mx, mf = mk("xla"), mk("fused")
    v = jax.jit(functools.partial(mx.init, train=False))(
        {"params": jax.random.key(0)}, x)

    @functools.partial(jax.jit, static_argnums=1)
    def fwd(v, which):
        m = mx if which == "xla" else mf
        return m.apply(v, x, train=True, mutable=["batch_stats"])

    yx, sx = fwd(v, "xla")
    yf, sf = fwd(v, "fused")
    np.testing.assert_allclose(np.asarray(yf), np.asarray(yx),
                               rtol=1e-4, atol=1e-4)
    fx = {jax.tree_util.keystr(k): a for k, a in
          jax.tree_util.tree_leaves_with_path(sx["batch_stats"])}
    ff = {jax.tree_util.keystr(k): a for k, a in
          jax.tree_util.tree_leaves_with_path(sf["batch_stats"])}
    assert fx.keys() == ff.keys()
    for k in fx:
        np.testing.assert_allclose(np.asarray(ff[k]), np.asarray(fx[k]),
                                   rtol=1e-4, atol=1e-4, err_msg=k)

    gv = jnp.asarray(rng.standard_normal((8, 15, 2)), jnp.float32)

    def loss(p, m):
        y, _ = m.apply({"params": p, "batch_stats": v["batch_stats"]}, x,
                       train=True, mutable=["batch_stats"])
        return jnp.sum(y * gv)

    gx = jax.grad(loss)(v["params"], mx)
    gf = {jax.tree_util.keystr(k): a for k, a in
          jax.tree_util.tree_leaves_with_path(jax.grad(loss)(v["params"],
                                                             mf))}
    for k, a in jax.tree_util.tree_leaves_with_path(gx):
        k = jax.tree_util.keystr(k)
        # block-sequential f32 accumulation vs XLA's tree reduce drifts
        # single elements ~1e-3 on heavy-cancellation reductions and the
        # noise amplifies back through upstream layers — compare in
        # relative L2 (a real math bug is orders of magnitude larger)
        a = np.asarray(a, np.float64)
        e = np.asarray(gf[k], np.float64)
        diff = np.linalg.norm(e - a)
        rel = diff / (np.linalg.norm(a) + 1e-4)
        assert rel < 2e-3 or diff < 1e-3, (k, rel, diff)


def test_fused_conv_stack_dropout2d_mask_structure():
    """With conv_dropout on, the fused path is finite and the Dropout2d
    law holds (mask shared per (sample, channel))."""
    import functools
    from wiflow_tpu.core.config import ModelConfig
    from wiflow_tpu.models.wiflow import WiFlowPoseModel

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((8, 60, 20)), jnp.float32)
    m = WiFlowPoseModel(ModelConfig(
        conv_train_impl="fused", tcn_train_impl="fused",
        num_subcarriers=60, tcn_channels=(60, 40),
        conv_channels=(8, 16, 32), num_keypoints=5))
    v = jax.jit(functools.partial(m.init, train=False))(
        {"params": jax.random.key(0)}, x)

    @jax.jit
    def run(seed):
        y, _ = m.apply(v, x, train=True, mutable=["batch_stats"],
                       rngs={"dropout": jax.random.key(seed)})
        return y

    y1, y1b, y2 = run(1), run(1), run(2)
    assert bool(jnp.all(jnp.isfinite(y1)))
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y1b))
    assert float(jnp.max(jnp.abs(y1.astype(jnp.float32)
                                 - y2.astype(jnp.float32)))) > 1e-4


def test_fused_full_model_small_matches_xla():
    """Default-batch integration parity at small scale: both fused paths
    (TCN + conv stack) vs XLA through the whole model — layout
    conversions, BN moments plumbing, join tails. The full-size variant
    (all chunk geometries) runs in the slow batch; the chunk kernels
    themselves are unit-tested above."""
    import functools
    from wiflow_tpu.core.config import ModelConfig
    from wiflow_tpu.models.wiflow import WiFlowPoseModel

    small = dict(num_subcarriers=60, window_size=20,
                 tcn_channels=(60, 40), conv_channels=(8, 16, 32),
                 num_keypoints=5, conv_dropout=0.0, dropout=0.0,
                 compute_dtype="float32")
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((8, 60, 20)), jnp.float32)
    mk = lambda impl: WiFlowPoseModel(ModelConfig(
        tcn_train_impl=impl, conv_train_impl=impl, **small))
    mx, mf = mk("xla"), mk("fused")
    v = jax.jit(functools.partial(mx.init, train=False))(
        {"params": jax.random.key(0)}, x)

    @functools.partial(jax.jit, static_argnums=1)
    def fwd(v, which):
        m = mx if which == "xla" else mf
        return m.apply(v, x, train=True, mutable=["batch_stats"])

    yx, sx = fwd(v, "xla")
    yf, sf = fwd(v, "fused")
    np.testing.assert_allclose(np.asarray(yf), np.asarray(yx),
                               rtol=1e-4, atol=1e-4)
    fx = {jax.tree_util.keystr(k): a for k, a in
          jax.tree_util.tree_leaves_with_path(sx["batch_stats"])}
    ff = {jax.tree_util.keystr(k): a for k, a in
          jax.tree_util.tree_leaves_with_path(sf["batch_stats"])}
    for k in fx:
        np.testing.assert_allclose(np.asarray(ff[k]), np.asarray(fx[k]),
                                   rtol=1e-4, atol=1e-4, err_msg=k)

    gv = jnp.asarray(rng.standard_normal((8, 5, 2)), jnp.float32)

    def loss(p, m):
        y, _ = m.apply({"params": p, "batch_stats": v["batch_stats"]}, x,
                       train=True, mutable=["batch_stats"])
        return jnp.sum(y * gv)

    gx = jax.jit(lambda p: jax.grad(loss)(p, mx))(v["params"])
    gf = {jax.tree_util.keystr(k): a for k, a in
          jax.tree_util.tree_leaves_with_path(
              jax.jit(lambda p: jax.grad(loss)(p, mf))(v["params"]))}
    for k, a in jax.tree_util.tree_leaves_with_path(gx):
        k = jax.tree_util.keystr(k)
        a = np.asarray(a, np.float64)
        e = np.asarray(gf[k], np.float64)
        diff = np.linalg.norm(e - a)
        rel = diff / (np.linalg.norm(a) + 1e-4)
        assert rel < 2e-3 or diff < 1e-3, (k, rel, diff)


@pytest.mark.slow
def test_fused_mmfi_model_matches_xla():
    """WiFlowMMFiModel fused-vs-xla parity (fwd, batch_stats, grads):
    distinct geometry from the trunk (T=10, w0=272 -> a cs=2 stride
    block followed by odd chunk counts)."""
    import dataclasses
    import functools
    from wiflow_tpu.models.wiflow_mmfi import MMFiModelConfig, WiFlowMMFiModel

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((8, 3, 114, 10)), jnp.float32)
    mk = lambda impl: WiFlowMMFiModel(dataclasses.replace(
        MMFiModelConfig(), tcn_train_impl=impl, conv_train_impl=impl,
        dropout=0.0, conv_dropout=0.0, compute_dtype="float32"))
    mx, mf = mk("xla"), mk("fused")
    v = jax.jit(functools.partial(mx.init, train=False))(
        {"params": jax.random.key(0)}, x)

    @functools.partial(jax.jit, static_argnums=1)
    def fwd(v, which):
        m = mx if which == "xla" else mf
        return m.apply(v, x, train=True, mutable=["batch_stats"])

    yx, sx = fwd(v, "xla")
    yf, sf = fwd(v, "fused")
    np.testing.assert_allclose(np.asarray(yf), np.asarray(yx),
                               rtol=2e-4, atol=2e-4)
    fx = {jax.tree_util.keystr(k): a for k, a in
          jax.tree_util.tree_leaves_with_path(sx["batch_stats"])}
    ff = {jax.tree_util.keystr(k): a for k, a in
          jax.tree_util.tree_leaves_with_path(sf["batch_stats"])}
    for k in fx:
        np.testing.assert_allclose(np.asarray(ff[k]), np.asarray(fx[k]),
                                   rtol=1e-4, atol=1e-4, err_msg=k)

    gv = jnp.asarray(rng.standard_normal(yx.shape), jnp.float32)

    def loss(p, m):
        y, _ = m.apply({"params": p, "batch_stats": v["batch_stats"]}, x,
                       train=True, mutable=["batch_stats"])
        return jnp.sum(y * gv)

    gx = jax.jit(lambda p: jax.grad(loss)(p, mx))(v["params"])
    gf = {jax.tree_util.keystr(k): a for k, a in
          jax.tree_util.tree_leaves_with_path(
              jax.jit(lambda p: jax.grad(loss)(p, mf))(v["params"]))}
    for k, a in jax.tree_util.tree_leaves_with_path(gx):
        k = jax.tree_util.keystr(k)
        a = np.asarray(a, np.float64)
        e = np.asarray(gf[k], np.float64)
        diff = np.linalg.norm(e - a)
        rel = diff / (np.linalg.norm(a) + 1e-4)
        assert rel < 2e-3 or diff < 1e-3, (k, rel, diff)


def test_dropout2d_mask_blocks_law():
    """The chunked-layout Dropout2d mask is constant per (sample,
    channel) across H rows, w_in_chunk rows, and chunk lanes — pinning
    the row-alignment assumption (lane r of block g = sample
    (g*nbv + r)//hh, b-major)."""
    from wiflow_tpu.models.wiflow import dropout2d_mask_blocks

    ng, nbv, hh, co, s_out, n_out = 3, 8, 4, 5, 2, 6
    keep = 0.6
    m = np.asarray(dropout2d_mask_blocks(
        jax.random.key(0), keep, ng, nbv, hh, co, s_out, n_out))
    assert m.shape == (ng, co * s_out, n_out * nbv)
    r_total = ng * nbv
    bsz = r_total // hh
    # reconstruct the per-(sample, channel) bit from one corner and
    # check EVERY (row, lane) agrees with it
    base = np.zeros((bsz, co), bool)
    for g in range(ng):
        for r in range(nbv):
            b = (g * nbv + r) // hh
            for c in range(co):
                base[b, c] = m[g, c * s_out, r]
    for g in range(ng):
        for r in range(nbv):
            b = (g * nbv + r) // hh
            for c in range(co):
                for s in range(s_out):
                    for n in range(n_out):
                        assert m[g, c * s_out + s, n * nbv + r] == \
                            base[b, c], (g, r, c, s, n)
    # and the marginal law is Bernoulli(keep)-ish
    frac = base.mean()
    assert 0.35 < frac < 0.85


def test_fused_conv_gate_decisions():
    """The shared engagement gate (models/wiflow.fused_conv_gate) —
    one decision point for both WiFlowPoseModel and WiFlowMMFiModel."""
    from wiflow_tpu.models.wiflow import fused_conv_gate

    kw = dict(conv_channels=(64, 32, 16), w0=64)
    # 'xla' or eval mode: always off
    assert fused_conv_gate(train=True, impl="xla", r_rows=128, **kw) is None
    assert fused_conv_gate(train=False, impl="fused", r_rows=128, **kw) is None
    # 'auto' only engages on a TPU backend (tests run on CPU)
    assert fused_conv_gate(train=True, impl="auto", r_rows=128, **kw) is None
    # 'fused' engages anywhere (interpret=True off-TPU), picking the
    # largest row block that tiles r_rows
    got = fused_conv_gate(train=True, impl="fused", r_rows=128, **kw)
    assert got is not None
    dplans, nbv, interp = got
    assert nbv == 64 and interp is True and dplans is not None
    assert fused_conv_gate(train=True, impl="fused", r_rows=48, **kw)[1] == 16
    # rows that no block size tiles: fall back to the unfused path
    assert fused_conv_gate(train=True, impl="fused", r_rows=7, **kw) is None
    # width chains the chunk schedule can't tile: fall back too
    assert fused_conv_gate(train=True, impl="fused", r_rows=128,
                           conv_channels=(64, 32, 16), w0=63) is None
