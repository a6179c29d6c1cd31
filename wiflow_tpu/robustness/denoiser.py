"""Stacked denoising autoencoders for CSI (HPE-Li robustness pipeline).

Rebuild of ref /root/reference/cross_dataset_test/HPE-Li/model/
HPE_{one..five}_denoiser.py and denoiser_training.py: a greedy stack of
conv autoencoder stages with reference-exact shapes —

  stage 1: 3->16  conv3x3+BN+ReLU+maxpool2   (HPE_one_denoiser.py:16-21)
  stage 2: 16->32 conv3x3+BN+ReLU+maxpool2   (HPE_two_denoiser.py:17-22)
  stage 3: 32->32 conv3x3+BN+ReLU+maxpool2   (HPE_three_denoiser.py:18-21)
  stage 4: 32->64 conv3x3+BN+ReLU (no pool)  (HPE_four_denoiser.py:17-19)
  stage 5: 64->64 conv3x3+BN+ReLU (no pool)  (HPE_five_denoiser.py:16-20)

Decoders: ConvTranspose2d(cout,cout,2,2) + BN + ReLU +
ConvTranspose2d(cout,cin,3,1,1); stages >= 2 bilinear-resize the decoded
map back to the stage-input size (F.interpolate align_corners=False).

Training quirk mirrored (denoiser_training.py:61-82): the reconstruction
TARGET is the *noisy* input itself — `csi_data` is reassigned to the
corrupted tensor before `criterion(reconstructed, csi_data)` — so the
"denoising" AE is actually trained as a plain autoencoder of corrupted
codes.  ``train_denoiser_stage(target='clean')`` opts into the true
denoising objective instead.

Denoiser-HPE models prepend the pretrained encoder stack to an SK-conv
pose head and are trained END-TO-END like the reference (main.py:65-67
optimizes all metafi.parameters(); HPE-Li has no requires_grad=False).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn

from wiflow_tpu.models.baselines.hpeli import conv2d
from wiflow_tpu.models.layers import (
    TorchBatchNorm, torch_bias_default, torch_conv_default,
)

# per-stage (cin, cout, maxpool) — see module docstring for citations
STAGE_CHANNELS: Tuple[Tuple[int, int, bool], ...] = (
    (3, 16, True), (16, 32, True), (32, 32, True),
    (32, 64, False), (64, 64, False),
)


def conv_transpose2d_nhwc(x: jax.Array, w_torch: jax.Array,
                          b: Optional[jax.Array] = None, *, stride: int = 1,
                          padding: int = 0) -> jax.Array:
    """torch ``ConvTranspose2d`` on NHWC input.

    ``w_torch`` keeps the torch layout ``[cin, cout, kh, kw]``; the op is
    the fractionally-strided conv identity: dilate the input by ``stride``,
    pad ``k-1-padding``, correlate with the spatially-flipped kernel.
    """
    k = w_torch.shape[2]
    w = jnp.flip(w_torch, (2, 3)).transpose(2, 3, 0, 1)   # [kh, kw, ci, co]
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(1, 1),
        padding=[(k - 1 - padding, k - 1 - padding)] * 2,
        lhs_dilation=(stride, stride),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


class AEStage(nn.Module):
    """One reference AE stage (encoder + decoder), NHWC."""

    cin: int
    cout: int
    pool: bool = True
    # stages >= 2 resize the decoded map back to the input size
    # (F.interpolate bilinear align_corners=False, e.g.
    # HPE_five_denoiser.py:38); stage 1 has no resize.
    resize_decode: bool = True

    @nn.compact
    def encode(self, x: jax.Array, *, train: bool) -> jax.Array:
        w = self.param("enc_weight", torch_conv_default(self.cin * 9),
                       (3, 3, self.cin, self.cout))
        b = self.param("enc_bias", torch_bias_default(self.cin * 9),
                       (self.cout,))
        y = conv2d(x, w, b)
        y = TorchBatchNorm(self.cout, name="enc_bn")(y, train=train)
        y = nn.relu(y)
        if self.pool:
            y = nn.max_pool(y, (2, 2), strides=(2, 2))
        return y

    @nn.compact
    def decode(self, z: jax.Array, *, train: bool,
               out_hw: Optional[Tuple[int, int]] = None) -> jax.Array:
        # torch ConvTranspose2d fan quirk: fan_in is computed from
        # weight.size(1) (= cout) regardless of the transpose direction
        w1 = self.param("dec1_weight", torch_conv_default(self.cout * 4),
                        (self.cout, self.cout, 2, 2))
        b1 = self.param("dec1_bias", torch_bias_default(self.cout * 4),
                        (self.cout,))
        y = conv_transpose2d_nhwc(z, w1, b1, stride=2, padding=0)
        y = TorchBatchNorm(self.cout, name="dec_bn")(y, train=train)
        y = nn.relu(y)
        w2 = self.param("dec2_weight", torch_conv_default(self.cin * 9),
                        (self.cout, self.cin, 3, 3))
        b2 = self.param("dec2_bias", torch_bias_default(self.cin * 9),
                        (self.cin,))
        y = conv_transpose2d_nhwc(y, w2, b2, stride=1, padding=1)
        if self.resize_decode and out_hw is not None:
            b_, _, _, c = y.shape
            y = jax.image.resize(y, (b_, out_hw[0], out_hw[1], c),
                                 method="bilinear", antialias=False)
        return y

    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        return self.decode(self.encode(x, train=train), train=train,
                           out_hw=x.shape[1:3])


class StackedDenoisingAE(nn.Module):
    """``num_stages`` greedy AE stages; ``encode`` runs the full stack
    (the ``getEncoder()`` chain of the reference AEs)."""

    num_stages: int = 1

    def setup(self):
        self.stages = [
            AEStage(cin, cout, pool=pool, resize_decode=(i > 0),
                    name=f"stage_{i}")
            for i, (cin, cout, pool) in
            enumerate(STAGE_CHANNELS[: self.num_stages])
        ]

    def encode(self, x: jax.Array, *, train: bool = False,
               upto: Optional[int] = None) -> jax.Array:
        for stage in self.stages[:upto]:
            x = stage.encode(x, train=train)
        return x

    def autoencode_last(self, code: jax.Array, *,
                        train: bool = False) -> jax.Array:
        """Run the LAST stage's encoder+decoder on a code tensor — the
        reference's ``model(csi_data)`` in denoiser_training.py:78 (the
        input there is already the frozen-prefix code)."""
        last = self.stages[-1]
        return last.decode(last.encode(code, train=train), train=train,
                           out_hw=code.shape[1:3])

    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        """Greedy-stack forward from RAW input: encode through the prefix,
        then autoencode with the last stage (output in the previous
        stage's code space; raw space for a 1-stage model)."""
        code_in = self.encode(x, train=train, upto=self.num_stages - 1)
        return self.autoencode_last(code_in, train=train)


def train_denoiser_stage(
    clean: np.ndarray,
    num_stages: int,
    noise_fn,
    prev_variables=None,
    *,
    epochs: int = 5,
    batch_size: int = 32,
    lr: float = 1e-3,
    seed: int = 0,
    target: str = "noisy",
    verbose: bool = False,
):
    """Greedy training of stage ``num_stages`` on NHWC ``clean`` data.

    ``noise_fn(x, key) -> corrupted`` is applied on-device per batch to
    the frozen-prefix CODE (the reference corrupts ``getProcessingInput``
    output, denoiser_training.py:63-70).  Earlier stages' params come
    from ``prev_variables`` and receive no gradients (the reference's
    prefix output is ``.detach()``-ed, :65).

    ``target='noisy'`` reproduces the reference loss exactly —
    ``criterion(reconstructed, csi_data)`` where ``csi_data`` IS the
    corrupted tensor (denoiser_training.py:78-82) — i.e. a plain AE of
    noisy codes.  ``target='clean'`` trains the true denoising objective.
    Returns the new variables.
    """
    if target not in ("noisy", "clean"):
        raise ValueError(f"target must be 'noisy' or 'clean', got {target!r}")
    model = StackedDenoisingAE(num_stages)
    x0 = jnp.asarray(clean[:1], jnp.float32)
    variables = model.init({"params": jax.random.key(seed)}, x0, train=False)
    params, stats = dict(variables["params"]), dict(variables["batch_stats"])
    if prev_variables is not None:
        for k, v in prev_variables["params"].items():
            params[k] = v
        for k, v in prev_variables["batch_stats"].items():
            stats[k] = v

    trainable = f"stage_{num_stages - 1}"
    labels = {k: ("train" if k == trainable else "freeze") for k in params}
    tx = optax.multi_transform(
        {"train": optax.adam(lr), "freeze": optax.set_to_zero()}, labels)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, stats, opt_state, xb, key):
        def loss_fn(p):
            v = {"params": p, "batch_stats": stats}
            # frozen prefix runs with eval stats (the reference runs it in
            # train mode, drifting the prefix BN stats while optimizing
            # nothing — a drift we deliberately do not replicate)
            code = model.apply(v, xb, train=False, upto=num_stages - 1,
                               method=StackedDenoisingAE.encode)
            noisy = noise_fn(code, key)
            out, mut = model.apply(v, noisy, train=True,
                                   mutable=["batch_stats"],
                                   method=StackedDenoisingAE.autoencode_last)
            tgt = noisy if target == "noisy" else code
            return jnp.mean((out - tgt) ** 2), mut["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_stats, opt_state, loss

    n = len(clean)
    data = jnp.asarray(clean, jnp.float32)
    key = jax.random.key(seed)
    rng = np.random.default_rng(seed)
    for epoch in range(epochs):
        order = rng.permutation(n)
        losses = []
        for i in range(0, n - batch_size + 1, batch_size):
            xb = jnp.take(data, jnp.asarray(order[i:i + batch_size]), axis=0)
            key, sub = jax.random.split(key)
            params, stats, opt_state, loss = step(params, stats, opt_state,
                                                  xb, sub)
            losses.append(float(loss))
        if verbose:
            print(f"[denoiser s{num_stages}] epoch {epoch + 1}: "
                  f"{np.mean(losses):.5f}")
    return {"params": params, "batch_stats": stats}


class DenoiserHPE(nn.Module):
    """Pose model with a pretrained denoising-encoder front end.

    Rebuild of ref cross_dataset_test/HPE-Li/model/HPE_{one..five}_
    denoiser.py::*LayerDenoiserHPE: the stacked-AE encoder cleans the CSI
    ([B, 3, 114, 10] NCHW), then two SKUnits (the caller's M=1/G=64 args
    are ignored — SKNet.py:139 hardcodes M=4/G=1/r=4) + a regression MLP
    (1792 -> 34) give [B, 17, 2].  AvgPool placement per variant: 1-stage
    pools after both SKUnits (HPE_one_denoiser.py:70,79), 2-stage only
    after the second (HPE_two_denoiser.py:85), 3+ stages never.

    Load pretrained AE stages by merging ``train_denoiser_stage``
    variables into this model's ``denoiser`` subtree.  The reference
    fine-tunes the encoder together with the head (main.py:65-67); pass
    ``frozen_params=('denoiser',)`` / ``frozen_denoiser_labels`` to opt
    into freezing instead.
    """

    num_stages: int = 1
    num_keypoints: int = 17
    keypoint_dims: int = 2
    compute_dtype: str = "bfloat16"

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        from wiflow_tpu.models.baselines.hpeli_zoo import (
            SKUnitSelective, avg_pool_nchw,
        )
        from wiflow_tpu.models.baselines.sknet_trans import RegressionHead

        b = x.shape[0]
        x = x.astype(jnp.dtype(self.compute_dtype))
        x = jnp.transpose(x, (0, 2, 3, 1))            # NHWC [B, S, T, A]
        ae = StackedDenoisingAE(self.num_stages, name="denoiser")
        code = ae.encode(x, train=train)   # fine-tuned end-to-end (ref)
        y = jnp.transpose(code, (0, 3, 1, 2))         # NCHW for the zoo

        y = SKUnitSelective(64, 64, name="skunit1")(y, train=train)
        if self.num_stages == 1:
            y = avg_pool_nchw(y, 2, 2)
        y = SKUnitSelective(128, 128, name="skunit2")(y, train=train)
        if self.num_stages <= 2:
            y = avg_pool_nchw(y, 2, 2)
        out = RegressionHead(self.num_keypoints * self.keypoint_dims, 32,
                             name="regression")(y, train=train)
        return out.reshape(b, self.num_keypoints,
                           self.keypoint_dims).astype(jnp.float32)


def frozen_denoiser_labels(params) -> dict:
    """optax.multi_transform labels freezing the ``denoiser`` subtree."""
    return {k: ("freeze" if k == "denoiser" else "train") for k in params}


# ---------------------------------------------------------------------------
# torch state_dict interop (torch_compat.Spec format)
# ---------------------------------------------------------------------------

def _encoder_stage_prefix(num_stages: int, i: int) -> str:
    """torch key prefix of stage ``i`` (1-indexed) inside the nested
    ``getEncoder()`` Sequential chain: stage n's getEncoder() is
    Sequential(pre_encoder, encoder), recursively, and stage 1's is
    Sequential(encoder)."""
    tail = ".0" if i == 1 else ".1"
    return "encoder" + ".0" * (num_stages - i) + tail


def denoiser_encoder_specs(num_stages: int, torch_root: str = "",
                           flax_root: Tuple[str, ...] = ("denoiser",)):
    """Specs for the (encoder-only) AE chain as embedded in a
    *LayerDenoiserHPE checkpoint."""
    from wiflow_tpu.models.baselines.hpeli_zoo import _hwio, _hwio_inv
    from wiflow_tpu.models.torch_compat import _bn_specs, _ident

    s: List = []
    for i in range(1, num_stages + 1):
        tp = torch_root + _encoder_stage_prefix(num_stages, i)
        fp = flax_root + (f"stage_{i - 1}",)
        s.append((f"{tp}.0.weight", "params", fp + ("enc_weight",),
                  _hwio, _hwio_inv))
        s.append((f"{tp}.0.bias", "params", fp + ("enc_bias",),
                  _ident, _ident))
        s += _bn_specs(f"{tp}.1", fp + ("enc_bn",))
    return s


def ae_stage_specs(flax_prefix: Tuple[str, ...] = (),
                   torch_root: str = ""):
    """Specs for one standalone *StageAE torch module (its OWN encoder +
    decoder; the nested ``pre_encoder`` keys are left unmapped)."""
    from wiflow_tpu.models.baselines.hpeli_zoo import _hwio, _hwio_inv
    from wiflow_tpu.models.torch_compat import _bn_specs, _ident

    fp = flax_prefix
    s: List = [
        (f"{torch_root}encoder.0.weight", "params", fp + ("enc_weight",),
         _hwio, _hwio_inv),
        (f"{torch_root}encoder.0.bias", "params", fp + ("enc_bias",),
         _ident, _ident),
    ]
    s += _bn_specs(f"{torch_root}encoder.1", fp + ("enc_bn",))
    # decoder weights stay in the torch ConvTranspose2d [cin, cout, kh, kw]
    # layout on the flax side — identity transforms
    s.append((f"{torch_root}decoder.0.weight", "params",
              fp + ("dec1_weight",), _ident, _ident))
    s.append((f"{torch_root}decoder.0.bias", "params",
              fp + ("dec1_bias",), _ident, _ident))
    s += _bn_specs(f"{torch_root}decoder.1", fp + ("dec_bn",))
    s.append((f"{torch_root}decoder.3.weight", "params",
              fp + ("dec2_weight",), _ident, _ident))
    s.append((f"{torch_root}decoder.3.bias", "params",
              fp + ("dec2_bias",), _ident, _ident))
    return s


def denoiser_hpe_spec(num_stages: int):
    """Full *LayerDenoiserHPE state_dict spec."""
    from wiflow_tpu.models.baselines.hpeli_zoo import (
        regression_spec, sk_unit_selective_spec,
    )
    return (denoiser_encoder_specs(num_stages)
            + sk_unit_selective_spec("skunit1", ("skunit1",))
            + sk_unit_selective_spec("skunit2", ("skunit2",))
            + regression_spec("regression", ("regression",)))
