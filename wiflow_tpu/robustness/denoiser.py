"""Stacked denoising autoencoders for CSI (HPE-Li robustness pipeline).

Rebuild of ref /root/reference/cross_dataset_test/HPE-Li/model/
HPE_{one..five}_denoiser.py and denoiser_training.py: a greedy stack of
conv autoencoder stages.  Stage 1 maps the raw CSI (3 channels) to a
16-channel half-resolution code; later stages (conv 3x3 + BN + ReLU +
maxpool encoders with transposed-conv decoders) refine deeper codes.
Denoiser-HPE models prepend the frozen encoder stack to an SK-conv pose
head.

Training (``train_denoiser_stage``): MSE reconstruction of the *clean*
input from salt-&-pepper/AWGN-corrupted input (ref denoiser_training.py),
stage-by-stage with earlier encoders frozen.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn

from wiflow_tpu.models.baselines.hpeli import conv2d
from wiflow_tpu.models.layers import TorchBatchNorm

# per-stage (in_ch, out_ch, pool) mirroring OneStageAE..FiveStageAE
STAGE_CHANNELS = ((3, 16), (16, 32), (32, 64), (64, 64), (64, 64))


class AEStage(nn.Module):
    """One encoder/decoder stage: conv+BN+ReLU+maxpool // convT x2."""

    cin: int
    cout: int

    @nn.compact
    def encode(self, x: jax.Array, *, train: bool) -> jax.Array:
        w = self.param("enc_weight", nn.initializers.he_normal(),
                       (3, 3, self.cin, self.cout))
        b = self.param("enc_bias", nn.initializers.zeros, (self.cout,))
        y = conv2d(x, w, b)
        y = TorchBatchNorm(self.cout, name="enc_bn")(y, train=train)
        y = nn.relu(y)
        return nn.max_pool(y, (2, 2), strides=(2, 2))

    @nn.compact
    def decode(self, z: jax.Array, *, train: bool) -> jax.Array:
        w1 = self.param("dec_weight1", nn.initializers.he_normal(),
                        (2, 2, z.shape[-1], z.shape[-1]))
        b1 = self.param("dec_bias1", nn.initializers.zeros, (z.shape[-1],))
        y = jax.lax.conv_transpose(
            z, w1.astype(z.dtype), strides=(2, 2), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + b1
        y = TorchBatchNorm(z.shape[-1], name="dec_bn")(y, train=train)
        y = nn.relu(y)
        w2 = self.param("dec_weight2", nn.initializers.he_normal(),
                        (3, 3, z.shape[-1], self.cin))
        b2 = self.param("dec_bias2", nn.initializers.zeros, (self.cin,))
        return conv2d(y, w2, b2)

    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        return self.decode(self.encode(x, train=train), train=train)


class StackedDenoisingAE(nn.Module):
    """``num_stages`` greedy AE stages; ``encode`` runs the full stack."""

    num_stages: int = 1

    def setup(self):
        self.stages = [AEStage(*STAGE_CHANNELS[i], name=f"stage_{i}")
                       for i in range(self.num_stages)]

    def encode(self, x: jax.Array, *, train: bool = False,
               upto: Optional[int] = None) -> jax.Array:
        for stage in self.stages[:upto]:
            x = stage.encode(x, train=train)
        return x

    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        """Greedy-stack forward: encode through the frozen prefix, then
        autoencode with the last stage.  Output lives in the PREVIOUS
        stage's code space (raw input space for a 1-stage model) — exactly
        the reference's ``getProcessingInput`` training target
        (denoiser_training.py mode 1)."""
        code_in = self.encode(x, train=train, upto=self.num_stages - 1)
        last = self.stages[-1]
        return last.decode(last.encode(code_in, train=train), train=train)

    def reconstruction_pair(self, noisy: jax.Array, clean: jax.Array,
                            *, train: bool = False):
        """(reconstruction of noisy, target code of clean) for training."""
        target = self.encode(clean, train=False, upto=self.num_stages - 1)
        return self(noisy, train=train), target


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
    verbose: bool = False,
):
    """Greedy training of stage ``num_stages`` on NHWC ``clean`` data.

    ``noise_fn(x, key) -> corrupted`` is applied on-device per batch.
    Earlier stages' params are copied from ``prev_variables`` and frozen
    (zero LR via masking).  Returns the new variables.
    """
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
        noisy = noise_fn(xb, key)

        def loss_fn(p):
            (out, target), mut = model.apply(
                {"params": p, "batch_stats": stats}, noisy, xb, train=True,
                mutable=["batch_stats"],
                method=StackedDenoisingAE.reconstruction_pair)
            return jnp.mean((out - target) ** 2), mut["batch_stats"]

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
    """Pose model with a (pretrained, frozen) denoising-encoder front end.

    Rebuild of ref cross_dataset_test/HPE-Li/model/HPE_{one..five}_
    denoiser.py::*LayerDenoiserHPE: the stacked-AE encoder cleans the CSI,
    then SK units + an MLP head regress the pose.  Load pretrained AE
    stages by merging ``train_denoiser_stage`` variables into this model's
    ``denoiser`` subtree and freeze them with ``frozen_denoiser_labels``.
    """

    num_stages: int = 1
    num_keypoints: int = 17
    keypoint_dims: int = 2
    compute_dtype: str = "bfloat16"

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        from wiflow_tpu.models.baselines.hpeli import SKUnit
        from wiflow_tpu.models.layers import TorchBatchNorm

        b = x.shape[0]
        x = x.astype(jnp.dtype(self.compute_dtype))
        x = jnp.transpose(x, (0, 2, 3, 1))            # NHWC [B, S, T, A]
        ae = StackedDenoisingAE(self.num_stages, name="denoiser")
        code = ae.encode(x, train=False)              # frozen: eval stats

        y = SKUnit(64, 64, m=2, name="skunit1")(code, train=train)
        y = nn.avg_pool(y, (2, 2), strides=(2, 2))
        y = SKUnit(128, 128, m=2, name="skunit2")(y, train=train)
        y = jnp.transpose(y, (0, 3, 1, 2)).reshape(b, -1)
        wl = self.param("head_weight", nn.initializers.xavier_normal(),
                        (y.shape[-1], self.num_keypoints * self.keypoint_dims))
        bl = self.param("head_bias", nn.initializers.zeros,
                        (self.num_keypoints * self.keypoint_dims,))
        y = y @ wl.astype(y.dtype) + bl
        return y.reshape(b, self.num_keypoints,
                         self.keypoint_dims).astype(jnp.float32)


def frozen_denoiser_labels(params) -> dict:
    """optax.multi_transform labels freezing the ``denoiser`` subtree."""
    return {k: ("freeze" if k == "denoiser" else "train") for k in params}
