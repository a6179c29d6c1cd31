"""HPE-Li sub-project model zoo: attention variants, MultiAxisAttention,
DSKNetTrans ablation models, MLP regression head.

Rebuilds of ref /root/reference/cross_dataset_test/HPE-Li/model/:
  * utils/utils.py:5-118 — Self/ScaledDotProduct/MultiHead/Additive/
    GlobalContext attention (the DSKNetTrans ablation zoo),
  * utils/transformer_based_encoder.py:4-84 — MultiAxisAttention:
    channel-axis + frequency-axis TransformerEncoder stacks, summed,
  * utils/regression.py:15-37 — 3-layer MLP head with BN,
  * sknet_trans_mmfi.py:156-252 / sknet_trans_wipose.py:156-251 —
    DSKNetTrans: 2 SKUnits + regression to 17x2 (MM-Fi) / 18x2 (WiPose).
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from wiflow_tpu.models.baselines.hpeli import SKUnit, conv2d
from wiflow_tpu.models.layers import TorchBatchNorm, TorchDropout


class SelfAttention(nn.Module):
    """Q/K/V linear + scaled dot-product over tokens (utils.py:5-25).
    (The reference's SelfAttention and ScaledDotProductAttention differ
    only in which tensor's dim scales the logits.)"""

    input_dim: int
    scale_by_query: bool = False     # True == ScaledDotProductAttention

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        q = nn.Dense(self.input_dim, name="query")(x)
        k = nn.Dense(self.input_dim, name="key")(x)
        v = nn.Dense(self.input_dim, name="value")(x)
        d = q.shape[-1] if self.scale_by_query else x.shape[-1]
        scores = jnp.einsum("...nd,...md->...nm", q, k) / math.sqrt(d)
        return jnp.einsum("...nm,...md->...nd",
                          jax.nn.softmax(scores, axis=-1), v)


class MultiHeadAttention(nn.Module):
    """utils.py:49-73."""

    input_dim: int
    num_heads: int = 4

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b = x.shape[0]
        hd = self.input_dim // self.num_heads
        def split(name):
            y = nn.Dense(self.input_dim, name=name)(x)
            return y.reshape(b, -1, self.num_heads, hd).transpose(0, 2, 1, 3)
        q, k, v = split("query"), split("key"), split("value")
        scores = jnp.einsum("bhnd,bhmd->bhnm", q, k) / math.sqrt(hd)
        out = jnp.einsum("bhnm,bhmd->bhnd", jax.nn.softmax(scores, -1), v)
        out = out.transpose(0, 2, 1, 3).reshape(b, -1, self.input_dim)
        return nn.Dense(self.input_dim, name="fc_out")(out)


class AdditiveAttention(nn.Module):
    """utils.py:75-96: tanh(QK^T) v scoring over tokens."""

    input_dim: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        q = nn.Dense(self.input_dim, name="query")(x)
        k = nn.Dense(self.input_dim, name="key")(x)
        vvec = self.param("v", nn.initializers.uniform(1.0),
                          (self.input_dim,))
        scores = jnp.tanh(jnp.einsum("...nd,...md->...nm", q, k))
        scores = jnp.einsum("...nm,m->...n", scores, vvec)
        w = jax.nn.softmax(scores, axis=-1)
        return jnp.einsum("...n,...nd->...d", w, x)[..., None, :] * \
            jnp.ones_like(x)


class GlobalContextAttention(nn.Module):
    """utils.py:98-118: unscaled dot-product attention."""

    input_dim: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        q = nn.Dense(self.input_dim, name="query")(x)
        k = nn.Dense(self.input_dim, name="key")(x)
        v = nn.Dense(self.input_dim, name="value")(x)
        scores = jnp.einsum("...nd,...md->...nm", q, k)
        return jnp.einsum("...nm,...md->...nd",
                          jax.nn.softmax(scores, axis=-1), v)


class TransformerEncoderLayer(nn.Module):
    """torch ``nn.TransformerEncoderLayer`` (post-norm variant)."""

    d_model: int
    nhead: int
    dim_feedforward: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        y = MultiHeadAttention(self.d_model, self.nhead, name="self_attn")(x)
        y = TorchDropout(self.dropout, name="drop1")(y, train=train)
        x = nn.LayerNorm(name="norm1")(x + y)
        y = nn.Dense(self.dim_feedforward, name="linear1")(x)
        y = nn.relu(y)
        y = TorchDropout(self.dropout, name="drop_ff")(y, train=train)
        y = nn.Dense(self.d_model, name="linear2")(y)
        y = TorchDropout(self.dropout, name="drop2")(y, train=train)
        return nn.LayerNorm(name="norm2")(x + y)


class MultiAxisAttention(nn.Module):
    """Channel-axis + frequency-axis transformer encoders, summed
    (transformer_based_encoder.py:4-84).  Input NHWC [B, F, T, C]."""

    embed_dim: int
    num_heads: int = 4
    depth: int = 2
    dim_feedforward: int = 256
    reduction_factor: int = 2
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        b, f, t, c = x.shape
        w = self.param("expand_weight", nn.initializers.he_normal(),
                       (1, 1, c, self.embed_dim))
        x = conv2d(x, w)
        x = TorchBatchNorm(self.embed_dim, name="expand_bn")(x, train=train)
        x = nn.relu(x)                                  # [B, F, T, E]

        # channel attention: tokens = (f, t) positions, features = E
        xc = x.reshape(b, f * t, self.embed_dim)
        for i in range(self.depth):
            xc = TransformerEncoderLayer(
                self.embed_dim, self.num_heads, self.dim_feedforward,
                self.dropout, name=f"channel_att_{i}")(xc, train=train)
        xc = xc.reshape(b, f, t, self.embed_dim)

        # frequency attention: tokens = frequency bins
        xf = jnp.transpose(x, (0, 2, 1, 3)).reshape(b * t, f, self.embed_dim)
        for i in range(self.depth):
            xf = TransformerEncoderLayer(
                self.embed_dim, self.num_heads, self.dim_feedforward,
                self.dropout, name=f"freq_att_{i}")(xf, train=train)
        xf = jnp.transpose(xf.reshape(b, t, f, self.embed_dim), (0, 2, 1, 3))

        out = xc + xf
        wr = self.param("reduce_weight", nn.initializers.he_normal(),
                        (3, 1, self.embed_dim, self.embed_dim))
        out = conv2d(out, wr)
        out = TorchBatchNorm(self.embed_dim, name="reduce_bn")(out,
                                                               train=train)
        out = nn.relu(out)
        f_red = self.embed_dim // self.reduction_factor
        out = jax.image.resize(out, (b, f_red, t, self.embed_dim), "linear")
        return nn.Dense(self.embed_dim, name="fc")(out)


class RegressionHead(nn.Module):
    """3-layer MLP with BN + dropout (regression.py:15-37)."""

    output_dim: int
    hidden_dim: int = 32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        x = x.reshape(x.shape[0], -1)
        x = nn.relu(nn.Dense(self.hidden_dim, name="fc1")(x))
        x = TorchDropout(0.1, name="drop1")(x, train=train)
        x = nn.Dense(self.hidden_dim * 2, name="fc2")(x)
        x = TorchBatchNorm(self.hidden_dim * 2, name="bn")(x, train=train)
        x = nn.relu(x)
        x = TorchDropout(0.1, name="drop2")(x, train=train)
        return nn.Dense(self.output_dim, name="fc3")(x)


class DSKNetTrans(nn.Module):
    """SKUnit x2 + regression (sknet_trans_mmfi.py:156-252).

    MM-Fi config: input [B, 3, 114, 10] -> [B, 17, 2]; WiPose config
    (``wipose=True``): input [B, 9, 30, 5] -> [B, 18, 2]
    (sknet_trans_wipose.py:156-251)."""

    num_keypoints: int = 17
    keypoint_dims: int = 2
    num_lay: int = 128
    hidden_reg: int = 32
    branches: int = 3
    compute_dtype: str = "bfloat16"

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        b = x.shape[0]
        x = x.astype(jnp.dtype(self.compute_dtype))
        x = jnp.transpose(x, (0, 2, 3, 1))              # NHWC
        x = SKUnit(self.num_lay, self.num_lay, m=self.branches,
                   name="skunit1")(x, train=train)
        x = TorchBatchNorm(self.num_lay, name="norm")(x, train=train)
        x = SKUnit(self.num_lay * 2, self.num_lay * 2, m=self.branches,
                   name="skunit2")(x, train=train)
        x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        x = jnp.transpose(x, (0, 3, 1, 2))              # NCHW flatten order
        out = RegressionHead(self.num_keypoints * self.keypoint_dims,
                             self.hidden_reg, name="regression")(
            x, train=train)
        return out.reshape(b, self.num_keypoints,
                           self.keypoint_dims).astype(jnp.float32)
