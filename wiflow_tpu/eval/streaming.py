"""Continuous-stream pose inference over arbitrarily long CSI recordings.

The paper's titular capability — continuous pose estimation — is served
by sliding the 20-frame window over a CSI stream.  The reference has no
streaming path (its dataset pre-materializes windows); here the windowing
happens on device inside one jitted call, so a [T, 540] stream of any
length yields [T - W + 1, 15, 2] poses at full throughput (SURVEY.md §5
"long-context" row).

Windows are built as a gather view and processed in fixed-size batches via
``lax.map`` over the batch dimension — static shapes, no host round trips.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np


def sliding_windows(stream: jax.Array, window: int, stride: int = 1
                    ) -> jax.Array:
    """[T, S] -> [N, S, window] on-device windowing (gather-based)."""
    t = stream.shape[0]
    n = (t - window) // stride + 1
    starts = jnp.arange(n) * stride
    idx = starts[:, None] + jnp.arange(window)[None, :]   # [N, W]
    return jnp.transpose(stream[idx], (0, 2, 1))          # [N, S, W]


def make_stream_infer(apply_fn: Callable, window: int = 20,
                      stride: int = 1, batch: int = 1024):
    """Build ``infer(stream [T, S]) -> poses [N, K, D]``.

    ``apply_fn`` maps a [B, S, window] batch to keypoints (e.g. the
    BN-folded fast path with bound variables).  The stream is windowed on
    device and processed in ``batch``-sized chunks under one jit; the tail
    is padded to keep shapes static and sliced off afterwards.
    """

    @functools.partial(jax.jit, static_argnames=("n_real",))
    def infer_padded(stream, n_real: int):
        win = sliding_windows(stream, window, stride)
        n = win.shape[0]
        pad = (-n) % batch
        win = jnp.pad(win, ((0, pad), (0, 0), (0, 0)))
        chunks = win.reshape(-1, batch, *win.shape[1:])
        poses = jax.lax.map(apply_fn, chunks)
        return poses.reshape(-1, *poses.shape[2:])[:n_real]

    def infer(stream):
        stream = jnp.asarray(stream, jnp.float32)
        n_real = (stream.shape[0] - window) // stride + 1
        return infer_padded(stream, n_real)

    return infer
