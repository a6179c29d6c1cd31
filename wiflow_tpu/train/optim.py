"""Optimizer + schedule machinery with torch-matched semantics.

AdamW(lr, betas (0.9, 0.999), weight_decay 5e-5, decay on *all* params)
preceded by global-norm clipping at 1.0 — exactly the reference trainer
(ref: /root/reference/train.py:105-110, 234-235).  No GradScaler: bf16 on
TPU has fp32 dynamic range, so loss scaling is unnecessary (SURVEY §2.4).

``ReduceLROnPlateau`` replicates torch's scheduler including the rel
threshold mode, cooldown and eps gate (train.py:112-121 passes factor 0.5,
patience 3, threshold 1e-4, cooldown 1, min_lr lr/1000) — SURVEY §7 hard
part 5: small deltas here change the 50-epoch trajectory.

``EarlyStopping`` is the val-MPE strict-improvement counter of
train.py:361-384.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from wiflow_tpu.core.config import OptimConfig


def make_optimizer(cfg: OptimConfig,
                   frozen_subtrees: Optional[Tuple[str, ...]] = None
                   ) -> optax.GradientTransformation:
    """Optimizer per config: AdamW (trunk, train.py:105-110), plain Adam
    (WiSPPN, wisppn.py:953) or SGD (WPformer model.py:930-935 momentum .9;
    HPE-Li main.py:67 plain SGD — set ``cfg.momentum=0`` /
    ``cfg.grad_clip_norm=None`` for that recipe).

    ``frozen_subtrees``: top-level param-dict keys whose updates are
    zeroed — an *opt-in* capability of this rebuild (the reference trains
    its denoiser-HPE compositions end-to-end; no ``requires_grad=False``
    exists in HPE-Li).  The zero-mask is applied BEFORE global-norm
    clipping so frozen subtrees don't inflate the clipping norm.
    """
    if cfg.kind == "adamw":
        inner = optax.inject_hyperparams(optax.adamw)(
            learning_rate=cfg.lr, b1=cfg.betas[0], b2=cfg.betas[1],
            weight_decay=cfg.weight_decay)
    elif cfg.kind == "adam":
        inner = optax.inject_hyperparams(optax.adam)(
            learning_rate=cfg.lr, b1=cfg.betas[0], b2=cfg.betas[1])
    elif cfg.kind == "sgd":
        inner = optax.inject_hyperparams(optax.sgd)(
            learning_rate=cfg.lr, momentum=cfg.momentum)
    else:
        raise ValueError(f"unknown optimizer kind {cfg.kind!r}")
    parts = []
    if frozen_subtrees:
        frozen = tuple(frozen_subtrees)

        def mask(updates):
            return {k: jax.tree.map(lambda _: k in frozen, v)
                    for k, v in updates.items()}
        parts.append(optax.masked(optax.set_to_zero(), mask))
    if cfg.grad_clip_norm is not None and cfg.grad_clip_norm > 0:
        parts.append(optax.clip_by_global_norm(cfg.grad_clip_norm))
    parts.append(inner)
    return optax.chain(*parts)


def epoch_schedule_lr(cfg: OptimConfig, epoch: int) -> float:
    """Epoch-indexed LR schedules used by the baselines.

    'linear_decay': constant until ``decay_start``, then linear to 0 at
    ``decay_end`` (WPformer LambdaLR, ref model.py:936-942).
    'multistep': lr * gamma ** (#milestones passed) (WiSPPN MultiStepLR,
    ref wisppn.py:955).
    """
    if cfg.schedule == "linear_decay":
        if epoch <= cfg.decay_start:
            return cfg.lr
        span = max(cfg.decay_end - cfg.decay_start, 1)
        return cfg.lr * max(0.0, 1.0 - (epoch - cfg.decay_start) / span)
    if cfg.schedule == "multistep":
        k = sum(1 for m in cfg.milestones if epoch >= m)
        return cfg.lr * cfg.gamma ** k
    return cfg.lr


def _inject_index(opt_state: Tuple) -> int:
    for i, s in enumerate(opt_state):
        if hasattr(s, "hyperparams"):
            return i
    raise ValueError("no inject_hyperparams state in the optimizer chain")


def set_learning_rate(opt_state: Tuple, lr: float) -> Tuple:
    """Functionally update the injected learning rate (epoch boundary)."""
    i = _inject_index(opt_state)
    hp = dict(opt_state[i].hyperparams)
    hp["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return tuple(opt_state[:i]) + (opt_state[i]._replace(hyperparams=hp),) \
        + tuple(opt_state[i + 1:])


def get_learning_rate(opt_state: Tuple) -> float:
    return float(opt_state[_inject_index(opt_state)]
                 .hyperparams["learning_rate"])


@dataclasses.dataclass
class ReduceLROnPlateau:
    """torch ``ReduceLROnPlateau`` (threshold_mode='rel').

    ``mode='min'`` for the main trunk (val MPE, train.py:112-121);
    ``mode='max'`` for the MM-Fi variant (val PCK, wiflow.py:1225-1233).
    """

    lr: float
    factor: float = 0.5
    patience: int = 3
    threshold: float = 1e-4
    cooldown: int = 1
    min_lr: float = 0.0
    eps: float = 1e-8
    mode: str = "min"

    best: float = None
    num_bad_epochs: int = 0
    cooldown_counter: int = 0

    def __post_init__(self):
        if self.best is None:
            self.best = float("inf") if self.mode == "min" else float("-inf")

    @classmethod
    def from_config(cls, cfg: OptimConfig, mode: str = "min") -> "ReduceLROnPlateau":
        return cls(lr=cfg.lr, factor=cfg.plateau_factor,
                   patience=cfg.plateau_patience,
                   threshold=cfg.plateau_threshold,
                   cooldown=cfg.plateau_cooldown,
                   min_lr=cfg.lr * cfg.min_lr_ratio, mode=mode)

    def _is_better(self, metric: float) -> bool:
        if self.mode == "min":
            return metric < self.best * (1.0 - self.threshold)
        return metric > self.best * (1.0 + self.threshold)

    def step(self, metric: float) -> float:
        """Feed the epoch's val metric; returns the (possibly reduced) lr."""
        if self._is_better(metric):
            self.best = metric
            self.num_bad_epochs = 0
        else:
            self.num_bad_epochs += 1
        if self.cooldown_counter > 0:
            self.cooldown_counter -= 1
            self.num_bad_epochs = 0
        if self.num_bad_epochs > self.patience:
            new_lr = max(self.lr * self.factor, self.min_lr)
            if self.lr - new_lr > self.eps:
                self.lr = new_lr
            self.cooldown_counter = self.cooldown
            self.num_bad_epochs = 0
        return self.lr

    def state_dict(self) -> Dict[str, Any]:
        return {f.name: getattr(self, f.name)
                for f in dataclasses.fields(self)}

    def load_state_dict(self, state: Dict[str, Any]) -> None:
        for k, v in state.items():
            setattr(self, k, v)


@dataclasses.dataclass
class EarlyStopping:
    """Strict-improvement early stop (val MPE min, train.py:361-384;
    val PCK max in the MM-Fi variant, wiflow.py:1227-1247)."""

    patience: int = 5
    mode: str = "min"
    best: float = None
    counter: int = 0
    best_epoch: int = -1

    def __post_init__(self):
        if self.best is None:
            self.best = float("inf") if self.mode == "min" else float("-inf")

    def update(self, metric: float, epoch: int) -> bool:
        """Returns True when this epoch is a new best."""
        improved = (metric < self.best if self.mode == "min"
                    else metric > self.best)
        if improved:
            self.best = metric
            self.best_epoch = epoch
            self.counter = 0
            return True
        self.counter += 1
        return False

    @property
    def should_stop(self) -> bool:
        return self.counter >= self.patience

    def state_dict(self) -> Dict[str, Any]:
        return {f.name: getattr(self, f.name)
                for f in dataclasses.fields(self)}

    def load_state_dict(self, state: Dict[str, Any]) -> None:
        for k, v in state.items():
            setattr(self, k, v)
