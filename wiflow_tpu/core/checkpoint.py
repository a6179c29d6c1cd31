"""Checkpointing: best-model artifacts and full-resume bundles.

The reference has two disjoint mechanisms — a bare ``state_dict`` save of
the best model (ref: /root/reference/train.py:375-377) and a full resume
bundle only in the MM-Fi variant (cross_dataset_test/WiFlow/
wiflow.py:1253-1283).  Here both are first-class for every trainer:

  * ``save_best_model``: ``best_pose_model.msgpack`` (flax-native) and,
    when torch is importable, a drop-in ``best_pose_model.pth`` that the
    reference ecosystem can ``torch.load`` directly.
  * ``save_checkpoint``/``load_checkpoint``: everything needed for
    deterministic resume — train state (params, BN stats, optimizer),
    scheduler/early-stop state, history, epoch counter.
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Dict, Optional

import jax
import numpy as np
from flax import serialization


def _to_numpy(tree):
    # only device arrays need materializing; python scalars stay scalars
    # (np.asarray would turn history floats into 0-d ndarrays, which are
    # unhashable and poison the resumed history).
    #
    # Issue ALL device->host copies asynchronously FIRST (what
    # jax.device_get does): a synchronous per-leaf np.asarray costs one
    # device round trip per leaf, and a full resume bundle has ~1000
    # leaves (params + BN stats + Adam moments + best_variables) — on a
    # remote/tunneled TPU that latency, not bandwidth, dominated the
    # per-epoch wall clock of small-epoch demo runs (~12 s/epoch vs
    # 0.2 s of compute).  The async sweep pipelines the transfers.
    for x in jax.tree.leaves(tree):
        if isinstance(x, jax.Array):
            try:
                x.copy_to_host_async()
            except AttributeError:
                pass
    return jax.tree.map(
        lambda x: np.asarray(x) if isinstance(x, jax.Array) else x, tree)


def save_checkpoint(path: str, payload: Dict[str, Any]) -> None:
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(_to_numpy(payload), f, protocol=pickle.HIGHEST_PROTOCOL)
    os.replace(tmp, path)   # atomic: a crash never leaves a torn checkpoint


def load_checkpoint(path: str) -> Optional[Dict[str, Any]]:
    if not os.path.exists(path):
        return None
    with open(path, "rb") as f:
        return pickle.load(f)


def save_best_model(output_dir: str, variables: Dict[str, Any],
                    model_cfg=None, stem: str = "best_pose_model") -> None:
    os.makedirs(output_dir, exist_ok=True)
    variables = _to_numpy(variables)
    with open(os.path.join(output_dir, f"{stem}.msgpack"), "wb") as f:
        f.write(serialization.msgpack_serialize(
            {"params": variables["params"],
             "batch_stats": variables["batch_stats"]}))
    if model_cfg is not None:
        try:
            import torch

            from wiflow_tpu.models.torch_compat import to_torch_state_dict
            sd = {k: torch.from_numpy(np.ascontiguousarray(v).copy())
                  for k, v in to_torch_state_dict(variables, model_cfg).items()}
            torch.save(sd, os.path.join(output_dir, f"{stem}.pth"))
        except ImportError:
            pass
        except KeyError as e:
            # param tree doesn't match the reference architecture (e.g.
            # the encoder_kind='conv2d' ablation) — no torch analog
            # exists.  Warn instead of passing silently so a genuine
            # torch_compat spec regression is visible (loop.py already
            # gates export on encoder_kind, so this should never fire
            # for the flagship).
            print(f"[checkpoint] torch export skipped: missing key {e} "
                  f"in the param tree (no .pth written)")


def load_best_model(path: str) -> Dict[str, Any]:
    """Load ``best_pose_model.msgpack`` (or a ``.pth`` via torch_compat)."""
    if path.endswith(".pth"):
        import torch

        from wiflow_tpu.models.torch_compat import from_torch_state_dict
        return from_torch_state_dict(
            torch.load(path, map_location="cpu", weights_only=True))
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())
