"""Bidirectional torch-checkpoint compatibility for WiFlowPoseModel.

The reference trains with torch and stores ``best_pose_model.pth`` as a raw
``state_dict`` (ref: /root/reference/train.py:375-377).  This module maps
that state_dict onto our flax variable tree (and back), so users can bring
reference checkpoints to TPU or export TPU-trained weights for torch
tooling.  Only name reshuffling and layout transposes — no numerics.

Layout conventions (torch -> ours):
  grouped Conv1d  (Co, Ci/g, K)   -> (K, G, ci_g, co_g)
  pointwise Conv1d(Co, Ci, 1)     -> (Ci, Co)
  (1,3) Conv2d    (Co, Ci, 1, 3)  -> (3, Ci, Co)
  1x1  Conv2d     (Co, Ci, 1, 1)  -> (Ci, Co)
  3x3  Conv2d     (Co, Ci, 3, 3)  -> (3, 3, Ci, Co)   (HWIO)
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Tuple

import numpy as np

from wiflow_tpu.core.config import ModelConfig

Path = Tuple[str, ...]


def _grouped(w: np.ndarray, groups: int) -> np.ndarray:
    co, ci_g, k = w.shape
    co_g = co // groups
    return w.reshape(groups, co_g, ci_g, k).transpose(3, 0, 2, 1)


def _grouped_inv(w: np.ndarray) -> np.ndarray:
    k, g, ci_g, co_g = w.shape
    return w.transpose(1, 3, 2, 0).reshape(g * co_g, ci_g, k)


def _pw1d(w: np.ndarray) -> np.ndarray:
    return w[:, :, 0].T


def _pw1d_inv(w: np.ndarray) -> np.ndarray:
    return w.T[:, :, None]


def _conv1x3(w: np.ndarray) -> np.ndarray:
    return w[:, :, 0, :].transpose(2, 1, 0)


def _conv1x3_inv(w: np.ndarray) -> np.ndarray:
    return w.transpose(2, 1, 0)[:, :, None, :]


def _conv1x1(w: np.ndarray) -> np.ndarray:
    return w[:, :, 0, 0].T


def _conv1x1_inv(w: np.ndarray) -> np.ndarray:
    return w.T[:, :, None, None]


def _conv3x3(w: np.ndarray) -> np.ndarray:
    return w.transpose(2, 3, 1, 0)


def _conv3x3_inv(w: np.ndarray) -> np.ndarray:
    return w.transpose(3, 2, 0, 1)


def _ident(w: np.ndarray) -> np.ndarray:
    return w


# One entry per weight: (torch_key, collection, flax_path, fwd, inv)
Spec = Tuple[str, str, Path, Callable, Callable]


def _bn_specs(torch_prefix: str, flax_path: Path) -> List[Spec]:
    return [
        (f"{torch_prefix}.weight", "params", flax_path + ("weight",), _ident, _ident),
        (f"{torch_prefix}.bias", "params", flax_path + ("bias",), _ident, _ident),
        (f"{torch_prefix}.running_mean", "batch_stats",
         flax_path + ("running_mean",), _ident, _ident),
        (f"{torch_prefix}.running_var", "batch_stats",
         flax_path + ("running_var",), _ident, _ident),
    ]


def wiflow_spec(cfg: ModelConfig = ModelConfig()) -> List[Spec]:
    specs: List[Spec] = []
    g = cfg.tcn_groups

    n_in = cfg.num_subcarriers
    for i, n_out in enumerate(cfg.tcn_channels):
        tp = f"tcn.network.{i}"
        fp = ("tcn", f"network_{i}")
        grouped = lambda w, groups=g: _grouped(w, groups)  # noqa: E731
        specs += [
            (f"{tp}.conv1_group.weight", "params",
             fp + ("conv1_group_weight",), grouped, _grouped_inv),
            (f"{tp}.conv1_pw.weight", "params",
             fp + ("conv1_pw_weight",), _pw1d, _pw1d_inv),
            (f"{tp}.conv2_group.weight", "params",
             fp + ("conv2_group_weight",), grouped, _grouped_inv),
            (f"{tp}.conv2_pw.weight", "params",
             fp + ("conv2_pw_weight",), _pw1d, _pw1d_inv),
        ]
        specs += _bn_specs(f"{tp}.bn1_group", fp + ("bn1_group",))
        specs += _bn_specs(f"{tp}.bn1_pw", fp + ("bn1_pw",))
        specs += _bn_specs(f"{tp}.bn2_group", fp + ("bn2_group",))
        specs += _bn_specs(f"{tp}.bn2_pw", fp + ("bn2_pw",))
        if n_in != n_out:
            specs.append((f"{tp}.downsample.0.weight", "params",
                          fp + ("downsample_weight",), _pw1d, _pw1d_inv))
            specs += _bn_specs(f"{tp}.downsample.1", fp + ("downsample_bn",))
        n_in = n_out

    def conv_block(torch_prefix: str, flax_name: str) -> None:
        fp = (flax_name,)
        for idx, tidx in ((1, 0), (2, 4), (3, 8)):
            specs.append((f"{torch_prefix}.block.{tidx}.weight", "params",
                          fp + (f"conv{idx}_weight",), _conv1x3, _conv1x3_inv))
            specs.append((f"{torch_prefix}.block.{tidx}.bias", "params",
                          fp + (f"conv{idx}_bias",), _ident, _ident))
            specs.extend(_bn_specs(f"{torch_prefix}.block.{tidx + 1}",
                                   fp + (f"bn{idx}",)))
        specs.append((f"{torch_prefix}.downsample.0.weight", "params",
                      fp + ("downsample_weight",), _conv1x1, _conv1x1_inv))
        specs.extend(_bn_specs(f"{torch_prefix}.downsample.1",
                               fp + ("downsample_bn",)))

    conv_block("up", "up")
    for j in range(len(cfg.conv_channels)):
        conv_block(f"residual_blocks.{j}", f"residual_blocks_{j}")

    for axis in ("width_axis", "height_axis"):
        tp = f"attention.{axis}"
        fp = ("attention", axis)
        specs.append((f"{tp}.qkv_transform.weight", "params",
                      fp + ("qkv_weight",), _pw1d, _pw1d_inv))
        specs += _bn_specs(f"{tp}.bn_qkv", fp + ("bn_qkv",))
        specs += _bn_specs(f"{tp}.bn_similarity", fp + ("bn_similarity",))
        specs += _bn_specs(f"{tp}.bn_output", fp + ("bn_output",))

    specs += [
        ("decoder.0.weight", "params", ("decoder_conv1_weight",),
         _conv3x3, _conv3x3_inv),
        ("decoder.0.bias", "params", ("decoder_conv1_bias",), _ident, _ident),
        ("decoder.3.weight", "params", ("decoder_conv2_weight",),
         _conv1x1, _conv1x1_inv),
        ("decoder.3.bias", "params", ("decoder_conv2_bias",), _ident, _ident),
    ]
    specs += _bn_specs("decoder.1", ("decoder_bn1",))
    specs += _bn_specs("decoder.4", ("decoder_bn2",))
    return specs


def wiflow_mmfi_spec(cfg=None) -> List[Spec]:
    """Spec for the MM-Fi variant (ref cross_dataset_test/WiFlow/
    wiflow.py:441-530): 342-ch TCN groups 18, tcn_proj, `att` (not
    `attention`), final_conv head."""
    from wiflow_tpu.models.wiflow_mmfi import MMFiModelConfig
    cfg = cfg or MMFiModelConfig()
    specs: List[Spec] = []
    g = cfg.tcn_groups

    n_in = cfg.input_channels
    for i, n_out in enumerate(cfg.tcn_channels):
        tp = f"tcn.network.{i}"
        fp = ("tcn", f"network_{i}")
        grouped = lambda w, groups=g: _grouped(w, groups)  # noqa: E731
        specs += [
            (f"{tp}.conv1_group.weight", "params",
             fp + ("conv1_group_weight",), grouped, _grouped_inv),
            (f"{tp}.conv1_pw.weight", "params",
             fp + ("conv1_pw_weight",), _pw1d, _pw1d_inv),
            (f"{tp}.conv2_group.weight", "params",
             fp + ("conv2_group_weight",), grouped, _grouped_inv),
            (f"{tp}.conv2_pw.weight", "params",
             fp + ("conv2_pw_weight",), _pw1d, _pw1d_inv),
        ]
        for bn in ("bn1_group", "bn1_pw", "bn2_group", "bn2_pw"):
            specs += _bn_specs(f"{tp}.{bn}", fp + (bn,))
        if n_in != n_out:
            specs.append((f"{tp}.downsample.0.weight", "params",
                          fp + ("downsample_weight",), _pw1d, _pw1d_inv))
            specs += _bn_specs(f"{tp}.downsample.1", fp + ("downsample_bn",))
        n_in = n_out

    specs.append(("tcn_proj.0.weight", "params", ("tcn_proj_weight",),
                  _pw1d, _pw1d_inv))
    specs += _bn_specs("tcn_proj.1", ("tcn_proj_bn",))

    def conv_block(torch_prefix: str, flax_name: str) -> None:
        fp = (flax_name,)
        for idx, tidx in ((1, 0), (2, 4), (3, 8)):
            specs.append((f"{torch_prefix}.block.{tidx}.weight", "params",
                          fp + (f"conv{idx}_weight",), _conv1x3, _conv1x3_inv))
            specs.append((f"{torch_prefix}.block.{tidx}.bias", "params",
                          fp + (f"conv{idx}_bias",), _ident, _ident))
            specs.extend(_bn_specs(f"{torch_prefix}.block.{tidx + 1}",
                                   fp + (f"bn{idx}",)))
        specs.append((f"{torch_prefix}.downsample.0.weight", "params",
                      fp + ("downsample_weight",), _conv1x1, _conv1x1_inv))
        specs.extend(_bn_specs(f"{torch_prefix}.downsample.1",
                               fp + ("downsample_bn",)))

    conv_block("up", "up")
    for j in range(len(cfg.conv_channels)):
        conv_block(f"residual_blocks.{j}", f"residual_blocks_{j}")

    for axis in ("width_axis", "height_axis"):
        tp = f"att.{axis}"
        fp = ("attention", axis)
        specs.append((f"{tp}.qkv_transform.weight", "params",
                      fp + ("qkv_weight",), _pw1d, _pw1d_inv))
        specs += _bn_specs(f"{tp}.bn_qkv", fp + ("bn_qkv",))
        specs += _bn_specs(f"{tp}.bn_similarity", fp + ("bn_similarity",))
        specs += _bn_specs(f"{tp}.bn_output", fp + ("bn_output",))

    specs += [
        ("final_conv.0.weight", "params", ("final_conv1_weight",),
         _conv1x1, _conv1x1_inv),
        ("final_conv.0.bias", "params", ("final_conv1_bias",), _ident, _ident),
        ("final_conv.3.weight", "params", ("final_conv2_weight",),
         _conv1x1, _conv1x1_inv),
        ("final_conv.3.bias", "params", ("final_conv2_bias",), _ident, _ident),
    ]
    specs += _bn_specs("final_conv.1", ("final_bn",))
    return specs


def _set_path(tree: Dict[str, Any], path: Path, value: np.ndarray) -> None:
    node = tree
    for key in path[:-1]:
        node = node.setdefault(key, {})
    node[path[-1]] = value


def _get_path(tree: Dict[str, Any], path: Path) -> np.ndarray:
    node = tree
    for key in path:
        node = node[key]
    return node


def from_torch_state_dict(state_dict: Dict[str, Any],
                          cfg: ModelConfig = ModelConfig(),
                          spec: List[Spec] = None) -> Dict[str, Any]:
    """Convert a torch ``state_dict`` to flax ``{'params', 'batch_stats'}``."""
    # np.array(copy=True): torch buffers mutate in place during training, so
    # aliasing them here would silently corrupt the converted tree.
    arrays = {k: np.array(v.detach().cpu().numpy() if hasattr(v, "detach")
                          else v, np.float32, copy=True)
              for k, v in state_dict.items()}
    out: Dict[str, Any] = {"params": {}, "batch_stats": {}}
    missing = []
    for torch_key, coll, path, fwd, _ in (spec or wiflow_spec(cfg)):
        if torch_key not in arrays:
            missing.append(torch_key)
            continue
        _set_path(out[coll], path, fwd(arrays[torch_key]))
    if missing:
        raise KeyError(f"torch checkpoint is missing {len(missing)} keys, "
                       f"e.g. {missing[:5]}")
    return out


def to_torch_state_dict(variables: Dict[str, Any],
                        cfg: ModelConfig = ModelConfig(),
                        spec: List[Spec] = None) -> Dict[str, np.ndarray]:
    """Export flax variables to a torch-layout ``state_dict`` of numpy arrays."""
    out: Dict[str, np.ndarray] = {}
    for torch_key, coll, path, _, inv in (spec or wiflow_spec(cfg)):
        out[torch_key] = inv(np.asarray(_get_path(variables[coll], path),
                                        np.float32))
    return out
