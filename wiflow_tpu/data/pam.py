"""Pose-adjacency-matrix (PAM) labels for the WiSPPN-family baselines.

The reference baselines B1-B3 train against PAM ``.mat`` labels
(``keypoints_pam_data/wisppn_labels{1..5}/{file_id}_dual_cropped_frame_
{frame:06d}.mat``, key ``jointsMatrix`` [>=3, K, K]) with confidence-
weighted MSE (ref /root/reference/baseline/WiSPPN/wisppn.py:978-1000,
baseline/PerUnet/perunet.py:137-147).  Keypoints live on the PAM diagonal.

This module provides:
  * ``load_pam_mat``: .mat loader (scipy, h5py fallback for v7.3),
  * ``keypoints_to_pam``: construct PAM labels from plain keypoints
    (diagonal = coords, off-diagonal = pairwise midpoints, unit
    confidence) — used when the label directory is absent, so the PAM
    baselines run on any keypoint dataset including synthetic ones,
  * ``pam_confidence_mse``: the baselines' training loss,
  * ``pam_to_keypoints``: diagonal extraction for evaluation.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def load_pam_mat(path: str, key: str = "jointsMatrix") -> np.ndarray:
    """Load a PAM label matrix [C, K, K] from a .mat file."""
    try:
        import scipy.io as scio
        return np.asarray(scio.loadmat(path)[key], np.float32)
    except NotImplementedError:
        # MATLAB v7.3 files are HDF5
        import h5py
        with h5py.File(path, "r") as f:
            return np.asarray(f[key], np.float32).T


def keypoints_to_pam(kp: np.ndarray, confidence: float = 1.0) -> np.ndarray:
    """[N, K, C] keypoints -> [N, 2C, K, K] PAM labels (coords + conf)."""
    kp = np.asarray(kp, np.float32)
    n, k, c = kp.shape
    mid = 0.5 * (kp[:, :, None, :] + kp[:, None, :, :])     # [N, K, K, C]
    eye = np.eye(k, dtype=np.float32)[None, :, :, None]
    pam = mid * (1 - eye) + kp[:, :, None, :] * eye
    pam = np.transpose(pam, (0, 3, 1, 2))                   # [N, C, K, K]
    conf = np.full_like(pam, confidence)
    return np.concatenate([pam, conf], axis=1)


def pam_confidence_mse(pred: jax.Array, label: jax.Array):
    """Confidence-weighted MSE (ref wisppn.py:988-1000).

    ``pred`` [B, C, K, K]; ``label`` [B, >=C+1, K, K] with coords in the
    first C channels and confidence in the rest (a single confidence
    channel is broadcast across coords, mirroring wisppn.py:983-987).
    """
    c = pred.shape[1]
    xy = label[:, :c].astype(jnp.float32)
    conf = label[:, c:]
    if conf.shape[1] == 1:
        conf = jnp.repeat(conf, c, axis=1)
    conf = conf[:, :c].astype(jnp.float32)
    pred = pred.astype(jnp.float32)
    loss = jnp.mean((conf * pred - conf * xy) ** 2)
    return loss, {"position": loss, "bone": jnp.zeros((), jnp.float32)}


def pam_keypoint_mse(pred: jax.Array, label: jax.Array):
    """Confidence-weighted MSE on keypoints extracted from the PAM
    diagonal, for PAM-labeled KEYPOINT regressors (WPformer: the model
    outputs [B, K, D] keypoints; the reference extracts the diagonal
    coords + confidence from the [B, 3, K, K] label and weights the
    keypoint MSE — ref baseline/WPformer/model.py:504-525, 968-974).

    ``label`` [B, >=D+1, K, K]: coords in the first D channels,
    confidence in the rest (the reference's channel 2; a single
    confidence value broadcasts across coords, model.py:516,523).
    """
    d = pred.shape[-1]
    diag = jnp.diagonal(label, axis1=-2, axis2=-1)          # [B, C_l, K]
    kp = jnp.swapaxes(diag[:, :d], -1, -2).astype(jnp.float32)
    conf = jnp.swapaxes(diag[:, d:], -1, -2)[..., :1]       # [B, K, 1]
    conf = conf.astype(jnp.float32)
    pred = pred.astype(jnp.float32)
    loss = jnp.mean((conf * pred - conf * kp) ** 2)
    return loss, {"position": loss, "bone": jnp.zeros((), jnp.float32)}


def pam_diag_keypoints(pred: jax.Array, label: jax.Array):
    """(pred keypoints, PAM label) -> (pred kp, target kp): eval adapter
    for keypoint-output models trained on PAM labels (WPformer)."""
    d = pred.shape[-1]
    td = jnp.diagonal(label[:, :d], axis1=-2, axis2=-1)
    return pred, jnp.swapaxes(td, -1, -2)


def pam_train_kwargs(spec: dict) -> dict:
    """``train_pose_model`` kwargs for a baseline spec's label type:
    full-matrix confidence MSE for PAM-output models (WiSPPN/PerUnet,
    ref wisppn.py:978-1000) vs diagonal-keypoint confidence MSE for
    keypoint-output models (WPformer, ref model.py:968-974)."""
    if spec["labels"] != "pam":
        return {}
    if spec.get("pam_target") == "keypoints":
        return dict(loss_fn=pam_keypoint_mse,
                    to_keypoints=pam_diag_keypoints)
    return dict(loss_fn=pam_confidence_mse, to_keypoints=pam_to_keypoints)


def pam_to_keypoints(pred: jax.Array, label: jax.Array):
    """(pred PAM, PAM label) -> (pred kp, target kp) via diagonals."""
    c = pred.shape[1]
    pd = jnp.diagonal(pred, axis1=-2, axis2=-1)
    td = jnp.diagonal(label[:, :c], axis1=-2, axis2=-1)
    return jnp.swapaxes(pd, -1, -2), jnp.swapaxes(td, -1, -2)


def load_pam_labels_for_windows(
    pam_root: str, file_ids, window_to_file, window_to_frame,
    indices: np.ndarray, subject_dirs: Optional[Dict[str, str]] = None,
    num_keypoints: int = 15,
    file_subjects: Optional[Dict[str, int]] = None,
) -> np.ndarray:
    """Batch-load PAM labels following the reference's path convention
    ``{pam_root}/wisppn_labels{subject}/{file_id}_dual_cropped_frame_
    {frame:06d}.mat`` (ref baseline/PerUnet/perunet.py:137-147).

    The subject directory comes from ``file_subjects`` (explicit
    file-id -> subject mapping) when given, otherwise from
    ``splits.infer_subject`` on the file id (which raises rather than
    guessing when no subject tag is present)."""
    from wiflow_tpu.data.splits import infer_subject

    out = None
    for row, idx in enumerate(np.asarray(indices)):
        fid = file_ids[int(window_to_file[idx])]
        frame = int(window_to_frame[idx])
        subject = (file_subjects[fid] if file_subjects is not None
                   else infer_subject(fid))
        path = os.path.join(pam_root, f"wisppn_labels{subject}",
                            f"{fid}_dual_cropped_frame_{frame:06d}.mat")
        mat = load_pam_mat(path)
        if out is None:
            out = np.zeros((len(indices), *mat.shape), np.float32)
        out[row] = mat
    return out
