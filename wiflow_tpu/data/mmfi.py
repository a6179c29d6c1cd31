"""MM-Fi dataset layer (Setting 3, cross-dataset transfer).

Rebuild of ref /root/reference/cross_dataset_test/mmfi.py with the same
on-disk contract and split semantics, but a TPU-first data story: the
reference loads one ``frame{idx:03d}.mat`` per ``__getitem__`` (the
measured I/O hotspot, SURVEY.md §3.4); here the WiFi-CSI split is
materialized ONCE into dense arrays (with an on-disk cache) and staged to
HBM.

Preserved semantics:
  * directory tree ``E0x/Sxx/Axx/<modality>``; subjects S01-S40 map to
    scenes by decade (mmfi.py:141-151),
  * protocol1/2/3 action subsets and the four split modes, including the
    per-action incrementing ``np.random.seed`` of random_split
    (mmfi.py:20-48),
  * CSI frame loading: ``CSIamp`` [3, 114, 10], inf->nan, per-timestep
    NaN fill with the frame's non-NaN mean, min-max normalization
    (mmfi.py:269-278),
  * frame data units with zero-byte-file filtering (mmfi.py:181-199),
  * labels: ``ground_truth.npy`` [297, 17, 3] per action sequence.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

ALL_SUBJECTS = [f"S{i:02d}" for i in range(1, 41)]
ALL_ACTIONS = [f"A{i:02d}" for i in range(1, 28)]
PROTOCOL1_ACTIONS = ["A02", "A03", "A04", "A05", "A13", "A14", "A17", "A18",
                     "A19", "A20", "A21", "A22", "A23", "A27"]
PROTOCOL2_ACTIONS = ["A01", "A06", "A07", "A08", "A09", "A10", "A11", "A12",
                     "A15", "A16", "A24", "A25", "A26"]
FRAMES_PER_SEQUENCE = 297


def scene_of(subject: str) -> str:
    idx = int(subject[1:])
    if not 1 <= idx <= 40:
        raise ValueError(f"unknown subject {subject}")
    return f"E{(idx - 1) // 10 + 1:02d}"


def protocol_actions(protocol: str) -> List[str]:
    if protocol == "protocol1":
        return list(PROTOCOL1_ACTIONS)
    if protocol == "protocol2":
        return list(PROTOCOL2_ACTIONS)
    return list(ALL_ACTIONS)


def decode_config(config: Dict) -> Dict:
    """YAML config -> {subject: [actions]} train/val forms (mmfi.py:11-82)."""
    actions = protocol_actions(config["protocol"])
    train_form: Dict[str, List[str]] = {}
    val_form: Dict[str, List[str]] = {}

    split = config["split_to_use"]
    if split == "random_split":
        rs = config["random_split"]["random_seed"]
        ratio = config["random_split"]["ratio"]
        for action in actions:
            # the reference reseeds per action with an incrementing seed
            np.random.seed(rs)
            idx = np.random.permutation(len(ALL_SUBJECTS))
            cut = int(np.floor(ratio * len(ALL_SUBJECTS)))
            subjects_train = {ALL_SUBJECTS[i] for i in idx[:cut]}
            subjects_val = {ALL_SUBJECTS[i] for i in idx[cut:]}
            for subject in ALL_SUBJECTS:
                if subject in subjects_train:
                    train_form.setdefault(subject, []).append(action)
                if subject in subjects_val:
                    val_form.setdefault(subject, []).append(action)
            rs += 1
    elif split == "cross_scene_split":
        for subject in ALL_SUBJECTS[:30]:
            train_form[subject] = actions
        for subject in ALL_SUBJECTS[30:]:
            val_form[subject] = actions
    elif split == "cross_subject_split":
        for subject in config["cross_subject_split"]["train_dataset"]["subjects"]:
            train_form[subject] = actions
        for subject in config["cross_subject_split"]["val_dataset"]["subjects"]:
            val_form[subject] = actions
    else:
        man = config["manual_split"]
        for subject in man["train_dataset"]["subjects"]:
            train_form[subject] = man["train_dataset"]["actions"]
        for subject in man["val_dataset"]["subjects"]:
            val_form[subject] = man["val_dataset"]["actions"]

    return {"train": train_form, "val": val_form}


def load_csi_frame(path: str) -> np.ndarray:
    """One CSI frame -> [3, 114, 10] float32, NaN-repaired + min-max normed.

    Mirrors mmfi.py:269-278 exactly, including the quirk that the NaN fill
    value is the mean over the frame's non-NaN entries of each [3, 114]
    time slice.  Accepts ``.mat`` (key ``CSIamp``) or ``.npy``.
    """
    if path.endswith(".npy"):
        data = np.load(path).astype(np.float64)
    else:
        import scipy.io as scio
        data = scio.loadmat(path)["CSIamp"].astype(np.float64)
    data[np.isinf(data)] = np.nan
    for t in range(data.shape[-1]):
        col = data[:, :, t]
        if np.isnan(col).any():
            col[np.isnan(col)] = col[~np.isnan(col)].mean()
    dmin, dmax = np.min(data), np.max(data)
    return ((data - dmin) / (dmax - dmin)).astype(np.float32)


class MMFiDataset:
    """Frame-unit MM-Fi WiFi-CSI dataset over a {subject: [actions]} form."""

    def __init__(self, data_root: str, data_form: Dict[str, List[str]],
                 modality: str = "wifi-csi"):
        if modality != "wifi-csi":
            raise NotImplementedError(
                "the rebuild materializes the WiFi-CSI modality; other "
                "modalities follow the same item contract")
        self.data_root = data_root
        self.modality = modality
        self.items: List[Dict] = []
        for subject in sorted(data_form):
            scene = scene_of(subject)
            for action in data_form[subject]:
                base = os.path.join(data_root, scene, subject, action)
                mod_dir = os.path.join(base, modality)
                gt_path = os.path.join(base, "ground_truth.npy")
                if not os.path.isdir(mod_dir):
                    continue
                for idx in range(FRAMES_PER_SEQUENCE):
                    fp = self._frame_path(mod_dir, idx)
                    if fp is None:
                        continue
                    self.items.append({
                        "scene": scene, "subject": subject, "action": action,
                        "idx": idx, "frame_path": fp, "gt_path": gt_path,
                    })

    @staticmethod
    def _frame_path(mod_dir: str, idx: int) -> Optional[str]:
        for ext in (".mat", ".npy"):
            p = os.path.join(mod_dir, f"frame{idx + 1:03d}{ext}")
            # zero-size files are invalid frames (mmfi.py:196-198)
            if os.path.isfile(p) and os.path.getsize(p) > 0:
                return p
        return None

    def __len__(self) -> int:
        return len(self.items)

    def __getitem__(self, i: int) -> Dict:
        item = self.items[i]
        gt = np.load(item["gt_path"])
        return {
            "modality": [self.modality],
            "scene": item["scene"], "subject": item["subject"],
            "action": item["action"], "idx": item["idx"],
            "input_wifi-csi": load_csi_frame(item["frame_path"]),
            "output": gt[item["idx"]].astype(np.float32),
        }

    def materialize(self, cache_path: Optional[str] = None,
                    ) -> Tuple[np.ndarray, np.ndarray]:
        """Dense (csi [N,3,114,10], keypoints [N,17,3]) for HBM staging."""
        if cache_path and os.path.exists(cache_path):
            z = np.load(cache_path)
            if len(z["csi"]) == len(self):
                return z["csi"], z["kp"]
        csi = np.zeros((len(self), 3, 114, 10), np.float32)
        kp = np.zeros((len(self), 17, 3), np.float32)
        gt_cache: Dict[str, np.ndarray] = {}
        for i, item in enumerate(self.items):
            csi[i] = load_csi_frame(item["frame_path"])
            if item["gt_path"] not in gt_cache:
                gt_cache[item["gt_path"]] = np.load(item["gt_path"])
                if len(gt_cache) > 8:
                    gt_cache.pop(next(iter(gt_cache)))
            kp[i] = gt_cache[item["gt_path"]][item["idx"]]
        if cache_path:
            np.savez(cache_path, csi=csi, kp=kp)
        return csi, kp


def make_dataset(dataset_root: str, config: Dict,
                 ) -> Tuple[MMFiDataset, MMFiDataset]:
    """(train, val) datasets from a YAML config dict (mmfi.py:326-331)."""
    forms = decode_config(config)
    return (MMFiDataset(dataset_root, forms["train"], config["modality"]),
            MMFiDataset(dataset_root, forms["val"], config["modality"]))


def split_val_test(val_items_count: int, seed: int = 41,
                   ) -> Tuple[np.ndarray, np.ndarray]:
    """50/50 val/test split of the validation set, matching the reference's
    ``sklearn.train_test_split(test_size=0.5, random_state=41)``
    (wiflow.py:1818)."""
    from sklearn.model_selection import train_test_split

    idx = np.arange(val_items_count)
    val_idx, test_idx = train_test_split(idx, test_size=0.5, random_state=seed)
    return np.asarray(val_idx), np.asarray(test_idx)


def generate_synthetic_mmfi(root: str, subjects: Sequence[str] = ("S01", "S02"),
                            actions: Sequence[str] = ("A01", "A02"),
                            frames: int = 24, seed: int = 0,
                            fmt: str = "mat") -> None:
    """Write a miniature MM-Fi tree (CSI frames + ground truth) for tests."""
    rng = np.random.default_rng(seed)
    for subject in subjects:
        scene = scene_of(subject)
        for action in actions:
            base = os.path.join(root, scene, subject, action)
            mod = os.path.join(base, "wifi-csi")
            os.makedirs(mod, exist_ok=True)
            gt = rng.standard_normal((FRAMES_PER_SEQUENCE, 17, 3)).astype(
                np.float32) * 0.3
            np.save(os.path.join(base, "ground_truth.npy"), gt)
            for idx in range(frames):
                frame = rng.standard_normal((3, 114, 10)) * 2 + 10
                if idx % 7 == 3:      # exercise the NaN-repair path
                    frame[0, :5, 2] = np.nan
                if fmt == "mat":
                    import scipy.io as scio
                    scio.savemat(os.path.join(mod, f"frame{idx + 1:03d}.mat"),
                                 {"CSIamp": frame})
                else:
                    np.save(os.path.join(mod, f"frame{idx + 1:03d}.npy"),
                            frame)
