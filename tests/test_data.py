"""Data layer tests: preprocessing contract, dataset, splits, zero repair."""

import os
import random

import numpy as np
import pytest

from wiflow_tpu.data.dataset import CSIKeypointsDataset
from wiflow_tpu.data.preprocess import (
    clean_single_frame_zeros, clean_zero_keypoints_temporal,
    preprocess_csi_data, window_csi,
)
from wiflow_tpu.data.splits import expand_to_samples, file_level_split, infer_subject, loso_split
from wiflow_tpu.data.synthetic import generate_raw_dataset, make_preprocessed_dataset


@pytest.fixture(scope="module")
def dataset_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth")
    out = make_preprocessed_dataset(str(root), num_files=6,
                                    frames_per_file=60, num_subcarriers=24)
    return out


def test_windowing_shape_and_content():
    csi = np.arange(50 * 4, dtype=np.float32).reshape(50, 4)
    win = window_csi(csi, window_size=20, stride=3)
    assert win.shape == ((50 - 20) // 3 + 1, 4, 20)
    # window 0 covers frames 0..19, channel-major
    np.testing.assert_array_equal(win[0, 0], csi[:20, 0])
    np.testing.assert_array_equal(win[2, 1], csi[6:26, 1])


def test_preprocess_artifact_contract(dataset_dir):
    """All six §2.6 artifacts exist and are mutually consistent."""
    files = {"csi_windows.npy", "window_info.npz", "file_info.npz",
             "config.npz", "all_keypoints.npy", "file_mappings.pkl"}
    assert files.issubset(set(os.listdir(dataset_dir)))

    ds = CSIKeypointsDataset(dataset_dir)
    assert ds.window_size == 20 and ds.stride == 1
    n = len(ds)
    assert n == 6 * (60 - 20 + 1)
    assert ds.csi_windows.shape == (n, 24, 20)
    assert ds.window_ranges[-1, 1] == n
    # labels exist for every window and are finite, in metres (|kp| < ~2)
    csi, kp = ds.materialize(np.arange(0, n, 7))
    assert kp.shape == (len(csi), 15, 2)
    assert np.isfinite(kp).all() and np.abs(kp).max() < 5.0


def test_csv_mode_matches_npy_mode(tmp_path):
    """Slow CSV fallback and fast npy mode agree where no zeros exist."""
    raw = tmp_path / "raw"
    generate_raw_dataset(str(raw), num_files=2, frames_per_file=40,
                         num_subcarriers=12, zero_dropout=0.0)
    out = tmp_path / "pre"
    preprocess_csi_data(str(raw), str(out))
    ds_npy = CSIKeypointsDataset(str(out))
    assert ds_npy.use_npy_mode
    os.remove(out / "all_keypoints.npy")
    os.remove(out / "file_mappings.pkl")
    ds_csv = CSIKeypointsDataset(str(out))
    assert not ds_csv.use_npy_mode
    idx = np.arange(len(ds_npy))
    np.testing.assert_allclose(ds_npy.keypoints_for(idx),
                               ds_csv.keypoints_for(idx), rtol=1e-5, atol=1e-6)


def test_zero_repair_single_frame():
    kp = np.array([[[1.0, 2.0], [0.0, 0.0], [3.0, 4.0]]], np.float32)
    out = clean_single_frame_zeros(kp)
    np.testing.assert_allclose(out[0, 1], [2.0, 3.0])  # mean of non-zero
    np.testing.assert_allclose(out[0, 0], [1.0, 2.0])  # untouched


def test_zero_repair_temporal_interpolation():
    seq = np.zeros((5, 1, 2), np.float32)
    seq[0, 0] = [1.0, 10.0]
    seq[4, 0] = [5.0, 50.0]
    out = clean_zero_keypoints_temporal(seq)
    np.testing.assert_allclose(out[2, 0], [3.0, 30.0])   # midpoint
    np.testing.assert_allclose(out[1, 0], [2.0, 20.0])


def test_file_level_split_matches_reference_semantics():
    """Exact replica of dataset.py:256-276 (python random, seed 42)."""
    for num_files, seed in [(20, 42), (7, 42), (100, 7)]:
        random.seed(seed)
        idx = list(range(num_files))
        random.shuffle(idx)
        ts = int(np.floor(0.7 * num_files))
        vs = int(np.floor(0.15 * num_files))
        train, val, test = file_level_split(num_files, seed=seed)
        assert train == idx[:ts]
        assert val == idx[ts:ts + vs]
        assert test == idx[ts + vs:]
        assert sorted(train + val + test) == list(range(num_files))


def test_expand_to_samples(dataset_dir):
    ds = CSIKeypointsDataset(dataset_dir)
    samples = expand_to_samples(ds.window_ranges, [1, 0])
    assert len(samples) == ds.window_ranges[1, 1] - ds.window_ranges[1, 0] \
        + ds.window_ranges[0, 1] - ds.window_ranges[0, 0]
    assert samples[0] == ds.window_ranges[1, 0]


def test_loso_split(dataset_dir):
    ds = CSIKeypointsDataset(dataset_dir)
    subjects = [infer_subject(fid) for fid in ds.file_ids]
    train, val, test = loso_split(subjects, test_subject=1)
    assert all(subjects[i] == 1 for i in test)
    assert all(subjects[i] != 1 for i in train + val)
    assert set(train + val + test) == set(range(len(subjects)))


def test_preprocess_cli_entry(tmp_path):
    """python -m wiflow_tpu.cli.preprocess wraps preprocess_csi_data
    (the script the reference names at run.py:74 but never shipped)."""
    from wiflow_tpu.cli.preprocess import main as preprocess_main
    raw, out = tmp_path / "raw", tmp_path / "pre"
    generate_raw_dataset(str(raw), num_files=2, frames_per_file=30,
                         num_subcarriers=24, seed=3)
    rc = preprocess_main(["--raw_dir", str(raw), "--output_dir", str(out),
                          "--window_size", "10", "--stride", "2"])
    assert rc == 0
    import numpy as np_
    win = np_.load(out / "csi_windows.npy")
    cfg = np_.load(out / "config.npz")
    assert win.shape[1:] == (24, 10)
    assert int(cfg["window_size"]) == 10 and int(cfg["stride"]) == 2
    for name in ("window_info.npz", "file_info.npz", "all_keypoints.npy",
                 "file_mappings.pkl"):
        assert (out / name).exists()
