"""CLI-level tests for the HPE-Li robustness harness and the
convergence demo's data generator."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np


def test_run_robustness_mode0_basic_cnn(tmp_path):
    """Mode-0 end-to-end: synthetic MM-Fi tree -> train BasicCnnHPE ->
    sweep JSON (ref HPE-Li/main.py modes; the cheapest zoo model keeps
    the CPU compile small)."""
    from wiflow_tpu.cli.run_robustness import main

    root = str(tmp_path / "mmfi")
    out = str(tmp_path / "out")
    rc = main(["--model", "basic_cnn", "--mode", "0", "--epochs", "1",
               "--batch_size", "8", "--dataset_root", root,
               "--output_dir", out, "--synthetic", "--no_resume",
               "--no_scan"])
    assert rc == 0
    path = os.path.join(out, "robustness_basic_cnn_mode0.json")
    with open(path, "r", encoding="utf-8") as fd:
        results = json.load(fd)
    row = results["0.0"]
    assert 0.0 <= row["test_pck20"] <= 1.0
    assert np.isfinite(row["test_mpjpe"])
    assert "0.0" in row["sweep"]


def test_convergence_synth_windows_deterministic():
    from wiflow_tpu.cli.convergence_demo import synth_windows

    x1, y1 = synth_windows(64, seed=3, chunk=32)
    x2, y2 = synth_windows(64, seed=3, chunk=32)
    assert x1.shape == (64, 540, 20) and x1.dtype == jnp.bfloat16
    assert y1.shape == (64, 15, 2) and y1.dtype == jnp.float32
    np.testing.assert_array_equal(np.asarray(x1, np.float32),
                                  np.asarray(x2, np.float32))
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
    # splits with different seeds share the mixing map but differ in data
    x3, _ = synth_windows(64, seed=4, chunk=32)
    assert not np.allclose(np.asarray(x1, np.float32),
                           np.asarray(x3, np.float32))


def test_convergence_synth_windows_multipath_observable():
    """Multipath mode (VERDICT r4 item 6): deterministic, finite, and —
    the r5 P=8 floor lesson — the pose->delay observation must be
    full-rank (P >= 2*keypoints), else 30-P pose dimensions are
    invisible to every model and the ablation table pins at the
    mean-pose floor (measured/ablations_r05/README.md)."""
    import inspect

    from wiflow_tpu.cli.convergence_demo import synth_windows

    default_paths = inspect.signature(synth_windows).parameters[
        "n_paths"].default
    assert default_paths >= 30  # 2 * 15 keypoints

    x1, y1 = synth_windows(64, seed=3, chunk=32, mode="multipath")
    x2, _ = synth_windows(64, seed=3, chunk=32, mode="multipath")
    assert x1.shape == (64, 540, 20) and x1.dtype == jnp.bfloat16
    xf = np.asarray(x1, np.float32)
    assert np.isfinite(xf).all() and np.isfinite(np.asarray(y1)).all()
    np.testing.assert_array_equal(xf, np.asarray(x2, np.float32))
    # wrapped observation: CSI is not an affine function of the pose, so
    # it must differ from the linear mode on the same seeds
    xl, _ = synth_windows(64, seed=3, chunk=32, mode="linear")
    assert not np.allclose(xf, np.asarray(xl, np.float32))


def test_run_robustness_mode2_filter_sweep(tmp_path):
    """Mode-2 end-to-end: AWGN corruption + traditional filter cleanup
    (ref HPE-Li/main.py:100-105, traditional_filter/) through the CLI;
    the sweep must evaluate both the clean and the noisy level."""
    from wiflow_tpu.cli.run_robustness import main

    root = str(tmp_path / "mmfi")
    out = str(tmp_path / "out")
    rc = main(["--model", "basic_cnn", "--mode", "2", "--epochs", "1",
               "--batch_size", "8", "--noise_levels", "0.2",
               "--filter", "mean", "--dataset_root", root,
               "--output_dir", out, "--synthetic", "--no_resume",
               "--no_scan"])
    assert rc == 0
    path = os.path.join(out, "robustness_basic_cnn_mode2.json")
    with open(path, "r", encoding="utf-8") as fd:
        results = json.load(fd)
    row = results["0.2"]
    assert np.isfinite(row["test_mpjpe"])
    assert set(row["sweep"]) == {"0.0", "0.2"}


def test_run_robustness_mode1_denoiser_pipeline(tmp_path):
    """Mode-1 end-to-end: greedy AE pre-training then END-TO-END
    DenoiserHPE training (ref main.py:57-67 + denoiser_training.py)
    through the CLI with a 1-stage encoder."""
    from wiflow_tpu.cli.run_robustness import main

    root = str(tmp_path / "mmfi")
    out = str(tmp_path / "out")
    rc = main(["--model", "denoiser_hpe", "--denoiser_stages", "1",
               "--denoiser_epochs", "1", "--epochs", "1",
               "--batch_size", "8", "--noise_levels", "0.1",
               "--noise_kind", "salt_pepper", "--dataset_root", root,
               "--output_dir", out, "--synthetic", "--no_resume",
               "--no_scan", "--devices", "1"])
    assert rc == 0
    path = os.path.join(out, "robustness_denoiser_hpe_mode1.json")
    with open(path, "r", encoding="utf-8") as fd:
        results = json.load(fd)
    row = results["0.1"]
    assert np.isfinite(row["test_mpjpe"])
    assert set(row["sweep"]) == {"0.0", "0.1"}
