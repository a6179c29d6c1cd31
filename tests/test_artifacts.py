"""Artifact writers: file presence + format contract."""

import os

import numpy as np
import pandas as pd
import pytest

from wiflow_tpu.eval.artifacts import (
    calculate_keypoint_errors, plot_training_history, save_all_predictions,
    save_history_csv, save_test_summary, write_all_artifacts,
)


@pytest.fixture()
def fake_result():
    from wiflow_tpu.train.loop import TrainResult

    rng = np.random.default_rng(0)
    t = rng.standard_normal((50, 15, 2)).astype(np.float32) * 0.1
    p = t + rng.standard_normal((50, 15, 2)).astype(np.float32) * 0.01
    history = {k: list(rng.random(4)) for k in (
        "train_loss", "val_loss", "train_position_loss", "train_bone_loss",
        "train_mpe", "val_mpe", "train_pck", "val_pck", "train_pck50",
        "val_pck50", "lr")}
    metrics = {"loss": 0.01, "mpe": 0.007, "pck@0.1": 0.9, "pck@0.2": 0.97,
               "pck@0.3": 0.98, "pck@0.4": 0.99, "pck@0.5": 0.995}
    return TrainResult(variables={}, history=history, test_metrics=metrics,
                       predictions=p, targets=t, best_epoch=2, epochs_run=4,
                       wall_clock_sec=1.0)


def test_predictions_csv_contract(tmp_path, fake_result):
    path = save_all_predictions(fake_result.targets, fake_result.predictions,
                                str(tmp_path / "test_predictions.csv"))
    df = pd.read_csv(path, index_col="sample_id")
    assert list(df.columns[:4]) == ["true_kp0_x", "true_kp0_y",
                                    "pred_kp0_x", "pred_kp0_y"]
    assert df.shape == (50, 15 * 4)
    # x1000 rescale (ref pose_viz.py:122-125)
    np.testing.assert_allclose(df.iloc[0, 0],
                               fake_result.targets[0, 0, 0] * 1000, rtol=1e-4)


def test_keypoint_error_stats(fake_result):
    df = calculate_keypoint_errors(fake_result.targets,
                                   fake_result.predictions)
    assert len(df) == 15
    assert {"keypoint_id", "keypoint_name", "body_part", "mean_error",
            "median_error", "std_error", "min_error",
            "max_error"} <= set(df.columns)
    assert df.loc[0, "keypoint_name"] == "Neck"
    assert (df["mean_error"] > 0).all()


def test_full_artifact_surface(tmp_path, fake_result):
    paths = write_all_artifacts(fake_result, str(tmp_path), make_videos=True)
    for fname in ("test_predictions.csv", "keypoint_error_stats.csv",
                  "test_results_summary.csv", "training_history.csv",
                  "training_history.png"):
        assert os.path.exists(tmp_path / fname), fname
    # videos (cv2 available in this env)
    for vid in ("true_poses.mp4", "predicted_poses.mp4",
                "comparison_poses.mp4"):
        p = tmp_path / "videos" / vid
        assert p.exists() and p.stat().st_size > 1000, vid
    summary = pd.read_csv(tmp_path / "test_results_summary.csv")
    assert list(summary.columns) == ["Metric", "Value"]
    assert summary["Metric"].tolist()[:2] == ["Loss", "MPE"]
