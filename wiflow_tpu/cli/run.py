"""CLI entry point: train WiFlow on preprocessed 540x20 CSI windows.

Flag-compatible rebuild of ref /root/reference/run.py (argparse at
run.py:32-41), with the shipped bugs fixed: ``--output_dir`` and
``--data_dir`` are honored (the reference hardcodes both, SURVEY.md §8.5),
``--use_augmentation`` works (§8.2), and the video/artifact chain completes
(§8.3/8.4).  Extra flags cover what upstream documents but never coded:
LOSO splits (Setting 2) and synthetic-data bootstrap.

Usage:
  python -m wiflow_tpu.cli.run --epochs 50 --batch_size 64 \
      --data_dir preprocessed_csi_data --output_dir outputs
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import random
import sys

import numpy as np


def set_seed(seed: int = 42) -> None:
    """Seed python + numpy (jax PRNG keys are derived from cfg.train.seed).

    Mirrors ref run.py:18-26; cuDNN-determinism flags have no TPU analog —
    XLA is deterministic by default.
    """
    random.seed(seed)
    np.random.seed(seed)
    os.environ.setdefault("PYTHONHASHSEED", str(seed))


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="WiFlow TPU training")
    p.add_argument("--gpu", type=str, default="auto",
                   help="device selection: 'auto' (all), or a count of "
                        "mesh devices (kept for reference-CLI compat)")
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--epochs", type=int, default=50)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--weight_decay", type=float, default=5e-5)
    p.add_argument("--output_dir", type=str, default="outputs")
    p.add_argument("--use_augmentation", action="store_true")
    p.add_argument("--data_dir", type=str, default="preprocessed_csi_data")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--patience", type=int, default=5)
    p.add_argument("--split", choices=["random", "loso"], default="random")
    p.add_argument("--test_subject", type=int, default=1,
                   help="held-out subject for --split loso (Setting 2)")
    p.add_argument("--subject_map", type=str, default=None,
                   help="JSON file mapping file_id -> subject int; "
                        "overrides the file-name-based inference for "
                        "--split loso")
    p.add_argument("--synthetic", action="store_true",
                   help="generate a synthetic dataset into --data_dir if "
                        "the artifacts are missing")
    p.add_argument("--no_videos", action="store_true")
    p.add_argument("--no_resume", action="store_true")
    p.add_argument("--grad_accum_steps", type=int, default=1)
    p.add_argument("--profile_dir", type=str, default=None,
                   help="write a jax.profiler trace of the run here "
                        "(SURVEY §5 tracing; view with TensorBoard or "
                        "xprof)")
    p.add_argument("--debug_nans", action="store_true",
                   help="enable jax_debug_nans: fail fast at the op that "
                        "produced a NaN (SURVEY §5 sanitizers)")
    p.add_argument("--compute_dtype", choices=["bfloat16", "float32"],
                   default="bfloat16",
                   help="forward-pass compute dtype (params stay fp32). "
                        "Use float32 for CPU runs: this box's XLA:CPU "
                        "thunk runtime can't execute bf16xbf16->f32 dots")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    from wiflow_tpu.core.jax_cache import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()
    set_seed(args.seed)

    import jax
    if args.debug_nans:
        jax.config.update("jax_debug_nans", True)
    profile_ctx = None
    if args.profile_dir:
        profile_ctx = jax.profiler.trace(args.profile_dir,
                                         create_perfetto_link=False)
        profile_ctx.__enter__()

    from wiflow_tpu.core.config import (
        Config, DataConfig, MeshConfig, ModelConfig, OptimConfig, TrainConfig,
    )
    from wiflow_tpu.data.dataset import CSIKeypointsDataset
    from wiflow_tpu.data.splits import (
        expand_to_samples, file_level_split, infer_subject, loso_split,
    )
    from wiflow_tpu.eval.artifacts import write_all_artifacts
    from wiflow_tpu.train.loop import train_pose_model

    data_dir = args.data_dir
    if args.synthetic and not os.path.exists(
            os.path.join(data_dir, "csi_windows.npy")):
        from wiflow_tpu.data.synthetic import make_preprocessed_dataset
        print(f"[synthetic] generating dataset under {data_dir}/..")
        root = os.path.dirname(os.path.abspath(data_dir)) or "."
        made = make_preprocessed_dataset(root, num_files=20,
                                         frames_per_file=200)
        if os.path.abspath(made) != os.path.abspath(data_dir):
            data_dir = made

    if not os.path.exists(os.path.join(data_dir, "csi_windows.npy")):
        print(f"error: no preprocessed artifacts in {data_dir!r}. Run "
              f"wiflow_tpu.data.preprocess.preprocess_csi_data on your raw "
              f"recordings, or pass --synthetic.", file=sys.stderr)
        return 2

    num_devices = None
    if args.gpu not in ("auto", ""):
        try:
            num_devices = max(1, int(args.gpu.split(",")[0]) or 1)
        except ValueError:
            num_devices = None

    dataset = CSIKeypointsDataset(data_dir)
    print(f"[data] {len(dataset)} windows from {dataset.num_files} files "
          f"({'npy fast' if dataset.use_npy_mode else 'csv'} mode)")

    if args.split == "loso":
        if args.subject_map:
            import json as _json
            with open(args.subject_map, "r", encoding="utf-8") as fd:
                smap = _json.load(fd)
            subjects = [int(smap[f]) for f in dataset.file_ids]
        else:
            subjects = [infer_subject(f) for f in dataset.file_ids]
        tr, va, te = loso_split(subjects, args.test_subject, seed=args.seed)
        print(f"[split] LOSO: test subject {args.test_subject} "
              f"({len(te)} files)")
    else:
        tr, va, te = file_level_split(dataset.num_files, seed=args.seed)
        print(f"[split] random file-level: {len(tr)}/{len(va)}/{len(te)} files")

    parts = {}
    for name, files in (("train", tr), ("val", va), ("test", te)):
        idx = expand_to_samples(dataset.window_ranges, files)
        parts[name] = dataset.materialize(idx)
        print(f"[split] {name}: {len(idx)} samples")

    # one-batch smoke check (ref run.py:94-101)
    xb, yb = parts["train"][0][:8], parts["train"][1][:8]
    assert np.isfinite(xb).all() and np.isfinite(yb).all(), \
        "NaN/Inf in the first training batch"
    print(f"[smoke] batch x{xb.shape} y{yb.shape} ok")

    cfg = Config(
        data=DataConfig(data_dir=data_dir),
        model=ModelConfig(compute_dtype=args.compute_dtype),
        train=TrainConfig(
            batch_size=args.batch_size, num_epochs=args.epochs,
            patience=args.patience, use_augmentation=args.use_augmentation,
            seed=args.seed, grad_accum_steps=args.grad_accum_steps,
            optim=OptimConfig(lr=args.lr, weight_decay=args.weight_decay)),
        mesh=MeshConfig(num_devices=num_devices),
        output_dir=args.output_dir,
    )

    result = train_pose_model(parts["train"], parts["val"], parts["test"],
                              cfg, args.output_dir,
                              resume=not args.no_resume)
    paths = write_all_artifacts(result, args.output_dir,
                                make_videos=not args.no_videos)
    print("[artifacts] " + ", ".join(sorted(paths)))
    print(f"[done] best epoch {result.best_epoch + 1}, "
          f"test MPJPE {result.test_metrics['mpe']:.4f} m, "
          f"PCK@20 {result.test_metrics['pck@0.2'] * 100:.2f}%, "
          f"wall clock {result.wall_clock_sec:.1f}s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
