"""Setting-2 LOSO demonstration: 5-fold cross-subject training (measured).

The reference publishes per-subject leave-one-subject-out results
(ref /root/reference/README.md:122-188) but ships NO LOSO split code
(SURVEY.md §4.4) — the rebuild has the split machinery
(data/splits.loso_split, cli/run.py --split loso) and this driver
produces the measured 5-fold table on synthetic per-subject data: each
subject has a distinct movement style over shared CSI physics
(cli/convergence_demo.synth_windows(subject=s)), the model trains on 4
subjects (85/15 train/val) with the reference recipe and is tested on
the held-out subject.

Usage:
  python -m wiflow_tpu.cli.loso_demo --per_subject 20000 --epochs 12 \
      --output_dir measured/loso_r03
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="5-fold LOSO measured run")
    p.add_argument("--per_subject", type=int, default=20_000)
    p.add_argument("--epochs", type=int, default=12)
    p.add_argument("--batch_size", type=int, default=256)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--subjects", type=int, default=5)
    p.add_argument("--folds", type=int, nargs="+", default=None,
                   help="subset of folds to run (default: all subjects)")
    p.add_argument("--output_dir", type=str, default="measured/loso")
    p.add_argument("--seed", type=int, default=42)
    args = p.parse_args(argv)
    from wiflow_tpu.core.jax_cache import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()

    import jax.numpy as jnp
    import numpy as np

    from wiflow_tpu.cli.convergence_demo import synth_windows
    from wiflow_tpu.core.config import (
        Config, MeshConfig, OptimConfig, TrainConfig,
    )
    from wiflow_tpu.train.loop import train_pose_model

    subjects = list(range(1, args.subjects + 1))
    folds = args.folds or subjects
    os.makedirs(args.output_dir, exist_ok=True)

    print(f"[data] generating {args.per_subject} windows x "
          f"{len(subjects)} subjects on-device")
    per_subject = {}
    for s in subjects:
        per_subject[s] = synth_windows(args.per_subject,
                                       args.seed + 1000 * s, subject=s)

    rows = []
    for s in folds:
        fold_dir = os.path.join(args.output_dir, f"subject_{s}")
        os.makedirs(fold_dir, exist_ok=True)
        trains_x, trains_y, vals_x, vals_y = [], [], [], []
        for o in subjects:
            if o == s:
                continue
            x, y = per_subject[o]
            n_tr = int(len(x) * 0.85)
            trains_x.append(x[:n_tr]); trains_y.append(y[:n_tr])
            vals_x.append(x[n_tr:]); vals_y.append(y[n_tr:])
        train = (jnp.concatenate(trains_x), jnp.concatenate(trains_y))
        val = (jnp.concatenate(vals_x), jnp.concatenate(vals_y))
        test = per_subject[s]

        cfg = Config(
            train=TrainConfig(batch_size=args.batch_size,
                              num_epochs=args.epochs, patience=5,
                              seed=args.seed, data_dtype="bfloat16",
                              optim=OptimConfig(lr=args.lr,
                                                weight_decay=5e-5)),
            mesh=MeshConfig(num_devices=1), output_dir=fold_dir)

        t0 = time.time()
        result = train_pose_model(train, val, test, cfg, fold_dir,
                                  resume=False)
        wall = time.time() - t0
        tm = result.test_metrics
        row = {
            "subject": s,
            "pck20": round(float(tm["pck@0.2"]) * 100, 2),
            "pck30": round(float(tm["pck@0.3"]) * 100, 2),
            "pck50": round(float(tm["pck@0.5"]) * 100, 2),
            "mpjpe_m": round(float(tm["mpe"]), 4),
            "epochs_run": result.epochs_run,
            "best_epoch": result.best_epoch + 1,
            "wall_clock_min": round(wall / 60, 2),
        }
        rows.append(row)
        print(f"[fold S{s}] PCK@20 {row['pck20']}% PCK@30 {row['pck30']}% "
              f"PCK@50 {row['pck50']}% MPJPE {row['mpjpe_m']} m "
              f"({row['wall_clock_min']} min)")

    avg = {k: round(float(np.mean([r[k] for r in rows])), 4)
           for k in ("pck20", "pck30", "pck50", "mpjpe_m",
                     "wall_clock_min")}
    summary = {
        "per_subject_windows": args.per_subject,
        "epochs": args.epochs,
        "folds": rows,
        "average": avg,
        "reference_table": "README.md:141-188 (5-fold avg "
                           "87.26/94.01/97.69 PCK@20/30/50, MPJPE 0.019)",
    }
    out = os.path.join(args.output_dir, "loso_summary.json")
    with open(out, "w", encoding="utf-8") as fd:
        json.dump(summary, fd, indent=2)

    md = ["| Test subject | PCK@20 | PCK@30 | PCK@50 | MPJPE (m) | "
          "Wall clock (min) |",
          "|---|---|---|---|---|---|"]
    for r in rows:
        md.append(f"| Subject {r['subject']} | {r['pck20']} | {r['pck30']} |"
                  f" {r['pck50']} | {r['mpjpe_m']} | {r['wall_clock_min']} |")
    md.append(f"| **Average** | **{avg['pck20']}** | **{avg['pck30']}** | "
              f"**{avg['pck50']}** | **{avg['mpjpe_m']}** | "
              f"**{avg['wall_clock_min']}** |")
    with open(os.path.join(args.output_dir, "loso_table.md"), "w",
              encoding="utf-8") as fd:
        fd.write("\n".join(md) + "\n")
    print(f"[done] summary -> {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
