"""Ablation-table demonstration: the config switches change outcomes.

The reference publishes a Setting-1 ablation table (ref
/root/reference/README.md:240-248: full model vs plain conv1d TCN vs
depthwise conv vs no axial attention) but ships no ablation code.  The
rebuild exposes the variants as ModelConfig switches (``tcn_conv``,
``use_attention``); this driver trains them on the SAME synthetic data
and recipe at reduced scale and writes the measured table, demonstrating
the switches differentiate.

Usage:
  python -m wiflow_tpu.cli.ablation_demo --windows 60000 --epochs 10 \
      --output_dir measured/ablations_r03
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

VARIANTS = (
    # (name, ref README.md row, ModelConfig overrides)
    ("full", "WiFlow (full), :244", {}),
    ("tcn_plain", "TCN -> regular 1-D conv, :245", {"tcn_conv": "plain"}),
    ("conv2d_encoder", "TCN + asym conv -> 2D res conv, :246",
     {"encoder_kind": "conv2d"}),
    ("group_depthwise", "group conv -> depthwise conv, :247",
     {"tcn_conv": "depthwise"}),
    ("no_attention", "- axial attention, :248", {"use_attention": False}),
)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="ablation measured run")
    p.add_argument("--windows", type=int, default=60_000)
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--batch_size", type=int, default=256)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--output_dir", type=str, default="measured/ablations")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--variants", type=str,
                   default=",".join(v[0] for v in VARIANTS),
                   help="comma-separated subset to run")
    p.add_argument("--compute_dtype", choices=["bfloat16", "float32"],
                   default="bfloat16",
                   help="float32 for CPU runs (XLA:CPU thunk runtime "
                        "can't execute bf16 dots)")
    p.add_argument("--depthwise_lr", type=float, default=None,
                   help="per-variant lr override for group_depthwise "
                        "(depthwise-separable TCNs want a larger step "
                        "than the grouped recipe's 1e-4; the r3 table's "
                        "collapse was the plateau scheduler strangling "
                        "an under-stepped run to min-lr)")
    p.add_argument("--synth_mode", choices=["linear", "multipath"],
                   default="multipath",
                   help="synthetic CSI observation model (see "
                        "convergence_demo.synth_windows). 'linear' is "
                        "per-frame invertible and cannot reward temporal/"
                        "cross-subcarrier modeling — the r4 table's "
                        "reversed ordering; 'multipath' encodes pose in "
                        "wrapped (cosine) path delays + Doppler "
                        "amplitude, the structure the architecture "
                        "targets")
    args = p.parse_args(argv)
    from wiflow_tpu.core.jax_cache import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()

    import jax

    from wiflow_tpu.cli.convergence_demo import synth_windows
    from wiflow_tpu.core.config import (
        Config, MeshConfig, ModelConfig, OptimConfig, TrainConfig,
    )
    from wiflow_tpu.train.loop import train_pose_model

    os.makedirs(args.output_dir, exist_ok=True)
    n = args.windows
    n_tr, n_va = int(n * 0.7), int(n * 0.15)
    train = synth_windows(n_tr, args.seed, mode=args.synth_mode)
    val = synth_windows(n_va, args.seed + 101, mode=args.synth_mode)
    test = synth_windows(n - n_tr - n_va, args.seed + 202,
                         mode=args.synth_mode)
    print(f"[data] {n} windows (train {n_tr} / val {n_va} / "
          f"test {n - n_tr - n_va}), synth_mode={args.synth_mode}")

    rows = []
    wanted = set(args.variants.split(","))
    data_dtype = ("bfloat16" if args.compute_dtype == "bfloat16"
                  else "float32")
    for name, ref_row, overrides in VARIANTS:
        if name not in wanted:
            continue
        run_dir = os.path.join(args.output_dir, name)
        os.makedirs(run_dir, exist_ok=True)
        model_cfg = ModelConfig(compute_dtype=args.compute_dtype,
                                **overrides)
        lr = args.lr
        if name == "group_depthwise" and args.depthwise_lr:
            lr = args.depthwise_lr
        cfg = Config(
            model=model_cfg,
            train=TrainConfig(batch_size=args.batch_size,
                              num_epochs=args.epochs, patience=10 ** 6,
                              seed=args.seed, data_dtype=data_dtype,
                              optim=OptimConfig(lr=lr,
                                                weight_decay=5e-5)),
            mesh=MeshConfig(num_devices=1), output_dir=run_dir)
        t0 = time.time()
        result = train_pose_model(train, val, test, cfg, run_dir,
                                  resume=True)
        wall = time.time() - t0
        params = sum(x.size for x in
                     jax.tree.leaves(result.variables["params"]))
        tm = result.test_metrics
        row = {
            "variant": name,
            "reference_row": ref_row,
            "lr": lr,
            "pck10": round(float(tm["pck@0.1"]) * 100, 2),
            "pck20": round(float(tm["pck@0.2"]) * 100, 2),
            "mpjpe_m": round(float(tm["mpe"]), 4),
            "params": int(params),
            "wall_clock_min": round(wall / 60, 2),
        }
        rows.append(row)
        print(f"[{name}] PCK@10 {row['pck10']}% PCK@20 {row['pck20']}% "
              f"MPJPE {row['mpjpe_m']} m, {params / 1e6:.2f}M params "
              f"({row['wall_clock_min']} min)")

        # write after every variant: a killed multi-hour run still
        # leaves a valid summary of the variants that finished
        out = os.path.join(args.output_dir, "ablation_summary.json")
        with open(out, "w", encoding="utf-8") as fd:
            json.dump({"windows": n, "epochs": args.epochs, "rows": rows,
                       "reference_table": "README.md:240-248"}, fd,
                      indent=2)
        md = ["| Variant | PCK@10 | PCK@20 | MPJPE (m) | Params |",
              "|---|---|---|---|---|"]
        for r in rows:
            md.append(f"| {r['variant']} | {r['pck10']} | {r['pck20']} | "
                      f"{r['mpjpe_m']} | {r['params'] / 1e6:.2f}M |")
        with open(os.path.join(args.output_dir, "ablation_table.md"), "w",
                  encoding="utf-8") as fd:
            fd.write("\n".join(md) + "\n")
    print(f"[done] summary -> {args.output_dir}/ablation_summary.json")
    return 0


if __name__ == "__main__":
    sys.exit(main())
