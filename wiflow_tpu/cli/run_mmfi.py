"""CLI entry: WiFlow cross-dataset training on MM-Fi (Setting 3).

Rebuild of ref /root/reference/cross_dataset_test/WiFlow/wiflow.py's
main/train flow (:1749-1904): YAML-configured MM-Fi splits, 50/50 val/test
split of the validation subjects (sklearn, random_state 41), early stop +
LR plateau on *max val PCK* (:1225-1247), full checkpoint/resume, AdamW
with weight_decay 1e-4 (:1218-1221), root-relative metrics.

Usage:
  python -m wiflow_tpu.cli.run_mmfi --dataset_root /data/MMFi \
      --config config.yaml --epochs 50 --batch_size 64
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

DEFAULT_CONFIG = {
    # mirrors ref HPE-Li/dataset_lib/config.yaml defaults
    "modality": "wifi-csi",
    "protocol": "protocol3",
    "data_unit": "frame",
    "split_to_use": "random_split",
    "random_split": {"ratio": 0.7, "random_seed": 0},
    "init_rand_seed": 0,
}


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="WiFlow on MM-Fi (TPU)")
    p.add_argument("--dataset_root", type=str, default="MMFi")
    p.add_argument("--config", type=str, default=None,
                   help="YAML config (protocol/split); defaults mirror the "
                        "reference's config.yaml")
    p.add_argument("--model", default="wiflow",
                   choices=["wiflow", "hpeli", "wisppn", "perunet",
                            "wpformer"],
                   help="wiflow (default) or a baseline re-targeted to "
                        "MM-Fi (ref cross_dataset_test/ suite)")
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--epochs", type=int, default=50)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--output_dir", type=str, default="mmfi_outputs")
    p.add_argument("--patience", type=int, default=5)
    p.add_argument("--plateau_patience", type=int, default=3,
                   help="ReduceLROnPlateau patience in epochs (ref "
                        "cross_dataset_test/WiFlow/wiflow.py:1225-1233 "
                        "uses 3). The reference tunes this for real "
                        "MM-Fi epoch sizes (~thousands of steps); small "
                        "synthetic trees have ~50-step epochs, where "
                        "patience 3 strangles the lr before the model "
                        "escapes the BN eval-lag warmup — raise it "
                        "proportionally for small runs")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--synthetic", action="store_true",
                   help="generate a miniature synthetic MM-Fi tree if the "
                        "dataset_root is missing")
    p.add_argument("--no_resume", action="store_true")
    p.add_argument("--no_videos", action="store_true")
    p.add_argument("--compute_dtype", choices=["bfloat16", "float32"],
                   default="bfloat16",
                   help="forward-pass compute dtype (params stay fp32); "
                        "float32 for CPU runs (XLA:CPU's thunk runtime "
                        "can't execute bf16xbf16->f32 dots)")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    from wiflow_tpu.core.jax_cache import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()

    from wiflow_tpu.core.config import (
        Config, MMFI_SKELETON_CONNECTIONS, MeshConfig, OptimConfig,
        TrainConfig,
    )
    from wiflow_tpu.data.mmfi import (
        generate_synthetic_mmfi, make_dataset, split_val_test,
    )
    from wiflow_tpu.eval.artifacts import write_all_artifacts
    from wiflow_tpu.metrics.mmfi_metrics import (
        root_aligned_mpjpe, root_relative_pck_fractions,
    )
    from wiflow_tpu.models.wiflow_mmfi import MMFiModelConfig, WiFlowMMFiModel
    from wiflow_tpu.train.loop import train_pose_model

    config = dict(DEFAULT_CONFIG)
    if args.config:
        import yaml
        with open(args.config, "r", encoding="utf-8") as fd:
            config.update(yaml.safe_load(fd))

    if args.synthetic and not os.path.isdir(args.dataset_root):
        print(f"[synthetic] generating miniature MM-Fi at {args.dataset_root}")
        generate_synthetic_mmfi(args.dataset_root,
                                subjects=("S01", "S02", "S11"),
                                actions=("A01", "A02"), frames=48)

    if not os.path.isdir(args.dataset_root):
        print(f"error: MM-Fi root {args.dataset_root!r} not found "
              f"(pass --synthetic for a test tree)", file=sys.stderr)
        return 2

    train_ds, val_ds = make_dataset(args.dataset_root, config)
    print(f"[data] train {len(train_ds)} frames, val+test {len(val_ds)}")
    os.makedirs(args.output_dir, exist_ok=True)
    train_xy = train_ds.materialize(
        os.path.join(args.output_dir, "mmfi_train_cache.npz"))
    val_all = val_ds.materialize(
        os.path.join(args.output_dir, "mmfi_val_cache.npz"))
    vi, ti = split_val_test(len(val_ds))
    val_xy = (val_all[0][vi], val_all[1][vi])
    test_xy = (val_all[0][ti], val_all[1][ti])
    print(f"[split] train {len(train_xy[0])} / val {len(val_xy[0])} / "
          f"test {len(test_xy[0])}")

    cfg = Config(
        train=TrainConfig(
            batch_size=args.batch_size, num_epochs=args.epochs,
            patience=args.patience, seed=args.seed,
            optim=OptimConfig(lr=args.lr, weight_decay=1e-4,
                              plateau_patience=args.plateau_patience)),
        mesh=MeshConfig(),
        output_dir=args.output_dir,
    )

    # model-specific label/loss wiring (ref cross_dataset_test/ suite):
    # wiflow/wpformer/perunet regress 17x3 keypoints; hpeli regresses the
    # 2-D projection (HPE-Li/model/HPE_no_denoiser.py); wisppn regresses a
    # 3x17x17 PAM with confidence-weighted MSE
    kwargs = dict(connections=MMFI_SKELETON_CONNECTIONS,
                  pck_fn=root_relative_pck_fractions,
                  mpe_fn=root_aligned_mpjpe, monitor="pck")
    dt = args.compute_dtype
    if args.model == "wiflow":
        model = WiFlowMMFiModel(MMFiModelConfig(compute_dtype=dt))
    elif args.model == "hpeli":
        from wiflow_tpu.models.baselines import HPELiMMFi
        model = HPELiMMFi(compute_dtype=dt)
        train_xy = (train_xy[0], train_xy[1][..., :2])
        val_xy = (val_xy[0], val_xy[1][..., :2])
        test_xy = (test_xy[0], test_xy[1][..., :2])
    elif args.model == "wpformer":
        import jax.numpy as jnp
        from wiflow_tpu.models.baselines import wpformer_mmfi
        model = wpformer_mmfi(compute_dtype=dt)

        def metafi_masked_mse(out, yb):
            """Valid-keypoint-masked MSE (ref cross_dataset_test/WPformer/
            metafi.py:750-753): only penalize keypoints whose GT exists."""
            mask = (jnp.sum(jnp.abs(yb), axis=-1, keepdims=True)
                    > 1e-5).astype(jnp.float32)
            loss = jnp.mean((out.astype(jnp.float32) * mask
                             - yb.astype(jnp.float32) * mask) ** 2)
            return loss, {"position": loss,
                          "bone": jnp.zeros((), jnp.float32)}
        kwargs.update(loss_fn=metafi_masked_mse)
    elif args.model == "perunet":
        from wiflow_tpu.models.baselines import PerUnetMMFi
        model = PerUnetMMFi(compute_dtype=dt)
    else:  # wisppn: PAM targets
        from wiflow_tpu.data.pam import (
            keypoints_to_pam, pam_confidence_mse, pam_to_keypoints,
        )
        from wiflow_tpu.models.baselines import WiSPPN
        model = WiSPPN(input_converter="mmfi", pam_channels=3, pam_size=17,
                       compute_dtype=dt)
        train_xy = (train_xy[0], keypoints_to_pam(train_xy[1]))
        val_xy = (val_xy[0], keypoints_to_pam(val_xy[1]))
        test_xy = (test_xy[0], keypoints_to_pam(test_xy[1]))
        kwargs.update(loss_fn=pam_confidence_mse,
                      to_keypoints=pam_to_keypoints)

    result = train_pose_model(
        train_xy, val_xy, test_xy, cfg, args.output_dir, model=model,
        resume=not args.no_resume, **kwargs)
    paths = write_all_artifacts(result, args.output_dir,
                                make_videos=not args.no_videos,
                                connections=MMFI_SKELETON_CONNECTIONS)
    print("[artifacts] " + ", ".join(sorted(paths)))
    print(f"[done] best epoch {result.best_epoch + 1}, "
          f"test MPJPE {result.test_metrics['mpe']:.4f} m, "
          f"PCK@20 {result.test_metrics['pck@0.2'] * 100:.2f}%")
    return 0


if __name__ == "__main__":
    sys.exit(main())
