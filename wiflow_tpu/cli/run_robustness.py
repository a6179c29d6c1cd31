"""CLI entry: the HPE-Li robustness experiment harness.

Rebuild of ref /root/reference/cross_dataset_test/HPE-Li/main.py:24-250 +
constant.py modes, and the DSKNetTrans trainers att_mmfi.py:427 /
att_wipose.py:340:

  mode 0  train + evaluate on clean CSI,
  mode 1  pre-train a stacked denoising AE per noise level
          (denoiser_training.py), then train DenoiserHPE END-TO-END —
          the reference optimizes all metafi.parameters() (main.py:65-67;
          no requires_grad=False exists anywhere in HPE-Li).  Pass
          --freeze_denoiser to freeze the pretrained encoder instead
          (a rebuild-only option),
  mode 2  corrupt CSI with AWGN and clean with a traditional filter
          (traditional_filter/{gaussian,mean}_filter.py).

Reference training recipe kept: confidence-weighted MSE / 32 where the
"confidence" is the keypoint z-channel (main.py:125-131 — a quirk: MM-Fi
z-coordinates are used as confidences), plain SGD lr 1e-3 (torch
defaults: momentum 0, no gradient clipping — main.py:67) with linear
LambdaLR decay from epoch 20 over 30 (main.py:68-76), best checkpoint by
max overall PCK@20 (main.py:258-268), metrics via compute_pck_pckh
(scale keypoints 1/11) + MPJPE/PA-MPJPE.

Models: original_hpe (HPE_no_denoiser.py), dsknet_trans
(sknet_trans_mmfi.py, att_mmfi.py:427), basic_cnn (HPE_basic_cnn.py),
denoiser_hpe (HPE_*_denoiser.py, implies mode 1); WiPose variants
hpe_wipose (HPE_Wipose.py) and dsknet_trans_wipose (att_wipose.py:340).

Usage:
  python -m wiflow_tpu.cli.run_robustness --model original_hpe --mode 0 \
      --dataset_root mmfi_data --synthetic --epochs 5
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

MMFI_MODELS = ("original_hpe", "dsknet_trans", "basic_cnn", "denoiser_hpe")
WIPOSE_MODELS = ("hpe_wipose", "dsknet_trans_wipose")


def build_model(name: str, num_stages: int = 5):
    from wiflow_tpu.models.baselines import hpeli_zoo
    from wiflow_tpu.robustness.denoiser import DenoiserHPE
    if name == "original_hpe":
        return hpeli_zoo.OriginalHPE()
    if name == "dsknet_trans":
        return hpeli_zoo.DSKNetTransMMFi()
    if name == "basic_cnn":
        return hpeli_zoo.BasicCnnHPE()
    if name == "denoiser_hpe":
        return DenoiserHPE(num_stages=num_stages)
    if name == "hpe_wipose":
        return hpeli_zoo.HPEWiPoseModel()
    if name == "dsknet_trans_wipose":
        return hpeli_zoo.DSKNetTransWipose()
    raise ValueError(name)


def conf_weighted_mse(out, yb):
    """criterion_L2(conf*pred, conf*xy) / 32 (ref main.py:125-131)."""
    import jax.numpy as jnp
    conf = yb[..., 2:3].astype(jnp.float32)
    xy = yb[..., :2].astype(jnp.float32)
    loss = jnp.mean((conf * out.astype(jnp.float32) - conf * xy) ** 2) / 32.0
    return loss, {"position": loss, "bone": jnp.zeros((), jnp.float32)}


def to_xy_keypoints(out, yb):
    return out, yb[..., :2]


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="HPE-Li robustness harness (TPU)")
    p.add_argument("--model", choices=MMFI_MODELS + WIPOSE_MODELS,
                   default="original_hpe")
    p.add_argument("--mode", type=int, choices=(0, 1, 2), default=0,
                   help="0 none / 1 AE denoiser / 2 traditional filter")
    p.add_argument("--noise_levels", type=float, nargs="+", default=[0.0])
    p.add_argument("--noise_kind", choices=("awgn", "salt_pepper"),
                   default="awgn")
    p.add_argument("--filter", choices=("gaussian", "mean"),
                   default="gaussian")
    p.add_argument("--denoiser_stages", type=int, default=5)
    p.add_argument("--denoiser_epochs", type=int, default=5)
    p.add_argument("--freeze_denoiser", action="store_true",
                   help="freeze the pretrained AE encoder during mode-1 "
                        "HPE training (rebuild-only; the reference trains "
                        "end-to-end, main.py:65-67)")
    p.add_argument("--dataset_root", type=str, default="mmfi_data")
    p.add_argument("--wipose_root", type=str, default="wipose_data")
    p.add_argument("--config", type=str, default=None,
                   help="MM-Fi protocol/split YAML")
    p.add_argument("--output_dir", type=str, default="robustness_outputs")
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--epochs", type=int, default=60)     # constant.py epoch
    p.add_argument("--lr", type=float, default=1e-3)     # main.py:67
    p.add_argument("--optimizer", choices=("sgd", "adam"), default=None,
                   help="default: adam for the DSKNetTrans trainers "
                        "(att_mmfi.py:86), sgd otherwise (main.py:67)")
    p.add_argument("--patience", type=int, default=10 ** 6,
                   help="the reference runs fixed epochs; no early stop")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--devices", type=int, default=None,
                   help="mesh size (default: all devices)")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--synthetic_frames", type=int, default=48)
    p.add_argument("--synthetic_learnable", action="store_true",
                   help="derive synthetic CSI from the GT poses (one "
                        "fixed mixing map) so the model can actually "
                        "learn — use for measured sweeps")
    p.add_argument("--no_resume", action="store_true")
    p.add_argument("--no_scan", action="store_true",
                   help="per-batch steps instead of the whole-epoch "
                        "lax.scan (faster compiles for small smokes)")
    return p


def _load_mmfi(args):
    from wiflow_tpu.cli.run_mmfi import DEFAULT_CONFIG
    from wiflow_tpu.data.mmfi import (
        generate_synthetic_mmfi, make_dataset, split_val_test,
    )
    config = dict(DEFAULT_CONFIG)
    if args.config:
        import yaml
        with open(args.config, "r", encoding="utf-8") as fd:
            config.update(yaml.safe_load(fd))
    if args.synthetic and not os.path.isdir(args.dataset_root):
        print(f"[synthetic] generating miniature MM-Fi at "
              f"{args.dataset_root}")
        subs = ("S01", "S02", "S03", "S11") if args.synthetic_learnable \
            else ("S01", "S02", "S11")
        generate_synthetic_mmfi(args.dataset_root, subjects=subs,
                                actions=("A01", "A02"),
                                frames=args.synthetic_frames,
                                learnable=args.synthetic_learnable)
    if not os.path.isdir(args.dataset_root):
        raise FileNotFoundError(
            f"MM-Fi root {args.dataset_root!r} not found "
            f"(pass --synthetic for a test tree)")
    train_ds, val_ds = make_dataset(args.dataset_root, config)
    os.makedirs(args.output_dir, exist_ok=True)
    train_xy = train_ds.materialize(
        os.path.join(args.output_dir, "mmfi_train_cache.npz"))
    val_all = val_ds.materialize(
        os.path.join(args.output_dir, "mmfi_val_cache.npz"))
    vi, ti = split_val_test(len(val_ds))
    return (train_xy, (val_all[0][vi], val_all[1][vi]),
            (val_all[0][ti], val_all[1][ti]))


def _load_wipose(args):
    from wiflow_tpu.data.wipose import WiPoseDataset, generate_synthetic_wipose
    if args.synthetic and not os.path.isdir(args.wipose_root):
        generate_synthetic_wipose(args.wipose_root, per_split=64)
    train = WiPoseDataset(args.wipose_root, split="Train").materialize()
    test = WiPoseDataset(args.wipose_root, split="Test").materialize()
    n = len(test[0]) // 2
    return (train, (test[0][:n], test[1][:n]), (test[0][n:], test[1][n:]))


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    from wiflow_tpu.core.jax_cache import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()
    if args.model == "denoiser_hpe":
        args.mode = 1

    import jax.numpy as jnp

    from wiflow_tpu.core.config import Config, MeshConfig, OptimConfig, TrainConfig
    from wiflow_tpu.metrics.metrics import pckh_fractions_fn
    from wiflow_tpu.robustness.evaluate import evaluate_robustness
    from wiflow_tpu.robustness.noise import add_awgn
    from wiflow_tpu.robustness.filters import gaussian_filter, mean_filter
    from wiflow_tpu.train.loop import train_pose_model

    wipose = args.model in WIPOSE_MODELS
    if wipose:
        train_xy, val_xy, test_xy = _load_wipose(args)
        pck_fn = pckh_fractions_fn(6, 13)   # 18 kp (evaluation.py:33-57)
    else:
        train_xy, val_xy, test_xy = _load_mmfi(args)
        pck_fn = pckh_fractions_fn(1, 11)   # HPE-Li eval.py:44-76

    print(f"[split] train {len(train_xy[0])} / val {len(val_xy[0])} / "
          f"test {len(test_xy[0])}")

    results = {}
    mode0_cache = None   # mode-0 training is noise-level-independent
    for level in args.noise_levels:
        run_dir = os.path.join(args.output_dir,
                               f"{args.model}_mode{args.mode}_n{level}")
        os.makedirs(run_dir, exist_ok=True)

        parts = {"train": train_xy, "val": val_xy, "test": test_xy}
        if args.mode == 2 and level > 0:
            # corrupt + traditional-filter the CSI (main.py:100-105)
            filt = gaussian_filter if args.filter == "gaussian" else mean_filter
            rng = np.random.default_rng(args.seed)
            for name, (x, y) in parts.items():
                xn = add_awgn(x, level, rng)
                parts[name] = (np.asarray(filt(xn), np.float32), y)

        init_variables = None
        frozen = None
        if args.mode == 1:
            from wiflow_tpu.robustness.denoiser import train_denoiser_stage
            from wiflow_tpu.robustness.noise import (
                add_awgn_jax, add_salt_and_pepper_jax,
            )
            noise_jax = (add_awgn_jax if args.noise_kind == "awgn"
                         else add_salt_and_pepper_jax)
            # greedy stage-by-stage pre-training (denoiser_training.py)
            clean_nhwc = np.transpose(parts["train"][0], (0, 2, 3, 1))
            ae_vars = None
            for stage in range(1, args.denoiser_stages + 1):
                ae_vars = train_denoiser_stage(
                    clean_nhwc, stage,
                    lambda x, k: noise_jax(x, level, k),
                    prev_variables=ae_vars, epochs=args.denoiser_epochs,
                    seed=args.seed, verbose=True)
            init_variables = {
                "params": {"denoiser": ae_vars["params"]},
                "batch_stats": {"denoiser": ae_vars["batch_stats"]},
            }
            # Reference trains the composition end-to-end (main.py:65-67);
            # freezing the encoder is an explicit rebuild-only opt-in.
            frozen = ("denoiser",) if args.freeze_denoiser else None

        opt_kind = args.optimizer or (
            "adam" if args.model.startswith("dsknet") else "sgd")
        cfg = Config(
            train=TrainConfig(
                batch_size=args.batch_size, num_epochs=args.epochs,
                patience=args.patience, seed=args.seed,
                scan_epochs=not args.no_scan,
                # torch.optim.SGD defaults at main.py:67: momentum 0, no
                # gradient clipping (nothing clips anywhere in HPE-Li).
                optim=OptimConfig(lr=args.lr, kind=opt_kind,
                                  momentum=0.0, grad_clip_norm=None,
                                  schedule="linear_decay",
                                  decay_start=20, decay_end=50)),
            mesh=MeshConfig(num_devices=args.devices), output_dir=run_dir)

        if args.mode == 0 and mode0_cache is not None:
            # nothing in mode 0 depends on the level; reuse the model
            model, result = mode0_cache
        else:
            model = build_model(args.model, args.denoiser_stages)
            result = train_pose_model(
                parts["train"], parts["val"], parts["test"], cfg, run_dir,
                model=model, resume=not args.no_resume,
                loss_fn=conf_weighted_mse, to_keypoints=to_xy_keypoints,
                pck_fn=pck_fn, monitor="pck",
                init_variables=init_variables, frozen_params=frozen)
            if args.mode == 0:
                mode0_cache = (model, result)
            keys = sorted(result.history)
            with open(os.path.join(run_dir, "training_history.csv"), "w",
                      encoding="utf-8") as fd:
                fd.write(",".join(["epoch"] + keys) + "\n")
                for i in range(len(result.history[keys[0]])):
                    fd.write(",".join(
                        [str(i + 1)] + [f"{result.history[k][i]:.6g}"
                                        for k in keys]) + "\n")

        # post-training robustness sweep on the test split (main.py's
        # outer noise_level loop evaluates the trained model per level)
        import functools
        import jax as _jax
        variables = result.variables
        predict = _jax.jit(functools.partial(model.apply, variables,
                                             train=False))
        sweep = evaluate_robustness(
            predict, parts["test"][0], parts["test"][1][..., :2],
            noise_levels=(0.0, level) if level > 0 else (0.0,),
            noise_kind=args.noise_kind,
            cleaner=(args.filter if args.mode == 2 else "none"),
            pck_fn=pck_fn, batch_size=args.batch_size, seed=args.seed)
        results[level] = {
            "test_pck20": result.test_metrics["pck@0.2"],
            "test_pck50": result.test_metrics["pck@0.5"],
            "test_mpjpe": result.test_metrics["mpe"],
            "sweep": {str(k): v for k, v in sweep.items()},
        }
        print(f"[noise {level}] PCK@20 "
              f"{result.test_metrics['pck@0.2'] * 100:.2f}% "
              f"MPJPE {result.test_metrics['mpe']:.4f}")

    out_path = os.path.join(args.output_dir,
                            f"robustness_{args.model}_mode{args.mode}.json")
    with open(out_path, "w", encoding="utf-8") as fd:
        json.dump(results, fd, indent=2)
    print(f"[done] results -> {out_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
