"""Test-time noise robustness of the trained ablation variants.

Epilogue to the round-5 ablation table (measured/ablations_r05/lr1e3):
on the clean multipath synthetic test split the simpler variants out-fit
the full model (the generator is clean, stationary, and train/test are
iid — raw capacity wins, unlike the reference's real-CSI table, ref
/root/reference/README.md:240-248).  The reference architecture's
inductive biases (causal dilated TCN, grouped convs, axial attention)
are noise/nuisance-robustness mechanisms, so the honest follow-up
question is: does the ordering change when the TEST CSI is corrupted?

Evaluates every variant's best checkpoint on the SAME test split under
AWGN at several levels (robustness/noise.py::add_awgn_jax — the
HPE-Li sweep's corruption model, ref HPE-Li/utils/noise.py:12-29) and
writes noise_eval.{json,md} next to the table.

Usage: python measured/ablation_noise_eval_r05.py [--dir measured/ablations_r05/lr1e3]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--dir", default="measured/ablations_r05/lr1e3")
    p.add_argument("--windows", type=int, default=60_000,
                   help="must match the ablation run (test split derives "
                        "from it)")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--levels", type=float, nargs="+",
                   default=[0.0, 0.05, 0.1, 0.2])
    args = p.parse_args()

    from wiflow_tpu.core.jax_cache import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()

    import jax
    import jax.numpy as jnp

    from wiflow_tpu.cli.ablation_demo import VARIANTS
    from wiflow_tpu.cli.convergence_demo import synth_windows
    from wiflow_tpu.core.checkpoint import load_best_model
    from wiflow_tpu.core.config import ModelConfig
    from wiflow_tpu.metrics.metrics import pck_correct_fractions
    from wiflow_tpu.models.wiflow import WiFlowPoseModel
    from wiflow_tpu.robustness.noise import add_awgn_jax

    # reproduce the ablation driver's test split exactly
    # (ablation_demo.main: test = synth_windows(n - n_tr - n_va, seed+202))
    n = args.windows
    n_te = n - int(n * 0.7) - int(n * 0.15)
    x, y = synth_windows(n_te, args.seed + 202, mode="multipath")
    x = x.astype(jnp.float32)

    rows = []
    for name, _ref_row, overrides in VARIANTS:
        path = os.path.join(args.dir, name, "best_pose_model.msgpack")
        if not os.path.exists(path):
            print(f"[skip] {name}: no checkpoint at {path}")
            continue
        variables = load_best_model(path)
        model = WiFlowPoseModel(ModelConfig(**overrides))

        @jax.jit
        def fwd_metrics(variables, xb, yb, level, key, model=model):
            # level is a traced scalar: one compile per variant, not per
            # level (level 0.0 degenerates to zero-std noise = clean)
            xn = add_awgn_jax(xb, level, key)
            pred = model.apply(variables, xn, train=False)
            pck = pck_correct_fractions(pred, yb, (0.2,), True)[0]
            mpe = jnp.mean(jnp.linalg.norm(pred - yb, axis=-1))
            return pck, mpe

        def eval_level(level: float) -> dict:
            key = jax.random.key(7)
            lv = jnp.float32(level)
            pcks, mpes = [], []
            bs = 1024
            for i in range(0, n_te - bs + 1, bs):
                pck, mpe = fwd_metrics(variables, x[i:i + bs], y[i:i + bs],
                                       lv, key)
                pcks.append(float(pck))
                mpes.append(float(mpe))
            return {"pck20": round(100 * float(np.mean(pcks)), 2),
                    "mpjpe_m": round(float(np.mean(mpes)), 4)}

        row = {"variant": name}
        for lv in args.levels:
            row[f"awgn_{lv}"] = eval_level(lv)
        rows.append(row)
        print(f"[{name}] " + " | ".join(
            f"σ={lv}: PCK@20 {row[f'awgn_{lv}']['pck20']}%"
            for lv in args.levels))

    out = {"levels": args.levels, "rows": rows,
           "note": "AWGN std = level * (max-min) of the batch, the "
                   "HPE-Li corruption model; same test split and best "
                   "checkpoints as ablation_table.md"}
    with open(os.path.join(args.dir, "noise_eval.json"), "w") as fd:
        json.dump(out, fd, indent=2)
    md = ["| Variant | " + " | ".join(f"PCK@20 σ={lv}" for lv in args.levels)
          + " |",
          "|---|" + "---|" * len(args.levels)]
    for r in rows:
        md.append(f"| {r['variant']} | " + " | ".join(
            str(r[f"awgn_{lv}"]["pck20"]) for lv in args.levels) + " |")
    with open(os.path.join(args.dir, "noise_eval.md"), "w") as fd:
        fd.write("\n".join(md) + "\n")
    print(f"[done] -> {args.dir}/noise_eval.{{json,md}}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
