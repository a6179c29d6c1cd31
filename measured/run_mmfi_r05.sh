#!/bin/bash
# Setting-3 measured run, round 5 (VERDICT r4 item 4): WiFlow-on-MM-Fi
# at a step budget that escapes the mean-pose floor, on the TPU.
#
# Round 4 diagnosed why its run stalled at the 6.4% PCK floor
# (measured/mmfi_r04/summary.md): the 46-step epochs of the small tree
# mis-scaled the reference's epoch-counted plateau/early-stop patience,
# and the step budget (~2.2k) was far below the BN eval-lag warmup.
# Round 5 fixes both systematically:
#   * steps-aware patience (OptimConfig.plateau_patience_steps /
#     TrainConfig.patience_steps) now scales patience per run — no
#     per-demo hand tuning;
#   * a 5x bigger learnable tree (80 sequences) + a 300-epoch budget
#     gives ~50k optimizer steps on the TPU.
#
# Usage: bash measured/run_mmfi_r05.sh
set -e
cd "$(dirname "$0")/.."
OUT=measured/mmfi_r05
TREE=/tmp/mmfi_tree_r05
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"

python - <<'EOF'
import os
if os.path.isdir("/tmp/mmfi_tree_r05"):
    raise SystemExit
from wiflow_tpu.data.mmfi import generate_synthetic_mmfi
generate_synthetic_mmfi(
    "/tmp/mmfi_tree_r05",
    subjects=tuple(f"S{i:02d}" for i in range(1, 11)),
    actions=tuple(f"A{i:02d}" for i in range(1, 9)),
    frames=297, learnable=True, fmt="mat")
print("[tree] 80 sequences x 297 frames generated")
EOF

mkdir -p "$OUT"
# lr 1e-3 (the r4 control probe's stable fixed rate); patience flags are
# left at their reference defaults — the steps-aware scaling handles the
# small-epoch geometry now.
python -m wiflow_tpu.cli.run_mmfi --dataset_root $TREE \
  --epochs 300 --batch_size 64 --lr 1e-3 --output_dir $OUT \
  --compute_dtype bfloat16 > "$OUT/train.log" 2>&1
tail -5 "$OUT/train.log"
