#!/bin/bash
# Round-5 refresh of the 5-model comparison table (VERDICT r4 items 2+3).
#
# Seeds measured/baselines_r05 from the committed r04 rows (same data:
# 20k 'linear'-mode synthetic windows, seed 42 — rows stay comparable),
# then re-trains the two rows the verdict flagged:
#
#   * wpformer — the r04 row (PCK@20 7.21) never left the mean-PAM
#     floor.  Probe (round 5, 8k windows): the reference recipe is
#     SGD(0.9) + ImageNet ResNet34 warm-start (ref baseline/WPformer/
#     model.py:302-328,930-942); with no ImageNet weights in this
#     environment, SGD from random init memorizes without generalizing
#     (30 epochs: train loss 0.042->0.029 while val PCK stays 7.0%,
#     lr 1e-3/1e-2/3e-2 all), while Adam 1e-3 generalizes in 8 epochs
#     (test PCK 15.8% at probe scale).  Row recipe: Adam 1e-3,
#     15 epochs — recorded in the table JSON via the new "optim" field.
#   * perunet — re-run only to fill the FLOPs cell via the analytic
#     jaxpr fallback (VERDICT r4 weak #5); recipe unchanged.
#
# Usage: bash measured/run_baselines_r05.sh
set -e
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
OUT=measured/baselines_r05
mkdir -p "$OUT"
[ -f "$OUT/comparison_summary.json" ] || \
  cp measured/baselines_r04/comparison_summary.json "$OUT/"

python -m wiflow_tpu.cli.baseline_table \
  --windows 20000 --epochs 8 --batch_size 128 \
  --models wpformer,perunet \
  --per_model_epochs wpformer=15,perunet=6 \
  --per_model_batch wpformer=64,perunet=32 \
  --per_model_lr wpformer=1e-3 \
  --per_model_kind wpformer=adam \
  --max_steps_per_call 100 \
  --output_dir "$OUT"
