#!/bin/bash
# Ablation-table refresh (VERDICT r4 item 2): the r3 depthwise row was an
# under-stepped run — its history shows steady learning (val MPE
# 0.379 -> 0.239 and still falling at epoch 30) with the plateau
# scheduler already at lr 1e-5; the groups==channels lowering itself is
# numerics-tested (tests/test_ops.py). A depthwise-separable TCN has
# ~1/9 the multiplicative capacity per step of the grouped one and wants
# a larger step size, so the refresh gives it lr 1e-3.
#
# TPU mode re-runs the full 5-variant grid at the r3 scale; CPU mode
# runs the two rows that settle the question (full vs tuned depthwise)
# at a reduced scale.
#
# Usage: bash measured/run_ablations_r04.sh [cpu|tpu]
set -e
cd "$(dirname "$0")/.."
MODE="${1:-cpu}"
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
if [ "$MODE" = cpu ]; then
  export JAX_PLATFORMS=cpu
  exec python -m wiflow_tpu.cli.ablation_demo \
    --windows 5000 --epochs 10 --batch_size 64 \
    --variants full,group_depthwise --depthwise_lr 1e-3 \
    --compute_dtype float32 --output_dir measured/ablations_r04
else
  exec python -m wiflow_tpu.cli.ablation_demo \
    --windows 60000 --epochs 30 --batch_size 128 \
    --depthwise_lr 1e-3 --output_dir measured/ablations_r04
fi
