#!/bin/bash
# 5-model trained comparison table (VERDICT r4 item 3) mirroring ref
# README.md:109-120. TPU mode uses the reference-scale default
# (20k windows x 8 epochs); CPU mode runs a reduced but beyond-smoke
# scale sized to this box's ~86 ms/sample fwd+bwd (flagship, f32).
#
# Usage: bash measured/run_baselines_r04.sh [cpu|tpu]
set -e
cd "$(dirname "$0")/.."
MODE="${1:-cpu}"
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
if [ "$MODE" = cpu ]; then
  export JAX_PLATFORMS=cpu
  exec python -m wiflow_tpu.cli.baseline_table \
    --windows 6000 --epochs 6 --batch_size 64 --compute_dtype float32 \
    --output_dir measured/baselines_r04
else
  # Per-model recipes (the reference's table is per-recipe too):
  # - wiflow 30 epochs + lr 3e-4: its torch-faithful BN has a long
  #   eval-lag warmup; 8 epochs at lr 1e-4 leaves it at the mean-pose
  #   floor at this 14k-train-window scale (same remedy as the
  #   depthwise ablation row, measured/ablations_r04).
  # - wisppn/perunet batch 32: the 121M/309M-param upsampling models
  #   exhaust v5e HBM at batch 128 (measured RESOURCE_EXHAUSTED).
  # - wpformer batch 64: 18 ResNet34 streams, [B,256,15,144] concat.
  # - model order: the flagship row runs first by priority, then the
  #   cheap baselines before the HBM-heavy giants — rows persist after
  #   every model, so a wall-clock kill still leaves a useful table.
  # - max_steps_per_call 100 bounds each device execution so the giant
  #   models' multi-minute scans can't trip backend watchdogs.
  exec python -m wiflow_tpu.cli.baseline_table \
    --windows 20000 --epochs 8 --batch_size 128 \
    --models wiflow,hpeli,wpformer,perunet,wisppn \
    --per_model_epochs wiflow=30,wisppn=6,perunet=6 \
    --per_model_batch wisppn=32,perunet=32,wpformer=64 \
    --per_model_lr wiflow=3e-4 \
    --max_steps_per_call 100 \
    --output_dir measured/baselines_r04
fi
