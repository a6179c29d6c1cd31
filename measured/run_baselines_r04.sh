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
  exec python -m wiflow_tpu.cli.baseline_table \
    --windows 20000 --epochs 8 --batch_size 128 \
    --output_dir measured/baselines_r04
fi
