#!/bin/bash
# Ablation-table rerun on the 'multipath' synthetic mode (VERDICT r4
# item 6): the r3/r4 tables ran on the 'linear' observation model —
# one global linear map of [pose, velocity] into subcarrier space,
# instantaneously invertible per frame — so a plain per-frame encoder
# (conv2d_encoder) could beat the full model and the table demonstrated
# config plumbing, not the architecture's value.
#
# 'multipath' (convergence_demo.synth_windows, commit c3cebf7) encodes
# pose in WRAPPED (cosine) path delays with per-subcarrier wavenumbers
# plus Doppler-style amplitude modulation: per-frame, per-subcarrier
# observations are many-to-one, so position must be disambiguated by
# combining subcarriers of different wavenumber (the axial-attention /
# grouped-conv axis) and by temporal smoothness of the path delays (the
# TCN axis) — the WiFi-CSI physics the reference architecture targets
# (ref README.md:13-27, ablation table ref README.md:240-248).
#
# Recipe matches the r3 TPU grid (60k windows, 30 epochs) so rows are
# comparable; depthwise keeps the r4 lr remedy. Steps-aware patience
# (commit c3cebf7) handles the small-epoch geometry — no per-variant
# patience tuning.
#
# NOTE: per-variant run dirs (full/, tcn_plain/, ...) RESUME from
# latest_checkpoint on re-invocation (kill-safety). If the generator or
# synth recipe changes (e.g. the P=8 -> P=48 fix,
# measured/ablations_r05/README.md), clear those dirs first.
#
# Usage: bash measured/run_ablations_r05.sh [cpu|tpu]
set -e
cd "$(dirname "$0")/.."
MODE="${1:-tpu}"
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
if [ "$MODE" = cpu ]; then
  export JAX_PLATFORMS=cpu
  exec python -m wiflow_tpu.cli.ablation_demo \
    --windows 5000 --epochs 10 --batch_size 64 \
    --variants full,conv2d_encoder --synth_mode multipath \
    --compute_dtype float32 --output_dir measured/ablations_r05
else
  exec python -m wiflow_tpu.cli.ablation_demo \
    --windows 60000 --epochs 30 --batch_size 128 \
    --depthwise_lr 1e-3 --synth_mode multipath \
    --output_dir measured/ablations_r05
fi
