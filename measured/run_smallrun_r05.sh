#!/bin/bash
# Demo-scale flagship run with 100% SHIPPED defaults (VERDICT r4 item 5:
# "the next demo needs zero per-model lr/patience archaeology").
#
# Geometry: 6,000 synthetic windows (4,200 train / batch 256 = 16
# steps/epoch) — far below the reference recipe's 3,937 steps/epoch, the
# regime where round 4 needed three hand-tunings (lr overrides, patience
# flags).  Here NOTHING is overridden: lr stays the reference recipe's
# 1e-4 (ref train.py:105), plateau/early-stop patience are the shipped
# steps-aware defaults (OptimConfig.plateau_patience_steps, commit
# c3cebf7) which stretch the 3-epoch patience to ceil(3*3937/16) = 739
# epochs automatically instead of strangling lr during the step-counted
# BN eval-lag warmup.  150 epochs = 2,400 optimizer steps total, the
# same step budget at which the reference-scale run crosses the
# mean-pose floor (measured/kill_resume_r03: crossed during epoch 2,
# ~2k steps at 984 steps/epoch).
#
# Success = test PCK@20 way clear of the ~8-10% mean-pose floor and
# val MPE well under the 0.261 m mean-pose floor of this generator.
# The fast mechanism pin lives in
# tests/test_train.py::test_shipped_patience_survives_demo_scale_warmup.
set -e
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
exec python -m wiflow_tpu.cli.convergence_demo \
  --windows 6000 --epochs 150 --no_videos \
  --output_dir measured/smallrun_r05
