#!/bin/bash
# ShapesWSSS learning-dynamics proof runs (round 3).
#
# Trains the UNMODIFIED VOC12 pipeline (ViT-B/16, 448^2, from scratch — no
# pretrained weights exist in this environment) on the procedurally
# generated solvable WSSS task (scripts/make_synth_data.py), demonstrating
# the full co-training dynamic end to end: CAM + Seg mIoU climbing across
# validations, best-checkpoint selection, finaleval + CRF.
#
# Usage: scripts/run_synth.sh [name] [extra flags...]
#   headline:  scripts/run_synth.sh synthrun_r3
#   gmm-on:    scripts/run_synth.sh synthrun_gmm --usegmm true --max_iters 4000
set -e
cd "$(dirname "$0")/.."
NAME=${1:-synthrun_r3}
shift || true

[ -d work_dirs/synthdata/JPEGImages ] || \
  python scripts/make_synth_data.py --root work_dirs/synthdata \
    --n_train 3000 --n_val 200 --seed 0

python -m cosa_tpu.cli.train "$NAME" --dataset VOC12 \
  --data_root work_dirs/synthdata \
  --split_dir work_dirs/synthdata/splits \
  --pretrained false \
  --lr 3e-4 \
  --max_iters 10000 \
  --warmup_iters 1500 \
  --lr_warmup_iters 500 \
  --warmup_gate_floor 0.01 \
  --eval_iters 500 \
  --batch_size 4 \
  "$@"
