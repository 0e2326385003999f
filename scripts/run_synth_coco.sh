#!/bin/bash
# ShapesWSSS-COCO learning-dynamics proof run (round 4).
#
# Trains the UNMODIFIED 81-class COCO pipeline (ViT-B/16, 448^2, global
# batch 8, from scratch) on the COCO-shaped procedural WSSS task
# (80 fg classes = 20 hues x 4 textures; scripts/make_synth_data.py
# --layout coco), exercising every COCO-specific code path end to end:
# the args_coco.py preset deltas, train2014/val2014 + SegmentationClass
# layout, the coco cls_labels_onehot.npy dict (reference coco.py:22), and
# during-training eval on the val_part subset (dataloaders/__init__.py:25).
#
# Usage: scripts/run_synth_coco.sh [name] [extra flags...]
set -e
cd "$(dirname "$0")/.."
NAME=${1:-synthcoco_r4}
shift || true

[ -d work_dirs/synthdata_coco/train2014 ] || \
  python scripts/make_synth_data.py --root work_dirs/synthdata_coco \
    --layout coco --n_train 6000 --n_val 200 --seed 0

python -m cosa_tpu.cli.train "$NAME" --dataset COCO \
  --data_root work_dirs/synthdata_coco \
  --split_dir work_dirs/synthdata_coco/splits \
  --pretrained false \
  --lr 3e-4 \
  --max_iters 8000 \
  --warmup_iters 1200 \
  --lr_warmup_iters 500 \
  --warmup_gate_floor 0.01 \
  --eval_iters 1000 \
  --batch_size 8 \
  "$@"
