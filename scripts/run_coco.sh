#!/usr/bin/env bash
# COCO co-training launch — twin of reference run_coco.sh.
set -e
COCO_ROOT=${COCO_ROOT:-/data/coco}
python -m cosa_tpu.cli.train coco_cosa \
  --dataset COCO \
  --data_root "$COCO_ROOT" \
  --batch_size 4 \
  "$@"
