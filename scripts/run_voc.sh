#!/usr/bin/env bash
# VOC12 co-training launch — twin of reference run_voc.sh.
#
# Hyperparameter provenance (SURVEY.md §2.9): the released VOC log used
# aux_layer=-3 (our default), low_thre=0.2 (vs the 0.25 args.py default) and
# max_iters=32000 (reference run_voc.sh:10, assets/logs/voc_log.txt:32);
# we pass the log's values explicitly for parity runs.
#
# The reference launches 2 processes via torchrun; here one process drives
# all local TPU devices (batch_size is per-device; global batch = 2 devices
# x 2 = 4 on a 2-chip slice, matching the reference's 2x2).
set -e
VOC_ROOT=${VOC_ROOT:-/data/VOC2012}
python -m cosa_tpu.cli.train voc_cosa \
  --dataset VOC12 \
  --data_root "$VOC_ROOT" \
  --batch_size 2 \
  --max_iters 32000 \
  --eval_iters 4000 \
  --low_thre 0.2 \
  "$@"
