#!/usr/bin/env bash
# One-command VOC accuracy parity vs the released reference run.
#
#   VOC_ROOT=/data/VOC2012 ./scripts/parity_voc.sh /path/to/best_seg.pth
#
# best_seg.pth = the released CoSA VOC checkpoint (reference README.md:131
# links the 76.2-mIoU weights). Runs full finaleval (1449 val images,
# 5-scale+flip TTA, CRF) and diffs every per-class IoU against the pinned
# table from the released log (voc_expected_final.json <- voc_log.txt:723).
set -e
cd "$(dirname "$0")/.."
python scripts/parity_voc.py "$@"
