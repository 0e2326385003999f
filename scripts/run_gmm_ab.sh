#!/bin/bash
# GMM fixed-vs-adaptive A/B on the drifting-contrast ShapesWSSS regime
# (round 5; VERDICT r4 "give GMM a fair fight").
#
# The standard ShapesWSSS task has crisp, saturated foregrounds — CAMs
# peak sharply and the reference's hand-tuned fixed thresholds (0.25/0.7,
# args.py) are near-optimal, which is why the round-3 GMM-on run LOST
# (57.5 vs 68.0; the reference itself ships usegmm=False for its released
# numbers, assets/logs/voc_log.txt:51). This regime instead draws a
# per-image foreground fade ~ U(0.35, 1.0): part of the population is
# faint, its CAMs diffuse and low-peaked, so no single fixed (low, high)
# pair fits the whole CAM-maxima distribution — the situation adaptive
# thresholds (seg_helper.py:924-959) exist for. Both arms run the same
# config; only --usegmm differs. thre_low/thre_high are in metrics.jsonl
# for both arms (fixed constants vs the GMM EMA trajectory), so the
# adaptation is auditable: scripts/report_synth.py prints both.
#
# Usage: scripts/run_gmm_ab.sh [suffix] [extra flags...]
#   runs work_dirs/gmmab_fixed{suffix} then work_dirs/gmmab_gmm{suffix}
set -e
cd "$(dirname "$0")/.."
SUFFIX=${1:-_r5}
shift || true

[ -d work_dirs/synthdata_faint/JPEGImages ] || \
  python scripts/make_synth_data.py --root work_dirs/synthdata_faint \
    --n_train 3000 --n_val 200 --seed 0 --fade 0.35 1.0

common=(--dataset VOC12
  --data_root work_dirs/synthdata_faint
  --split_dir work_dirs/synthdata_faint/splits
  --pretrained false
  --lr 3e-4
  --max_iters 6000
  --warmup_iters 1500
  --lr_warmup_iters 500
  --warmup_gate_floor 0.01
  --eval_iters 500
  --batch_size 4)

python -m cosa_tpu.cli.train "gmmab_fixed$SUFFIX" "${common[@]}" \
  --usegmm false "$@"
python -m cosa_tpu.cli.train "gmmab_gmm$SUFFIX" "${common[@]}" \
  --usegmm true "$@"
