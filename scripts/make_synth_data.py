"""Generate the ShapesWSSS dataset for the learning-dynamics proof runs.

Two on-disk layouts (cosa_tpu/data/synthwsss.py::make_dataset):
  * --layout voc  (default): 20 fg classes, VOC12 layout — train the
    UNMODIFIED VOC pipeline on it:
      python scripts/make_synth_data.py --root work_dirs/synthdata \
          --n_train 3000 --n_val 200 --seed 0
      python -m cosa_tpu.cli.train synthrun --dataset VOC12 \
          --data_root work_dirs/synthdata \
          --split_dir work_dirs/synthdata/splits --pretrained false ...
  * --layout coco: 80 fg classes (20 hues x 4 textures), COCO layout
    (train2014/val2014 + SegmentationClass/val2014 + val_part split) — the
    81-class COCO pipeline end to end:
      python scripts/make_synth_data.py --root work_dirs/synthdata_coco \
          --layout coco --n_train 6000 --n_val 200
      python -m cosa_tpu.cli.train synthcoco --dataset COCO \
          --data_root work_dirs/synthdata_coco \
          --split_dir work_dirs/synthdata_coco/splits --pretrained false ...
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cosa_tpu.data.synthwsss import class_names, make_dataset  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True)
    ap.add_argument("--layout", choices=("voc", "coco"), default="voc")
    ap.add_argument("--n_train", type=int, default=3000)
    ap.add_argument("--n_val", type=int, default=200)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--jpeg_quality", type=int, default=92)
    ap.add_argument("--fade", type=float, nargs=2, default=None,
                    metavar=("LO", "HI"),
                    help="drifting-contrast regime: per-image foreground "
                         "fade factor ~ U(LO, HI) (GMM A/B, round 5)")
    args = ap.parse_args()

    t0 = time.time()
    meta = make_dataset(args.root, args.n_train, args.n_val, args.seed,
                        jpeg_quality=args.jpeg_quality, layout=args.layout,
                        fade_range=tuple(args.fade) if args.fade else None)
    names = class_names(meta["n_hues"], meta["n_textures"])
    with open(os.path.join(args.root, "splits", args.layout,
                           "class_names.txt"), "w") as f:
        f.write("\n".join(names) + "\n")
    meta["seconds"] = round(time.time() - t0, 1)
    print(json.dumps(meta))


if __name__ == "__main__":
    main()
