"""Generate the ShapesWSSS dataset (VOC12 on-disk layout) for the
learning-dynamics proof runs.

Usage:
  python scripts/make_synth_data.py --root work_dirs/synthdata \
      --n_train 3000 --n_val 200 --seed 0

Then train the UNMODIFIED VOC pipeline on it:
  python -m cosa_tpu.cli.train synthrun --dataset VOC12 \
      --data_root work_dirs/synthdata --split_dir work_dirs/synthdata/splits \
      --pretrained false ...
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cosa_tpu.data.synthwsss import CLASS_NAMES, make_dataset  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True)
    ap.add_argument("--n_train", type=int, default=3000)
    ap.add_argument("--n_val", type=int, default=200)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--jpeg_quality", type=int, default=92)
    args = ap.parse_args()

    t0 = time.time()
    meta = make_dataset(args.root, args.n_train, args.n_val, args.seed,
                        jpeg_quality=args.jpeg_quality)
    with open(os.path.join(args.root, "splits", "voc", "class_names.txt"),
              "w") as f:
        f.write("\n".join(CLASS_NAMES) + "\n")
    meta["seconds"] = round(time.time() - t0, 1)
    print(json.dumps(meta))


if __name__ == "__main__":
    main()
