"""Input-pipeline scaling micro-benchmark: decode+augment throughput vs
worker count, thread pool vs process pool.

Measures the TrainLoader (real JPEG decode + scale/flip/crop/blur/RandAug)
against a synthetic or on-disk VOC-layout tree, WITHOUT any device work, so
the numbers isolate the host pipeline. The compute bound to clear is printed
alongside (48 img/s on one v5e chip at the VOC config = batch 4 / 0.083 s).

Usage:
  python scripts/bench_loader.py --data_root work_dirs/synthdata \
      --split_dir work_dirs/synthdata/splits [--workers 1 2 4 -2 -4]
Negative worker counts select the process-pool decode path
(cosa_tpu/data/loader.py). Prints one JSON line per setting.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_root", required=True)
    ap.add_argument("--split_dir", default="")
    ap.add_argument("--batch_size", type=int, default=4)
    ap.add_argument("--n_batches", type=int, default=30)
    ap.add_argument("--workers", type=int, nargs="+",
                    default=[1, 2, 4, 8, -2, -4])
    args = ap.parse_args()

    from cosa_tpu.config import voc_config
    from cosa_tpu.data.loader import TrainLoader, build_train_dataset

    cfg = voc_config(
        data_root=args.data_root,
        split_dir=args.split_dir or os.path.join(args.data_root, "splits"),
    )
    nproc = os.cpu_count() or 1
    for w in args.workers:
        ds = build_train_dataset(cfg)
        loader = TrainLoader(
            ds, batch_size=args.batch_size, seed=0, num_workers=w,
            process_index=0, process_count=1,
        )
        try:
            for _ in range(3):  # warmup (pool spinup, first-touch caches)
                next(loader)
            t0 = time.perf_counter()
            for _ in range(args.n_batches):
                next(loader)
            dt = time.perf_counter() - t0
        finally:
            loader.close()
        imgs = args.n_batches * args.batch_size
        print(json.dumps({
            "workers": w,
            "pool": "process" if w < 0 else "thread",
            "imgs_per_sec": round(imgs / dt, 2),
            "sec_per_batch": round(dt / args.n_batches, 4),
            "batch_size": args.batch_size,
            "host_cores": nproc,
        }), flush=True)


if __name__ == "__main__":
    main()
