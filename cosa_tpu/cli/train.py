"""Training CLI — twin of reference main.py's __main__ + run_voc.sh/run_coco.sh.

Usage:
  python -m cosa_tpu.cli.train my_run --dataset VOC12 --data_root /data/VOC2012
  python -m cosa_tpu.cli.train my_run --dataset COCO --data_root /data/coco

Unlike the torchrun launch (one OS process per GPU), a single process drives
all local devices; multi-host runs call jax.distributed.initialize() when the
usual cluster env vars are present.
"""

from __future__ import annotations

import os


def main(argv=None) -> None:
    import jax

    if os.environ.get("COORDINATOR_ADDRESS"):
        jax.distributed.initialize()

    from cosa_tpu.config import parse_cli
    from cosa_tpu.train.loop import finaleval, train

    cfg = parse_cli(argv)
    train(cfg)
    if cfg.finalval:
        finaleval(cfg)


if __name__ == "__main__":
    main()
