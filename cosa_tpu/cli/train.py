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


def _maybe_enable_compile_cache(jax) -> None:
    """Opt-in persistent compilation cache (COSA_XLA_CACHE_DIR): repeated
    launches of the same config skip the multi-minute XLA compile. Off by
    default — XLA:CPU AOT reloads can warn/SIGILL across host types."""
    cache = os.environ.get("COSA_XLA_CACHE_DIR")
    if cache:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def main(argv=None) -> None:
    import jax

    _maybe_enable_compile_cache(jax)
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
