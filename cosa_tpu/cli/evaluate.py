"""Standalone evaluation CLI — twin of reference finaleval (main.py:401-433).

Usage:
  python -m cosa_tpu.cli.evaluate run_name --dataset VOC12 --data_root ... \
      [--pretrained_path ckpt.pth]
Evaluates the run's best_seg checkpoint (or a given torch/orbax checkpoint)
on the full val split with CRF refinement.
"""

from __future__ import annotations


def main(argv=None) -> None:
    import jax

    from cosa_tpu.cli.train import _maybe_enable_compile_cache
    from cosa_tpu.config import parse_cli
    from cosa_tpu.train.loop import finaleval

    _maybe_enable_compile_cache(jax)
    cfg = parse_cli(argv)
    finaleval(cfg)


if __name__ == "__main__":
    main()
