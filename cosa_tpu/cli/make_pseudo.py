"""Pseudo-label generation CLI (BASELINE configs #1/#2).

Usage:
  python -m cosa_tpu.cli.make_pseudo my_run --dataset VOC12 --data_root ... \
      [--pretrained_path best_seg.pth] [--usepar true]
Writes palette-PNG pseudo masks + raw CAM .npy under
{work_dir}/{name}/pseudo/ and prints the pseudo-mask quality table.
"""

from __future__ import annotations

import os


def main(argv=None) -> None:
    import jax

    from cosa_tpu.config import parse_cli
    from cosa_tpu.data.loader import build_val_dataset
    from cosa_tpu.eval.pseudo_pipeline import generate_pseudo_labels
    from cosa_tpu.models import build_model
    from cosa_tpu.train.loop import output_dir
    from cosa_tpu.train.state import create_train_state

    cfg = parse_cli(argv)
    model = build_model(cfg)
    state = create_train_state(cfg, model, cfg.batch_size)
    params = state.student
    if cfg.pretrained_path:
        from cosa_tpu.models.convert import (
            _merge,
            load_torch_checkpoint,
            network_params_from_torch,
        )
        from cosa_tpu.models.vit import BACKBONES

        sd = load_torch_checkpoint(cfg.pretrained_path)
        params = _merge(params, network_params_from_torch(
            sd, BACKBONES[cfg.backbone].depth))

    ds = build_val_dataset(cfg)
    out = os.path.join(output_dir(cfg), "pseudo")
    res = generate_pseudo_labels(cfg, model, params, ds, out)
    print({k: (round(v, 4) if isinstance(v, float) else "...") for k, v in res.items()
           if k != "iou"})


if __name__ == "__main__":
    main()
