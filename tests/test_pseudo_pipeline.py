"""Standalone pseudo-label pipeline tests (BASELINE configs #1/#2)."""

import os

import numpy as np
import pytest

from cosa_tpu.config import preset_config
from cosa_tpu.data.loader import build_val_dataset
from cosa_tpu.eval.pseudo_pipeline import generate_pseudo_labels
from cosa_tpu.models import build_model
from cosa_tpu.train import create_train_state


@pytest.mark.parametrize("usepar", [False, True])
def test_pseudo_pipeline(tmp_path, usepar):
    cfg = preset_config(
        "synthetic",
        backbone="vit_tiny_test",
        crop_size=64,
        mixed_precision=False,
        flash_attention=False,
        pseudo_scales=(1.0, 0.5),
        usepar=usepar,
        par_iters=2,
        par_dilations=(1, 2),
    )
    model = build_model(cfg)
    state = create_train_state(cfg, model, 2)
    ds = build_val_dataset(cfg)
    res = generate_pseudo_labels(
        cfg, model, state.student, ds, str(tmp_path), max_images=2
    )
    assert 0.0 <= res["miou"] <= 1.0
    assert len(os.listdir(tmp_path / "mask")) == 2
    assert len(os.listdir(tmp_path / "cam")) == 2
