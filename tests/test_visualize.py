"""Visualization + eval artifact dump tests."""

import os

import numpy as np
from PIL import Image

import jax

from cosa_tpu.config import preset_config
from cosa_tpu.data.loader import build_val_dataset
from cosa_tpu.eval import evaluate
from cosa_tpu.models import build_model
from cosa_tpu.train import create_train_state
from cosa_tpu.utils.visualize import (
    cam_overlay,
    save_cam_on_image,
    save_merge,
    save_seg,
    voc_palette,
)

RNG = np.random.default_rng(0)


def test_voc_palette_matches_reference_constants():
    # first rows of the reference PALETTE (utils/seg_helper.py:12-39)
    pal = voc_palette(8)
    expect = np.array(
        [[0, 0, 0], [128, 0, 0], [0, 128, 0], [128, 128, 0], [0, 0, 128],
         [128, 0, 128], [0, 128, 128], [128, 128, 128]], np.uint8,
    )
    np.testing.assert_array_equal(pal, expect)


def test_save_seg_roundtrip(tmp_path):
    seg = RNG.integers(0, 21, (16, 16)).astype(np.uint8)
    path = str(tmp_path / "seg.png")
    save_seg(seg, path, 21)
    back = np.asarray(Image.open(path))
    np.testing.assert_array_equal(back, seg)


def test_cam_overlay_and_merge(tmp_path):
    img = RNG.integers(0, 255, (16, 20, 3)).astype(np.uint8)
    cam = RNG.random((16, 20)).astype(np.float32)
    out = cam_overlay(img, cam)
    assert out.shape == (16, 20, 3) and out.dtype == np.uint8
    save_cam_on_image(img, cam, str(tmp_path / "cam.png"))
    save_merge(img, cam, cam > 0.5, cam > 0.3, str(tmp_path / "merge.png"))
    assert np.asarray(Image.open(tmp_path / "merge.png")).shape == (16, 80, 3)


def test_evaluate_save_dir(tmp_path):
    cfg = preset_config(
        "synthetic", backbone="vit_tiny_test", crop_size=64,
        mixed_precision=False, flash_attention=False, eval_scales=(1.0,),
    )
    model = build_model(cfg)
    state = create_train_state(cfg, model, 2)
    ds = build_val_dataset(cfg)
    evaluate(cfg, model, state.student, ds, max_images=2, save_dir=str(tmp_path))
    assert os.listdir(tmp_path / "seg")
