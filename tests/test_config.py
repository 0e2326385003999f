"""Config system tests: preset overlays (reference args.py vs args_coco.py
deltas), CLI parsing, changed-args echo."""

import pytest

from cosa_tpu.config import (
    Config,
    coco_config,
    diff_from_preset,
    parse_cli,
    voc_config,
)


def test_coco_preset_deltas_match_reference():
    """args_coco.py differs from args.py exactly in these fields."""
    voc, coco = voc_config(), coco_config()
    assert coco.eval_iters == 6000 and voc.eval_iters == 2000
    assert coco.num_classes == 81 and voc.num_classes == 21
    assert coco.batch_size == 4 and voc.batch_size == 2
    assert coco.max_iters == 60000 and voc.max_iters == 40000
    assert coco.warmup_iters == 10000 and voc.warmup_iters == 6000
    assert coco.high_thre == 0.65 and voc.high_thre == 0.7
    # everything else identical
    same = ("lr", "momentum", "seg_weight", "cam_weight", "low_thre",
            "bkg_thre", "crop_size", "pseudo_scales", "detach")
    for f in same:
        assert getattr(voc, f) == getattr(coco, f), f


def test_cli_dataset_dispatch_and_overrides():
    cfg = parse_cli(["myrun", "--dataset", "COCO", "--lr", "1e-4"])
    assert cfg.name == "myrun"
    assert cfg.num_classes == 81  # COCO preset applied
    assert cfg.lr == 1e-4  # override survives
    assert cfg.batch_size == 4


def test_diff_echo():
    cfg = voc_config(lr=1e-4, usegmm=True)
    d = diff_from_preset(cfg)
    assert d == {"lr": 1e-4, "usegmm": True}


def test_validation_rejects_bad_values():
    with pytest.raises(AssertionError):
        Config(decoder="nope").validate()
    with pytest.raises(AssertionError):
        Config(pseudo_scales=(0.5, 1.5)).validate()  # missing 1.0


def test_tuple_cli_args():
    cfg = parse_cli(["r", "--pseudo_scales", "1.0", "0.75"])
    assert cfg.pseudo_scales == (1.0, 0.75)
