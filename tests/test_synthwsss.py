"""ShapesWSSS generator tests: determinism, label/mask consistency,
solvability signals, and end-to-end compatibility with the VOC pipeline."""

import os

import numpy as np
import pytest

from cosa_tpu.data import synthwsss as sw


def test_deterministic_and_valid():
    a, ma, oa = sw.render_sample(7, 42)
    b, mb, ob = sw.render_sample(7, 42)
    assert (a == b).all() and (ma == mb).all() and (oa == ob).all()
    assert a.dtype == np.uint8 and ma.dtype == np.uint8
    assert a.shape[:2] == ma.shape
    assert ma.max() <= sw.N_FG
    # onehot reflects exactly the visible classes
    present = np.unique(ma)
    present = present[present > 0]
    assert set(np.nonzero(oa)[0] + 1) == set(present.tolist())


def test_class_coverage_and_balance():
    """All 20 classes appear across a modest sample of images."""
    seen = np.zeros(sw.N_FG)
    for i in range(120):
        _, _, oh = sw.render_sample(0, i)
        seen += oh
    assert (seen > 0).all(), f"classes never sampled: {np.where(seen == 0)[0] + 1}"


def test_solvability_signal():
    """Foreground must be chromatically separable from background+distractors
    (that is the designed weak-supervision signal): mean fg saturation far
    above mean bg saturation."""
    fg_sat, bg_sat = [], []
    for i in range(20):
        img, mask, _ = sw.render_sample(3, i)
        rgb = img.astype(np.float32) / 255.0
        mx, mn = rgb.max(-1), rgb.min(-1)
        sat = np.where(mx > 0, (mx - mn) / np.maximum(mx, 1e-6), 0)
        if (mask > 0).any():
            fg_sat.append(sat[mask > 0].mean())
        bg_sat.append(sat[mask == 0].mean())
    assert np.mean(fg_sat) > 0.45
    assert np.mean(bg_sat) < 0.25
    assert np.mean(fg_sat) - np.mean(bg_sat) > 0.3


def test_boundary_ignore_ring():
    mask = np.zeros((32, 32), np.uint8)
    mask[8:20, 8:20] = 5
    out = sw.boundary_ignore(mask, width=2)
    assert (out[10:18, 10:18] == 5).all()  # interior intact
    assert (out == 255).sum() > 0
    # the ring hugs the boundary on both sides
    assert out[8, 8] == 255 and out[7, 8] == 255


def test_make_dataset_voc_layout(tmp_path):
    root = str(tmp_path / "synth")
    meta = sw.make_dataset(root, n_train=4, n_val=3, seed=1)
    assert meta["n_train"] == 4
    # VOC layout
    imgs = os.listdir(os.path.join(root, "JPEGImages"))
    assert len(imgs) == 7
    # masks only for val (weak supervision: train GT withheld)
    segs = os.listdir(os.path.join(root, "SegmentationClassAug"))
    assert len(segs) == 3
    labels = np.load(
        os.path.join(root, "splits", "voc", "cls_labels_onehot.npy"),
        allow_pickle=True,
    ).item()
    assert len(labels) == 7
    for v in labels.values():
        assert v.shape == (sw.N_FG,)

    # the unmodified VOC12 dataset classes load it
    from cosa_tpu.config import voc_config
    from cosa_tpu.data.loader import build_train_dataset, build_val_dataset

    cfg = voc_config(
        data_root=root, split_dir=os.path.join(root, "splits"),
        crop_size=64, num_classes=sw.N_FG + 1,
    )
    tr = build_train_dataset(cfg)
    s = tr[(0, 1)]
    assert s["wimg"].shape == (64, 64, 3)
    assert s["cls_label"].shape == (sw.N_FG,)
    va = build_val_dataset(cfg)
    v = va[0]
    assert v["image"].ndim == 3 and v["label"].shape == v["image"].shape[:2]
    assert (np.unique(v["label"]) <= sw.N_FG).sum() + (
        255 in np.unique(v["label"])
    ) > 0


def test_voc_generator_unchanged_by_coco_extension():
    """The round-3 run artifacts (work_dirs/synthrun_*) depend on the default
    generator's exact rng draw order; pin it so the parametric COCO-shape
    extension (n_hues/n_textures kwargs, new texture families) can never
    silently change the VOC-shaped samples."""
    img, mask, oh = sw.render_sample(7, 42)
    assert (int(img.astype(np.int64).sum()), int(mask.astype(np.int64).sum()),
            int(oh.sum())) == (56452604, 314344, 2)
    explicit = sw.render_sample(7, 42, n_hues=sw.N_HUES,
                                n_textures=sw.N_TEXTURES)
    assert (explicit[0] == img).all() and (explicit[1] == mask).all()


def test_coco_shape_render():
    """80-class variant: determinism, all 4 texture families render, labels
    track visible classes."""
    a, ma, oa = sw.render_sample(5, 9, n_hues=20, n_textures=4)
    b, mb, ob = sw.render_sample(5, 9, n_hues=20, n_textures=4)
    assert (a == b).all() and (ma == mb).all() and (oa == ob).all()
    assert oa.shape == (80,) and ma.max() <= 80
    present = np.unique(ma)
    present = present[present > 0]
    assert set(np.nonzero(oa)[0] + 1) == set(present.tolist())
    seen_tex = set()
    for i in range(60):
        _, m, _ = sw.render_sample(5, i, n_hues=20, n_textures=4)
        ids = np.unique(m)
        seen_tex |= {int((c - 1) // 20) for c in ids if c > 0}
    assert seen_tex == {0, 1, 2, 3}


def test_make_dataset_coco_layout(tmp_path):
    root = str(tmp_path / "synthc")
    meta = sw.make_dataset(root, n_train=4, n_val=4, seed=2, layout="coco",
                           size_range=(96, 128))
    assert meta["num_classes"] == 81 and meta["layout"] == "coco"
    assert len(os.listdir(os.path.join(root, "train2014"))) == 4
    assert len(os.listdir(os.path.join(root, "val2014"))) == 4
    # masks only under SegmentationClass/val2014 (train GT withheld)
    assert len(os.listdir(
        os.path.join(root, "SegmentationClass", "val2014"))) == 4
    assert not os.path.exists(os.path.join(root, "SegmentationClass",
                                           "train2014"))
    sdir = os.path.join(root, "splits")
    part = open(os.path.join(sdir, "coco", "val_part.txt")).read().split()
    assert len(part) == 2  # default n_val // 2

    # the unmodified COCO pipeline loads it: image-level labels MUST come
    # from the split dir's cls_labels_onehot.npy (reference coco.py:22) —
    # the lazy mask-derived fallback would fail on train images, whose GT
    # is withheld from disk.
    from cosa_tpu.config import coco_config
    from cosa_tpu.data.loader import build_train_dataset, build_val_dataset

    cfg = coco_config(data_root=root, split_dir=sdir, crop_size=64)
    tr = build_train_dataset(cfg)
    s = tr[(0, 1)]
    assert s["wimg"].shape == (64, 64, 3)
    assert s["cls_label"].shape == (80,)
    va = build_val_dataset(cfg)  # val_part during-training subset
    assert len(va) == 2
    v = va[0]
    assert v["label"].shape == v["image"].shape[:2]


def test_class_names_override(tmp_path):
    from cosa_tpu.data.datasets import class_list

    d = tmp_path / "splits" / "voc"
    d.mkdir(parents=True)
    (d / "class_names.txt").write_text("\n".join(sw.CLASS_NAMES) + "\n")
    names = class_list("VOC12", str(tmp_path / "splits"))
    assert names == sw.CLASS_NAMES
    assert class_list("VOC12")[0] == "_background_"


def test_fade_range_faints_foreground():
    """Drifting-contrast regime (round 5 GMM A/B): fade < 1 lowers foreground
    saturation toward the distractor statistics; default rendering is
    untouched when fade_range is None (no extra rng draw)."""
    base, mask, _ = sw.render_sample(11, 5)
    none_eq, mask2, _ = sw.render_sample(11, 5, fade_range=None)
    np.testing.assert_array_equal(base, none_eq)

    faint, fmask, foh = sw.render_sample(11, 5, fade_range=(0.3, 0.3))
    assert fmask.any() and (foh.sum() >= 1)

    def mean_fg_sat(img, m):
        rgb = img[m > 0].astype(np.float32) / 255.0
        mx, mn = rgb.max(1), rgb.min(1)
        return float(np.mean((mx - mn) / np.maximum(mx, 1e-6)))

    # same scene geometry is not guaranteed (fade consumes one rng draw),
    # so compare population statistics over several images instead
    sats_base = [mean_fg_sat(*sw.render_sample(11, i)[:2]) for i in range(4)]
    sats_faint = [
        mean_fg_sat(*sw.render_sample(11, i, fade_range=(0.3, 0.3))[:2])
        for i in range(4)
    ]
    assert np.mean(sats_faint) < 0.6 * np.mean(sats_base), (
        sats_base, sats_faint)
