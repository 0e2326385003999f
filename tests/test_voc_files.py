"""Real-file dataset path: a miniature VOC tree on disk exercises the same
IO code that a full VOC2012 run uses (JPEGImages/SegmentationClassAug layout,
split lists, the shipped cls_labels_onehot dict)."""

import os

import numpy as np
import pytest
from PIL import Image

from cosa_tpu.config import voc_config
from cosa_tpu.data import datasets as D


@pytest.fixture()
def voc_root(tmp_path, monkeypatch):
    root = tmp_path / "VOC2012"
    (root / "JPEGImages").mkdir(parents=True)
    (root / "SegmentationClassAug").mkdir()
    rng = np.random.default_rng(0)
    names = []
    for i in range(3):
        name = f"2007_{i:06d}"
        names.append(name)
        img = rng.integers(0, 255, (280 + 10 * i, 320, 3)).astype(np.uint8)
        Image.fromarray(img).save(root / "JPEGImages" / f"{name}.jpg")
        mask = np.zeros(img.shape[:2], np.uint8)
        mask[50:150, 60:200] = (i % 20) + 1
        pimg = Image.fromarray(mask, mode="P")
        from cosa_tpu.utils.visualize import voc_palette

        pimg.putpalette(
            np.concatenate([voc_palette(256)]).flatten().tolist()
        )
        pimg.save(root / "SegmentationClassAug" / f"{name}.png")
    # temporary split dir with our names + a label dict
    split_dir = tmp_path / "splits" / "voc"
    split_dir.mkdir(parents=True)
    for split in ("train_aug", "val"):
        (split_dir / f"{split}.txt").write_text("\n".join(names))
    labels = {}
    for i, n in enumerate(names):
        oh = np.zeros(20, np.uint8)
        oh[i % 20] = 1
        labels[n] = oh
    np.save(split_dir / "cls_labels_onehot.npy", labels)
    monkeypatch.setattr(D, "_SPLIT_DIR", str(tmp_path / "splits"))
    return str(root)


def test_voc_train_dataset_from_files(voc_root):
    cfg = voc_config(data_root=voc_root, crop_size=224)
    from cosa_tpu.data.loader import build_train_dataset

    ds = build_train_dataset(cfg)
    assert len(ds) == 3
    s = ds[(0, 1)]
    assert s["wimg"].shape == (224, 224, 3) and s["wimg"].dtype == np.uint8
    assert s["simg"].shape == (224, 224, 3)
    assert s["cls_label"].shape == (20,) and s["cls_label"][1] == 1
    h0, h1, w0, w1 = s["img_box"]
    assert 0 <= h0 < h1 <= 224 and 0 <= w0 < w1 <= 224


def test_voc_val_dataset_from_files(voc_root):
    cfg = voc_config(data_root=voc_root)
    from cosa_tpu.data.loader import build_val_dataset

    ds = build_val_dataset(cfg)
    s = ds[1]
    assert s["image"].shape == (290, 320, 3)
    assert s["label"].shape == (290, 320)
    assert s["cls_label"][1] == 1
    assert (s["label"] == 2).any()  # class index preserved through PNG
