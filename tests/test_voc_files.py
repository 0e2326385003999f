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
    # GT-less test-split images (VOC server submission path)
    (root / "JPEGImages_test").mkdir()
    test_names = []
    for i in range(2):
        name = f"2008_{i:06d}"
        test_names.append(name)
        img = rng.integers(0, 255, (240, 300 + 20 * i, 3)).astype(np.uint8)
        Image.fromarray(img).save(root / "JPEGImages_test" / f"{name}.jpg")
    # temporary split dir with our names + a label dict
    split_dir = tmp_path / "splits" / "voc"
    split_dir.mkdir(parents=True)
    for split in ("train_aug", "val"):
        (split_dir / f"{split}.txt").write_text("\n".join(names))
    (split_dir / "test.txt").write_text("\n".join(test_names))
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


def test_voc_test_split_dataset(voc_root):
    """GT-less test split: zero label canvas, all-ones cls vector."""
    cfg = voc_config(data_root=voc_root, eval_split="test")
    from cosa_tpu.data.loader import build_test_dataset

    ds = build_test_dataset(cfg)
    assert len(ds) == 2
    s = ds[0]
    assert s["image"].shape == (240, 300, 3)
    assert s["label"].shape == (240, 300) and not s["label"].any()
    assert s["cls_label"].shape == (20,) and s["cls_label"].all()


def test_submission_dump(voc_root, tmp_path):
    """End-to-end eval-server artifact dump: one indexed-palette PNG per test
    image in the VOC server directory layout, image-sized, classes < 21."""
    from cosa_tpu.data.loader import build_test_dataset
    from cosa_tpu.eval.submit import dump_submission, submission_dir
    from cosa_tpu.models import build_model
    from cosa_tpu.train import create_train_state

    cfg = voc_config(
        data_root=voc_root, eval_split="test", backbone="vit_tiny_test",
        crop_size=64, mixed_precision=False, eval_scales=(1.0, 0.5),
    )
    model = build_model(cfg)
    state = create_train_state(cfg, model, 2)
    ds = build_test_dataset(cfg)
    out = tmp_path / "subm"
    dst = dump_submission(cfg, model, state.student, ds, str(out), use_crf=False)
    assert dst == submission_dir(str(out))
    for i, name in enumerate(("2008_000000", "2008_000001")):
        png = Image.open(os.path.join(dst, name + ".png"))
        assert png.mode == "P"  # indexed palette, as the server requires
        arr = np.asarray(png)
        assert arr.shape == (240, 300 + 20 * i)
        assert arr.max() < 21
