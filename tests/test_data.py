"""Data layer tests: transforms, datasets, loader sharding/determinism."""

import numpy as np
import pytest
from PIL import Image

from cosa_tpu.config import preset_config
from cosa_tpu.data import randaug, transforms
from cosa_tpu.data.datasets import SyntheticBase, ClsTrainDataset, _onehot_from_mask
from cosa_tpu.data.loader import TrainLoader, build_train_dataset


def test_random_crop_img_box_semantics():
    """img_box marks the valid-pixel rectangle inside the padded crop
    (reference transforms.py:184-196)."""
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (100, 80, 3)).astype(np.uint8)
    crop, box = transforms.random_crop(rng, img, crop_size=128, mean_rgb=(0, 0, 0))
    assert crop.shape == (128, 128, 3)
    h0, h1, w0, w1 = box
    # interior is image content; exterior is the pad color (0)
    assert (h1 - h0) == 100 and (w1 - w0) == 80
    outside = crop.copy()
    outside[h0:h1, w0:w1] = 0
    assert outside.sum() == 0


def test_random_crop_large_image_box_full():
    rng = np.random.default_rng(1)
    img = rng.integers(1, 255, (600, 700, 3)).astype(np.uint8)
    crop, box = transforms.random_crop(rng, img, crop_size=448)
    assert crop.shape == (448, 448, 3)
    np.testing.assert_array_equal(box, [0, 448, 0, 448])


def test_randaug_ops_run():
    img = Image.fromarray(
        np.random.default_rng(0).integers(0, 255, (32, 32, 3)).astype(np.uint8)
    )
    for op in randaug.OPS:
        out = op(img, 5)
        assert out.size == img.size


def test_onehot_from_mask():
    mask = np.array([[0, 3], [255, 7]], np.uint8)
    oh = _onehot_from_mask(mask, 21, 255)
    assert oh.sum() == 2 and oh[3] == 1 and oh[7] == 1 and oh[0] == 0


def test_sample_replayable():
    """(seed, epoch, idx) fully determines a training sample."""
    cfg = preset_config("synthetic", crop_size=64)
    ds = build_train_dataset(cfg)
    a = ds[(3, 7)]
    b = ds[(3, 7)]
    c = ds[(4, 7)]
    np.testing.assert_array_equal(a["wimg"], b["wimg"])
    np.testing.assert_array_equal(a["img_box"], b["img_box"])
    assert not np.array_equal(a["wimg"], c["wimg"])  # epoch changes aug


def test_loader_shards_partition_data():
    cfg = preset_config("synthetic", crop_size=64)
    ds = build_train_dataset(cfg)
    l0 = TrainLoader(ds, batch_size=4, seed=0, num_workers=2,
                     process_index=0, process_count=2)
    l1 = TrainLoader(ds, batch_size=4, seed=0, num_workers=2,
                     process_index=1, process_count=2)
    b0, b1 = next(l0), next(l1)
    l0.close()
    l1.close()
    assert b0["wimg"].shape == (4, 64, 64, 3)
    assert b0["wimg"].dtype == np.uint8
    # different shards see different data
    assert not np.array_equal(b0["wimg"], b1["wimg"])


def test_loader_epoch_reshuffles():
    cfg = preset_config("synthetic", crop_size=64)
    ds = build_train_dataset(cfg)
    loader = TrainLoader(ds, batch_size=8, seed=0, num_workers=2,
                         process_index=0, process_count=1)
    per_epoch = len(ds) // 8
    first_epoch = [next(loader) for _ in range(per_epoch)]
    second_epoch = [next(loader) for _ in range(2)]
    loader.close()
    assert not np.array_equal(first_epoch[0]["wimg"], second_epoch[0]["wimg"])


def test_photometric_distortion_runs_and_bounds():
    from cosa_tpu.data.transforms import PhotoMetricDistortion, _rgb_to_hsv, _hsv_to_rgb

    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (24, 24, 3)).astype(np.uint8)
    # HSV roundtrip identity
    h, s, v = _rgb_to_hsv(img)
    back = _hsv_to_rgb(h, s, v)
    assert np.abs(back.astype(int) - img.astype(int)).max() <= 2
    pmd = PhotoMetricDistortion()
    out = pmd(rng, img)
    assert out.shape == img.shape and out.dtype == np.uint8


def test_loader_skip_batches_continues_stream():
    """Resume determinism: skipping N batches reproduces the tail of an
    unskipped stream exactly."""
    cfg = preset_config("synthetic", crop_size=64)
    ds = build_train_dataset(cfg)
    a = TrainLoader(ds, batch_size=4, seed=0, num_workers=2,
                    process_index=0, process_count=1)
    full = [next(a) for _ in range(5)]
    a.close()
    b = TrainLoader(ds, batch_size=4, seed=0, num_workers=2,
                    process_index=0, process_count=1, skip_batches=3)
    resumed = [next(b) for _ in range(2)]
    b.close()
    np.testing.assert_array_equal(full[3]["wimg"], resumed[0]["wimg"])
    np.testing.assert_array_equal(full[4]["img_box"], resumed[1]["img_box"])


def test_loader_surfaces_worker_failures():
    """A dataset error must raise in the consumer, not hang the queue
    (regression: the feeder thread used to die silently and __next__
    blocked forever)."""
    import pytest

    class Boom:
        def __len__(self):
            return 8

        def __getitem__(self, key):
            raise OSError("corrupt file")

    from cosa_tpu.data.loader import TrainLoader

    loader = TrainLoader(Boom(), batch_size=2, num_workers=2,
                         process_index=0, process_count=1)
    with pytest.raises(RuntimeError, match="worker failed"):
        next(loader)
    loader.close()


def test_pack_unpack_batch_roundtrip():
    import numpy as np

    from cosa_tpu.data.loader import pack_batch, unpack_batch

    rng = np.random.default_rng(0)
    batch = dict(
        wimg=rng.integers(0, 255, (4, 32, 32, 3)).astype(np.uint8),
        simg=rng.integers(0, 255, (4, 32, 32, 3)).astype(np.uint8),
        cls_label=(rng.random((4, 20)) > 0.5).astype(np.float32),
        img_box=rng.integers(0, 32, (4, 4)).astype(np.int32),
    )
    packed = pack_batch(batch)
    assert set(packed) == {"imgs", "meta"}
    w, s, cl, box = unpack_batch({k: np.asarray(v) for k, v in packed.items()})
    np.testing.assert_array_equal(np.asarray(w), batch["wimg"])
    np.testing.assert_array_equal(np.asarray(s), batch["simg"])
    np.testing.assert_array_equal(np.asarray(cl), batch["cls_label"])
    np.testing.assert_array_equal(np.asarray(box), batch["img_box"])
    # unpacked dicts pass through unchanged
    w2, s2, _, _ = unpack_batch(batch)
    np.testing.assert_array_equal(w2, batch["wimg"])


def test_train_dataset_needs_no_masks(tmp_path):
    """Cls training reads only JPEGs + the label dict (reference
    VOC12ClsDatasetNew never opens SegmentationClassAug) — a mask-less
    tree must work."""
    import os

    import numpy as np
    from PIL import Image

    from cosa_tpu.config import voc_config
    from cosa_tpu.data.loader import build_train_dataset

    root = tmp_path / "VOC2012"
    (root / "JPEGImages").mkdir(parents=True)  # NO SegmentationClassAug
    sdir = tmp_path / "splits" / "voc"
    sdir.mkdir(parents=True)
    rng = np.random.default_rng(0)
    names = [f"2007_{i:06d}" for i in range(2)]
    for n in names:
        Image.fromarray(
            rng.integers(0, 255, (120, 160, 3)).astype(np.uint8)
        ).save(root / "JPEGImages" / f"{n}.jpg")
    (sdir / "train_aug.txt").write_text("\n".join(names))
    labels = {}
    for i, n in enumerate(names):
        o = np.zeros(20, np.uint8)
        o[i] = 1
        labels[n] = o
    np.save(sdir / "cls_labels_onehot.npy", labels)

    cfg = voc_config(data_root=str(root), split_dir=str(tmp_path / "splits"),
                     crop_size=64)
    ds = build_train_dataset(cfg)
    s = ds[(0, 1)]
    assert s["wimg"].shape == (64, 64, 3)
    assert s["cls_label"][1] == 1


def test_process_pool_loader_matches_threads():
    """num_workers < 0 selects the fork-pool decode path (GIL-contention
    insurance on many-core hosts); it must produce bit-identical batches to
    the thread pool (same deterministic (seed, epoch, idx) stream)."""
    cfg = preset_config("synthetic", crop_size=64)
    ds = build_train_dataset(cfg)
    lt = TrainLoader(ds, batch_size=4, seed=0, num_workers=2,
                     process_index=0, process_count=1)
    lp = TrainLoader(ds, batch_size=4, seed=0, num_workers=-2,
                     process_index=0, process_count=1)
    try:
        for _ in range(2):
            bt, bp = next(lt), next(lp)
            np.testing.assert_array_equal(bt["wimg"], bp["wimg"])
            np.testing.assert_array_equal(bt["simg"], bp["simg"])
            np.testing.assert_array_equal(bt["cls_label"], bp["cls_label"])
            np.testing.assert_array_equal(bt["img_box"], bp["img_box"])
    finally:
        lt.close()
        lp.close()
