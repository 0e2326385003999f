"""Host-side geometric/photometric transforms (numpy + PIL).

Twins of reference dataloaders/transforms.py:9-203. Design difference: the
pipeline emits uint8 HWC crops and ImageNet normalization happens on device
inside the compiled step (cosa_tpu/ops/image.py) — the reference ships f32
CHW tensors from a single worker (dataloaders/__init__.py:99).

Randomness: every function takes a ``numpy.random.Generator`` explicitly, so
a loader worker's stream is reproducible from (seed, epoch, index) — the
reference's implicit global random state cannot be replayed (SURVEY §7.3).
"""

from __future__ import annotations

import random
from typing import Optional, Tuple

import numpy as np
from PIL import Image, ImageFilter


def random_scaling(
    rng: np.random.Generator,
    image: np.ndarray,
    label: Optional[np.ndarray] = None,
    scale_range: Tuple[float, float] = (0.5, 2.0),
):
    """Uniform scale in [lo, hi]; PIL bilinear for image, nearest for label
    (reference transforms.py:52-77)."""
    ratio = rng.uniform(scale_range[0], scale_range[1])
    h, w = image.shape[:2]
    new = (int(ratio * w), int(ratio * h))  # PIL size is (W, H)
    img = Image.fromarray(image.astype(np.uint8)).resize(new, Image.BILINEAR)
    img = np.asarray(img)
    if label is None:
        return img
    lab = Image.fromarray(label).resize(new, Image.NEAREST)
    return img, np.asarray(lab)


def random_fliplr(
    rng: np.random.Generator,
    image: np.ndarray,
    label: Optional[np.ndarray] = None,
):
    flip = rng.random() > 0.5
    if label is None:
        return np.fliplr(image) if flip else image
    if flip:
        return np.fliplr(image), np.fliplr(label)
    return image, label


def random_crop(
    rng: np.random.Generator,
    image: np.ndarray,
    label: Optional[np.ndarray] = None,
    crop_size: int = 448,
    mean_rgb=(0, 0, 0),
    ignore_index: int = 255,
    cat_max_ratio: float = 0.75,
):
    """Pad to >= crop_size, take a random crop, return the valid-pixel
    rectangle ``img_box`` = [h0, h1, w0, w1] (reference transforms.py:145-202;
    img_box math :184-196). With a label, re-draws the crop up to 10x until
    no class dominates more than ``cat_max_ratio``."""
    h, w = image.shape[:2]
    H, W = max(crop_size, h), max(crop_size, w)

    pad_image = np.empty((H, W, 3), dtype=np.uint8)
    pad_image[..., 0] = mean_rgb[0]
    pad_image[..., 1] = mean_rgb[1]
    pad_image[..., 2] = mean_rgb[2]
    h_pad = int(rng.integers(0, H - h + 1))
    w_pad = int(rng.integers(0, W - w + 1))
    pad_image[h_pad : h_pad + h, w_pad : w_pad + w] = image.astype(np.uint8)

    def draw():
        hs = int(rng.integers(0, H - crop_size + 1))
        ws = int(rng.integers(0, W - crop_size + 1))
        return hs, ws

    hs, ws = draw()
    if label is not None:
        pad_label = np.full((H, W), ignore_index, dtype=np.uint8)
        pad_label[h_pad : h_pad + h, w_pad : w_pad + w] = label
        for _ in range(10):
            temp = pad_label[hs : hs + crop_size, ws : ws + crop_size]
            idx, cnt = np.unique(temp, return_counts=True)
            cnt = cnt[idx != ignore_index]
            if len(cnt) > 1 and cnt.max() / cnt.sum() < cat_max_ratio:
                break
            hs, ws = draw()

    crop = pad_image[hs : hs + crop_size, ws : ws + crop_size]
    img_box = np.array(
        [
            max(h_pad - hs, 0),
            min(crop_size, h + h_pad - hs),
            max(w_pad - ws, 0),
            min(crop_size, w + w_pad - ws),
        ],
        dtype=np.int32,
    )
    if label is None:
        return crop, img_box
    lab = pad_label[hs : hs + crop_size, ws : ws + crop_size]
    return crop, lab, img_box


def gaussian_blur(
    rng: np.random.Generator,
    img: Image.Image,
    p: float = 0.5,
    radius_min: float = 0.1,
    radius_max: float = 2.0,
) -> Image.Image:
    """Reference transforms.py:9-27."""
    if rng.random() > p:
        return img
    return img.filter(
        ImageFilter.GaussianBlur(radius=rng.uniform(radius_min, radius_max))
    )
