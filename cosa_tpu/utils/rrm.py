"""RRM-era legacy utilities (reference ``utils/rrm_utils.py`` + the unique
symbols of ``utils/helper.py``).

Neither file is imported by the reference's live pipeline (main.py:21 /
evaluation_engine.py:4 import only seg_helper/torch_helper/evaluation/misc),
but both ship with it, so the surface is rebuilt here as working, tested
code. The bundle is the pseudo-label machinery of the earlier RRM project
("Reliability Does Matter", AAAI'20) that CoSA grew out of:

  * dual-alpha CRF label fusion — ``_crf_with_alpha`` + ``compute_seg_label``
    (rrm_utils.py:9-79; duplicated at helper.py:76-180 minus the
    empty-class guard — we keep the guarded rrm_utils variant and note the
    delta), plus the batched driver ``cam2seglabel``/``compute_cam_up``
    (helper.py:109-125, rrm_utils.py:123-127);
  * the joint CE + dense-energy loss ``compute_joint_loss``
    (rrm_utils.py:82-120) — here a pure-JAX function on the same on-device
    dense-energy core the live loop uses (objectives/energy.py) instead of
    the reference's per-step GPU->CPU->C++ round trip;
  * the prototype-contrast regularizer ``compute_cos`` /
    ``compute_dis_no_batch`` (rrm_utils.py:245-340);
  * small data helpers: ``read_file``/``chunker`` (rrm_utils.py:130-139),
    ``resize_label_batch`` (:142-148, bilinear-on-labels quirk preserved),
    ``flip``/``scale_im``/``scale_gt`` (:151-165), ``random_crop_with_mask``
    (RandomCrop, :174-207 — returns the boolean valid-pixel mask the
    dense-energy ROI gating consumes, unlike the live pipeline's img_box
    rectangle), and the legacy batcher ``get_data_from_chunk_v2`` (:209-242);
  * ``rrm_poly_sgd`` — helper.py:182-209's two-phase PolyOptimizer with its
    weight_decay-into-the-momentum-slot positional bug preserved.

Covered-elsewhere symbols of the two files (see PARITY.md §"legacy row"):
``set_seed`` -> config/train seeding; ``init_model``/``save_ckpt`` -> orbax
full-state auto-resume in train/loop.py (superset: optimizer + loader state);
``crf_inference`` -> data/imutils.py::crf_inference (same sxy/compat
parameters); ``save_seg`` -> utils/visualize.py;
``load_image_label_list_from_npy`` -> data/datasets.py label-dict loading.

Array convention: images/CAMs that cross the CRF are channel-first numpy
(C, H, W) exactly like the reference; the JAX losses are NHWC like the rest
of cosa_tpu.
"""

from __future__ import annotations

from typing import Callable, Dict, Iterable, Iterator, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cosa_tpu.data.imutils import crf_inference
from cosa_tpu.objectives.energy import get_energy_loss
from cosa_tpu.ops.resize import resize_bilinear


# ---------------------------------------------------------------------------
# Dual-alpha CRF label fusion (rrm_utils.py:9-79)
# ---------------------------------------------------------------------------

def crf_with_alpha(
    ori_img: np.ndarray,
    cam_dict: Dict[int, np.ndarray],
    alpha: float,
    n_classes: int = 21,
    t: int = 10,
) -> np.ndarray:
    """``_crf_with_alpha`` (rrm_utils.py:9-20): stack the present-class CAM
    planes, synthesize a background plane as (1 - max_fg)^alpha, run CRF
    mean-field over the compact (1+present) planes, then scatter the result
    back into a dense (n_classes, H, W) map (absent classes stay 0).

    ori_img: (H, W, 3) uint8 RGB. cam_dict: {fg_class_index: (H, W) cam}.
    """
    v = np.array(list(cam_dict.values()), dtype=np.float32)
    bg_score = np.power(1.0 - np.max(v, axis=0, keepdims=True), alpha)
    bgcam_score = np.concatenate((bg_score, v), axis=0)
    crf_score = crf_inference(ori_img, bgcam_score, t=t,
                              labels=bgcam_score.shape[0])

    dense = np.zeros((n_classes, bg_score.shape[1], bg_score.shape[2]),
                     dtype=crf_score.dtype)
    dense[0] = crf_score[0]
    for i, key in enumerate(cam_dict.keys()):
        dense[key + 1] = crf_score[i + 1]
    return dense


def compute_seg_label(
    ori_img: np.ndarray,
    cam_label: np.ndarray,
    norm_cam: np.ndarray,
    n_fg_classes: int = 20,
) -> np.ndarray:
    """``compute_seg_label`` (rrm_utils.py:23-79): fuse a low-alpha (4) and a
    high-alpha (32) CRF pass over the normalized CAMs into a pseudo mask with
    an ignore (255) band.

    Semantics, in order (all indices are 1-offset fg labels, 0 = background):
      * start from the low-alpha argmax; its *background* pixels become 255
        (low alpha under-grows background, so bg there is unreliable);
      * pixels the high-alpha pass calls background are forced to 0 (high
        alpha over-grows background, so its bg is reliable);
      * "not sure" pixels become 255: CRF confidence below 0.8 on the fused
        map (high-alpha bg plane + low-alpha fg planes), OR outside the
        per-class CAM "sure region" — for each fg class present in the
        low-alpha labels, the sure region is cam > 60th-percentile of that
        class's argmax-region values above 0.1 (empty region -> threshold 0,
        the rrm_utils.py:55-56 guard; helper.py:127-180's duplicate omits it
        and IndexErrors instead); for background, bg_score > 0.8.

    ori_img: (H, W, 3) uint8; cam_label: (n_fg,) image-level onehot;
    norm_cam: (n_fg, H, W) per-class min-max-normalized CAM. Returns
    (H, W) int pseudo label with 255 = ignore.
    """
    cam_label = cam_label.astype(np.uint8)
    cam_dict = {i: norm_cam[i] for i in range(n_fg_classes)
                if cam_label[i] > 1e-5}
    cam_np = np.zeros_like(norm_cam)
    for i in cam_dict:
        cam_np[i] = norm_cam[i]

    bg_score = np.power(1.0 - np.max(cam_np, 0), 32)[None]
    cam_all = np.concatenate((bg_score, cam_np))
    cam_img = np.argmax(cam_all, 0)

    crf_la = crf_with_alpha(ori_img, cam_dict, 4, n_classes=n_fg_classes + 1)
    crf_ha = crf_with_alpha(ori_img, cam_dict, 32, n_classes=n_fg_classes + 1)
    crf_la_label = np.argmax(crf_la, 0)
    crf_ha_label = np.argmax(crf_ha, 0)
    crf_label = crf_la_label.copy()
    crf_label[crf_la_label == 0] = 255

    cam_sure_region = np.zeros(bg_score.shape[1:], dtype=bool)
    for class_i in np.unique(crf_la_label):
        cam_class = np.where(cam_img == class_i, cam_all[class_i], 0.0)
        if class_i != 0:
            vals = np.sort(cam_class[cam_class > 0.1])
            confidence = vals[int(vals.shape[0] * 0.6)] if len(vals) else 0.0
            cam_sure_region |= cam_class > confidence
        else:
            cam_sure_region |= cam_class > 0.8

    crf_label[crf_ha_label == 0] = 0
    fused = np.concatenate([crf_ha[:1], crf_la[1:]])
    not_sure = (np.max(fused, 0) < 0.8) | ~cam_sure_region
    crf_label[not_sure] = 255
    return crf_label


def compute_cam_up(
    cam: jnp.ndarray, label: jnp.ndarray, size_hw: Tuple[int, int]
) -> np.ndarray:
    """``compute_cam_up`` (rrm_utils.py:123-127 / helper.py:121-125):
    bilinear-upsample the raw CAM to image size and zero absent classes.

    cam: (B, h, w, n_fg) NHWC; label: (B, n_fg) onehot. Returns host numpy
    (B, H, W, n_fg).
    """
    up = resize_bilinear(cam, size_hw) * label[:, None, None, :]
    return np.asarray(up)


def cam2seglabel(
    cam: jnp.ndarray, label: jnp.ndarray, ori_images: np.ndarray
) -> np.ndarray:
    """``cam2seglabel`` (helper.py:109-119): per-image max-normalize the
    upsampled CAM and run compute_seg_label.

    cam: (B, h, w, n_fg) NHWC; label: (B, n_fg); ori_images: (B, H, W, 3)
    uint8. Returns (B, H, W) pseudo labels. (The reference sizes its output
    (b, W, H) and interpolates to (w, h) — transposed axes that only agree
    on square crops, its sole use; we use (H, W) throughout.)
    """
    b, h, w = ori_images.shape[:3]
    cam_up = compute_cam_up(cam, label, (h, w))
    out = np.zeros((b, h, w), dtype=np.int32)
    for i in range(b):
        norm = cam_up[i] / (cam_up[i].max(axis=(0, 1), keepdims=True) + 1e-5)
        out[i] = compute_seg_label(
            ori_images[i].astype(np.uint8), np.asarray(label[i]),
            np.moveaxis(norm, -1, 0), n_fg_classes=cam.shape[-1])
    return out


# ---------------------------------------------------------------------------
# Joint CE + dense-energy loss (rrm_utils.py:82-120)
# ---------------------------------------------------------------------------

def compute_joint_loss(
    images: jnp.ndarray,
    seg_logits: jnp.ndarray,
    seg_label: jnp.ndarray,
    croppings: jnp.ndarray,
    energy_weight: float = 1e-7,
    sigma_rgb: float = 15.0,
    sigma_xy: float = 100.0,
    scale_factor: float = 0.5,
    **energy_kwargs,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """``compute_joint_loss`` (rrm_utils.py:82-120): background CE + foreground
    CE (each sum-normalized by its own pixel count; NOT the live seg_loss's
    0.5/0.5 blend — rrm adds the two terms whole) plus the dense-energy
    regularizer gated by the crop-validity mask.

    images: (B, H, W, 3) normalized NHWC; seg_logits: (B, h, w, C) — resized
    to label resolution like the reference's F.interpolate(pred, (w, h));
    seg_label: (B, H, W) pseudo mask with 255 ignore; croppings: (B, H, W)
    1.0 on valid (in-crop) pixels. Returns (celoss, dloss); dloss already
    carries the reference's 1e-7 weight via ``energy_weight``.

    The dense-energy term runs the same on-device custom-vjp core as the
    live loop (objectives/energy.py) instead of the reference's per-step
    host round trip through bilateralfilter_batch; the crop mask is passed
    as the ROI by converting it to its bounding box (the rrm crop masks ARE
    axis-aligned rectangles, rrm_utils.py:198-207, so this is exact).
    """
    b, h, w = seg_label.shape
    pred = resize_bilinear(seg_logits, (h, w))
    nll = -jax.nn.log_softmax(pred.astype(jnp.float32), axis=-1)
    lab = seg_label.astype(jnp.int32)
    safe = jnp.clip(lab, 0, pred.shape[-1] - 1)
    pix = jnp.take_along_axis(nll, safe[..., None], axis=-1)[..., 0]

    bg_mask = lab == 0
    fg_mask = (lab != 0) & (lab != 255)
    bg = jnp.sum(jnp.where(bg_mask, pix, 0.0)) / (bg_mask.sum() + 1e-6)
    fg = jnp.sum(jnp.where(fg_mask, pix, 0.0)) / (fg_mask.sum() + 1e-6)
    celoss = bg + fg

    # crop mask -> bounding box (exact for rrm's rectangular masks)
    ys = jnp.any(croppings > 0, axis=2)  # (B, H)
    xs = jnp.any(croppings > 0, axis=1)  # (B, W)
    y0 = jnp.argmax(ys, axis=1)
    y1 = h - jnp.argmax(ys[:, ::-1], axis=1)
    x0 = jnp.argmax(xs, axis=1)
    x1 = w - jnp.argmax(xs[:, ::-1], axis=1)
    img_box = jnp.stack([y0, y1, x0, x1], axis=1)

    dloss = get_energy_loss(
        images, pred, seg_label, img_box,
        weight=energy_weight, sigma_rgb=sigma_rgb, sigma_xy=sigma_xy,
        scale_factor=scale_factor, **energy_kwargs,
    )
    return celoss, dloss


# ---------------------------------------------------------------------------
# Prototype-contrast regularizer (rrm_utils.py:245-340)
# ---------------------------------------------------------------------------

def compute_cos(f1: jnp.ndarray, f2: jnp.ndarray) -> jnp.ndarray:
    """``compute_cos`` (rrm_utils.py:245-251): pairwise cosine similarity
    between row sets, with the reference's +1e-7 in the denominator."""
    n1 = jnp.linalg.norm(f1, axis=1, keepdims=True)
    n2 = jnp.linalg.norm(f2, axis=1, keepdims=True)
    return (f1 @ f2.T) / (n1 @ n2.T + 1e-7)


def compute_dis_no_batch(
    seg: jnp.ndarray, seg_feature: jnp.ndarray, n_fg_classes: int = 20
) -> jnp.ndarray:
    """``compute_dis_no_batch`` (rrm_utils.py:254-340): prototype-contrast
    regularizer over the seg argmax regions.

      * pixel_dis — mean (1 - cos) distance of each region's pixels to its
        prototype: per-image background prototypes (a batch with no bg
        pixels contributes the constant 2) plus cross-batch per-class
        foreground prototypes, averaged over (B + #present classes);
      * dis_loss — prototype separation: mean (1 + cos) over distinct
        fg/fg prototype pairs and over fg/bg pairs, 0.5/0.5 blended; the
        reference's degenerate branches are preserved (no fg pixels at
        all -> 0; fg but no bg -> fg/fg term + 1).

    seg: (B, H, W, 1+n_fg) logits NHWC; seg_feature: (B, H, W, C).
    Host-side utility (Python branches on concrete scalars — do not jit).
    Returns a scalar (shape (1,) like the reference).
    """
    b = seg.shape[0]
    c = seg_feature.shape[-1]
    labels = jnp.argmax(seg, axis=-1).reshape(b, -1)          # (B, HW)
    feats = seg_feature.reshape(b, -1, c).astype(jnp.float32)  # (B, HW, C)

    bg_label = (labels == 0).astype(jnp.float32)               # (B, HW)
    bg_num_batch = bg_label.sum(axis=1) + 1e-7                 # (B,)
    bg_centers = (feats * bg_label[..., None]).sum(axis=1) / bg_num_batch[:, None]

    pixel_dis = jnp.zeros((1,), jnp.float32)
    for i in range(b):
        d = 1.0 - compute_cos(feats[i], bg_centers[i][None])[:, 0]  # (HW,)
        if float(bg_num_batch[i]) >= 1:
            pixel_dis = pixel_dis + jnp.sum(d * bg_label[i]) / bg_num_batch[i]
        else:
            pixel_dis = pixel_dis + 2.0

    flat_labels = labels.reshape(-1)
    flat_feats = feats.reshape(-1, c)
    fg_centers: List[jnp.ndarray] = []
    batch_num = 0.0
    for class_i in range(1, n_fg_classes + 1):
        class_mask = (flat_labels == class_i).astype(jnp.float32)
        class_num = class_mask.sum() + 1e-7
        batch_num += float(class_num)
        if float(class_num) < 1:
            continue
        center = (flat_feats * class_mask[:, None]).sum(axis=0) / class_num
        d = 1.0 - compute_cos(flat_feats, center[None])[:, 0]
        pixel_dis = pixel_dis + jnp.sum(d * class_mask) / class_num
        fg_centers.append(center)

    pixel_dis = pixel_dis / (len(fg_centers) + b)

    total_bg = float(bg_label.sum())
    if fg_centers and batch_num >= 1 and total_bg + 1e-7 >= 1:
        fgc = jnp.stack(fg_centers)
        fg_fg = 1.0 + compute_cos(fgc, fgc)
        fg_fg = fg_fg - jnp.diag(jnp.diag(fg_fg))
        n = fgc.shape[0]
        fg_fg_loss = (jnp.sum(fg_fg) / (n * (n - 1))) if n > 1 else jnp.zeros(())
        fg_bg = 1.0 + compute_cos(fgc, bg_centers)
        fg_bg_loss = jnp.sum(fg_bg) / (fg_bg.shape[0] * fg_bg.shape[1])
        dis_loss = 0.5 * fg_fg_loss + 0.5 * fg_bg_loss
    elif fg_centers and total_bg + 1e-7 < 1:
        fgc = jnp.stack(fg_centers)
        fg_fg = 1.0 + compute_cos(fgc, fgc)
        fg_fg = fg_fg - jnp.diag(jnp.diag(fg_fg))
        n = fgc.shape[0]
        fg_fg_loss = (jnp.sum(fg_fg) / (n * (n - 1))) if n > 1 else jnp.zeros(())
        dis_loss = 0.5 * fg_fg_loss + 1.0
    else:
        dis_loss = jnp.zeros(())

    return dis_loss + pixel_dis


# ---------------------------------------------------------------------------
# Small data helpers (rrm_utils.py:130-242) + the helper.py PolyOptimizer
# ---------------------------------------------------------------------------

def read_file(path: str) -> List[str]:
    """rrm_utils.py:130-135 (strips exactly the trailing newline)."""
    with open(path) as f:
        return [line[:-1] if line.endswith("\n") else line for line in f]


def chunker(seq: Sequence, size: int) -> Iterator[Sequence]:
    """rrm_utils.py:138-139."""
    return (seq[pos:pos + size] for pos in range(0, len(seq), size))


def resize_label_batch(label: np.ndarray, size: int) -> np.ndarray:
    """rrm_utils.py:142-148 — BILINEARLY resizes integer label maps
    (align_corners=True UpsamplingBilinear2d) then maps values > 21 to 255.
    The interpolation-on-labels quirk is the reference's; preserved verbatim
    because downstream thresholds were tuned against it.

    label: (H, W, 1, B); returns (size, size, 1, B) float."""
    from cosa_tpu.ops.resize import resize_bilinear_ac

    x = jnp.asarray(label.transpose(3, 0, 1, 2), jnp.float32)  # (B,H,W,1)
    out = np.array(resize_bilinear_ac(x, (size, size)))
    out[out > 21] = 255
    return out.transpose(1, 2, 3, 0)


def flip(img: np.ndarray, flip_p: float) -> np.ndarray:
    """rrm_utils.py:151-155."""
    return np.fliplr(img) if flip_p > 0.5 else img


def scale_im(img: np.ndarray, scale: float) -> np.ndarray:
    """rrm_utils.py:158-160 (cv2.resize default bilinear; PIL here)."""
    from PIL import Image

    h, w = int(img.shape[0] * scale), int(img.shape[1] * scale)
    return np.asarray(Image.fromarray(img.astype(np.uint8)).resize(
        (w, h), Image.BILINEAR)).astype(float)


def scale_gt(img: np.ndarray, scale: float) -> np.ndarray:
    """rrm_utils.py:163-165 (nearest)."""
    from PIL import Image

    h, w = int(img.shape[0] * scale), int(img.shape[1] * scale)
    return np.asarray(Image.fromarray(img.astype(np.uint8)).resize(
        (w, h), Image.NEAREST)).astype(float)


def random_crop_with_mask(
    imgarr: np.ndarray, cropsize: int, rng: np.random.Generator
) -> Tuple[np.ndarray, np.ndarray]:
    """rrm_utils.py:174-207 ``RandomCrop``: crop-or-pad to cropsize² and
    return the boolean valid-pixel mask ("cropping") that
    compute_joint_loss gates the dense energy by. Unlike the live
    transforms.random_crop (which returns an img_box rectangle), the mask
    is materialized per pixel. Takes an explicit Generator like the rest of
    data/transforms.py."""
    h, w = imgarr.shape[:2]
    ch, cw = min(cropsize, h), min(cropsize, w)
    w_space, h_space = w - cropsize, h - cropsize

    cont_left, img_left = (0, int(rng.integers(w_space + 1))) if w_space > 0 \
        else (int(rng.integers(-w_space + 1)), 0)
    cont_top, img_top = (0, int(rng.integers(h_space + 1))) if h_space > 0 \
        else (int(rng.integers(-h_space + 1)), 0)

    container = np.zeros((cropsize, cropsize, imgarr.shape[-1]), np.float32)
    cropping = np.zeros((cropsize, cropsize), bool)
    container[cont_top:cont_top + ch, cont_left:cont_left + cw] = \
        imgarr[img_top:img_top + ch, img_left:img_left + cw]
    cropping[cont_top:cont_top + ch, cont_left:cont_left + cw] = True
    return container, cropping


def get_data_from_chunk_v2(
    chunk: Iterable[str],
    img_dir: str,
    crop_size: int,
    label_dict: Dict[str, np.ndarray],
    rng: np.random.Generator,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """rrm_utils.py:209-242: the RRM-era batcher — one shared U(0.7, 1.3)
    scale per chunk, per-image flip, torchvision-normalize, RandomCrop.
    Returns (images NHWC float32, ori_images NHWC uint8 de-normalized,
    labels (B, n_fg), croppings (B, H, W)). The reference's hard-coded
    voc12/cls_labels.npy load is the injected ``label_dict``."""
    import os

    from PIL import Image

    chunk = list(chunk)
    scale = float(rng.uniform(0.7, 1.3))
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    images = np.zeros((len(chunk), crop_size, crop_size, 3), np.float32)
    ori_images = np.zeros((len(chunk), crop_size, crop_size, 3), np.uint8)
    croppings = np.zeros((len(chunk), crop_size, crop_size), np.float32)
    labels = np.stack([label_dict[name] for name in chunk])

    for i, name in enumerate(chunk):
        img = np.asarray(Image.open(
            os.path.join(img_dir, name + ".jpg")).convert("RGB"))
        img = scale_im(img, scale)
        img = flip(img, float(rng.uniform(0, 1)))
        img = (img / 255.0 - mean) / std
        img, cropping = random_crop_with_mask(img, crop_size, rng)
        ori_images[i] = np.clip((img * std + mean) * 255.0, 0, 255).astype(np.uint8)
        croppings[i] = cropping.astype(np.float32)
        images[i] = img
    return images, ori_images, labels, croppings


def rrm_poly_sgd_schedule(
    base_lr: float, max_step: int, momentum: float = 0.9
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """helper.py:182-209 ``PolyOptimizer``'s lr(step): two-phase poly —
    first half decays base_lr by (1 - s/(max/2))^momentum (reaching 0 at the
    midpoint!), second half restarts from the HARD-CODED 0.0007 and decays
    the same way. The `momentum` argument doubles as the poly power. Past
    max_step the reference stops updating, so the step-(max_step-1) value
    holds (clamp reproduces it)."""
    half = 0.5 * max_step

    def lr(step):
        s = jnp.minimum(jnp.asarray(step, jnp.float32), max_step - 1)
        first = base_lr * jnp.maximum(1.0 - s / half, 0.0) ** momentum
        second = 0.0007 * (1.0 - (s - half) / (max_step - half)) ** momentum
        return jnp.where(s < half, first, second)

    return lr


def rrm_poly_sgd(base_lr: float, weight_decay: float, max_step: int,
                 momentum: float = 0.9):
    """The optax twin of helper.py's PolyOptimizer, bug included: the
    constructor's ``SGD(params, lr, weight_decay)`` positional call puts
    weight_decay in torch's momentum slot — SGD momentum := weight_decay and
    no decay is applied."""
    import optax

    return optax.sgd(
        learning_rate=rrm_poly_sgd_schedule(base_lr, max_step, momentum),
        momentum=weight_decay,
    )
