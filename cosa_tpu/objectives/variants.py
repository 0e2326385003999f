"""Dead/optional op and loss variants from the reference, kept working.

The reference ships several TTA-fuse and seg-loss variants that the live
pipeline never calls (SURVEY §2.5 DEAD rows, /root/reference/utils/
seg_helper.py:277-513 and :815-861). They are small, occasionally useful
for ablations, and part of the capability surface — so they live here as
tested pure functions, NHWC like the rest of objectives/.

  * :func:`multi_scale_camseg_v2`  (seg_helper.py:328-397) configurable
    flip-fuse / scale-fuse modes for CAM and seg
  * :func:`multi_scale_camseg_v4`  (seg_helper.py:277-326) global (whole
    tensor) min-max CAM normalization after cam_validation
  * :func:`multi_scale_seg` / :func:`multi_scale_cls`
    (seg_helper.py:452-513) seg-only / cls-only TTA sums
  * :func:`seg_get_pseudo`         (seg_helper.py:570-578) top-2-margin
    pseudo labels
  * :func:`seg_loss_v2`            (seg_helper.py:815-821) plain masked CE
  * :func:`seg_weightloss`         (seg_helper.py:823-835) per-pixel-weighted
    fg/bg CE
  * :func:`seg_softloss` / :func:`seg_softloss_v2`
    (seg_helper.py:837-861) soft-target cross-entropies
  * :func:`mask_to_onehot`         (seg_helper.py:124-140)

(`seg_helper.refine_camlabel_` (:655-718) is NOT rebuilt: it passes a kwarg
`_refine_cams` no longer accepts and TypeErrors on any call in the
reference itself; its working role is covered by cam2mask + ops/par.)
"""

from __future__ import annotations

from typing import Callable, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp

from cosa_tpu.objectives.losses import _per_pixel_nll
from cosa_tpu.objectives.pseudo import cam_validation, minmax_norm, scale_size
from cosa_tpu.ops.image import hflip
from cosa_tpu.ops.resize import resize_bilinear


def _tta_batches(imgs: jnp.ndarray, scales: Sequence[float]):
    """Yield (scale, (2B, h', w', 3) img+flip batch) per scale."""
    h, w = imgs.shape[1:3]
    assert 1.0 in tuple(scales), "scale 1.0 must be in scales"
    for s in scales:
        if s == 1.0:
            yield s, jnp.concatenate([imgs, hflip(imgs)], axis=0)
        else:
            sz = scale_size(h, w, s)
            yield s, jnp.concatenate(
                [resize_bilinear(imgs, sz),
                 resize_bilinear(imgs, sz, flip_w=True)],
                axis=0,
            )


def _flip_fuse(x: jnp.ndarray, b: int, hw: Tuple[int, int], mode: str) -> jnp.ndarray:
    a = resize_bilinear(x[:b].astype(jnp.float32), hw)
    f = resize_bilinear(x[b:].astype(jnp.float32), hw, flip_w=True)
    return jnp.maximum(a, f) if mode == "max" else a + f


def _scale_fuse(parts, mode: str):
    out = parts[0]
    for p in parts[1:]:
        out = jnp.maximum(out, p) if mode == "max" else out + p
    return out


def multi_scale_camseg_v2(
    forward: Callable[[jnp.ndarray], Dict[str, jnp.ndarray]],
    imgs: jnp.ndarray,
    scales: Sequence[float],
    cam_fuse: Tuple[str, str] = ("max", "sum"),
    seg_fuse: Tuple[str, str] = ("max", "sum"),
):
    """Configurable-fuse TTA (seg_helper.py:328-397). Quirks preserved:
    cam_aux keeps only the last scale (list rebind, :365) and is always
    sum-"fused"; CAM/aux end with per-channel min-max normalization."""
    b, h, w = imgs.shape[0], imgs.shape[1], imgs.shape[2]
    cams, segs, aux_last = [], [], None
    for _, xcat in _tta_batches(imgs, scales):
        out = forward(xcat)
        cams.append(jax.nn.relu(_flip_fuse(out["cam"], b, (h, w), cam_fuse[0])))
        aux_last = jax.nn.relu(
            _flip_fuse(out["cam_aux"], b, (h, w), cam_fuse[0]))
        segs.append(_flip_fuse(out["seg"], b, (h, w), seg_fuse[0]))
    cam = minmax_norm(_scale_fuse(cams, cam_fuse[1]), eps=1e-5)
    cam_aux = minmax_norm(aux_last, eps=1e-5)
    seg = _scale_fuse(segs, seg_fuse[1])
    return cam, cam_aux, seg


def multi_scale_camseg_v4(
    forward: Callable[[jnp.ndarray], Dict[str, jnp.ndarray]],
    imgs: jnp.ndarray,
    scales: Sequence[float],
    cls_label: jnp.ndarray,
):
    """Global-min-max TTA (seg_helper.py:277-326): fuse like the live v1,
    apply cam_validation, then normalize by the GLOBAL (whole-tensor)
    min/max — the reference's `cam - cam.min(); cam /= cam.max() + 1e-5`
    runs over all batch/channel/space dims at once."""
    b, h, w = imgs.shape[0], imgs.shape[1], imgs.shape[2]
    cam_sum, aux_last, seg_sum = 0.0, None, 0.0
    for _, xcat in _tta_batches(imgs, scales):
        out = forward(xcat)
        cam_sum = cam_sum + jax.nn.relu(_flip_fuse(out["cam"], b, (h, w), "max"))
        aux_last = jax.nn.relu(_flip_fuse(out["cam_aux"], b, (h, w), "max"))
        seg_sum = seg_sum + _flip_fuse(out["seg"], b, (h, w), "sum")

    def global_norm(x):
        x = x - jnp.min(x)
        return x / (jnp.max(x) + 1e-5)

    cam = global_norm(cam_validation(cam_sum, cls_label))
    cam_aux = global_norm(cam_validation(aux_last, cls_label))
    return cam, cam_aux, seg_sum


def multi_scale_seg(
    forward_seg: Callable[[jnp.ndarray], jnp.ndarray],
    imgs: jnp.ndarray,
    scales: Sequence[float],
) -> jnp.ndarray:
    """Seg-only sum-fused TTA (seg_helper.py:452-470; the `seg_only=True`
    twin :472-490 is the same computation against a different model call)."""
    b, h, w = imgs.shape[0], imgs.shape[1], imgs.shape[2]
    seg_sum = 0.0
    for _, xcat in _tta_batches(imgs, scales):
        seg_sum = seg_sum + _flip_fuse(forward_seg(xcat), b, (h, w), "sum")
    return seg_sum


def multi_scale_cls(
    forward_cls: Callable[[jnp.ndarray], jnp.ndarray],
    imgs: jnp.ndarray,
    scales: Sequence[float],
) -> jnp.ndarray:
    """Cls-only TTA (seg_helper.py:492-513): orig+flip logits summed over
    every scale."""
    b = imgs.shape[0]
    cls_sum = 0.0
    for _, xcat in _tta_batches(imgs, scales):
        logits = forward_cls(xcat).astype(jnp.float32)
        cls_sum = cls_sum + logits[:b] + logits[b:]
    return cls_sum


def seg_get_pseudo(seg: jnp.ndarray, greater: float = 1.5,
                   ignore_index: int = 255) -> jnp.ndarray:
    """Top-2-margin pseudo labels (seg_helper.py:570-578): argmax where the
    top prob beats `greater` x the runner-up, ignore elsewhere.
    seg: (B, H, W, C) logits -> (B, H, W) int32."""
    prob = jax.nn.softmax(seg.astype(jnp.float32), axis=-1)
    top1 = jnp.max(prob, axis=-1)
    lab = jnp.argmax(prob, axis=-1).astype(jnp.int32)
    c = prob.shape[-1]
    classes = jax.lax.broadcasted_iota(jnp.int32, (c,), 0)
    top2 = jnp.max(
        jnp.where(lab[..., None] == classes, -jnp.inf, prob), axis=-1
    )
    return jnp.where(top1 < greater * top2, ignore_index, lab)


def seg_loss_v2(seg_pred: jnp.ndarray, mask_label: jnp.ndarray,
                ignore_index: int = 255) -> jnp.ndarray:
    """Plain masked CE, sum / valid-count (seg_helper.py:815-821)."""
    valid = mask_label != ignore_index
    nll = _per_pixel_nll(seg_pred, mask_label.astype(jnp.int32))
    return jnp.sum(jnp.where(valid, nll, 0.0)) / (valid.sum() + 1e-6)


def seg_weightloss(seg_pred: jnp.ndarray, mask_label: jnp.ndarray,
                   mask_weights: jnp.ndarray, fg_alpha: float = 0.5,
                   ignore_index: int = 255) -> jnp.ndarray:
    """Per-pixel-weighted fg/bg CE (seg_helper.py:823-835): each term is
    (weighted nll sum) / (unweighted valid count)."""
    nll = _per_pixel_nll(seg_pred, mask_label.astype(jnp.int32))
    wnll = nll * mask_weights.astype(jnp.float32)
    bg_mask = mask_label == 0
    fg_mask = (mask_label != 0) & (mask_label != ignore_index)
    bg = jnp.sum(jnp.where(bg_mask, wnll, 0.0)) / (bg_mask.sum() + 1e-6)
    fg = jnp.sum(jnp.where(fg_mask, wnll, 0.0)) / (fg_mask.sum() + 1e-6)
    return (1.0 - fg_alpha) * bg + fg_alpha * fg


def seg_softloss_v2(seg_pred: jnp.ndarray, softprobs: jnp.ndarray,
                    mask: jnp.ndarray = None) -> jnp.ndarray:
    """Soft-target CE, mean over pixels (seg_helper.py:855-861). ``mask``
    restricts the mean to selected pixels (used by :func:`seg_softloss`)."""
    ce = -jax.nn.log_softmax(seg_pred.astype(jnp.float32), axis=-1) * softprobs
    ce = ce.sum(axis=-1)
    if mask is None:
        return ce.mean()
    m = mask.astype(jnp.float32)
    return jnp.sum(ce * m) / (m.sum() + 1e-6)


def seg_softloss(seg_pred: jnp.ndarray, softprobs: jnp.ndarray,
                 fg_alpha: float = 0.5) -> jnp.ndarray:
    """fg/bg-separated soft CE (seg_helper.py:837-853): pixels split by the
    soft target's argmax (0 = background); the reference's boolean gathers
    become masked means."""
    labels = jnp.argmax(softprobs, axis=-1)
    bg = seg_softloss_v2(seg_pred, softprobs, labels == 0)
    fg = seg_softloss_v2(seg_pred, softprobs, labels != 0)
    return (1.0 - fg_alpha) * bg + fg_alpha * fg


def mask_to_onehot(mask: jnp.ndarray, num_classes: int) -> jnp.ndarray:
    """(B, H, W) int mask -> (B, H, W, C) one-hot (seg_helper.py:124-140;
    the reference's scatter_ becomes a compare-based one-hot)."""
    assert num_classes > 0
    return jax.nn.one_hot(mask.astype(jnp.int32), num_classes, dtype=jnp.float32)
