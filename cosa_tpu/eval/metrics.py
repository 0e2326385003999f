"""Segmentation metrics: confusion-matrix mIoU/pAcc/mAcc + classification mAP.

Numerical twins of reference utils/evaluation.py:9-59 and
utils/torch_helper.py:140-148. The confusion matrix is accumulated on device
during eval (a (C, C) f64-equivalent in i64) and summed across processes with
one collective — the reference gathers per-rank uint8 prediction maps through
.pth files on shared disk (evaluation_engine.py:217-231).
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def fast_hist(label_true: np.ndarray, label_pred: np.ndarray, n: int) -> np.ndarray:
    """Reference _fast_hist (utils/evaluation.py:9-15)."""
    mask = (label_true >= 0) & (label_true < n)
    return np.bincount(
        n * label_true[mask].astype(np.int64) + label_pred[mask],
        minlength=n * n,
    ).reshape(n, n)


def jax_hist(gt: jnp.ndarray, pred: jnp.ndarray, n: int) -> jnp.ndarray:
    """Device-side confusion matrix: same semantics as fast_hist (gt values
    outside [0, n) — e.g. ignore 255 — are dropped).

    Built as one_hot(gt)^T @ one_hot(pred) so it lands on the MXU: the
    scatter-add formulation serializes on TPU and cost ~70 ms/batch of eval
    (4 hists over 8x500^2 maps); the matmul runs in ~1 ms. f32 accumulation
    is exact only below 2^24 counts per cell, so the pixels are processed
    in <= 2^22-element slices whose partial hists sum in int32 (exact) —
    correct for any batch/pad size without a silent-rounding cliff."""
    gt = gt.reshape(-1).astype(jnp.int32)
    pred = pred.reshape(-1).astype(jnp.int32)
    chunk = 1 << 22
    if gt.size > chunk:
        pad = (-gt.size) % chunk
        if pad:
            gt = jnp.pad(gt, (0, pad), constant_values=n)  # n: invalid, dropped
            pred = jnp.pad(pred, (0, pad))
        gt = gt.reshape(-1, chunk)
    else:
        gt = gt.reshape(1, -1)
    pred = pred.reshape(gt.shape)
    # clip pred like fast_hist's bincount clamp: out-of-range predictions
    # (e.g. an ignore_index leaking through a caller) count toward class
    # n-1 instead of silently vanishing, so row sums always equal the
    # valid-pixel count
    pred = jnp.clip(pred, 0, n - 1)
    valid = (gt >= 0) & (gt < n)
    cls = jnp.arange(n, dtype=jnp.int32)
    a = ((gt[..., None] == cls) & valid[..., None]).astype(jnp.float32)
    b = (pred[..., None] == cls).astype(jnp.float32)
    hist = jax.lax.dot_general(
        a, b, (((1,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )  # (slices, n, n), each exact in f32
    return jnp.sum(hist.astype(jnp.int32), axis=0)


def scores_from_hist(hist: np.ndarray) -> Dict:
    """Reference scores() tail (utils/evaluation.py:21-35)."""
    hist = hist.astype(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        acc = np.diag(hist).sum() / hist.sum()
        acc_cls = np.nanmean(np.diag(hist) / hist.sum(axis=1))
        iu = np.diag(hist) / (hist.sum(axis=1) + hist.sum(axis=0) - np.diag(hist))
    valid = hist.sum(axis=1) > 0
    mean_iu = np.nanmean(iu[valid])
    return {
        "pAcc": acc,
        "mAcc": acc_cls,
        "miou": mean_iu,
        "iou": dict(zip(range(hist.shape[0]), iu)),
    }


def scores(label_trues: Sequence, label_preds: Sequence, num_classes: int) -> Dict:
    hist = np.zeros((num_classes, num_classes), np.int64)
    for lt, lp in zip(label_trues, label_preds):
        hist += fast_hist(lt.flatten(), lp.flatten(), num_classes)
    return scores_from_hist(hist)


def pseudo_scores(label_trues: Sequence, label_preds: Sequence, num_classes: int) -> Dict:
    """Reference pseudo_scores (utils/evaluation.py:37-59): prediction 255
    (ignore band) removes the pixel from scoring."""
    hist = np.zeros((num_classes, num_classes), np.int64)
    for lt, lp in zip(label_trues, label_preds):
        lt = lt.flatten().copy()
        lp = lp.flatten().copy()
        lt[lp == 255] = 255
        lp[lp == 255] = 0
        hist += fast_hist(lt, lp, num_classes)
    return scores_from_hist(hist)


class Evaluator:
    """Incremental confusion-matrix evaluator (reference utils/metrics.py:4-66,
    unused in the live path). ``ignore=True`` treats the LAST class as an
    ignore bucket and drops it from the class-averaged metrics; gt values
    outside [0, num_class) are excluded per _generate_matrix."""

    def __init__(self, num_class: int, ignore: bool = False):
        self.num_class = num_class
        self.ignore = ignore
        self.confusion_matrix = np.zeros((num_class, num_class), np.float64)

    def add_batch(self, gt_image: np.ndarray, pre_image: np.ndarray) -> None:
        assert gt_image.shape == pre_image.shape, (gt_image.shape, pre_image.shape)
        self.confusion_matrix += fast_hist(
            gt_image.flatten(), pre_image.flatten(), self.num_class
        )

    def reset(self) -> None:
        self.confusion_matrix = np.zeros((self.num_class, self.num_class), np.float64)

    def _maybe_drop(self, per_class: np.ndarray) -> np.ndarray:
        return per_class[:-1] if self.ignore else per_class

    def Precision_Recall(self):
        h = self.confusion_matrix
        precision = np.diag(h) / (h.sum(axis=0) + 1e-5)
        recall = np.diag(h) / (h.sum(axis=1) + 1e-5)
        return (precision, recall,
                np.nanmean(self._maybe_drop(precision)),
                np.nanmean(self._maybe_drop(recall)))

    def Pixel_Accuracy(self) -> float:
        h = self.confusion_matrix
        return np.diag(h).sum() / h.sum()

    def Pixel_Accuracy_Class(self) -> float:
        h = self.confusion_matrix
        with np.errstate(divide="ignore", invalid="ignore"):
            acc = np.diag(h) / h.sum(axis=1)
        return np.nanmean(self._maybe_drop(acc))

    def Mean_Intersection_over_Union(self):
        h = self.confusion_matrix
        with np.errstate(divide="ignore", invalid="ignore"):
            iou = np.diag(h) / (h.sum(axis=1) + h.sum(axis=0) - np.diag(h))
        iou = self._maybe_drop(iou)
        return iou, np.nanmean(iou)

    def Frequency_Weighted_Intersection_over_Union(self) -> float:
        h = self.confusion_matrix
        freq = h.sum(axis=1) / h.sum()
        with np.errstate(divide="ignore", invalid="ignore"):
            iu = np.diag(h) / (h.sum(axis=1) + h.sum(axis=0) - np.diag(h))
        return (freq[freq > 0] * iu[freq > 0]).sum()


def compute_mAP(labels: np.ndarray, probs: np.ndarray) -> List[float]:
    """Per-sample average precision over classes (reference
    utils/torch_helper.py:140-148, sklearn-backed)."""
    from sklearn.metrics import average_precision_score

    out = []
    for i in range(labels.shape[0]):
        if labels[i].sum() > 0:
            out.append(average_precision_score(labels[i], probs[i]))
    return out
