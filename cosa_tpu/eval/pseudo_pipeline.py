"""Standalone pseudo-label generation pipeline: CAM -> PAR -> CRF.

The on-device pipeline behind BASELINE.json configs #1/#2 ("ViT-B CAM
inference + PAR refinement", "CAM -> PAR -> bilateralfilter -> denseCRF"):
given a checkpoint, produce multi-scale fused CAMs and hard pseudo masks for
a dataset split, optionally PAR-refined and CRF-polished, and save them as
palette PNGs / raw .npy. Everything up to the CRF runs inside one jit.

CLI: python -m cosa_tpu.cli.make_pseudo run_name --dataset VOC12 ...
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from cosa_tpu.objectives.pseudo import cam2mask, cam_validation, multi_scale_camseg
from cosa_tpu.ops.image import denormalize01, normalize
from cosa_tpu.ops.par import par_refine
from cosa_tpu.ops.resize import _linear_matrix


def build_pseudo_step(cfg, model):
    """jitted: padded image -> (fused CAM at crop res, pseudo mask)."""
    s = cfg.crop_size

    refine_fn = None
    if cfg.usepar:
        refine_fn = lambda imgs, probs: par_refine(
            imgs, probs, dilations=cfg.par_dilations, num_iter=cfg.par_iters
        )

    @jax.jit
    def step(params, img_pad, cls_label, m_in_h, m_in_w, box):
        img = normalize(img_pad)
        img_s = jnp.einsum("bsh,bhwc->bswc", m_in_h, img)
        img_s = jnp.einsum("btw,bswc->bstc", m_in_w, img_s)
        fwd = lambda x: model.apply({"params": params}, x)
        cam, cam_aux, seg = multi_scale_camseg(fwd, img_s, cfg.pseudo_scales)
        valid_cam = cam_validation(cam, cls_label)
        mask = cam2mask(
            img_box=box,
            cams=valid_cam,
            cls_labels=cls_label,
            threshold_high=cfg.high_thre,
            threshold_low=cfg.low_thre,
            downscale=cfg.par_downscale,
            ignore_index=cfg.ignore_index,
            refine_fn=refine_fn,
            images=denormalize01(img_s) if cfg.usepar else None,
        )
        seg_probs = jax.nn.softmax(seg, axis=-1)
        return valid_cam, mask, seg_probs

    return step


def generate_pseudo_labels(
    cfg,
    model,
    params,
    dataset,
    out_dir: str,
    max_images: Optional[int] = None,
    use_crf: bool = False,
) -> Dict[str, float]:
    """Run the pipeline over a SegValDataset split; saves masks as palette
    PNGs (+ raw CAM .npy) and reports pseudo-mask quality vs GT."""
    from cosa_tpu.eval.metrics import fast_hist, scores_from_hist
    from cosa_tpu.utils.visualize import save_seg

    os.makedirs(os.path.join(out_dir, "mask"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "cam"), exist_ok=True)
    step = build_pseudo_step(cfg, model)
    s = cfg.crop_size
    n = cfg.num_classes
    hist = np.zeros((n, n), np.int64)

    if use_crf:
        from cosa_tpu.eval.crf import crf_refine_host

    count = len(dataset) if max_images is None else min(max_images, len(dataset))
    for i in range(count):
        smp = dataset[i]
        img, gt, cls_label = smp["image"], smp["label"], smp["cls_label"]
        h, w = img.shape[:2]
        pad = max(h, w)
        img_pad = np.zeros((1, pad, pad, 3), np.uint8)
        img_pad[0, :h, :w] = img
        m_in_h = _linear_matrix(h, s)
        m_in_h = np.pad(m_in_h, ((0, 0), (0, pad - h)))[None]
        m_in_w = _linear_matrix(w, s)
        m_in_w = np.pad(m_in_w, ((0, 0), (0, pad - w)))[None]
        box = np.array([[0, s, 0, s]], np.int32)

        cam, mask, seg_probs = step(
            params,
            jnp.asarray(img_pad),
            jnp.asarray(cls_label[None]),
            jnp.asarray(m_in_h),
            jnp.asarray(m_in_w),
            jnp.asarray(box),
        )
        # back to native resolution on host (nearest for the hard mask)
        from cosa_tpu.ops.resize import np_resize_bilinear

        mask_np = np.asarray(mask)[0]
        ys = (np.arange(h) * s / h).astype(int).clip(0, s - 1)
        xs = (np.arange(w) * s / w).astype(int).clip(0, s - 1)
        mask_hw = mask_np[ys][:, xs]
        if use_crf:
            probs_hw = np_resize_bilinear(np.asarray(seg_probs)[0], (h, w))
            probs_hw = np.clip(probs_hw, 1e-8, 1.0)
            probs_hw = probs_hw / probs_hw.sum(-1, keepdims=True)
            mask_hw = crf_refine_host(cfg, img, probs_hw).astype(np.uint8)

        save_seg(mask_hw.astype(np.uint8),
                 os.path.join(out_dir, "mask", smp["name"] + ".png"), n)
        cam_np = np.asarray(cam)[0]
        np.save(os.path.join(out_dir, "cam", smp["name"] + ".npy"), cam_np)

        gt64 = gt.astype(np.int64)
        m64 = mask_hw.astype(np.int64)
        # pseudo-score convention: ignore band (255) doesn't count
        gt64 = np.where(m64 == 255, 255, gt64)
        m64 = np.where(m64 == 255, 0, m64)
        hist += fast_hist(gt64.flatten(), m64.flatten(), n)

    return scores_from_hist(hist)
