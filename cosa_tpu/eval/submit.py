"""Eval-server submission dumps for the ground-truth-less test split.

The reference scores 75.1 on the VOC12 test server (README.md:132) but ships
no code path to produce the submission: its data layer has the test list
(dataloaders/voc.py) and finaleval only ever scores val (main.py:414). This
module closes that gap: run the same single-compile TTA inference the val
engine uses, take the raw seg argmax (no class validation — test images have
no image-level labels), optionally CRF-refine, and write indexed-palette
PNGs in the directory layout the PASCAL VOC evaluation server expects:

  {out}/results/VOC2012/Segmentation/comp6_test_cls/{name}.png

(comp6 is the segmentation-from-additional-data track CoSA competes in;
`tar -czf results.tgz results/` of the dump directory is uploadable as-is.)
"""

from __future__ import annotations

import os
from typing import Optional

import jax.numpy as jnp
import numpy as np

from cosa_tpu.eval.engine import _build_eval_step


def submission_dir(out_dir: str, dataset: str = "VOC12") -> str:
    # the eval server unpacks results/VOC2012/Segmentation/comp6_test_cls/
    server_name = {"VOC12": "VOC2012"}.get(dataset, dataset)
    return os.path.join(
        out_dir, "results", server_name, "Segmentation", "comp6_test_cls"
    )


def dump_submission(
    cfg,
    model,
    params,
    test_ds,
    out_dir: str,
    use_crf: bool = True,
    max_images: Optional[int] = None,
) -> str:
    """Run TTA inference over ``test_ds`` and write one palette PNG per
    image. Returns the directory containing the PNGs."""
    from cosa_tpu.utils.visualize import save_seg

    dst = submission_dir(out_dir, cfg.dataset)
    os.makedirs(dst, exist_ok=True)

    pad = 500 if cfg.dataset == "VOC12" else 640
    step_cache = {}

    # CRF backend mirrors the val engine: on-device (batched-capable, probs
    # never leave the device) unless cfg.crf_backend selects a host path
    crf_on_device = use_crf and getattr(cfg, "crf_backend", "device") == "device"
    host_crf = use_crf and not crf_on_device
    if host_crf:
        from cosa_tpu.eval.crf import crf_refine_host

    n_total = len(test_ds) if max_images is None else min(max_images, len(test_ds))
    # the host-CRF path fetches full prob maps (large): batch 1 there; the
    # device paths batch eval_batch images per compiled call (round 2 ran
    # every submission image alone)
    bsz = 1 if host_crf else max(1, int(getattr(cfg, "eval_batch", 8)))

    def _image_size(i):
        # header-only size read (PIL lazy open) — decoding every image just
        # to plan the buckets would double the pipeline's IO
        base = getattr(test_ds, "base", None)
        if base is not None and hasattr(base, "_paths"):
            try:
                from PIL import Image as _Image

                with _Image.open(base._paths(base.names[i])[0]) as im:
                    return im.size[1], im.size[0]
            except Exception:
                pass
        return test_ds[i]["image"].shape[:2]

    # group images into same-pad-bucket batches so one compiled program
    # serves each bucket
    buckets = {}
    for i in range(n_total):
        m = max(_image_size(i))
        pad_i = pad if m <= pad else -(-m // 128) * 128
        buckets.setdefault(pad_i, []).append(i)

    for pad_i, members in sorted(buckets.items()):
        if pad_i not in step_cache:
            step_cache[pad_i] = _build_eval_step(
                cfg, model, pad_i, (), return_maps=True,
                return_probs=host_crf, getcrf=crf_on_device,
            )
        step = step_cache[pad_i]
        for c0 in range(0, len(members), bsz):
            chunk = members[c0 : c0 + bsz]
            samples = [test_ds[i] for i in chunk]
            nvalid = len(samples)
            while len(samples) < bsz:  # pad tail; outputs discarded
                samples.append(samples[-1])
            img_pad = np.zeros((bsz, pad_i, pad_i, 3), np.uint8)
            gt_pad = np.full((bsz, pad_i, pad_i), 255, np.uint8)
            cls_labels = np.zeros((bsz, cfg.num_classes - 1), np.float32)
            hw = np.zeros((bsz, 2), np.int32)
            for bi, smp in enumerate(samples):
                h, w = smp["image"].shape[:2]
                img_pad[bi, :h, :w] = smp["image"]
                cls_labels[bi] = smp["cls_label"]
                hw[bi] = [h, w]

            outs = step(
                params,
                jnp.asarray(img_pad), jnp.asarray(gt_pad),
                jnp.asarray(cls_labels), jnp.asarray(hw),
            )
            # extras: [probs?] seg_vd r_cam [crf_label?]
            if host_crf:
                probs_b = np.asarray(outs[1])
            elif crf_on_device:
                pred_b = np.asarray(outs[-1])
            else:
                pred_b = np.asarray(outs[1])
            for bi in range(nvalid):
                smp = samples[bi]
                h, w = smp["image"].shape[:2]
                if host_crf:
                    pred = crf_refine_host(cfg, smp["image"], probs_b[bi, :h, :w])
                else:
                    pred = pred_b[bi, :h, :w]
                save_seg(
                    pred.astype(np.uint8),
                    os.path.join(dst, smp["name"] + ".png"),
                    cfg.num_classes,
                )
    return dst
