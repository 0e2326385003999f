"""Loss parity vs the reference's torch formulas (utils/seg_helper.py:593-861,
main.py:127-128). The torch expressions below re-state the reference formulas
at the formula level to serve as oracles."""

import numpy as np
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from cosa_tpu.objectives import (
    cam_loss_v1,
    cam_loss_v2,
    multilabel_soft_margin,
    seg_loss,
)

RNG = np.random.default_rng(0)


def test_multilabel_soft_margin_matches_torch():
    x = RNG.standard_normal((4, 20)).astype(np.float32)
    y = (RNG.random((4, 20)) > 0.7).astype(np.float32)
    ours = float(multilabel_soft_margin(jnp.asarray(x), jnp.asarray(y)))
    ref = float(
        F.multilabel_soft_margin_loss(torch.from_numpy(x), torch.from_numpy(y))
    )
    assert abs(ours - ref) < 1e-6


def _torch_seg_loss(seg_pred, mask_label, fg_alpha=0.5, ignore=255):
    """Reference utils/seg_helper.py:800-813 (NCHW torch oracle)."""
    bg = mask_label.clone()
    bg[mask_label != 0] = ignore
    bg_loss = F.cross_entropy(
        seg_pred, bg.long(), ignore_index=ignore, reduction="sum"
    ) / ((bg != ignore).sum() + 1e-6)
    fg = mask_label.clone()
    fg[mask_label == 0] = ignore
    fg_loss = F.cross_entropy(
        seg_pred, fg.long(), ignore_index=ignore, reduction="sum"
    ) / ((fg != ignore).sum() + 1e-6)
    return (1 - fg_alpha) * bg_loss + fg_alpha * fg_loss


def test_seg_loss_matches_torch():
    logits = RNG.standard_normal((2, 21, 16, 16)).astype(np.float32)
    labels = RNG.integers(0, 22, size=(2, 16, 16)).astype(np.int32)
    labels[labels == 21] = 255  # some ignore pixels
    labels[0, :4] = 0  # guarantee bg pixels

    ours = float(
        seg_loss(
            jnp.asarray(np.moveaxis(logits, 1, -1)),
            jnp.asarray(labels),
            fg_alpha=0.5,
        )
    )
    ref = float(
        _torch_seg_loss(torch.from_numpy(logits), torch.from_numpy(labels))
    )
    assert abs(ours - ref) < 1e-4


def test_cam_loss_v1_matches_torch():
    """Reference utils/seg_helper.py:593-602."""
    B, C, h, w, H, W = 2, 20, 8, 8, 32, 32
    cam = RNG.standard_normal((B, C, h, w)).astype(np.float32)
    seg_ps = RNG.random((B, C + 1, H, W)).astype(np.float32)

    t_fg = F.interpolate(
        torch.from_numpy(seg_ps)[:, 1:], size=(h, w), mode="bilinear",
        align_corners=False,
    )
    t_cam = F.relu(torch.from_numpy(cam))
    t_flat = t_cam.permute(0, 2, 3, 1).reshape(-1, C)
    t_fg_flat = t_fg.permute(0, 2, 3, 1).reshape(-1, C)
    ref = float(F.multilabel_soft_margin_loss(t_flat, t_fg_flat))

    ours = float(
        cam_loss_v1(
            jnp.asarray(np.moveaxis(cam, 1, -1)),
            jnp.asarray(np.moveaxis(seg_ps, 1, -1)),
        )
    )
    assert abs(ours - ref) < 1e-5


def test_cam_loss_v2_matches_torch():
    """Reference utils/seg_helper.py:604-624 (min-max normalized CAM)."""
    B, C, h, w = 2, 5, 8, 8
    cam = RNG.standard_normal((B, C, h, w)).astype(np.float32)
    seg_ps = RNG.random((B, C + 1, h, w)).astype(np.float32)

    t = F.relu(torch.from_numpy(cam))
    d1 = F.adaptive_max_pool2d(-t, (1, 1))
    d2 = F.adaptive_max_pool2d(t, (1, 1)) + 1e-4
    t = (t + d1) / d2
    t_fg = torch.from_numpy(seg_ps)[:, 1:]
    ref = float(
        F.multilabel_soft_margin_loss(
            t.permute(0, 2, 3, 1).reshape(-1, C),
            t_fg.permute(0, 2, 3, 1).reshape(-1, C),
        )
    )
    ours = float(
        cam_loss_v2(
            jnp.asarray(np.moveaxis(cam, 1, -1)),
            jnp.asarray(np.moveaxis(seg_ps, 1, -1)),
        )
    )
    assert abs(ours - ref) < 1e-5
