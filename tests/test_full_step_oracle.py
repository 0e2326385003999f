"""THE composition test: one full co-training iteration's losses must match
a torch/numpy oracle of reference main.py:106-243 (teacher TTA -> pseudo
masks -> all five losses) with identical weights on both networks.

Covers the orchestration the per-component tests can't: input routing
(weak->teacher / strong->student), loss order, threshold plumbing, warmup
gating, aux blending."""

import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from cosa_tpu.config import preset_config
from cosa_tpu.models import build_model
from cosa_tpu.models.convert import network_params_from_torch
from cosa_tpu.train import build_optimizer, build_train_step
from cosa_tpu.train.state import TrainState, init_gmm_state

from tests import torch_oracle as O

MEAN = np.array([123.675, 116.28, 103.53], np.float32)
STD = np.array([58.395, 57.12, 57.375], np.float32)
NUM_CLASSES = 6
CROP = 64


def _cfg():
    return preset_config(
        "synthetic",
        backbone="vit_tiny_test",
        num_classes=NUM_CLASSES,
        crop_size=CROP,
        batch_size=2,
        mixed_precision=False,
        flash_attention=False,
        aux_layer=-2,
        pseudo_scales=(1.0, 0.5),
        warmup_iters=-1,  # gate open at step 0
        energy_filter="exact",
        energy_weight=1.0,  # scale up the 1e-7 regularizer for comparison
        aux_cam2seg=True,
        aux_seg2cam=False,
        detach="none",
    )


def _numpy_energy(cfg, simg_u8, seg_pred_t, mask_label_t, img_box):
    """get_energy_loss oracle (utils/seg_helper.py:191-230 + 864-903) with
    the exact Gaussian transform, numpy/torch."""
    b, _, h, w = seg_pred_t.shape
    probs = F.softmax(seg_pred_t, dim=1)
    rois = torch.zeros((b, h, w))
    for i, c in enumerate(img_box):
        rois[i, c[0]:c[1], c[2]:c[3]] = 1.0
    # denormalize exactly like the device path (normalize -> denorm -> u8)
    norm = (simg_u8.astype(np.float32) - MEAN) / STD
    img255 = np.clip(norm * STD + MEAN, 0, 255).astype(np.uint8).astype(np.float32)
    img_t = torch.from_numpy(np.moveaxis(img255, -1, 1))

    sh, sw = int(h * cfg.energy_scale), int(w * cfg.energy_scale)
    s_img = F.interpolate(img_t, size=(sh, sw))  # nearest
    s_probs = F.interpolate(probs, size=(sh, sw), mode="bilinear",
                            align_corners=False)
    s_rois = F.interpolate(rois.unsqueeze(1), size=(sh, sw)).squeeze(1)
    s_label = F.interpolate(mask_label_t.unsqueeze(1).float(), size=(sh, sw),
                            mode="nearest").squeeze(1)

    unlabeled = s_label == 255
    gate = (s_rois - s_probs.max(dim=1)[0]).clamp(min=0)
    gate[unlabeled] = 1.0
    seg_roi = s_probs * s_rois.unsqueeze(1)

    # exact Gaussian transform per image
    ys, xs = np.mgrid[0:sh, 0:sw].astype(np.float32)
    sxy = cfg.energy_sigma_xy * cfg.energy_scale
    loss = 0.0
    for i in range(b):
        f = np.concatenate(
            [ (xs / sxy)[..., None], (ys / sxy)[..., None],
              np.moveaxis(s_img[i].numpy(), 0, -1) / cfg.energy_sigma_rgb ],
            axis=-1,
        ).reshape(-1, 5)
        d2 = ((f[:, None, :] - f[None, :, :]) ** 2).sum(-1)
        g = np.exp(-0.5 * d2)
        v = s_probs.shape[1]
        sr = seg_roi[i].numpy().reshape(v, -1).T  # (N, K)
        as_ = g @ sr
        as_g = as_ * gate[i].numpy().reshape(-1, 1)
        loss -= float((sr * as_g).sum())
    return cfg.energy_weight * loss / b


def test_full_iteration_matches_reference_math():
    rng = np.random.default_rng(0)
    sd = O.make_state_dict(rng, NUM_CLASSES)

    cfg = _cfg()
    model = build_model(cfg)
    params = network_params_from_torch(dict(sd), depth=O.CFG.depth)
    tx = build_optimizer(cfg, params)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        student=params,
        teacher=jax.tree.map(lambda x: x, params),  # identical weights
        opt_state=tx.init(params),
        gmm=init_gmm_state(cfg, 2),
    )

    wimg = rng.integers(0, 255, (2, CROP, CROP, 3)).astype(np.uint8)
    simg = rng.integers(0, 255, (2, CROP, CROP, 3)).astype(np.uint8)
    cls_label = np.zeros((2, NUM_CLASSES - 1), np.float32)
    cls_label[0, [0, 2]] = 1
    cls_label[1, [1, 4]] = 1
    img_box = np.array([[0, CROP, 0, CROP], [4, 60, 2, 62]], np.int32)
    batch = dict(wimg=wimg, simg=simg, cls_label=cls_label, img_box=img_box)

    step = jax.jit(build_train_step(cfg, model, tx))
    _, metrics = step(state, {k: jnp.asarray(v) for k, v in batch.items()})

    # ---------------- torch oracle of main.py:106-243 ----------------
    def norm_t(u8):
        return torch.from_numpy(
            np.moveaxis((u8.astype(np.float32) - MEAN) / STD, -1, 1)
        )

    wimg_t, simg_t = norm_t(wimg), norm_t(simg)
    with torch.no_grad():
        cam_ps, cam_aux_ps, seg_ps = O.multi_scale_camseg(
            sd, wimg_t, cfg.pseudo_scales, cfg.aux_layer, NUM_CLASSES
        )
        out = O.forward(sd, simg_t, cfg.aux_layer, NUM_CLASSES)

        lab_t = torch.from_numpy(cls_label)
        cls_loss = F.multilabel_soft_margin_loss(out["cls"], lab_t)
        cls_aux_loss = F.multilabel_soft_margin_loss(out["cls_aux"], lab_t)

        valid_cam = lab_t[:, :, None, None] * cam_ps
        mask = O.cam2mask(img_box, valid_cam, cls_label, cfg.high_thre,
                          cfg.low_thre, cfg.par_downscale)
        seg_pred = F.interpolate(out["seg"], size=(CROP, CROP),
                                 mode="bilinear", align_corners=False)
        sl = O.seg_loss(seg_pred, mask, cfg.segfg_alpha)
        valid_cam_aux = lab_t[:, :, None, None] * cam_aux_ps
        mask_aux = O.cam2mask(img_box, valid_cam_aux, cls_label,
                              cfg.high_thre_aux, cfg.low_thre_aux,
                              cfg.par_downscale)
        sl_aux = O.seg_loss(seg_pred, mask_aux, cfg.segfg_alpha)
        sl = (1 - cfg.aux_cam2seg_alpha) * sl + cfg.aux_cam2seg_alpha * sl_aux

        reg = _numpy_energy(cfg, simg, seg_pred, mask, img_box)

        lab_bk = torch.cat([torch.ones(2, 1), lab_t], dim=1)
        vseg = seg_ps.clone()
        vseg[lab_bk[:, :, None, None].expand_as(vseg) == 0] = -1e5
        vseg = F.softmax(vseg / cfg.seg_softmaxtemp, dim=1)
        fg = F.interpolate(vseg[:, 1:], size=out["cam"].shape[-2:],
                           mode="bilinear", align_corners=False)
        cam_flat = F.relu(out["cam"]).permute(0, 2, 3, 1).reshape(-1, NUM_CLASSES - 1)
        fg_flat = fg.permute(0, 2, 3, 1).reshape(-1, NUM_CLASSES - 1)
        cl = F.multilabel_soft_margin_loss(cam_flat, fg_flat)

        total = (cls_loss + cls_aux_loss + cfg.seg_weight * sl
                 + cfg.cam_weight * cl + cfg.reg_weight * reg)

    def close(ours, ref, tol, name):
        ours, ref = float(ours), float(ref)
        assert abs(ours - ref) <= tol * max(abs(ref), 1e-3), (name, ours, ref)

    close(metrics["cls_loss"], cls_loss, 2e-3, "cls")
    close(metrics["cls_aux_loss"], cls_aux_loss, 2e-3, "cls_aux")
    close(metrics["seg_loss"], sl, 5e-3, "seg")
    close(metrics["cam_loss"], cl, 2e-3, "cam")
    close(metrics["reg_loss"], reg, 2e-2, "reg")
    close(metrics["overall_loss"], total, 5e-3, "total")
