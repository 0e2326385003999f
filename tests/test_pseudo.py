"""Pseudo-label op parity vs torch oracles of the reference semantics
(utils/seg_helper.py:232-275, 515-591, 721-797)."""

import numpy as np
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from cosa_tpu.objectives import (
    cam2mask,
    cam_to_label,
    cam_validation,
    minmax_norm,
    multi_scale_camseg,
    seg_refine_by_label,
    seg_validation,
)
from cosa_tpu.objectives.pseudo import box_mask

RNG = np.random.default_rng(42)


def nchw(x):
    return torch.from_numpy(np.moveaxis(np.asarray(x), -1, 1).copy())


def nhwc(t):
    return jnp.asarray(np.moveaxis(t.numpy(), 1, -1))


def test_minmax_norm_matches_adaptive_pool_trick():
    x = RNG.random((2, 9, 11, 5)).astype(np.float32) * 3
    t = nchw(x)
    t = t + F.adaptive_max_pool2d(-t, (1, 1))
    t = t / (F.adaptive_max_pool2d(t, (1, 1)) + 1e-5)
    ours = minmax_norm(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours), np.moveaxis(t.numpy(), 1, -1),
                               rtol=1e-5, atol=1e-6)


def test_box_mask_slice_semantics():
    box = jnp.asarray([[1, 3, 0, 4], [0, -1, 0, -1]], jnp.int32)
    m = np.asarray(box_mask(box, 5, 5))
    ref0 = np.zeros((5, 5), bool)
    ref0[1:3, 0:4] = True
    ref1 = np.zeros((5, 5), bool)
    ref1[0:-1, 0:-1] = True
    np.testing.assert_array_equal(m[0], ref0)
    np.testing.assert_array_equal(m[1], ref1)


def test_seg_refine_by_label_matches_torch():
    """Reference seg_helper.py:553-568 (masked softmax at temperature)."""
    B, C, H, W = 2, 6, 7, 7
    seg = RNG.standard_normal((B, C, H, W)).astype(np.float32)
    cls_label = (RNG.random((B, C - 1)) > 0.5).astype(np.int32)

    lab_bk = torch.cat(
        [torch.ones(B, 1).long(), torch.from_numpy(cls_label).long()], dim=1
    )
    valid = torch.from_numpy(seg).clone()
    valid[lab_bk == 0] = -1e5
    ref = F.softmax(valid / 0.01, dim=1)

    ours = seg_refine_by_label(
        jnp.asarray(np.moveaxis(seg, 1, -1)), jnp.asarray(cls_label), 0.01
    )
    np.testing.assert_allclose(
        np.asarray(ours), np.moveaxis(ref.numpy(), 1, -1), rtol=1e-4, atol=1e-6
    )


def test_cam_to_label_matches_torch():
    """Reference seg_helper.py:515-545."""
    B, C, H, W = 2, 4, 6, 6
    cam = RNG.random((B, C, H, W)).astype(np.float32)
    cls_label = np.array([[1, 0, 1, 1], [0, 1, 1, 0]], np.float32)
    box = np.array([[1, 5, 0, 6], [0, 6, 2, 5]], np.int32)

    t_cam = torch.from_numpy(cam)
    rep = torch.from_numpy(cls_label)[:, :, None, None]
    t_valid = rep * t_cam
    val, lab = t_valid.max(dim=1)
    lab = lab + 1
    lab[val <= 0.5] = 0
    ref_full = torch.full_like(lab, 255)
    for i, c in enumerate(box):
        ref_full[i, c[0]:c[1], c[2]:c[3]] = lab[i, c[0]:c[1], c[2]:c[3]]

    valid_cam, label = cam_to_label(
        jnp.asarray(np.moveaxis(cam, 1, -1)),
        jnp.asarray(cls_label),
        img_box=jnp.asarray(box),
        bkg_thre=0.5,
        ignore_index=255,
    )
    np.testing.assert_array_equal(np.asarray(label), ref_full.numpy())
    np.testing.assert_allclose(
        np.asarray(valid_cam), np.moveaxis(t_valid.numpy(), 1, -1), rtol=1e-6
    )


def _torch_cam2mask(img_boxes, cams, cls_labels, th, tl, downscale=2):
    """Oracle: the reference per-image gather/softmax algorithm
    (seg_helper.py:721-797), torch NCHW."""
    cams = nchw(cams)
    cls_labels = torch.from_numpy(cls_labels)
    b, _, h, w = cams.shape
    tmp = torch.ones((b, 1, h, w))
    hi = torch.cat([tmp * th, cams], dim=1)
    lo = torch.cat([tmp * tl, cams], dim=1)
    if downscale:
        hi = F.interpolate(hi, size=(h // downscale, w // downscale),
                           mode="bilinear", align_corners=False)
        lo = F.interpolate(lo, size=(h // downscale, w // downscale),
                           mode="bilinear", align_corners=False)
    lab_bk = torch.cat([torch.ones(b, 1), cls_labels.float()], dim=1)
    out_h = torch.full((b, h, w), 255.0)
    out_l = torch.full((b, h, w), 255.0)
    for i, coord in enumerate(img_boxes):
        keys = torch.nonzero(lab_bk[i])[:, 0]
        for src, dst in ((hi, out_h), (lo, out_l)):
            act = src[i, keys].unsqueeze(0).softmax(dim=1)
            act = F.interpolate(act, size=(h, w), mode="bilinear",
                                align_corners=False)
            lab = keys[act.argmax(dim=1)]
            dst[i, coord[0]:coord[1], coord[2]:coord[3]] = lab[
                0, coord[0]:coord[1], coord[2]:coord[3]
            ].float()
    merged = out_h.clone()
    merged[out_h == 0] = 255
    merged[(out_h + out_l) == 0] = 0
    return merged.numpy().astype(np.int32)


def test_cam2mask_matches_reference_per_image_algorithm():
    """The masked-softmax batched cam2mask must equal the reference's
    per-image present-class gather exactly."""
    B, C, H, W = 3, 5, 16, 16
    cams_raw = RNG.random((B, H, W, C)).astype(np.float32)
    cls_labels = (RNG.random((B, C)) > 0.4).astype(np.int32)
    cls_labels[0] = [1, 0, 0, 0, 0]  # single-class image edge case
    cams = np.asarray(
        cam_validation(jnp.asarray(cams_raw), jnp.asarray(cls_labels))
    )
    box = np.array([[0, 16, 0, 16], [2, 14, 1, 15], [0, -1, 0, -1]], np.int32)

    ours = np.asarray(
        cam2mask(
            img_box=jnp.asarray(box),
            cams=jnp.asarray(cams),
            cls_labels=jnp.asarray(cls_labels),
            threshold_high=0.7,
            threshold_low=0.25,
            downscale=2,
        )
    )
    ref = _torch_cam2mask(box, cams, cls_labels, 0.7, 0.25, downscale=2)
    assert (ours == ref).mean() > 0.999  # allow rare argmax ties
    np.testing.assert_array_equal(ours[:2], ref[:2])


class _FakeModel:
    """A deterministic 'network': stride-16 pooling + fixed linear maps,
    implemented identically in jax and torch to test the TTA fuse."""

    def __init__(self, c_cls=3):
        r = np.random.default_rng(7)
        self.wc = r.standard_normal((3, c_cls)).astype(np.float32)
        self.ws = r.standard_normal((3, c_cls + 1)).astype(np.float32)

    def jax_forward(self, x):
        f = x[:, ::4, ::4, :]
        return dict(
            cam=f @ jnp.asarray(self.wc),
            cam_aux=f @ jnp.asarray(self.wc) * 0.5,
            seg=f @ jnp.asarray(self.ws),
            cls=jnp.mean(f, axis=(1, 2)) @ jnp.asarray(self.wc),
            cls_aux=jnp.mean(f, axis=(1, 2)) @ jnp.asarray(self.wc) * 0.5,
        )

    def torch_forward(self, x):  # x NCHW
        f = x[:, :, ::4, ::4]
        wc = torch.from_numpy(self.wc)
        ws = torch.from_numpy(self.ws)
        cam = torch.einsum("bchw,ck->bkhw", f, wc)
        seg = torch.einsum("bchw,ck->bkhw", f, ws)
        return cam, cam * 0.5, seg


def test_multi_scale_camseg_matches_torch_fuse():
    """TTA fuse parity incl. the cam_aux last-scale-only quirk
    (seg_helper.py:232-275)."""
    model = _FakeModel()
    B, H, W = 2, 32, 32
    imgs = RNG.standard_normal((B, H, W, 3)).astype(np.float32)
    scales = [1.0, 0.5, 1.5]

    cam, cam_aux, seg = multi_scale_camseg(
        model.jax_forward, jnp.asarray(imgs), scales
    )

    # torch oracle (reference loop)
    t_img = nchw(imgs)
    cam_sum, seg_sum, cam_aux_last = 0, 0, None
    for s in scales:
        x = t_img if s == 1.0 else F.interpolate(
            t_img, size=(int(s * H), int(s * W)), mode="bilinear",
            align_corners=False)
        xc = torch.cat([x, x.flip(-1)], dim=0)
        _cam, _cam_aux, _seg = model.torch_forward(xc)
        _cam = F.interpolate(_cam, size=(H, W), mode="bilinear", align_corners=False)
        _cam = torch.max(_cam[:B], _cam[B:].flip(-1))
        _cam_aux = F.interpolate(_cam_aux, size=(H, W), mode="bilinear",
                                 align_corners=False)
        _cam_aux = torch.max(_cam_aux[:B], _cam_aux[B:].flip(-1))
        cam_sum = cam_sum + F.relu(_cam)
        cam_aux_last = F.relu(_cam_aux)
        _seg = F.interpolate(_seg, size=(H, W), mode="bilinear", align_corners=False)
        seg_sum = seg_sum + _seg[:B] + _seg[B:].flip(-1)

    def mmnorm(t):
        t = t + F.adaptive_max_pool2d(-t, (1, 1))
        return t / (F.adaptive_max_pool2d(t, (1, 1)) + 1e-5)

    np.testing.assert_allclose(np.asarray(cam), np.moveaxis(
        mmnorm(cam_sum).numpy(), 1, -1), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(cam_aux), np.moveaxis(
        mmnorm(cam_aux_last).numpy(), 1, -1), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(seg), np.moveaxis(
        seg_sum.numpy(), 1, -1), rtol=2e-4, atol=2e-4)


def test_seg_validation():
    seg = RNG.standard_normal((2, 4, 4, 3)).astype(np.float32)
    cls_label = np.array([[1, 0], [0, 1]], np.int32)
    out = np.asarray(seg_validation(jnp.asarray(seg), jnp.asarray(cls_label)))
    assert (out[0, :, :, 2] == -1e5).all()  # class 2 absent in img 0
    assert (out[0, :, :, 0] == seg[0, :, :, 0]).all()  # bkg untouched
    assert (out[1, :, :, 1] == -1e5).all()
