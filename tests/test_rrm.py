"""Tests for cosa_tpu/utils/rrm.py — the rebuilt utils/rrm_utils.py +
utils/helper.py legacy surface (reference rrm_utils.py:9-340,
helper.py:109-209). Oracles restate the reference formulas in
torch/numpy; none of them import reference code."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from cosa_tpu.utils import rrm


def _rand_img(rng, h=24, w=24):
    return (rng.random((h, w, 3)) * 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# crf_with_alpha / compute_seg_label
# ---------------------------------------------------------------------------

def test_crf_with_alpha_scatter_semantics():
    rng = np.random.default_rng(0)
    img = _rand_img(rng)
    cams = {3: rng.random((24, 24)).astype(np.float32),
            11: rng.random((24, 24)).astype(np.float32)}
    dense = rrm.crf_with_alpha(img, cams, alpha=4, t=2)
    assert dense.shape == (21, 24, 24)
    # absent classes must be exactly zero; bg + the two present planes live
    present = {0, 4, 12}
    for c in range(21):
        if c in present:
            assert dense[c].max() > 0
        else:
            assert np.all(dense[c] == 0)
    # Q is a softmax over the compact planes -> present planes sum to 1
    np.testing.assert_allclose(dense.sum(0), 1.0, atol=1e-5)


def test_crf_with_alpha_bg_alpha_monotone():
    # with t=0 mean-field iterations the filter never runs, so the bg plane
    # is exactly the synthesized unary (1-max_fg)^alpha: higher alpha =>
    # uniformly weaker background score
    rng = np.random.default_rng(1)
    img = _rand_img(rng)
    cam = {0: (rng.random((24, 24)) * 0.8).astype(np.float32)}
    lo = rrm.crf_with_alpha(img, cam, alpha=4, t=0)
    hi = rrm.crf_with_alpha(img, cam, alpha=32, t=0)
    np.testing.assert_allclose(lo[0], np.power(1 - cam[0], 4), atol=1e-5)
    np.testing.assert_allclose(hi[0], np.power(1 - cam[0], 32), atol=1e-5)
    assert np.all(hi[0] <= lo[0] + 1e-7)


def test_compute_seg_label_matches_fusion_oracle():
    """Restate rrm_utils.py:23-79's fusion given the same two CRF maps and
    compare elementwise (the CRF passes themselves are shared — the oracle
    checks the dual-alpha fusion + sure-region logic)."""
    rng = np.random.default_rng(2)
    img = _rand_img(rng)
    n_fg = 20
    cam_label = np.zeros(n_fg)
    cam_label[[2, 7]] = 1
    norm_cam = np.zeros((n_fg, 24, 24), np.float32)
    for c in (2, 7):
        yy, xx = np.mgrid[0:24, 0:24]
        cy, cx = rng.integers(6, 18, 2)
        norm_cam[c] = np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / 30.0)
        norm_cam[c] /= norm_cam[c].max()

    got = rrm.compute_seg_label(img, cam_label, norm_cam)

    # oracle
    cam_dict = {c: norm_cam[c] for c in (2, 7)}
    bg = np.power(1 - norm_cam.max(0), 32)[None]
    cam_all = np.concatenate([bg, norm_cam])
    cam_img = cam_all.argmax(0)
    crf_la = rrm.crf_with_alpha(img, cam_dict, 4)
    crf_ha = rrm.crf_with_alpha(img, cam_dict, 32)
    la, ha = crf_la.argmax(0), crf_ha.argmax(0)
    lab = la.copy()
    lab[la == 0] = 255
    sure = np.zeros((24, 24), bool)
    for ci in np.unique(la):
        plane = np.where(cam_img == ci, cam_all[ci], 0.0)
        if ci == 0:
            sure |= plane > 0.8
        else:
            vals = np.sort(plane[plane > 0.1])
            thr = vals[int(len(vals) * 0.6)] if len(vals) else 0.0
            sure |= plane > thr
    lab[ha == 0] = 0
    fused = np.concatenate([crf_ha[:1], crf_la[1:]]).max(0)
    lab[(fused < 0.8) | ~sure] = 255

    np.testing.assert_array_equal(got, lab)
    assert set(np.unique(got)) <= {0, 3, 8, 255}


def test_cam2seglabel_batched():
    rng = np.random.default_rng(3)
    imgs = np.stack([_rand_img(rng), _rand_img(rng)])
    cam = jnp.asarray(rng.random((2, 6, 6, 20)), jnp.float32)
    label = np.zeros((2, 20), np.float32)
    label[0, 4] = 1
    label[1, [1, 9]] = 1
    out = rrm.cam2seglabel(cam, jnp.asarray(label), imgs)
    assert out.shape == (2, 24, 24)
    assert set(np.unique(out[0])) <= {0, 5, 255}
    assert set(np.unique(out[1])) <= {0, 2, 10, 255}


# ---------------------------------------------------------------------------
# compute_joint_loss
# ---------------------------------------------------------------------------

def test_compute_joint_loss_ce_matches_torch():
    rng = np.random.default_rng(4)
    b, h, w, c = 2, 16, 16, 21
    logits = rng.standard_normal((b, 8, 8, c)).astype(np.float32)
    label = rng.integers(0, c, (b, h, w)).astype(np.int32)
    label[0, :3] = 255
    crop = np.zeros((b, h, w), np.float32)
    crop[:, 2:14, 1:15] = 1.0
    imgs = rng.standard_normal((b, h, w, 3)).astype(np.float32) * 0.5

    ce, dloss = rrm.compute_joint_loss(
        jnp.asarray(imgs), jnp.asarray(logits), jnp.asarray(label),
        jnp.asarray(crop))

    # torch oracle (rrm_utils.py:82-120): bilinear-resize logits to label
    # size, bg CE (labels !=0 -> 255) + fg CE (labels ==0 -> 255), each
    # summed and divided by its own valid count
    pred = F.interpolate(torch.tensor(logits).permute(0, 3, 1, 2), (h, w),
                         mode="bilinear", align_corners=False)
    lab = torch.tensor(label.astype(np.int64))
    bg_l, fg_l = lab.clone(), lab.clone()
    bg_l[lab != 0] = 255
    fg_l[lab == 0] = 255
    bg = F.cross_entropy(pred, bg_l, ignore_index=255, reduction="sum") / \
        ((bg_l != 255).sum() + 1e-6)
    fg = F.cross_entropy(pred, fg_l, ignore_index=255, reduction="sum") / \
        ((fg_l != 255).sum() + 1e-6)
    np.testing.assert_allclose(float(ce), float(bg + fg), rtol=1e-5)
    assert np.isfinite(float(dloss))


def test_compute_joint_loss_bbox_recovery():
    """The crop-mask -> img_box conversion must hand get_energy_loss the
    exact rectangle: dloss computed from the mask equals the dloss from the
    known box."""
    from cosa_tpu.objectives.energy import get_energy_loss
    from cosa_tpu.ops.resize import resize_bilinear

    rng = np.random.default_rng(5)
    b, h, w, c = 2, 16, 16, 5
    logits = jnp.asarray(rng.standard_normal((b, 8, 8, c)), jnp.float32)
    label = jnp.asarray(rng.integers(0, c, (b, h, w)), jnp.int32)
    imgs = jnp.asarray(rng.standard_normal((b, h, w, 3)), jnp.float32)
    crop = np.zeros((b, h, w), np.float32)
    crop[0, 3:12, 2:10] = 1.0
    crop[1, 0:16, 5:16] = 1.0

    _, dloss = rrm.compute_joint_loss(imgs, logits, label, jnp.asarray(crop))
    box = jnp.asarray([[3, 12, 2, 10], [0, 16, 5, 16]], jnp.int32)
    want = get_energy_loss(imgs, resize_bilinear(logits, (h, w)), label, box)
    np.testing.assert_allclose(float(dloss), float(want), rtol=1e-6)


# ---------------------------------------------------------------------------
# compute_cos / compute_dis_no_batch
# ---------------------------------------------------------------------------

def _torch_dis_no_batch(seg_nchw: torch.Tensor, feat_nchw: torch.Tensor,
                        n_fg: int = 20) -> float:
    """Oracle restating rrm_utils.py:254-340 in torch (own words)."""
    def cos(a, b):
        na = a.norm(dim=1, keepdim=True)
        nb = b.norm(dim=1, keepdim=True)
        return (a @ b.t()) / (na @ nb.t() + 1e-7)

    b, c = seg_nchw.shape[0], feat_nchw.shape[1]
    lab = seg_nchw.argmax(1).reshape(b, -1)                   # (B, HW)
    feats = feat_nchw.reshape(b, c, -1)                        # (B, C, HW)
    bg = (lab == 0).float()
    bg_cnt = bg.sum(1) + 1e-7
    bg_ctr = (feats * bg.unsqueeze(1)).sum(2) / bg_cnt.unsqueeze(1)

    pixel = torch.zeros(1)
    for i in range(b):
        d = 1 - cos(feats[i].t(), bg_ctr[i:i + 1])             # (HW,1)
        if bg_cnt[i] >= 1:
            pixel = pixel + (d[:, 0] * bg[i]).sum() / bg_cnt[i]
        else:
            pixel = pixel + 2.0

    fl = lab.reshape(-1)
    ff = feats.permute(0, 2, 1).reshape(-1, c)
    ctrs = []
    for ci in range(1, n_fg + 1):
        m = (fl == ci).float()
        num = m.sum() + 1e-7
        if num < 1:
            continue
        ctr = (ff * m.unsqueeze(1)).sum(0, keepdim=True) / num
        d = 1 - cos(ff, ctr)
        pixel = pixel + (d[:, 0] * m).sum() / num
        ctrs.append(ctr)
    pixel = pixel / (len(ctrs) + b)

    total_bg = bg.sum()
    if ctrs and total_bg + 1e-7 >= 1:
        fgc = torch.cat(ctrs)
        ffc = 1 + cos(fgc, fgc)
        ffc = ffc - torch.diag(torch.diag(ffc))
        n = fgc.shape[0]
        ffl = ffc.sum() / (n * (n - 1)) if n > 1 else torch.zeros(())
        fbc = 1 + cos(fgc, bg_ctr)
        dis = 0.5 * ffl + 0.5 * fbc.sum() / (fbc.shape[0] * fbc.shape[1])
    elif ctrs:
        fgc = torch.cat(ctrs)
        ffc = 1 + cos(fgc, fgc)
        ffc = ffc - torch.diag(torch.diag(ffc))
        n = fgc.shape[0]
        ffl = ffc.sum() / (n * (n - 1)) if n > 1 else torch.zeros(())
        dis = 0.5 * ffl + 1.0
    else:
        dis = torch.zeros(())
    return float(dis + pixel)


def test_compute_cos_matches_torch():
    rng = np.random.default_rng(6)
    a = rng.standard_normal((5, 8)).astype(np.float32)
    b = rng.standard_normal((3, 8)).astype(np.float32)
    ours = np.asarray(rrm.compute_cos(jnp.asarray(a), jnp.asarray(b)))
    ta, tb = torch.tensor(a), torch.tensor(b)
    want = (ta @ tb.t()) / (ta.norm(dim=1, keepdim=True)
                            @ tb.norm(dim=1, keepdim=True).t() + 1e-7)
    np.testing.assert_allclose(ours, want.numpy(), atol=1e-6)


@pytest.mark.parametrize("case", ["mixed", "fg_only", "bg_only"])
def test_compute_dis_no_batch_matches_oracle(case):
    rng = np.random.default_rng(7)
    b, h, w, c, ncls = 2, 6, 6, 16, 21
    feat = rng.standard_normal((b, h, w, c)).astype(np.float32)
    seg = rng.standard_normal((b, h, w, ncls)).astype(np.float32)
    if case == "fg_only":
        seg[..., 0] -= 100.0  # background never wins
    elif case == "bg_only":
        seg[..., 0] += 100.0  # background always wins
    ours = float(np.asarray(rrm.compute_dis_no_batch(
        jnp.asarray(seg), jnp.asarray(feat))).reshape(-1)[0])
    want = _torch_dis_no_batch(
        torch.tensor(seg).permute(0, 3, 1, 2),
        torch.tensor(feat).permute(0, 3, 1, 2))
    np.testing.assert_allclose(ours, want, rtol=2e-4, atol=2e-5)


def test_compute_dis_no_batch_one_image_no_bg():
    # per-batch "no bg pixels -> +2" branch
    rng = np.random.default_rng(8)
    feat = rng.standard_normal((2, 4, 4, 8)).astype(np.float32)
    seg = rng.standard_normal((2, 4, 4, 21)).astype(np.float32)
    seg[0, ..., 0] -= 100.0  # image 0 has zero bg
    seg[1, ..., 0] += 100.0  # image 1 is all bg
    ours = float(np.asarray(rrm.compute_dis_no_batch(
        jnp.asarray(seg), jnp.asarray(feat))).reshape(-1)[0])
    want = _torch_dis_no_batch(
        torch.tensor(seg).permute(0, 3, 1, 2),
        torch.tensor(feat).permute(0, 3, 1, 2))
    np.testing.assert_allclose(ours, want, rtol=2e-4, atol=2e-5)


# ---------------------------------------------------------------------------
# small helpers
# ---------------------------------------------------------------------------

def test_resize_label_batch_matches_torch():
    rng = np.random.default_rng(9)
    label = rng.integers(0, 30, (7, 5, 1, 2)).astype(np.float64)
    ours = rrm.resize_label_batch(label, 12)
    interp = torch.nn.UpsamplingBilinear2d(size=(12, 12))
    want = interp(torch.tensor(label.transpose(3, 2, 0, 1))).numpy() \
        .transpose(2, 3, 1, 0)
    want[want > 21] = 255
    np.testing.assert_allclose(ours, want, atol=1e-4)


def test_random_crop_with_mask_both_directions():
    rng = np.random.default_rng(10)
    # image larger than crop: full-valid mask
    img = rng.random((20, 30, 3)).astype(np.float32)
    out, mask = rrm.random_crop_with_mask(img, 16, rng)
    assert out.shape == (16, 16, 3) and mask.all()
    # image smaller than crop: mask marks the pasted region only
    img = rng.random((10, 8, 3)).astype(np.float32)
    out, mask = rrm.random_crop_with_mask(img, 16, rng)
    assert mask.sum() == 10 * 8
    # pasted content must match the source image exactly
    ys, xs = np.where(mask)
    np.testing.assert_array_equal(
        out[ys.min():ys.max() + 1, xs.min():xs.max() + 1], img)


def test_get_data_from_chunk_v2(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(11)
    names = ["a", "b", "c"]
    for n in names:
        Image.fromarray(_rand_img(rng, 40, 52)).save(tmp_path / f"{n}.jpg")
    labels = {n: rng.integers(0, 2, 20).astype(np.float32) for n in names}
    imgs, ori, lab, crops = rrm.get_data_from_chunk_v2(
        names, str(tmp_path), 32, labels, rng)
    assert imgs.shape == (3, 32, 32, 3)
    assert ori.shape == (3, 32, 32, 3) and ori.dtype == np.uint8
    assert lab.shape == (3, 20)
    assert crops.shape == (3, 32, 32)
    # de-normalization inverts normalization on valid pixels (u8 rounding)
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    recon = (imgs * std + mean) * 255.0
    valid = crops[..., None] > 0
    assert np.abs(np.where(valid, recon - ori, 0)).max() < 1.0


def test_read_file_and_chunker(tmp_path):
    p = tmp_path / "list.txt"
    p.write_text("x\ny\nz\n")
    assert rrm.read_file(str(p)) == ["x", "y", "z"]
    assert [list(c) for c in rrm.chunker(list("abcde"), 2)] == \
        [["a", "b"], ["c", "d"], ["e"]]


def test_rrm_poly_sgd_schedule_matches_reference_math():
    base, mx, mom = 0.01, 100, 0.9
    sched = rrm.rrm_poly_sgd_schedule(base, mx, mom)
    for s in [0, 1, 25, 49, 50, 75, 99, 100, 150]:
        s_eff = min(s, mx - 1)
        half = 0.5 * mx
        if s_eff < half:
            want = base * (1 - s_eff / half) ** mom
        else:
            want = 0.0007 * (1 - (s_eff - half) / (mx - half)) ** mom
        np.testing.assert_allclose(float(sched(s)), want, rtol=1e-6)


def test_rrm_poly_sgd_momentum_slot_bug():
    """One step of our optax twin == torch SGD(lr sched, momentum=wd)."""
    import optax

    w = np.array([1.0, -2.0, 3.0], np.float32)
    g = np.array([0.5, 0.25, -1.0], np.float32)
    wd = 1e-4
    opt = rrm.rrm_poly_sgd(0.01, wd, max_step=100)
    state = opt.init(jnp.asarray(w))
    up1, state = opt.update(jnp.asarray(g), state)
    w1 = optax.apply_updates(jnp.asarray(w), up1)
    up2, _ = opt.update(jnp.asarray(g), state)
    w2 = optax.apply_updates(w1, up2)

    tw = torch.tensor(w, requires_grad=True)
    topt = torch.optim.SGD([tw], lr=0.01, momentum=wd)  # the slot bug
    for step, lr in ((0, float(rrm.rrm_poly_sgd_schedule(0.01, 100)(0))),
                     (1, float(rrm.rrm_poly_sgd_schedule(0.01, 100)(1)))):
        for gparam in topt.param_groups:
            gparam["lr"] = lr
        tw.grad = torch.tensor(g)
        topt.step()
    np.testing.assert_allclose(np.asarray(w2), tw.detach().numpy(), atol=1e-6)
