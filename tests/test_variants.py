"""Dead/optional op+loss variants (objectives/variants.py) vs torch oracles
restating the reference formulas (utils/seg_helper.py:277-513, 570-578,
815-861, 124-140)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from cosa_tpu.objectives import (
    mask_to_onehot,
    multi_scale_camseg,
    multi_scale_camseg_v2,
    multi_scale_camseg_v4,
    multi_scale_cls,
    multi_scale_seg,
    seg_get_pseudo,
    seg_loss_v2,
    seg_softloss,
    seg_softloss_v2,
    seg_weightloss,
)

RNG = np.random.default_rng(42)
B, H, W, C = 2, 12, 12, 5


def _logits():
    return RNG.normal(size=(B, H, W, C)).astype(np.float32)


def _labels(ignore_frac=0.2):
    lab = RNG.integers(0, C, (B, H, W)).astype(np.int32)
    lab[RNG.random((B, H, W)) < ignore_frac] = 255
    return lab


def test_seg_loss_v2_matches_torch():
    logits, lab = _logits(), _labels()
    ours = float(seg_loss_v2(jnp.asarray(logits), jnp.asarray(lab)))
    t = F.cross_entropy(
        torch.from_numpy(logits).permute(0, 3, 1, 2),
        torch.from_numpy(lab.astype(np.int64)),
        ignore_index=255, reduction="sum",
    ) / ((torch.from_numpy(lab) != 255).sum() + 1e-6)
    np.testing.assert_allclose(ours, float(t), rtol=1e-5)


def test_seg_weightloss_matches_torch():
    logits, lab = _logits(), _labels()
    wts = RNG.random((B, H, W)).astype(np.float32)
    ours = float(seg_weightloss(jnp.asarray(logits), jnp.asarray(lab),
                                jnp.asarray(wts), fg_alpha=0.3))
    tp = torch.from_numpy(logits).permute(0, 3, 1, 2)
    tl, tw = torch.from_numpy(lab.astype(np.int64)), torch.from_numpy(wts)
    bg = tl.clone(); bg[tl != 0] = 255
    fg = tl.clone(); fg[tl == 0] = 255
    bg_l = (F.cross_entropy(tp, bg, ignore_index=255, reduction="none") * tw
            ).sum() / ((bg != 255).sum() + 1e-6)
    fg_l = (F.cross_entropy(tp, fg, ignore_index=255, reduction="none") * tw
            ).sum() / ((fg != 255).sum() + 1e-6)
    np.testing.assert_allclose(ours, float(0.7 * bg_l + 0.3 * fg_l), rtol=1e-5)


def test_seg_softloss_matches_torch():
    logits = _logits()
    probs = jax.nn.softmax(jnp.asarray(RNG.normal(size=(B, H, W, C))
                                       .astype(np.float32)), -1)
    pn = np.asarray(probs)
    ours_v2 = float(seg_softloss_v2(jnp.asarray(logits), probs))
    tp = torch.from_numpy(logits).permute(0, 3, 1, 2)
    tq = torch.from_numpy(pn).permute(0, 3, 1, 2)
    t_v2 = (-F.log_softmax(tp, dim=1) * tq).sum(dim=1).mean()
    np.testing.assert_allclose(ours_v2, float(t_v2), rtol=1e-5)

    ours = float(seg_softloss(jnp.asarray(logits), probs, fg_alpha=0.5))
    labels = tq.argmax(dim=1)
    flat_p = tp.permute(0, 2, 3, 1)
    flat_q = tq.permute(0, 2, 3, 1)
    bg = (-F.log_softmax(flat_p[labels == 0], -1) * flat_q[labels == 0]
          ).sum(-1).mean()
    fg = (-F.log_softmax(flat_p[labels != 0], -1) * flat_q[labels != 0]
          ).sum(-1).mean()
    np.testing.assert_allclose(ours, float(0.5 * bg + 0.5 * fg), rtol=1e-4)


def test_seg_get_pseudo_matches_torch():
    logits = _logits()
    ours = np.asarray(seg_get_pseudo(jnp.asarray(logits), greater=1.5))
    prob = torch.from_numpy(logits).permute(0, 3, 1, 2).softmax(dim=1)
    top2, idx = prob.topk(2, dim=1)
    lab = idx[:, 0].clone()
    lab[top2[:, 0] < 1.5 * top2[:, 1]] = 255
    np.testing.assert_array_equal(ours, lab.numpy())


def test_mask_to_onehot():
    lab = RNG.integers(0, C, (B, H, W)).astype(np.int32)
    oh = np.asarray(mask_to_onehot(jnp.asarray(lab), C))
    assert oh.shape == (B, H, W, C)
    np.testing.assert_array_equal(oh.argmax(-1), lab)
    np.testing.assert_array_equal(oh.sum(-1), np.ones((B, H, W)))


def _fake_forward(xcat):
    """Deterministic 'model': cam/aux from channel mixes, seg from shifts —
    enough structure for fuse-mode semantics to differ measurably."""
    r = xcat.astype(jnp.float32)
    cam = jnp.stack([r[..., 0], r[..., 1] - r[..., 2]], -1)
    seg = jnp.stack([r[..., 2], r[..., 0] * 0.5, -r[..., 1]], -1)
    return {"cam": cam, "cam_aux": cam * 0.5 + 0.1, "seg": seg,
            "cls": r.mean((1, 2))[:, :2], "cls_aux": r.mean((1, 2))[:, 1:3]}


def test_multi_scale_v2_max_sum_matches_live_fuse():
    """v2 with ('max','sum') flip/scale fuse for CAM and ('sum','sum') for
    seg == the live multi_scale_camseg fuse (same normalization)."""
    imgs = jnp.asarray(RNG.normal(size=(B, 16, 16, 3)).astype(np.float32))
    cam_l, aux_l, seg_l = multi_scale_camseg(_fake_forward, imgs, (1.0, 0.5))
    cam_v, aux_v, seg_v = multi_scale_camseg_v2(
        _fake_forward, imgs, (1.0, 0.5),
        cam_fuse=("max", "sum"), seg_fuse=("sum", "sum"))
    np.testing.assert_allclose(np.asarray(cam_l), np.asarray(cam_v),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(aux_l), np.asarray(aux_v),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(seg_l), np.asarray(seg_v),
                               rtol=1e-5, atol=1e-5)


def test_multi_scale_v2_alternate_fuses_differ():
    imgs = jnp.asarray(RNG.normal(size=(B, 16, 16, 3)).astype(np.float32))
    _, _, seg_sum = multi_scale_camseg_v2(_fake_forward, imgs, (1.0, 0.5),
                                          seg_fuse=("sum", "sum"))
    _, _, seg_max = multi_scale_camseg_v2(_fake_forward, imgs, (1.0, 0.5),
                                          seg_fuse=("max", "max"))
    assert not np.allclose(np.asarray(seg_sum), np.asarray(seg_max))


def test_multi_scale_v4_global_norm_and_validation():
    imgs = jnp.asarray(RNG.normal(size=(B, 16, 16, 3)).astype(np.float32))
    cls_label = jnp.asarray([[1.0, 0.0], [1.0, 1.0]])
    cam, aux, seg = multi_scale_camseg_v4(_fake_forward, imgs, (1.0, 0.5),
                                          cls_label)
    cam_n = np.asarray(cam)
    # absent class is zeroed BEFORE the global norm -> spatially constant
    assert np.allclose(cam_n[0, ..., 1], cam_n[0, ..., 1].flat[0])
    # global normalization: min 0, max 1 over the WHOLE tensor only
    assert np.isclose(cam_n.min(), 0.0, atol=1e-6)
    assert cam_n.max() <= 1.0 + 1e-6
    assert np.isfinite(np.asarray(seg)).all()


def test_multi_scale_seg_and_cls():
    imgs = jnp.asarray(RNG.normal(size=(B, 16, 16, 3)).astype(np.float32))
    seg = multi_scale_seg(lambda x: _fake_forward(x)["seg"], imgs, (1.0, 0.5))
    _, _, seg_live = multi_scale_camseg(_fake_forward, imgs, (1.0, 0.5))
    np.testing.assert_allclose(np.asarray(seg), np.asarray(seg_live),
                               rtol=1e-5, atol=1e-5)
    cls = multi_scale_cls(lambda x: _fake_forward(x)["cls"], imgs, (1.0, 0.5))
    assert cls.shape == (B, 2)
    # the fake cls head is a spatial mean, so each scale contributes
    # orig + flip = 2x the mean logits of the (resized) image
    from cosa_tpu.ops.resize import resize_bilinear

    small = resize_bilinear(imgs, (8, 8))
    expect = (
        2.0 * _fake_forward(jnp.concatenate([imgs, imgs], 0))["cls"][:B]
        + 2.0 * _fake_forward(jnp.concatenate([small, small], 0))["cls"][:B]
    )
    np.testing.assert_allclose(np.asarray(cls), np.asarray(expect),
                               rtol=1e-4, atol=1e-5)
