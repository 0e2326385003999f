"""DenseCRF mean-field tests: edge-snapping behavior + native/JAX agreement."""

import numpy as np
import pytest

from cosa_tpu.config import voc_config


def _scene(h=48, w=48, noise=0.25, seed=0):
    """Two color regions with a vertical edge; noisy unary leaning the wrong
    way near the edge — CRF should snap the boundary to the color edge."""
    r = np.random.default_rng(seed)
    img = np.zeros((h, w, 3), np.uint8)
    img[:, : w // 2] = (200, 40, 40)
    img[:, w // 2 :] = (40, 40, 200)
    img = np.clip(img + r.normal(0, 6, img.shape), 0, 255).astype(np.uint8)

    gt = np.zeros((h, w), np.int32)
    gt[:, w // 2 :] = 1
    probs = np.where(gt[..., None] == 0, [0.7, 0.3], [0.3, 0.7]).astype(np.float32)
    # corrupt a stripe near the edge
    probs[:, w // 2 - 3 : w // 2 + 3] = [0.51, 0.49]
    probs += r.uniform(0, noise, probs.shape).astype(np.float32)
    probs /= probs.sum(-1, keepdims=True)
    return img, probs, gt


def test_crf_improves_noisy_boundary():
    from cosa_tpu.eval.crf import crf_refine_host

    cfg = voc_config(crf_iter=2)
    img, probs, gt = _scene()
    before = (np.argmax(probs, -1) == gt).mean()
    after = (crf_refine_host(cfg, img, probs) == gt).mean()
    assert after >= before
    assert after > 0.95, (before, after)


def test_native_and_jax_crf_agree():
    native = pytest.importorskip("cosa_tpu.native.build")
    try:
        native.load_native()
    except Exception as e:
        pytest.skip(f"no native build: {e}")
    from cosa_tpu.eval.crf import crf_refine_native, _crf_padded
    import jax.numpy as jnp

    cfg = voc_config(crf_iter=1)
    img, probs, gt = _scene(40, 40)
    a = crf_refine_native(cfg, img, probs)

    h = w = 40
    valid = np.ones((h, w), np.float32)
    b = np.asarray(
        _crf_padded(
            jnp.asarray(img.astype(np.float32)),
            jnp.asarray(probs),
            jnp.asarray(valid),
            1, cfg.crf_pos_w, cfg.crf_pos_xy, cfg.crf_bi_w,
            cfg.crf_bi_xy, cfg.crf_bi_rgb, 1,
        )
    )
    agree = (a == b).mean()
    assert agree > 0.98, agree
