"""Model structure + semantics tests (reference VITNetwork,
models/__init__.py:82-206)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cosa_tpu.models import CoSANetwork


def _tiny(decoder="LargeFOV", **kw):
    return CoSANetwork(
        num_classes=21,
        backbone="vit_tiny_test",
        decoder=decoder,
        aux_layer=-2,
        **kw,
    )


@pytest.fixture(scope="module")
def tiny_setup():
    model = _tiny()
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 64, 64, 3)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    return model, params, x


def test_output_shapes(tiny_setup):
    model, params, x = tiny_setup
    out = model.apply(params, x)
    gh = 64 // 16
    assert out["cls"].shape == (2, 20)
    assert out["cls_aux"].shape == (2, 20)
    assert out["feat"].shape == (2, gh, gh, 64)
    assert out["seg"].shape == (2, gh, gh, 21)
    assert out["cam"].shape == (2, gh, gh, 20)
    assert out["cam_aux"].shape == (2, gh, gh, 20)


def test_variable_resolution(tiny_setup):
    """Frozen pos-embed bicubic resizing must admit any /16 resolution
    (reference vit.py:288-291)."""
    model, params, _ = tiny_setup
    for s in (32, 96):
        x = jnp.zeros((1, s, s, 3))
        out = model.apply(params, x)
        assert out["seg"].shape == (1, s // 16, s // 16, 21)


def test_cls_head_shares_cam_weights(tiny_setup):
    """cls logits = max-pool(feat) @ classifier == max-pool path of CAM
    (reference __init__.py:197-204: pooling then same 1x1 conv)."""
    model, params, x = tiny_setup
    out = model.apply(params, x)
    w = params["params"]["classifier"]
    manual = jnp.max(out["feat"], axis=(1, 2)) @ w
    np.testing.assert_allclose(out["cls"], manual, rtol=1e-5, atol=1e-5)


def test_detach_modes_stop_gradients(tiny_setup):
    """detach routing (reference __init__.py:180-192): 'all' blocks grads to
    both feat and cls weight via CAM; 'feat' trains only the classifier;
    'cls' trains only features."""
    model, params, x = tiny_setup

    def cam_grad_wrt(p, detach):
        def loss(p):
            return model.apply(p, x, detach=detach)["cam"].sum()

        return jax.grad(loss)(p)

    g_all = cam_grad_wrt(params, "all")
    g_feat = cam_grad_wrt(params, "feat")
    g_cls = cam_grad_wrt(params, "cls")
    g_none = cam_grad_wrt(params, "none")

    def norm(g, path):
        leaf = g["params"]
        for k in path:
            leaf = leaf[k]
        return float(jnp.abs(leaf).sum())

    cls_w = ("classifier",)
    enc_patch = ("encoder", "patch_embed", "kernel")

    assert norm(g_all, cls_w) == 0 and norm(g_all, enc_patch) == 0
    assert norm(g_feat, cls_w) > 0 and norm(g_feat, enc_patch) == 0
    assert norm(g_cls, cls_w) == 0 and norm(g_cls, enc_patch) > 0
    assert norm(g_none, cls_w) > 0 and norm(g_none, enc_patch) > 0


def test_maskformer_decoder_shapes():
    model = _tiny(decoder="Maskformer")
    x = jnp.zeros((2, 64, 64, 3))
    params = model.init(jax.random.PRNGKey(1), x)
    out = model.apply(params, x)
    assert out["seg"].shape == (2, 4, 4, 21)


def test_aux_layer_tap_differs_from_final():
    model = _tiny()
    x = jnp.asarray(np.random.default_rng(1).standard_normal((1, 64, 64, 3)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    # aux tap (pre-norm block output) must differ from the final normed map
    assert not np.allclose(np.asarray(out["cam"]), np.asarray(out["cam_aux"]))
