"""Model-zoo tests: every non-ViT family builds, runs, and keeps its
contract (shapes, interfaces, BN mutability, co-training integration for
the Swin family). Reference: the vestigial zoo of SURVEY §2.3
(/root/reference/models/{vit/deit.py, vit/mix_transformer.py, res/*,
deeplabs/*, mmsegmodel/*}), rebuilt as working flax families."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cosa_tpu.config import preset_config
from cosa_tpu.models import build_model
from cosa_tpu.models.vit import BACKBONES
from cosa_tpu.models.zoo import (
    MSC,
    BECODeepLabV3Plus,
    DeepLabV1,
    DeepLabV1LargeFOV,
    DeepLabV2,
    DeepLabV2VGG16,
    DeepLabV3,
    DeepLabV3Plus,
    MMSegDeepLab3,
    SegFormer,
    SwinNetwork,
    UPerSwin,
    WRN38Seg,
    build_zoo_model,
)

RNG = jax.random.PRNGKey(0)
X = jnp.asarray(np.random.default_rng(0).normal(size=(2, 64, 64, 3)), jnp.float32)


def _init_apply(m, x=X, **kw):
    vs = m.init({"params": RNG}, x, **kw)
    return vs, m.apply(vs, x, **kw)


# ---------------------------------------------------------------------------
# seg-only families: output grids per architecture contract
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "model,grid",
    [
        (SegFormer(7, "mit_tiny_test"), 16),       # stage-1 1/4 grid
        (WRN38Seg(7, width_div=32), 8),            # os8
        # Kazuto DeepLabs: ceil-mode stem pool (deeplabs/resnet.py:110)
        # makes 64 -> 32 -> 17 -> os8 grid 9 / os16 grid 5, exactly as torch
        (DeepLabV1(7, n_blocks=(1, 1, 1, 1)), 9),  # os8
        (DeepLabV1LargeFOV(7, n_blocks=(1, 1, 1, 1)), 9),
        (DeepLabV2(7, n_blocks=(1, 1, 1, 1)), 9),
        (DeepLabV3(7, n_blocks=(1, 1, 1, 1)), 5),  # os16
        (DeepLabV3Plus(7, n_blocks=(1, 1, 1, 1)), 64),  # upsampled to input
        (DeepLabV2VGG16(7), 8),
        (BECODeepLabV3Plus(7, depth=26), 16),      # 1/4 (low-level) grid
        (MMSegDeepLab3(7, depth=26), 8),
        (MMSegDeepLab3(7, depth=26, separable=True), 16),
        (UPerSwin(7, "swin_tiny_test"), 16),       # 1/4 grid
    ],
    ids=[
        "segformer", "wrn38seg", "dlv1", "dlv1fov", "dlv2", "dlv3", "dlv3p",
        "vggv2", "beco", "mmseg-dl3", "mmseg-dl3p", "uper-swin",
    ],
)
def test_seg_family_shapes(model, grid):
    vs, out = _init_apply(model)
    assert out.shape == (2, grid, grid, 7)
    assert np.isfinite(np.asarray(out)).all()


def test_bn_families_update_stats_in_train_mode():
    m = WRN38Seg(4, width_div=32)
    vs = m.init({"params": RNG}, X)
    assert "batch_stats" in vs
    out, mut = m.apply(vs, X, train=True,
                       rngs={"dropout": RNG}, mutable=["batch_stats"])
    before = jax.tree_util.tree_leaves(vs["batch_stats"])
    after = jax.tree_util.tree_leaves(mut["batch_stats"])
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(before, after)
    )


def test_msc_max_fusion_and_train_pyramid():
    base = DeepLabV2(4, n_blocks=(1, 1, 1, 1))
    m = MSC(base, scales=(0.5,))
    vs = m.init({"params": RNG}, X)
    fused = m.apply(vs, X)
    # train mode updates BN running stats -> needs mutable batch_stats
    pyr, _ = m.apply(vs, X, train=True, rngs={"dropout": RNG},
                     mutable=["batch_stats"])  # [logits@1, logits@.5, max]
    assert isinstance(pyr, list) and len(pyr) == 3
    assert fused.shape == pyr[0].shape == pyr[-1].shape
    # max fusion == pixelwise max(1.0-branch, upsampled 0.5-branch), within
    # the same (train) BN mode; eval fused uses running stats so it differs
    from cosa_tpu.ops.resize import resize_bilinear

    up = resize_bilinear(pyr[1], (pyr[0].shape[1], pyr[0].shape[2]))
    np.testing.assert_allclose(
        np.asarray(pyr[-1]),
        np.maximum(np.asarray(pyr[0]), np.asarray(up)),
        rtol=1e-5, atol=1e-6,
    )


# ---------------------------------------------------------------------------
# Swin: co-training interface + shifted-window invariants
# ---------------------------------------------------------------------------


def test_swin_network_cosa_interface():
    net = SwinNetwork(6, "swin_tiny_test", aux_layer=-3)
    vs, out = _init_apply(net)
    assert set(out) == {"cls", "cls_aux", "feat", "seg", "cam", "cam_aux"}
    assert out["cls"].shape == (2, 5) and out["cls_aux"].shape == (2, 5)
    g = 64 // 4 // 8  # stage-3 grid (patch 4, three 2x merges)
    assert out["seg"].shape == (2, g, g, 6)
    assert out["cam"].shape == (2, g, g, 5)
    # aux tap: -3 of 4 blocks = stage-1 block (1/8 grid, its own width)
    assert out["cam_aux"].shape == (2, 8, 8, 5)

    # detach='all' blocks CAM gradients into the backbone
    def cam_sum(params, detach):
        o = net.apply({"params": params}, X, detach=detach)
        return o["cam"].sum() + o["cam_aux"].sum()

    gr = jax.grad(cam_sum)(vs["params"], "all")
    leaves = jax.tree_util.tree_leaves(gr)
    assert all(np.allclose(np.asarray(l), 0) for l in leaves)
    gr = jax.grad(cam_sum)(vs["params"], "none")
    assert any(np.abs(np.asarray(l)).sum() > 0 for l in jax.tree_util.tree_leaves(gr))


def test_swin_window_padding_consistency():
    """A 64-input (16x16 stage-0 grid, window 4) needs no padding; a
    60-input (15x15 grid) pads to 16 — the padded run restricted to the
    valid region must not produce NaNs or zero out real tokens."""
    net = SwinNetwork(4, "swin_tiny_test")
    vs = net.init({"params": RNG}, X)
    x60 = X[:, :60, :60]
    out = net.apply(vs, x60)
    assert np.isfinite(np.asarray(out["seg"])).all()
    assert out["seg"].shape[1] == 60 // 4 // 8 + 1  # ceil(15/8) merges


def test_swin_trains_in_cosa_loop():
    """'swinend2end' plugs into the unmodified co-training step (LayerNorm
    only — no batch_stats in the train state)."""
    from cosa_tpu.parallel import batch_sharding, make_mesh, state_sharding
    from cosa_tpu.train import (
        build_optimizer,
        build_train_step,
        create_train_state,
    )

    cfg = preset_config(
        "synthetic",
        model="swinend2end",
        backbone="swin_tiny_test",
        mixed_precision=False,
        flash_attention=False,
        energy_rff_features=64,
        energy_convention=1.0,
        batch_size=1,
        lr_warmup_iters=0,  # full LR at step 0 so the loss visibly moves
    )
    mesh = make_mesh(dp=2, tp=1, devices=jax.devices()[:2])
    model = build_model(cfg)
    state = create_train_state(cfg, model, 2)
    tx = build_optimizer(cfg, state.student)
    step = jax.jit(build_train_step(cfg, model, tx), donate_argnums=0)
    state = jax.device_put(state, state_sharding(state, mesh))
    rng = np.random.default_rng(3)
    s = cfg.crop_size
    batch = dict(
        wimg=rng.integers(0, 255, (2, s, s, 3)).astype(np.uint8),
        simg=rng.integers(0, 255, (2, s, s, 3)).astype(np.uint8),
        cls_label=(rng.random((2, cfg.num_classes - 1)) > 0.8).astype(np.float32),
        img_box=np.tile(np.array([[4, 60, 2, 62]], np.int32), (2, 1)),
    )
    batch = jax.device_put(batch, batch_sharding(mesh))
    st1, m1 = step(state, batch)
    _, m2 = step(st1, batch)
    assert np.isfinite(float(m1["overall_loss"]))
    assert np.isfinite(float(m2["overall_loss"]))
    assert float(m2["cls_loss"]) != float(m1["cls_loss"])  # params moved


# ---------------------------------------------------------------------------
# DeiT: distilled token plumbing through CoSANetwork
# ---------------------------------------------------------------------------


def test_deit_distilled_backbone_in_cosa_network():
    cfg = preset_config(
        "synthetic", backbone="deit_tiny_test_distilled",
        mixed_precision=False, flash_attention=False,
    )
    model = build_model(cfg)
    vs = model.init({"params": RNG}, X)
    enc = vs["params"]["encoder"]
    assert "dist_token" in enc
    gs = BACKBONES["deit_tiny_test_distilled"].base_img_size // 16
    assert enc["pos_embed"].shape == (1, gs * gs + 2, 64)
    out = model.apply(vs, X)
    assert out["cam"].shape == (2, 4, 4, 20)
    assert out["seg"].shape == (2, 4, 4, 21)

    # plain vs distilled at identical patch params: patch-token count equal
    cfg_p = cfg.replace(backbone="vit_tiny_test")
    out_p = build_model(cfg_p).init_with_output({"params": RNG}, X)[0]
    assert out_p["cam"].shape == out["cam"].shape


def test_seg_only_models_rejected_at_pipeline_entry():
    """Seg-only zoo families cannot co-train (neither can the reference's —
    main.py would TypeError on their single-tensor forward); the pipeline
    entry points must say so loudly instead of crashing deep in the step."""
    import pytest

    from cosa_tpu.eval.engine import evaluate
    from cosa_tpu.models.network import require_cosa_interface
    from cosa_tpu.train.loop import train

    cfg = preset_config("synthetic", model="segformer", backbone="mit_tiny_test")
    with pytest.raises(NotImplementedError, match="seg-only"):
        train(cfg, max_steps=1)
    with pytest.raises(NotImplementedError, match="seg-only"):
        evaluate(cfg, None, None, None)
    require_cosa_interface(preset_config("synthetic"))  # vit passes


def test_swin_drop_path_active_in_train_mode():
    """Stochastic depth must be LIVE under train=True (the reference MMSWIN
    trains with drop_path 0.1-0.3) and deterministic otherwise."""
    import dataclasses

    from cosa_tpu.models.zoo.swin import SWIN_CONFIGS, SwinBackbone

    cfg = dataclasses.replace(SWIN_CONFIGS["swin_tiny_test"], drop_path_rate=0.5)
    net = SwinBackbone(cfg)
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 64, 64, 3)), jnp.float32)
    vs = net.init({"params": RNG}, x)
    outs1, _ = net.apply(vs, x, train=True, rngs={"dropout": jax.random.PRNGKey(1)})
    outs2, _ = net.apply(vs, x, train=True, rngs={"dropout": jax.random.PRNGKey(2)})
    assert not np.allclose(np.asarray(outs1[-1]), np.asarray(outs2[-1]))
    det1, _ = net.apply(vs, x)
    det2, _ = net.apply(vs, x)
    np.testing.assert_array_equal(np.asarray(det1[-1]), np.asarray(det2[-1]))


def test_zoo_factory_dispatch():
    for model, backbone, cls in [
        ("res38", "res38", WRN38Seg),
        ("res38", "beco_r101", BECODeepLabV3Plus),
        ("res38", "l2g_r101", DeepLabV1LargeFOV),
        ("res38", "l2g_r101_v2", DeepLabV2),
        ("mmseg", "uper-swin-t", UPerSwin),
        ("mmseg", "deeplab3", MMSegDeepLab3),
        ("mmseg", "deeplab3p", MMSegDeepLab3),
        ("swinend2end", "swin-t", SwinNetwork),
        ("segformer", "mit_b0", SegFormer),
    ]:
        cfg = preset_config("synthetic", model=model, backbone=backbone)
        m = build_zoo_model(cfg)
        assert isinstance(m, cls), (model, backbone)
        assert build_model(cfg) is not None
    with pytest.raises(NotImplementedError):
        build_zoo_model(preset_config("synthetic", model="res38",
                                      backbone="nope"))
