"""Eval engine + metrics tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from cosa_tpu.config import preset_config
from cosa_tpu.data.loader import build_val_dataset
from cosa_tpu.eval import evaluate
from cosa_tpu.eval.metrics import fast_hist, jax_hist, scores, scores_from_hist
from cosa_tpu.models import build_model
from cosa_tpu.train import create_train_state

RNG = np.random.default_rng(0)


def test_jax_hist_matches_numpy_fast_hist():
    gt = RNG.integers(0, 21, size=(3, 37, 41)).astype(np.int32)
    gt[0, :5] = 255  # ignore
    pred = RNG.integers(0, 21, size=(3, 37, 41)).astype(np.int32)
    ref = fast_hist(gt.flatten(), pred.flatten(), 21)
    ours = np.asarray(jax_hist(jnp.asarray(gt), jnp.asarray(pred), 21))
    np.testing.assert_array_equal(ours, ref)


def test_scores_match_reference_formula():
    gt = [RNG.integers(0, 5, size=(16, 16)).astype(np.uint8) for _ in range(4)]
    pred = [RNG.integers(0, 5, size=(16, 16)).astype(np.uint8) for _ in range(4)]
    s = scores(gt, pred, 5)
    hist = sum(fast_hist(g.flatten(), p.flatten(), 5) for g, p in zip(gt, pred))
    s2 = scores_from_hist(hist)
    assert s["miou"] == pytest.approx(s2["miou"])
    assert s["pAcc"] == pytest.approx(s2["pAcc"])


def test_evaluate_synthetic_end_to_end():
    """Full eval path on synthetic data with a tiny random model: metrics
    exist, are in [0, 1], hists consistent."""
    cfg = preset_config(
        "synthetic",
        backbone="vit_tiny_test",
        crop_size=64,
        mixed_precision=False,
        flash_attention=False,
        eval_scales=(1.0, 0.5),
    )
    model = build_model(cfg)
    state = create_train_state(cfg, model, 2)
    ds = build_val_dataset(cfg)
    out = evaluate(cfg, model, state.student, ds, max_images=4)
    for k in ("CAM", "aux_CAM", "Seg_ps", "Seg_vd"):
        assert 0.0 <= out[k]["miou"] <= 1.0
        assert 0.0 <= out[k]["pAcc"] <= 1.0
    assert len(out["cls_aps"]) == 2


def test_evaluate_threshold_filters():
    """Per-threshold pseudo-mask scoring (reference evaluation_engine
    threshold_filters path + pseudo_scores convention)."""
    cfg = preset_config(
        "synthetic",
        backbone="vit_tiny_test",
        crop_size=64,
        mixed_precision=False,
        flash_attention=False,
        eval_scales=(1.0,),
    )
    model = build_model(cfg)
    state = create_train_state(cfg, model, 2)
    ds = build_val_dataset(cfg)
    out = evaluate(
        cfg, model, state.student, ds, max_images=2,
        threshold_filters=(0.25,),
    )
    assert "cam_0.25" in out and "camaux_0.25" in out
    assert 0.0 <= out["cam_0.25"]["miou"] <= 1.0


def test_batched_eval_equals_single_eval():
    """eval_batch>1 (with tail padding) must reproduce eval_batch=1 hists
    and mAPs exactly."""
    base = dict(
        backbone="vit_tiny_test", crop_size=64, mixed_precision=False,
        flash_attention=False, eval_scales=(1.0,),
    )
    cfg1 = preset_config("synthetic", eval_batch=1, **base)
    cfg3 = preset_config("synthetic", eval_batch=3, **base)
    model = build_model(cfg1)
    state = create_train_state(cfg1, model, 2)
    ds = build_val_dataset(cfg1)
    a = evaluate(cfg1, model, state.student, ds, max_images=5)
    b = evaluate(cfg3, model, state.student, ds, max_images=5)
    # batching changes matmul reduction order -> rare near-tie argmax flips
    for k in ("CAM", "aux_CAM", "Seg_ps", "Seg_vd"):
        assert a[k]["miou"] == pytest.approx(b[k]["miou"], abs=1e-4), k
    assert a["cls_aps"][0] == pytest.approx(b["cls_aps"][0], abs=1e-6)


def test_sharded_eval_matches_unsharded():
    """evaluate(mesh=...) shards the image batch over the mesh's data axis
    (SPMD eval on multi-chip hosts) and must reproduce the plain-jit result."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec

    from cosa_tpu.parallel import make_mesh

    if jax.device_count() < 4:
        pytest.skip("needs the 8-device virtual CPU mesh")
    base = dict(
        backbone="vit_tiny_test", crop_size=64, mixed_precision=False,
        flash_attention=False, eval_scales=(1.0, 0.5), eval_batch=4,
    )
    cfg = preset_config("synthetic", **base)
    model = build_model(cfg)
    state = create_train_state(cfg, model, 2)
    ds = build_val_dataset(cfg)
    mesh = make_mesh(dp=jax.device_count() // 2, tp=2)
    params = jax.device_put(
        state.student, NamedSharding(mesh, PartitionSpec())
    )
    a = evaluate(cfg, model, state.student, ds, max_images=6)
    b = evaluate(cfg, model, params, ds, max_images=6, mesh=mesh)
    for k in ("CAM", "aux_CAM", "Seg_ps", "Seg_vd"):
        assert a[k]["miou"] == pytest.approx(b[k]["miou"], abs=1e-4), k


def test_batched_map_dumps_match_single(tmp_path):
    """save_dir/save_rawcam_dir no longer force batch 1 (round-2
    restriction): the batched artifact path writes the same per-image dumps
    as batch 1."""
    import os

    base = dict(
        backbone="vit_tiny_test", crop_size=64, mixed_precision=False,
        flash_attention=False, eval_scales=(1.0,),
    )
    cfg1 = preset_config("synthetic", eval_batch=1, **base)
    cfg3 = preset_config("synthetic", eval_batch=3, **base)
    model = build_model(cfg1)
    state = create_train_state(cfg1, model, 2)
    ds = build_val_dataset(cfg1)
    d1, d3 = str(tmp_path / "b1"), str(tmp_path / "b3")
    evaluate(cfg1, model, state.student, ds, max_images=4, save_rawcam_dir=d1)
    evaluate(cfg3, model, state.student, ds, max_images=4, save_rawcam_dir=d3)
    f1 = sorted(os.listdir(d1))
    assert f1 == sorted(os.listdir(d3)) and len(f1) == 4
    import numpy as np

    for f in f1:
        a = np.load(os.path.join(d1, f), allow_pickle=True).item()
        b = np.load(os.path.join(d3, f), allow_pickle=True).item()
        assert a.keys() == b.keys()
        for k in a:
            np.testing.assert_allclose(a[k], b[k], atol=2e-5)
