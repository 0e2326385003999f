"""End-to-end train-step smoke tests on the virtual 8-device CPU mesh:
dp=8 batch sharding, dp=4 x tp=2 tensor sharding, GMM/PAR variants."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cosa_tpu.config import preset_config
from cosa_tpu.models import build_model
from cosa_tpu.parallel import batch_sharding, make_mesh, state_sharding
from cosa_tpu.train import build_optimizer, build_train_step, create_train_state

RNG = np.random.default_rng(0)


def _cfg(**kw):
    return preset_config(
        "synthetic",
        backbone="vit_tiny_test",
        mixed_precision=False,
        flash_attention=False,
        energy_rff_features=64,
        energy_convention=1.0,
        **kw,
    )


def _batch(cfg, n):
    s = cfg.crop_size
    return dict(
        wimg=RNG.integers(0, 255, (n, s, s, 3)).astype(np.uint8),
        simg=RNG.integers(0, 255, (n, s, s, 3)).astype(np.uint8),
        cls_label=(RNG.random((n, cfg.num_classes - 1)) > 0.8).astype(np.float32),
        img_box=np.tile(np.array([[4, 60, 2, 62]], np.int32), (n, 1)),
    )


def _fixed_batch(cfg, n):
    """Deterministic batch (own seeded Generator), for A/B-identical runs."""
    rng = np.random.default_rng(7)
    s = cfg.crop_size
    return dict(
        wimg=rng.integers(0, 255, (n, s, s, 3)).astype(np.uint8),
        simg=rng.integers(0, 255, (n, s, s, 3)).astype(np.uint8),
        cls_label=(rng.random((n, cfg.num_classes - 1)) > 0.8).astype(np.float32),
        img_box=np.tile(np.array([[4, 60, 2, 62]], np.int32), (n, 1)),
    )


def _run_steps(cfg, mesh, n_steps=3):
    model = build_model(cfg)
    gbatch = cfg.batch_size * mesh.shape["data"]
    state = create_train_state(cfg, model, gbatch)
    tx = build_optimizer(cfg, state.student)
    step = build_train_step(cfg, model, tx)

    st_shard = state_sharding(state, mesh)
    state = jax.device_put(state, st_shard)
    jstep = jax.jit(step, donate_argnums=0)

    batch = jax.device_put(_batch(cfg, gbatch), batch_sharding(mesh))
    metrics = None
    for _ in range(n_steps):
        state, metrics = jstep(state, batch)
    return state, metrics


def test_train_step_dp8():
    cfg = _cfg()
    mesh = make_mesh(dp=8, tp=1)
    state, metrics = _run_steps(cfg, mesh)
    assert int(state.step) == 3
    for k in ("overall_loss", "cls_loss", "seg_loss", "cam_loss", "reg_loss"):
        assert np.isfinite(float(metrics[k])), k


def test_train_step_tp2():
    cfg = _cfg()
    mesh = make_mesh(dp=4, tp=2)
    state, metrics = _run_steps(cfg, mesh)
    assert np.isfinite(float(metrics["overall_loss"]))


def test_warmup_gates_aux_losses():
    """During warmup total == cls + cls_aux exactly (main.py:240-241)."""
    cfg = _cfg(warmup_iters=100)
    mesh = make_mesh(dp=8, tp=1)
    _, metrics = _run_steps(cfg, mesh, n_steps=1)
    total = float(metrics["overall_loss"])
    parts = float(metrics["cls_loss"]) + float(metrics["cls_aux_loss"])
    assert abs(total - parts) < 1e-6


def test_ema_teacher_moves_toward_student():
    cfg = _cfg(momentum=0.5)
    mesh = make_mesh(dp=8, tp=1)
    model = build_model(cfg)
    state0 = create_train_state(cfg, model, cfg.batch_size * 8)
    tx = build_optimizer(cfg, state0.student)
    step = jax.jit(build_train_step(cfg, model, tx))
    batch = jax.device_put(_batch(cfg, cfg.batch_size * 8), batch_sharding(mesh))
    state1, _ = step(state0, batch)

    t0 = state0.teacher["classifier"]
    s1 = state1.student["classifier"]
    expect = 0.5 * t0 + 0.5 * s1
    np.testing.assert_allclose(
        np.asarray(state1.teacher["classifier"]), np.asarray(expect),
        rtol=1e-5, atol=1e-6,
    )


def test_frozen_pos_embed_never_updates():
    cfg = _cfg()
    mesh = make_mesh(dp=8, tp=1)
    model = build_model(cfg)
    state0 = create_train_state(cfg, model, cfg.batch_size * 8)
    pos0 = np.asarray(state0.student["encoder"]["pos_embed"])
    tx = build_optimizer(cfg, state0.student)
    step = jax.jit(build_train_step(cfg, model, tx))
    batch = jax.device_put(_batch(cfg, cfg.batch_size * 8), batch_sharding(mesh))
    state, _ = step(state0, batch)
    state, _ = step(state, batch)
    np.testing.assert_array_equal(np.asarray(state.student["encoder"]["pos_embed"]), pos0)


@pytest.mark.parametrize("flag", ["usegmm", "usepar"])
def test_optional_subsystems(flag):
    cfg = _cfg(**{flag: True, "gmm_em_iters": 10, "par_iters": 2})
    mesh = make_mesh(dp=8, tp=1)
    state, metrics = _run_steps(cfg, mesh, n_steps=2)
    assert np.isfinite(float(metrics["overall_loss"]))
    if flag == "usegmm":
        assert int(state.gmm.ptr) == 2 * cfg.batch_size * 8 % state.gmm.queue.shape[0]
        assert 0.0 <= float(metrics["thre_low"]) <= 1.5


def test_usegmmaux_gates_aux_thresholds_independently():
    """usegmmaux (dead flag in the reference, args.py:60; real here): the aux
    head's GMM thresholds move only when its gate is on."""
    mesh = make_mesh(dp=8, tp=1)
    # usegmm on, aux explicitly off: main EMAs move, aux EMAs stay at init
    cfg = _cfg(usegmm=True, usegmmaux=False, gmm_em_iters=10)
    state, _ = _run_steps(cfg, mesh, n_steps=2)
    assert float(state.gmm.ema_low) != cfg.low_thre
    assert float(state.gmm.ema_low_aux) == cfg.low_thre_aux
    # aux-only gating: main static, aux adapts
    cfg = _cfg(usegmm=False, usegmmaux=True, gmm_em_iters=10)
    state, metrics = _run_steps(cfg, mesh, n_steps=2)
    assert np.isfinite(float(metrics["overall_loss"]))
    assert float(state.gmm.ema_low) == cfg.low_thre
    assert float(state.gmm.ema_low_aux) != cfg.low_thre_aux
    # default None follows usegmm (reference-parity coupling, main.py:174)
    cfg = _cfg(usegmm=True, gmm_em_iters=10)
    assert cfg.usegmmaux is None
    state, _ = _run_steps(cfg, mesh, n_steps=2)
    assert float(state.gmm.ema_low_aux) != cfg.low_thre_aux


def test_coco_class_count_train_step():
    """81-class (COCO-shaped) co-training step on the virtual mesh."""
    cfg = _cfg(num_classes=81)
    mesh = make_mesh(dp=8, tp=1)
    state, metrics = _run_steps(cfg, mesh, n_steps=1)
    assert np.isfinite(float(metrics["overall_loss"]))


def test_maskformer_decoder_train_step():
    """Maskformer decoder path through the full co-training step
    (reference --decoder Maskformer, models/__init__.py:103-117)."""
    cfg = _cfg(decoder="Maskformer")
    mesh = make_mesh(dp=8, tp=1)
    state, metrics = _run_steps(cfg, mesh, n_steps=1)
    assert np.isfinite(float(metrics["overall_loss"]))


def test_warmup_gate_floor_prewarms_decoder_moments():
    """warmup_gate_floor keeps seg/cam/reg gradients flowing (scaled tiny)
    during warmup so Adam's moments are calibrated at gate opening — the
    hard zero gate (reference parity, default) gives the decoder exactly
    zero gradients and an unconditioned first post-gate step."""
    mesh = make_mesh(dp=8, tp=1)

    def decoder_kernel(cfg):
        state, _ = _run_steps(cfg, mesh, n_steps=1)
        return np.asarray(
            jax.tree.leaves(state.student["decoder"])[0]
        ), state

    k0, s0 = decoder_kernel(_cfg(warmup_iters=100))
    k1, s1 = decoder_kernel(_cfg(warmup_iters=100, warmup_gate_floor=0.01))
    # floor=0: decoder moves only by decoupled weight decay; floor>0: a real
    # gradient flows — the updates must differ
    assert not np.array_equal(k0, k1)


def test_int8_teacher_close_and_step_runs():
    """teacher_int8: the int8-projection twin shares the param tree and its
    CAM outputs track the float model closely (the teacher's consumers are
    min-max normalize + thresholds); the full step runs with the flag on."""
    cfg = _cfg()
    model = build_model(cfg)
    model_q = build_model(cfg, quant=True)
    state = create_train_state(cfg, model, 2)
    x = jnp.asarray(RNG.standard_normal((1, 64, 64, 3)), jnp.float32)
    of = model.apply({"params": state.student}, x)
    oq = model_q.apply({"params": state.student}, x)
    a = np.asarray(of["cam"]).ravel()
    b = np.asarray(oq["cam"]).ravel()
    cos = float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))
    assert cos > 0.98, cos

    mesh = make_mesh(dp=8, tp=1)
    _, metrics = _run_steps(
        _cfg(teacher_int8=True, teacher_int8_min_size=0), mesh, n_steps=1
    )
    assert np.isfinite(float(metrics["overall_loss"]))

    # the per-scale gate: min_size above every TTA scale = the quant twin is
    # never selected, so the step must match the plain-teacher step exactly
    # (same batch for both runs; _batch draws from a stateful RNG)
    losses = {}
    for key, kw in (
        ("gated", dict(teacher_int8=True, teacher_int8_min_size=10**6)),
        ("plain", dict(teacher_int8=False)),
    ):
        c = _cfg(**kw)
        m = build_model(c)
        st = create_train_state(c, m, 8)
        st = jax.device_put(st, state_sharding(st, mesh))
        jstep = jax.jit(build_train_step(c, m, build_optimizer(c, st.student)))
        b = jax.device_put(
            jax.tree.map(np.copy, _fixed_batch(c, 8)), batch_sharding(mesh)
        )
        _, mt = jstep(st, b)
        losses[key] = float(mt["overall_loss"])
    assert losses["gated"] == losses["plain"], losses


def test_lattice_filter_without_tables_fails_loudly():
    """energy_filter='lattice' + a batch missing the precomputed
    'energy_lattice' tables must raise at trace time instead of silently
    re-inlining the compile-hostile lattice build into the step jit
    (ADVICE r3; see objectives/energy.build_energy_lattice)."""
    cfg = _cfg(energy_filter="lattice")
    model = build_model(cfg)
    state = create_train_state(cfg, model, 2)
    tx = build_optimizer(cfg, state.student)
    step = build_train_step(cfg, model, tx)
    with pytest.raises(ValueError, match="energy_lattice"):
        step(state, _batch(cfg, 2))


def test_simg_from_packed_matches_unpack():
    """simg_from_packed is the single source of truth for pack_batch's
    stacking order: it must equal unpack_batch's strong-crop slot on both
    packed and unpacked batches (ADVICE r3)."""
    from cosa_tpu.data.loader import pack_batch, simg_from_packed, unpack_batch

    cfg = _cfg()
    raw = _batch(cfg, 4)
    packed = pack_batch(raw)
    np.testing.assert_array_equal(
        np.asarray(simg_from_packed(packed)), raw["simg"]
    )
    np.testing.assert_array_equal(
        np.asarray(unpack_batch(packed)[1]), raw["simg"]
    )
    np.testing.assert_array_equal(
        np.asarray(simg_from_packed(raw)), raw["simg"]
    )
