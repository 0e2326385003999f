"""Training-driver integration test: a short synthetic run with one
validation + best-checkpoint save, then resume from the saved state."""

import os

import numpy as np

from cosa_tpu.config import preset_config


def _cfg(tmp, **kw):
    base = dict(
        backbone="vit_tiny_test",
        mixed_precision=False,
        flash_attention=False,
        energy_rff_features=64,
        eval_scales=(1.0, 0.5),
        pseudo_scales=(1.0, 0.5),
        max_iters=6,
        eval_iters=3,
        log_iters=2,
        warmup_iters=2,
        lr_warmup_iters=2,
        fasteval=True,
        finalval=False,
        output_dir=str(tmp),
        num_workers=2,
    )
    base.update(kw)
    return preset_config("synthetic", **base)


def test_short_training_run_with_eval_and_resume(tmp_path):
    from cosa_tpu.train.loop import train

    cfg = _cfg(tmp_path / "run1")
    # monkeypatch fasteval to 4 images for speed
    import cosa_tpu.train.loop as loop_mod

    orig = loop_mod._run_validation

    def fast_val(cfg, model, state, val_ds, writer, n_iter, out_dir, bs, bc,
                 mesh=None):
        from cosa_tpu.eval.engine import evaluate
        from cosa_tpu.train import checkpoint as ckpt
        res = evaluate(cfg, model, state.student, val_ds, max_images=2)
        ckpt.save_best(out_dir, state.student, "seg",
                       dict(s_or_t="s", iter=n_iter, result=1.0))
        return {"student": res}, max(bs, 1.0), max(bc, 1.0)

    loop_mod._run_validation = fast_val
    try:
        results = train(cfg)
    finally:
        loop_mod._run_validation = orig

    out = str(tmp_path / "run1")
    assert os.path.exists(os.path.join(out, "metrics.jsonl"))
    assert os.path.exists(os.path.join(out, "ckpt"))
    assert os.path.exists(os.path.join(out, "best_seg"))
    assert results["best_seg"] >= 0

    # resume from the saved full state: should continue at step 6 with 2 more
    cfg2 = _cfg(
        tmp_path / "run2",
        resume=os.path.join(out, "ckpt"),
        max_iters=8,
    )
    loop_mod._run_validation = fast_val
    try:
        train(cfg2)
    finally:
        loop_mod._run_validation = orig
    lines = open(os.path.join(str(tmp_path / "run2"), "metrics.jsonl")).read()
    assert '"iter": 8' in lines


def test_finaleval_roundtrip(tmp_path):
    """best_seg checkpoint reload + CRF final eval (reference finaleval,
    main.py:401-433)."""
    import jax
    from cosa_tpu.train import checkpoint as ckpt
    from cosa_tpu.train.loop import finaleval
    from cosa_tpu.models import build_model
    from cosa_tpu.train.state import create_train_state

    cfg = _cfg(tmp_path / "fe", crf_iter=1)
    model = build_model(cfg)
    state = create_train_state(cfg, model, 2)
    ckpt.save_best(str(tmp_path / "fe"), state.student, "seg",
                   dict(s_or_t="s", iter=1, result=0.0))

    import cosa_tpu.eval.engine as eng
    orig = eng.evaluate

    def few(cfg_, model_, params_, ds_, **kw):
        return orig(cfg_, model_, params_, ds_, max_images=2, **kw)

    eng.evaluate = few
    import cosa_tpu.train.loop as loop_mod
    loop_mod.evaluate = few
    try:
        res = finaleval(cfg)
    finally:
        eng.evaluate = orig
        loop_mod.evaluate = orig
    assert "Seg_crf" in res
    assert 0.0 <= res["Seg_crf"]["miou"] <= 1.0


def test_turnon_rawcam_dumps(tmp_path):
    """turnon_rawcam (reference main.py:338: save_rawcam through every
    validation) writes {out}/{iter}/camraw_dir/*.npy per val image."""
    from cosa_tpu.train.loop import train

    cfg = _cfg(
        tmp_path / "rawcam", turnon_rawcam=True, max_iters=3, eval_iters=3,
        fasteval=True, fasteval_n=2,
    )
    train(cfg)
    d = os.path.join(str(tmp_path / "rawcam"), "3", "camraw_dir")
    assert os.path.isdir(d), d
    files = [f for f in os.listdir(d) if f.endswith(".npy")]
    assert files, "no rawcam dumps written"
    cam = np.load(os.path.join(d, files[0]), allow_pickle=True).item()
    assert all(v.ndim == 2 for v in cam.values())  # per-class 2-D CAM maps


def test_training_run_with_exact_lattice_energy(tmp_path):
    """energy_filter='lattice' on the training path: the loop precomputes
    the lattice structure per batch in its own program
    (objectives/energy.build_energy_lattice) and the step applies the exact
    filter — no surrogate, no convention rescale (VERDICT r2 #2, option b;
    reference utils/seg_helper.py:864-903)."""
    from cosa_tpu.train.loop import train

    cfg = _cfg(
        tmp_path / "latrun",
        energy_filter="lattice",
        max_iters=4,
        eval_iters=100,  # no validation; this tests the train path
    )
    results = train(cfg)
    import json

    lines = [
        json.loads(l)
        for l in open(str(tmp_path / "latrun" / "metrics.jsonl"))
        if '"iter"' in l
    ]
    regs = [r["reg_loss"] for r in lines if "reg_loss" in r]
    assert regs and all(np.isfinite(r) for r in regs)
    # the dense energy -<seg, AS> is strictly negative on any real batch
    assert all(r < 0 for r in regs), regs


def test_random_seed_resolves_and_echoes(tmp_path):
    """--random_seed true draws a fresh seed at train start (reference
    main.py:33) via a one-to-all broadcast and echoes it."""
    from cosa_tpu.train.loop import train

    cfg = _cfg(tmp_path / "rs", random_seed=True, max_iters=1, eval_iters=100)
    train(cfg, max_steps=1)
    out = open(os.path.join(str(tmp_path / "rs"), "print.out")).read()
    assert "random_seed: drew seed" in out
