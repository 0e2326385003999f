"""Per-piece roofline breakdown of the VOC train step on the live chip.

VERDICT r4 #2 asked for the accounting behind the ~0.083 s/iter single-chip
plateau. bench.py now reports whole-step MFU; this script answers the next
question — WHERE the time goes — by AOT-compiling the step's FLOP-bearing
pieces as separate programs and reporting wall time, XLA's own
``cost_analysis()`` FLOP count, and per-piece MFU:

  full      the exact bench.py / train-loop step program
  teacher   multi-scale x flip TTA (reference main.py:121; 3 scales at
            224/448/672 for crop 448, bf16 under mixed precision)
  student   jax.grad of the student loss with the pseudo-label inputs held
            fixed (fwd+bwd + dense-energy regularizer, main.py:124/245-248)
  update    PolyWarmupAdamW + EMA teacher tree update (main.py:57-72/250-252)

Pieces re-run under their own jit, so their sum exceeds the full step
wherever XLA fuses across piece boundaries in the real program (and each
piece repeats the uint8 normalize). The point is the RATIO — which piece
burns the time, and whether its MFU says "MXU-bound" or "memory/VPU-bound".

Relay discipline: block_until_ready does not synchronize over axon; every
timed loop ends with one scalar fetch that depends on the whole chain.

Usage:  python scripts/profile_step.py [--batch 4] [--iters 20]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _flops_of, _peak_tflops


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--crop", type=int, default=None)
    ap.add_argument("--backbone", type=str, default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from cosa_tpu.config import voc_config
    from cosa_tpu.models import build_model
    from cosa_tpu.objectives.energy import get_energy_loss
    from cosa_tpu.objectives.losses import (
        multilabel_soft_margin,
        seg_loss,
    )
    from cosa_tpu.objectives.pseudo import (
        cam2mask,
        cam_validation,
        multi_scale_camseg,
        seg_refine_by_label,
    )
    from cosa_tpu.ops.image import normalize
    from cosa_tpu.ops.resize import resize_bilinear
    from cosa_tpu.parallel import batch_sharding, make_mesh, state_sharding
    from cosa_tpu.train import (
        build_optimizer,
        build_train_step,
        create_train_state,
    )

    over = {}
    if args.crop:
        over["crop_size"] = args.crop
    if args.backbone:
        over["backbone"] = args.backbone
    cfg = voc_config(batch_size=args.batch, energy_convention=1.0, **over)
    peak = _peak_tflops(jax.devices()[0])

    mesh = make_mesh(dp=jax.device_count(), tp=1)
    model = build_model(cfg)
    state = create_train_state(cfg, model, args.batch)
    tx = build_optimizer(cfg, state.student)
    state = jax.device_put(state, state_sharding(state, mesh))

    rng = np.random.default_rng(0)
    s = cfg.crop_size
    batch = dict(
        wimg=rng.integers(0, 255, (args.batch, s, s, 3)).astype(np.uint8),
        simg=rng.integers(0, 255, (args.batch, s, s, 3)).astype(np.uint8),
        cls_label=(
            rng.random((args.batch, cfg.num_classes - 1)) > 0.8
        ).astype(np.float32),
        img_box=np.tile(np.array([[0, s, 0, s]], np.int32), (args.batch, 1)),
    )
    batch = jax.device_put(batch, batch_sharding(mesh))

    act_dt = jnp.bfloat16 if cfg.mixed_precision else jnp.float32

    # ---- pieces ----------------------------------------------------------
    def teacher_piece(teacher, wimg_u8):
        wimg = normalize(wimg_u8, dtype=act_dt)
        fwd = lambda x: model.apply({"params": teacher}, x)
        return jax.lax.stop_gradient(
            multi_scale_camseg(fwd, wimg, cfg.pseudo_scales, cam_dtype=act_dt)
        )

    def student_piece(student, simg_u8, refine_mask, refine_mask_aux,
                      valid_seg_ps, cls_label, img_box):
        simg = normalize(simg_u8)
        h, w = simg.shape[1:3]

        def loss_fn(params):
            out = model.apply({"params": params}, simg, detach=cfg.detach)
            cls_l = multilabel_soft_margin(out["cls"], cls_label)
            cls_a = multilabel_soft_margin(out["cls_aux"], cls_label)
            seg_pred = resize_bilinear(out["seg"], (h, w))
            sl = seg_loss(seg_pred, refine_mask, fg_alpha=cfg.segfg_alpha,
                          ignore_index=cfg.ignore_index)
            sla = seg_loss(seg_pred, refine_mask_aux,
                           fg_alpha=cfg.segfg_alpha,
                           ignore_index=cfg.ignore_index)
            sl = (1 - cfg.aux_cam2seg_alpha) * sl + cfg.aux_cam2seg_alpha * sla
            reg = get_energy_loss(
                simg, seg_pred, refine_mask, img_box,
                weight=cfg.energy_weight, sigma_rgb=cfg.energy_sigma_rgb,
                sigma_xy=cfg.energy_sigma_xy, scale_factor=cfg.energy_scale,
                filter_kind=cfg.energy_filter,
                rff_features=cfg.energy_rff_features,
                ignore_index=cfg.ignore_index, half=cfg.mixed_precision,
                convention=1.0,
            )
            from cosa_tpu.objectives.losses import cam_loss_v1

            cl = cam_loss_v1(out["cam"], valid_seg_ps)
            total = (cls_l + cls_a
                     + cfg.seg_weight * sl + cfg.cam_weight * cl
                     + cfg.reg_weight * reg)
            return total
        return jax.grad(loss_fn)(student)

    def update_piece(student, teacher, opt_state, grads):
        updates, new_opt = tx.update(grads, opt_state, student)
        new_student = jax.tree.map(lambda p, u: p + u, student, updates)
        m = cfg.momentum
        new_teacher = jax.tree.map(
            lambda t, st: m * t + (1.0 - m) * st.astype(t.dtype),
            teacher, new_student,
        )
        return new_student, new_teacher, new_opt

    full_step = jax.jit(build_train_step(cfg, model, tx))

    # ---- pseudo inputs for the student piece (one teacher pass) ----------
    cam_ps, cam_aux_ps, seg_ps = jax.jit(teacher_piece)(
        state.teacher, batch["wimg"])
    valid_cam = cam_validation(cam_ps.astype(jnp.float32),
                               batch["cls_label"])
    valid_cam_aux = cam_validation(cam_aux_ps.astype(jnp.float32),
                                   batch["cls_label"])
    mk = partial(cam2mask, img_box=batch["img_box"],
                 cls_labels=batch["cls_label"], downscale=cfg.par_downscale,
                 ignore_index=cfg.ignore_index)
    refine_mask = jax.jit(lambda c: mk(
        cams=c, threshold_high=cfg.high_thre, threshold_low=cfg.low_thre
    ))(valid_cam)
    refine_mask_aux = jax.jit(lambda c: mk(
        cams=c, threshold_high=cfg.high_thre_aux,
        threshold_low=cfg.low_thre_aux))(valid_cam_aux)
    valid_seg_ps = jax.jit(partial(
        seg_refine_by_label, softmaxtemp=cfg.seg_softmaxtemp,
        after_softmax=cfg.after_softmax))(seg_ps, batch["cls_label"])

    grads_ex = None  # filled after the student piece compiles

    peak_all = peak * jax.device_count() if peak else None

    def timed(name, compiled, fetch, call):
        # warmup + timed loop; one dependent scalar fetch at the end
        for _ in range(3):
            out = call()
        float(fetch(out))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = call()
        float(fetch(out))
        dt = (time.perf_counter() - t0) / args.iters
        flops = _flops_of(compiled)
        line = {"piece": name, "ms": round(dt * 1e3, 2)}
        if flops:
            line["tflops"] = round(flops / 1e12, 4)
            line["achieved_tflops_per_sec"] = round(flops / 1e12 / dt, 2)
            if peak_all:
                line["mfu"] = round(flops / 1e12 / dt / peak_all, 4)
        print(json.dumps(line), flush=True)
        return out

    # full step (non-donated here so `state` stays alive for the pieces)
    c_full = jax.jit(build_train_step(cfg, model, tx)).lower(
        state, batch).compile()
    timed("full", c_full, lambda o: o[1]["overall_loss"],
          lambda: c_full(state, batch))

    c_teach = jax.jit(teacher_piece).lower(
        state.teacher, batch["wimg"]).compile()
    timed("teacher_tta", c_teach, lambda o: o[2].reshape(-1)[0],
          lambda: c_teach(state.teacher, batch["wimg"]))

    c_stud = jax.jit(student_piece).lower(
        state.student, batch["simg"], refine_mask, refine_mask_aux,
        valid_seg_ps, batch["cls_label"], batch["img_box"]).compile()
    grads_ex = timed(
        "student_grad", c_stud,
        lambda o: jax.tree.leaves(o)[0].reshape(-1)[0],
        lambda: c_stud(state.student, batch["simg"], refine_mask,
                       refine_mask_aux, valid_seg_ps, batch["cls_label"],
                       batch["img_box"]))

    c_upd = jax.jit(update_piece).lower(
        state.student, state.teacher, state.opt_state, grads_ex).compile()
    timed("update", c_upd, lambda o: jax.tree.leaves(o[0])[0].reshape(-1)[0],
          lambda: c_upd(state.student, state.teacher, state.opt_state,
                        grads_ex))


if __name__ == "__main__":
    main()
