"""The compiled co-training step.

One XLA program per iteration covering what the reference spreads over
main.py:106-252 + host round trips:

  teacher multi-scale TTA  (main.py:121)          -> on device, same jit
  student forward/backward (main.py:124, 245-248) -> value_and_grad
  CAM -> pseudo mask       (main.py:134-203)      -> batched cam2mask
  GMM adaptive thresholds  (main.py:138-151)      -> on-device EM + ring buffer
  dense-energy regularizer (main.py:208-212)      -> custom-VJP Gaussian filter
  seg -> CAM soft targets  (main.py:226-228)
  PolyWarmupAdamW update   (main.py:57-72)        -> optax multi_transform
  EMA teacher update       (main.py:250-252)      -> tree_map, f32

Gradient all-reduce across the 'data' mesh axis is inserted by XLA (the
batch is sharded, the params replicated); there is no explicit collective
and no per-iteration barrier (reference main.py:385).

Loss weighting (main.py:240-243): cls losses always on; seg/cam/reg gated to
zero while step <= warmup_iters.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp

from cosa_tpu.objectives.energy import get_energy_loss
from cosa_tpu.objectives.losses import (
    cam_loss_v1,
    cam_loss_v2,
    cam_loss_v3,
    multilabel_soft_margin,
    seg_loss,
)
from cosa_tpu.objectives.pseudo import (
    cam2mask,
    cam_validation,
    multi_scale_camseg,
    seg_refine_by_label,
)
from cosa_tpu.ops.gmm import gmm_thresholds
from cosa_tpu.ops.image import denormalize01, normalize
from cosa_tpu.ops.par import par_refine
from cosa_tpu.ops.resize import resize_bilinear
from cosa_tpu.train.state import GMMState, TrainState


def _update_queue(queue: jnp.ndarray, ptr: jnp.ndarray, rows: jnp.ndarray):
    """Ring-buffer write (reference DynamicQueue.update, seg_helper.py:953-956)."""
    b = rows.shape[0]
    queue = jax.lax.dynamic_update_slice(queue, rows, (ptr, 0))
    return queue, (ptr + b) % queue.shape[0]


def _gmm_maxrow(valid_cam: jnp.ndarray, gmmscale: int) -> jnp.ndarray:
    """(B,H,W,C) validated CAM -> (B, (H/s)*(W/s)) spatial max map rows
    (main.py:139-143)."""
    h, w = valid_cam.shape[1:3]
    red = resize_bilinear(valid_cam, (h // gmmscale, w // gmmscale))
    return jnp.max(red, axis=-1).reshape(valid_cam.shape[0], -1)


def build_train_step(
    cfg, model, tx
) -> Callable[[TrainState, Dict[str, jnp.ndarray]], Tuple[TrainState, Dict]]:
    camloss_fn = {
        "v1": cam_loss_v1,
        "v2": cam_loss_v2,
        "v3": partial(cam_loss_v3, seg_confident_thre=cfg.segconf_thre),
    }[cfg.camloss_version]

    # the rff energy surrogate needs a calibrated rescale into the reference
    # lattice's convention; train() resolves 0.0 -> measured value before
    # building the step (direct builders must set cfg.energy_convention)
    energy_convention = float(cfg.energy_convention)
    if cfg.energy_filter == "rff" and energy_convention <= 0:
        raise ValueError(
            "cfg.energy_convention is unresolved (0.0 = auto). Call "
            "objectives.energy.resolve_energy_convention on a real batch "
            "first (train() does this), or set it explicitly."
        )

    # int8 teacher twin (same param tree, quantized projections); applied
    # per TTA scale — int8 only wins where the matmuls amortize the
    # quantize boundaries (cfg.teacher_int8_min_size, measured on v5e)
    quant_model = None
    if cfg.teacher_int8:
        from cosa_tpu.models import build_model as _build_model

        quant_model = _build_model(cfg, quant=True)

    refine_fn = None
    if cfg.usepar:
        refine_fn = lambda imgs, probs: par_refine(
            imgs, probs, dilations=cfg.par_dilations, num_iter=cfg.par_iters
        )

    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray]):
        from cosa_tpu.data.loader import unpack_batch

        wimg_u8, simg_u8, cls_label, img_box = unpack_batch(batch)
        if cfg.energy_filter == "lattice" and "energy_lattice" not in batch:
            # fail at trace time: the permissive get_energy_loss fallback
            # would silently re-inline the compile-hostile lattice build
            # (sort/unique/search) into this jit — the round-1/2 compile
            # blowup. Build the tables per batch with
            # objectives/energy.build_energy_lattice (train/loop.py lat_fn).
            raise ValueError(
                "energy_filter='lattice' requires batch['energy_lattice'] "
                "tables on the train path (see build_energy_lattice)"
            )
        # teacher input stored bf16 under mixed precision (same values the
        # model's patch-embed cast would produce; see ops/image.normalize);
        # simg stays f32 — it also feeds the energy features and PAR.
        wimg = normalize(
            wimg_u8,
            dtype=jnp.bfloat16 if cfg.mixed_precision else jnp.float32,
        )
        simg = normalize(simg_u8)
        cls_label = cls_label.astype(jnp.float32)
        h, w = simg.shape[1:3]

        # ---- teacher TTA pseudo labels (no grad) -------------------------
        def teacher_fwd(x):
            m = model
            if quant_model is not None and (
                min(x.shape[1], x.shape[2]) >= cfg.teacher_int8_min_size
            ):
                m = quant_model
            return m.apply({"params": state.teacher}, x)
        cam_ps, cam_aux_ps, seg_ps = jax.lax.stop_gradient(
            multi_scale_camseg(
                teacher_fwd, wimg, cfg.pseudo_scales,
                cam_dtype=jnp.bfloat16 if cfg.mixed_precision else jnp.float32,
            )
        )

        # ---- pseudo masks + adaptive thresholds (no grad) ----------------
        cam_src = (cam_ps + cam_aux_ps) / 2 if cfg.use_cammix else cam_ps
        valid_cam = cam_validation(cam_src, cls_label)
        valid_cam_aux = cam_validation(cam_aux_ps, cls_label)

        # GMM gates: usegmm drives the main head; usegmmaux (None = follow
        # usegmm, the reference-parity coupling of main.py:138/174) gates the
        # aux head's thresholds independently — the reference declares the
        # flag (args.py:60) but never consumes it; here it works.
        use_gmm_aux = cfg.usegmm if cfg.usegmmaux is None else cfg.usegmmaux
        gmm = state.gmm
        if cfg.usegmm or use_gmm_aux:
            d = cfg.gmmemadecay
            q, qa, ptr = gmm.queue, gmm.queue_aux, gmm.ptr
            ema_low, ema_high = gmm.ema_low, gmm.ema_high
            ema_low_aux, ema_high_aux = gmm.ema_low_aux, gmm.ema_high_aux
            if cfg.usegmm:
                q, ptr = _update_queue(
                    gmm.queue, gmm.ptr, _gmm_maxrow(valid_cam, cfg.gmmscale)
                )
                lo, hi = gmm_thresholds(q, cfg.gmmfilter_thre, 3,
                                        cfg.gmm_em_iters, cfg.gmm_em_subsample)
                ema_low = ema_low * d + lo * (1 - d)
                ema_high = ema_high * d + hi * (1 - d)
            if use_gmm_aux:
                qa, ptr = _update_queue(
                    gmm.queue_aux, gmm.ptr,
                    _gmm_maxrow(valid_cam_aux, cfg.gmmscale),
                )
                lo_a, hi_a = gmm_thresholds(qa, cfg.gmmfilter_thre, 3,
                                            cfg.gmm_em_iters,
                                            cfg.gmm_em_subsample)
                ema_low_aux = ema_low_aux * d + lo_a * (1 - d)
                ema_high_aux = ema_high_aux * d + hi_a * (1 - d)
            gmm = GMMState(
                queue=q, queue_aux=qa, ptr=ptr,
                ema_low=ema_low, ema_high=ema_high,
                ema_low_aux=ema_low_aux, ema_high_aux=ema_high_aux,
            )
        threlow, threhigh = (
            (gmm.ema_low, gmm.ema_high) if cfg.usegmm
            else (cfg.low_thre, cfg.high_thre)
        )
        threlow_a, threhigh_a = (
            (gmm.ema_low_aux, gmm.ema_high_aux) if use_gmm_aux
            else (cfg.low_thre_aux, cfg.high_thre_aux)
        )

        images01 = denormalize01(simg) if cfg.usepar else None
        mask_kwargs = dict(
            img_box=img_box,
            cls_labels=cls_label,
            downscale=cfg.par_downscale,
            ignore_index=cfg.ignore_index,
            refine_fn=refine_fn,
            images=images01,
        )
        refine_mask = cam2mask(
            cams=valid_cam, threshold_high=threhigh, threshold_low=threlow,
            **mask_kwargs,
        )
        if cfg.aux_cam2seg:
            refine_mask_aux = cam2mask(
                cams=valid_cam_aux, threshold_high=threhigh_a,
                threshold_low=threlow_a, **mask_kwargs,
            )

        # soft CAM targets from teacher seg (main.py:226-227)
        valid_seg_ps = seg_refine_by_label(
            seg_ps, cls_label, softmaxtemp=cfg.seg_softmaxtemp,
            after_softmax=cfg.after_softmax,
        )

        # ---- student loss -------------------------------------------------
        # stochastic-depth rng for families that train with drop-path (the
        # reference MMSWIN backbone, drop_path 0.1-0.3; torch .train() makes
        # DropPath live on the student while the teacher stays eval)
        student_kwargs = {}
        if cfg.model == "swinend2end":
            student_kwargs = dict(
                train=True,
                rngs={"dropout": jax.random.fold_in(
                    jax.random.PRNGKey(cfg.seed), state.step)},
            )

        def loss_fn(params):
            out = model.apply({"params": params}, simg, detach=cfg.detach,
                              **student_kwargs)
            cls_loss = multilabel_soft_margin(out["cls"], cls_label)
            cls_aux_loss = multilabel_soft_margin(out["cls_aux"], cls_label)

            seg_pred = resize_bilinear(out["seg"], (h, w))
            sl = seg_loss(seg_pred, refine_mask, fg_alpha=cfg.segfg_alpha,
                          ignore_index=cfg.ignore_index)
            if cfg.aux_cam2seg:
                sl_aux = seg_loss(seg_pred, refine_mask_aux,
                                  fg_alpha=cfg.segfg_alpha,
                                  ignore_index=cfg.ignore_index)
                sl = (1 - cfg.aux_cam2seg_alpha) * sl + cfg.aux_cam2seg_alpha * sl_aux

            reg = get_energy_loss(
                simg, seg_pred, refine_mask, img_box,
                weight=cfg.energy_weight,
                sigma_rgb=cfg.energy_sigma_rgb,
                sigma_xy=cfg.energy_sigma_xy,
                scale_factor=cfg.energy_scale,
                filter_kind=cfg.energy_filter,
                rff_features=cfg.energy_rff_features,
                ignore_index=cfg.ignore_index,
                half=cfg.mixed_precision,
                convention=energy_convention,
                # exact-lattice path: structure precomputed per batch in its
                # own program (objectives/energy.build_energy_lattice) so the
                # step jit only sees gathers/segment_sums
                lattice=batch.get("energy_lattice"),
            )

            cl = camloss_fn(out["cam"], valid_seg_ps)
            if cfg.aux_seg2cam:
                cl_aux = camloss_fn(out["cam_aux"], valid_seg_ps)
                cl = (1 - cfg.aux_seg2cam_alpha) * cl + cfg.aux_seg2cam_alpha * cl_aux

            # warmup gating (main.py:240-243)
            gate = jnp.where(
                state.step <= cfg.warmup_iters, cfg.warmup_gate_floor, 1.0
            )
            total = (
                cls_loss
                + cls_aux_loss
                + gate * (cfg.seg_weight * sl + cfg.cam_weight * cl + cfg.reg_weight * reg)
            )
            metrics = dict(
                overall_loss=total,
                cls_loss=cls_loss,
                cls_aux_loss=cls_aux_loss,
                seg_loss=sl,
                cam_loss=cl,
                reg_loss=reg,
                cls_logits=out["cls"],
                cls_aux_logits=out["cls_aux"],
            )
            return total, metrics

        grads, metrics = jax.grad(loss_fn, has_aux=True)(state.student)
        updates, new_opt = tx.update(grads, state.opt_state, state.student)
        new_student = jax.tree.map(lambda p, u: p + u, state.student, updates)

        # EMA teacher (main.py:250-252), f32
        m = cfg.momentum
        new_teacher = jax.tree.map(
            lambda t, s: m * t + (1.0 - m) * s.astype(t.dtype),
            state.teacher,
            new_student,
        )
        # logged LR uses the pre-increment step index: the reference's
        # PolyWarmupAdamW sets lr from global_step BEFORE incrementing it
        # (torch_helper.py:275-293), and main.py reads param_groups[0]['lr']
        # after step() — so the printed LR is schedule(step), not step+1
        metrics["lr"] = _current_lr(cfg, state.step)
        metrics["thre_low"] = jnp.asarray(threlow, jnp.float32)
        metrics["thre_high"] = jnp.asarray(threhigh, jnp.float32)
        new_state = TrainState(
            step=state.step + 1,
            student=new_student,
            teacher=new_teacher,
            opt_state=new_opt,
            gmm=gmm,
        )
        return new_state, metrics

    return train_step


def _current_lr(cfg, step):
    from cosa_tpu.train.optimizer import poly_warmup_schedule

    return poly_warmup_schedule(
        cfg.lr, cfg.lr_warmup_iters, cfg.max_iters, 1e-6, 0.9, cfg.min_mult
    )(step)
