"""Training driver — the functional twin of reference main.py:24-399.

Differences by design:
  * no DDP wrapper / barriers: the step is one jit over the mesh;
  * metrics stay on device between log points (async dispatch — pulling a
    scalar every step would serialize the pipeline the way the reference's
    .item() calls do, main.py:259-268);
  * full-state checkpointing + resume (the reference has neither);
  * best-seg / best-cam model selection across student AND teacher follows
    main.py:348-374 exactly.
"""

from __future__ import annotations

import os
import time
from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from cosa_tpu.config import Config, diff_from_preset
from cosa_tpu.data.loader import build_train_loader, build_val_dataset
from cosa_tpu.eval.engine import evaluate
from cosa_tpu.eval.metrics import compute_mAP
from cosa_tpu.models import build_model, require_cosa_interface
from cosa_tpu.parallel import batch_sharding, make_mesh, state_sharding
from cosa_tpu.train import checkpoint as ckpt
from cosa_tpu.train.optimizer import build_optimizer
from cosa_tpu.train.state import create_train_state
from cosa_tpu.train.step import build_train_step
from cosa_tpu.utils.logging import (
    AverageMeter,
    MetricWriter,
    eta_string,
    format_iou_table,
    is_host0,
)
from cosa_tpu.data.datasets import class_list


def output_dir(cfg: Config) -> str:
    return cfg.output_dir or os.path.join(cfg.work_dir, cfg.name)


def train(cfg: Config, max_steps: Optional[int] = None) -> Dict:
    require_cosa_interface(cfg)
    out_dir = output_dir(cfg)
    writer = MetricWriter(out_dir)
    writer.print(f"config diff vs {cfg.dataset} preset:", diff_from_preset(cfg))

    if cfg.random_seed:
        import random as _random

        from jax.experimental import multihost_utils

        s = multihost_utils.broadcast_one_to_all(
            np.int32(_random.randint(1, 10000))
        )
        cfg = cfg.replace(seed=int(s), random_seed=False)
        writer.print(f"random_seed: drew seed {cfg.seed}")

    mesh = make_mesh(cfg.dp, cfg.tp)
    writer.print(
        f"mesh: data={mesh.shape['data']} model={mesh.shape['model']} "
        f"({jax.device_count()} devices, {jax.process_count()} processes)"
    )
    model = build_model(cfg)
    global_batch = cfg.batch_size * mesh.shape["data"]

    state = create_train_state(cfg, model, global_batch)
    if cfg.pretrained and cfg.pretrained_path:
        from cosa_tpu.models.convert import load_pretrained_into_state

        state = load_pretrained_into_state(cfg, state)
        writer.print(f"loaded pretrained weights from {cfg.pretrained_path}")

    if cfg.energy_filter == "rff" and cfg.energy_convention <= 0:
        # auto-calibrate the rff->lattice energy convention on real first-
        # epoch crops at the actual energy resolution (replaces the round-2
        # baked 0.62, which was only correct at 224^2)
        from cosa_tpu.data.loader import build_train_dataset
        from cosa_tpu.objectives.energy import resolve_energy_convention

        cal_ds = build_train_dataset(cfg)
        imgs = np.stack(
            [cal_ds[(0, i)]["wimg"] for i in range(min(4, len(cal_ds)))]
        )
        conv, info = resolve_energy_convention(cfg, imgs)
        cfg = cfg.replace(energy_convention=conv)
        writer.print(f"energy convention auto-calibrated: {conv:.4f} {info}")

    tx = build_optimizer(cfg, state.student)
    step_fn = jax.jit(build_train_step(cfg, model, tx), donate_argnums=0)
    state = jax.device_put(state, state_sharding(state, mesh))

    start_step = 0
    ckpt_dir = os.path.join(out_dir, "ckpt")
    if cfg.resume:
        abstract = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), state
        )
        state = ckpt.restore_state(cfg.resume, abstract)
        state = jax.device_put(state, state_sharding(state, mesh))
        start_step = int(state.step)
        writer.print(f"resumed from {cfg.resume} at step {start_step}")

    per_process = global_batch // jax.process_count()
    loader = build_train_loader(cfg, per_process, skip_batches=start_step)
    val_ds = build_val_dataset(cfg)
    bshard = batch_sharding(mesh)

    n_params = sum(x.size for x in jax.tree.leaves(state.student))
    writer.print(f"Number of trainable params for Network: {n_params//1_000_000}M")

    if cfg.profile_dir and is_host0():
        jax.profiler.start_trace(cfg.profile_dir)

    meter = AverageMeter()
    pending = []  # device-side metric dicts awaiting a log flush
    total = min(cfg.max_iters, max_steps or cfg.max_iters)
    t0 = time.time()

    # failure containment: the reference loses everything but best weights on
    # a mid-run crash (SURVEY.md §5.3); here any exception flushes a full
    # resumable checkpoint before propagating.
    # exact-lattice dense energy: the structure build (sort/unique/binary
    # search) compiles pathologically INSIDE the train program, so it runs
    # as its own per-batch jit whose outputs feed the step as plain arrays
    # (objectives/energy.py::build_energy_lattice)
    lat_fn = None
    if cfg.energy_filter == "lattice":
        from cosa_tpu.objectives.energy import build_energy_lattice

        from cosa_tpu.data.loader import simg_from_packed

        def lat_fn(batch, _f=jax.jit(partial(build_energy_lattice, cfg))):
            return _f(simg_from_packed(batch))

    try:
        _train_body(
            cfg, model, state, step_fn, loader, val_ds, bshard, writer,
            out_dir, ckpt_dir, meter, pending, start_step, total, t0,
            results_box := {}, mesh, lat_fn,
        )
    except BaseException:
        try:
            ckpt.save_state(
                os.path.join(out_dir, "ckpt_emergency"),
                results_box.get("state", state),
                int(results_box.get("iter", start_step)),
                1,
            )
            writer.print("emergency checkpoint saved to ckpt_emergency/")
        except Exception as e:  # never mask the original failure
            writer.print(f"emergency checkpoint failed: {e}")
        raise
    state = results_box["state"]
    best_seg = results_box["best_seg"]
    best_cam = results_box["best_cam"]
    results = results_box["results"]

    if cfg.profile_dir and is_host0():
        jax.profiler.stop_trace()

    loader.close()
    writer.print(
        f"Training done in {time.time()-t0:.0f}s. "
        f"Best val Seg mIoU: {best_seg:.2f} Best val CAM mIoU: {best_cam:.2f}"
    )
    results.update(best_seg=best_seg, best_cam=best_cam)
    return results


def _train_body(cfg, model, state, step_fn, loader, val_ds, bshard, writer,
                out_dir, ckpt_dir, meter, pending, start_step, total, t0,
                box, mesh=None, lat_fn=None):
    best_seg, best_cam = -1.0, -1.0
    results = {}
    global_batch = cfg.batch_size * (jax.device_count() // max(cfg.tp, 1))
    t_log = time.time()
    box.update(state=state, iter=start_step)

    multihost = jax.process_count() > 1
    from cosa_tpu.data.loader import pack_batch

    def put(local_batch):
        # pack to 2 arrays first: the host->device hop pays a fixed
        # per-transfer cost (pronounced over the relay), so 2 transfers
        # beat 4 (data/loader.py pack_batch)
        local_batch = pack_batch(local_batch)
        if multihost:
            # each process contributes its local shard of the global batch
            return jax.tree.map(
                lambda x: jax.make_array_from_process_local_data(bshard, x),
                local_batch,
            )
        return jax.device_put(local_batch, bshard)

    for n_iter in range(start_step, total):
        local_batch = next(loader)
        batch = put(local_batch)
        if lat_fn is not None:
            batch["energy_lattice"] = lat_fn(batch)
        state, metrics = step_fn(state, batch)
        pending.append(metrics)
        box.update(state=state, iter=n_iter + 1)

        if (n_iter + 1) % cfg.log_iters == 0:
            # ONE device->host transfer for the whole window: scalar metrics
            # stack into a (window, 6) array on device first. Per-scalar
            # fetches cost a full relay round trip each (~27 ms measured).
            keys = ("overall_loss", "cls_loss", "cls_aux_loss",
                    "seg_loss", "cam_loss", "reg_loss")
            last = pending[-1]
            stacked = jnp.stack(
                [jnp.stack([m[k] for k in keys]) for m in pending]
            )
            parts = [stacked.reshape(-1), last["lr"][None],
                     last["thre_low"][None], last["thre_high"][None]]
            if not multihost:  # per-batch cls logits are data-sharded
                parts += [
                    jax.nn.sigmoid(last["cls_logits"]).reshape(-1),
                    jax.nn.sigmoid(last["cls_aux_logits"]).reshape(-1),
                ]
            host = np.asarray(jnp.concatenate(parts))
            nwin = len(pending)
            vals = host[: nwin * 6].reshape(nwin, 6)
            for row in vals:
                meter.add(dict(zip(keys, row)))
            lr_now = float(host[nwin * 6])
            thre_low, thre_high = float(host[nwin * 6 + 1]), float(host[nwin * 6 + 2])
            cls_acc = cls_aux_acc = float("nan")
            if not multihost:
                ncls = cfg.num_classes - 1
                probs = host[nwin * 6 + 3 :].reshape(2, -1, ncls)
                labels = np.asarray(local_batch["cls_label"])
                cls_acc = float(np.mean(compute_mAP(labels, probs[0]) or [0.0]))
                cls_aux_acc = float(
                    np.mean(compute_mAP(labels, probs[1]) or [0.0])
                )
            pending = []
            itertime = (time.time() - t_log) / cfg.log_iters
            t_log = time.time()
            elapsed, eta = eta_string(t0, n_iter + 1 - start_step, total - start_step)
            rec = dict(
                iter=n_iter + 1,
                itertime=round(itertime, 3),
                imgs_per_sec=round(global_batch / itertime, 2),
                lr=lr_now,
                # pseudo-label gate thresholds this step: the fixed
                # low/high_thre pair, or the GMM EMA trajectory when usegmm —
                # logged so adaptive-threshold behavior is auditable
                thre_low=round(thre_low, 4),
                thre_high=round(thre_high, 4),
                cls_acc=round(cls_acc, 3),
                cls_aux_acc=round(cls_aux_acc, 3),
                **{
                    k: round(meter.pop(k), 4)
                    for k in (
                        "overall_loss", "cls_loss", "cls_aux_loss",
                        "seg_loss", "cam_loss", "reg_loss",
                    )
                },
            )
            writer.log({"kind": "train", **rec})
            writer.print(
                f"Iter: {rec['iter']}; Elapsed: {elapsed}; ETA: {eta}; "
                f"Itertime: {rec['itertime']:.2f}s ({rec['imgs_per_sec']} img/s); "
                f"LR: {rec['lr']:.3e};\n overall_loss: {rec['overall_loss']:.4f}, "
                f"cls_loss: {rec['cls_loss']:.4f}, cls_acc: {rec['cls_acc']:.3f}, "
                f"cls_aux_loss: {rec['cls_aux_loss']:.4f}, "
                f"cls_aux_acc: {rec['cls_aux_acc']:.3f}, "
                f"seg_loss: {rec['seg_loss']:.4f}, cam_loss: {rec['cam_loss']:.4f}, "
                f"reg_loss: {rec['reg_loss']:.4f}"
            )

        if (n_iter + 1) % cfg.eval_iters == 0:
            results, best_seg, best_cam = _run_validation(
                cfg, model, state, val_ds, writer, n_iter + 1, out_dir,
                best_seg, best_cam, mesh=mesh,
            )
            ckpt.save_state(ckpt_dir, state, n_iter + 1, cfg.checkpoint_keep)

    box.update(state=state, best_seg=best_seg, best_cam=best_cam,
               results=results)


def _run_validation(cfg, model, state, val_ds, writer, n_iter, out_dir,
                    best_seg, best_cam, mesh=None):
    cats = class_list(cfg.dataset, cfg.split_dir)[: cfg.num_classes]
    fast_n = cfg.fasteval_n if cfg.fasteval else None

    # reference layout for raw-CAM dumps: {output_dir}/{epoch}/camraw_dir
    # (evaluation_engine.py:70-72); ON and AN share the dir, the second
    # eval's files win — the reference's own overwrite quirk, kept verbatim
    rawcam_dir = (
        os.path.join(out_dir, str(n_iter), "camraw_dir")
        if cfg.turnon_rawcam else None
    )
    res_s = evaluate(cfg, model, state.student, val_ds,
                     threshold_filters=cfg.eval_threshold_filters,
                     max_images=fast_n, mesh=mesh,
                     save_rawcam_dir=rawcam_dir)
    res_t = evaluate(cfg, model, state.teacher, val_ds,
                     threshold_filters=cfg.eval_threshold_filters,
                     max_images=fast_n, mesh=mesh,
                     save_rawcam_dir=rawcam_dir)

    # the reference writes the 0-based loop index here (main.py:377-378:
    # `iters:{n_iter}` inside `if (n_iter+1) % eval_iters == 0`), i.e. one
    # less than the 1-based iteration of the console prints — kept verbatim
    # so log_val.txt diffs cleanly against the released logs
    val_log_lines = [f"iters:{n_iter - 1}"]
    for tag, res in (("ON", res_s), ("AN", res_t)):
        names = [k for k in res if k not in ("cls_aps",)]
        tab = format_iou_table([res[k] for k in names], names, cats)
        writer.print(
            f"{tag} model @ iter {n_iter}: cls mAP {res['cls_aps'][0]:.3f}, "
            f"aux {res['cls_aps'][1]:.3f}\n{tab}"
        )
        writer.log({
            "kind": "val", "model": tag, "iter": n_iter,
            **{k: res[k]["miou"] for k in names},
        })
        val_log_lines.append(
            f"{tag} model: cls:{res['cls_aps'][0]:.4f}, "
            f"clsaux: {res['cls_aps'][1]:.4f}\n{tab}"
        )
    if is_host0():
        # per-validation table log (reference main.py:377-383)
        with open(os.path.join(out_dir, "log_val.txt"), "a") as f:
            f.write("\n".join(val_log_lines) + "\n")

    # best-model bookkeeping (reference main.py:348-374): round to 2 decimals,
    # student wins ties
    seg_s = round(res_s["Seg_vd"]["miou"] * 100, 2)
    seg_t = round(res_t["Seg_vd"]["miou"] * 100, 2)
    cam_s = round(res_s["CAM"]["miou"] * 100, 2)
    cam_t = round(res_t["CAM"]["miou"] * 100, 2)

    # NOTE: every process takes the same branch here (the metrics are
    # allgather-reduced, so seg_s/seg_t/... are identical across ranks) and
    # every process must enter save_best — orbax saves are collective
    # (tests/test_multiprocess.py guards this).
    cmp_seg = [seg_s, seg_t, best_seg]
    win = int(np.argmax(cmp_seg))
    best_seg = max(cmp_seg)
    if win != 2:
        ckpt.save_best(
            out_dir, state.student if win == 0 else state.teacher, "seg",
            dict(s_or_t="s" if win == 0 else "t", iter=n_iter, result=best_seg),
        )
    cmp_cam = [cam_s, cam_t, best_cam]
    win = int(np.argmax(cmp_cam))
    best_cam = max(cmp_cam)
    if win != 2:
        ckpt.save_best(
            out_dir, state.student if win == 0 else state.teacher, "cam",
            dict(s_or_t="s" if win == 0 else "t", iter=n_iter, result=best_cam),
        )
    return {"student": res_s, "teacher": res_t}, best_seg, best_cam


def finaleval(cfg: Config) -> Dict:
    """Reference finaleval (main.py:401-433): reload best_seg weights, full
    val split, CRF on."""
    out_dir = output_dir(cfg)
    writer = MetricWriter(out_dir)
    model = build_model(cfg)
    state = create_train_state(cfg, model, cfg.batch_size)
    if cfg.pretrained_path:
        # evaluate a released torch checkpoint (best_seg.pth-style) directly
        from cosa_tpu.models.convert import (
            load_torch_checkpoint,
            network_params_from_torch,
        )
        from cosa_tpu.models.vit import BACKBONES

        sd = load_torch_checkpoint(cfg.pretrained_path)
        params = network_params_from_torch(sd, BACKBONES[cfg.backbone].depth)
        # keep any params the torch dict lacks (e.g. Maskformer extras)
        from cosa_tpu.models.convert import _merge

        params = _merge(state.student, params)
        writer.print(f"evaluating torch checkpoint {cfg.pretrained_path}")
    else:
        abstract = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), state.student
        )
        params = ckpt.load_best(out_dir, "seg", abstract)
    from cosa_tpu.data.loader import build_test_dataset

    test_ds = build_test_dataset(cfg)
    if cfg.eval_split == "test":
        # GT-less eval-server split: dump submission PNGs instead of scoring
        from cosa_tpu.eval.submit import dump_submission

        dst = dump_submission(cfg, model, params, test_ds, out_dir)
        writer.print(f"wrote {len(os.listdir(dst))} submission PNGs to {dst}")
        return {"submission_dir": dst}
    mesh = make_mesh(cfg.dp, cfg.tp)
    if mesh.shape["data"] > 1:  # SPMD final eval on multi-chip hosts
        from jax.sharding import NamedSharding, PartitionSpec

        params = jax.device_put(params, NamedSharding(mesh, PartitionSpec()))
    if cfg.crf_backend == "device" and cfg.crf_reduce > 1:
        writer.print(
            f"note: Seg_crf uses the on-device mean-field at 1/{cfg.crf_reduce} "
            "resolution (exact Gaussian transform); for reference-parity "
            "comparisons use --crf_backend native (full-res host lattice)"
        )
    rawcam_dir = (
        os.path.join(out_dir, "best1", "camraw_dir")  # reference main.py:422
        if cfg.turnon_rawcam else None
    )
    res = evaluate(cfg, model, params, test_ds, getcrf=True, mesh=mesh,
                   save_rawcam_dir=rawcam_dir)
    cats = class_list(cfg.dataset, cfg.split_dir)[: cfg.num_classes]
    names = [k for k in res if k != "cls_aps"]
    writer.print("Final Model Result:\n" + format_iou_table(
        [res[k] for k in names], names, cats))
    writer.log({"kind": "final", **{k: res[k]["miou"] for k in names}})
    return res
