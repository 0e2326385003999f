"""Distributed evaluation engine.

Twin of reference evaluation_engine.py:11-297 — per-image 5-scale + flip TTA,
CAM->label, raw/class-validated seg argmax, optional per-threshold pseudo-mask
scoring, classification mAP — redesigned around XLA's static-shape model:

  * the model always sees the crop-size square (the reference resizes every
    val image to crop_size^2 first, evaluation_engine.py:81), so the TTA
    forward is ONE compiled program for the whole eval;
  * variable ground-truth sizes are handled with zero-padded per-image
    interpolation matrices: logits -> GT-size upsampling becomes two matmuls
    against host-built (pad, S) matrices, and the confusion matrix is
    accumulated on device over the padded canvas (pad rows carry ignore
    labels). No shape ever recompiles.
  * per-rank results merge with one tiny collective over the (C, C) hists —
    the reference ships uint8 prediction maps through .pth files on shared
    disk and merges on rank 0 (evaluation_engine.py:217-231).

Returns the same metric families: CAM / aux_CAM / Seg_ps / Seg_vd (+ optional
threshold-filtered pseudo scores, + Seg_crf at final eval).
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cosa_tpu.eval.metrics import (
    compute_mAP,
    jax_hist,
    pseudo_scores,
    scores_from_hist,
)
from cosa_tpu.objectives.pseudo import (
    cam2mask,
    cam_to_label,
    multi_scale_camseg,
    seg_validation,
)
from cosa_tpu.ops.image import normalize


def _dev_interp_in(sizes: jnp.ndarray, out_size: int, pad: int) -> jnp.ndarray:
    """Per-image (image -> crop) interpolation matrices built ON DEVICE from
    the (B,) true sizes: returns (B, out_size, pad), zero beyond each image's
    extent. Same torch align_corners=False sampling as ops/resize.py's
    host-built matrices; ``src`` is computed as an exactly-representable
    integer product divided once, so it is correctly rounded f32.

    Shipping host-built matrices dominated eval wall-clock over the device
    link (~29 MB/batch, 676 of 735 ms per 8-image batch measured on the
    relay); from (h, w) scalars the build is a few broadcast compares.
    """
    o = jnp.arange(out_size, dtype=jnp.float32)[None]  # (1, S)
    insz = sizes.astype(jnp.float32)[:, None]  # (B, 1)
    src = ((2.0 * o + 1.0) * insz) / (2.0 * out_size) - 0.5
    src = jnp.maximum(src, 0.0)
    i0 = jnp.floor(src)
    lam = src - i0
    i0 = jnp.clip(i0, 0.0, insz - 1.0)
    i1 = jnp.minimum(i0 + 1.0, insz - 1.0)
    col = jnp.arange(pad, dtype=jnp.float32)[None, None]  # (1, 1, P)
    m = jnp.where(col == i0[..., None], (1.0 - lam)[..., None], 0.0)
    m = m + jnp.where(col == i1[..., None], lam[..., None], 0.0)
    return m


def _dev_interp_out(sizes: jnp.ndarray, in_size: int, pad: int) -> jnp.ndarray:
    """Per-image (crop -> GT size) matrices on device: (B, pad, in_size),
    rows at or beyond each image's size are zero."""
    insz = sizes.astype(jnp.float32)[:, None]  # (B, 1)
    o = jnp.arange(pad, dtype=jnp.float32)[None]  # (1, P)
    src = ((2.0 * o + 1.0) * in_size) / 2.0 / jnp.maximum(insz, 1.0) - 0.5
    src = jnp.maximum(src, 0.0)
    i0 = jnp.floor(src)
    lam = src - i0
    i0 = jnp.clip(i0, 0.0, in_size - 1.0)
    i1 = jnp.minimum(i0 + 1.0, in_size - 1.0)
    col = jnp.arange(in_size, dtype=jnp.float32)[None, None]  # (1, 1, S)
    m = jnp.where(col == i0[..., None], (1.0 - lam)[..., None], 0.0)
    m = m + jnp.where(col == i1[..., None], lam[..., None], 0.0)
    row_ok = o[..., None] < insz[..., None]
    return m * row_ok


def _build_eval_step(cfg, model, pad: int, thresholds: Tuple[float, ...],
                     return_maps: bool = False, return_probs: bool = False,
                     getcrf: bool = False, out_sharding=None):
    """``out_sharding``: replicate outputs across a mesh — required by the
    multi-process SPMD path, where inferred shardings would leave outputs
    non-addressable on some hosts."""
    n = cfg.num_classes
    s = cfg.crop_size

    def _jit(f):
        if out_sharding is not None:
            return jax.jit(f, out_shardings=out_sharding)
        return jax.jit(f)

    @_jit
    def eval_step(params, img_pad, gt_pad, cls_label, hw):
        """Batched over B val images (the reference is locked to batch 1 per
        rank, evaluation_engine.py:75). img_pad: (B, P, P, 3) u8; gt_pad:
        (B, P, P) u8 (255 outside + on pad rows); hw: (B, 2) i32 true sizes.
        The per-image image->crop / logits->GT interpolation matrices and
        the inside-image boxes are all derived from ``hw`` on device."""
        # the packed result ships device->host as ONE f32 vector; a
        # confusion-matrix cell is exact in f32 only below 2^24, so guard
        # the worst case (all B*P*P pixels in one cell) at trace time
        assert img_pad.shape[0] * pad * pad < 2 ** 24, (
            f"eval_batch {img_pad.shape[0]} x pad {pad}^2 overflows exact "
            "f32 hist transfer; lower cfg.eval_batch"
        )
        m_in_h = _dev_interp_in(hw[:, 0], s, pad)
        m_in_w = _dev_interp_in(hw[:, 1], s, pad)
        m_out_h = _dev_interp_out(hw[:, 0], s, pad)
        m_out_w = _dev_interp_out(hw[:, 1], s, pad)
        box = jnp.stack(
            [jnp.zeros_like(hw[:, 0]), hw[:, 0] - 1,
             jnp.zeros_like(hw[:, 1]), hw[:, 1] - 1], axis=1
        )
        gt_pad = gt_pad.astype(jnp.int32)
        img = normalize(img_pad)
        img_s = jnp.einsum("bsh,bhwc->bswc", m_in_h, img)
        img_s = jnp.einsum("btw,bswc->bstc", m_in_w, img_s)

        fwd = lambda x: model.apply({"params": params}, x)
        cam, cam_aux, seg, cls_f, cls_a = multi_scale_camseg(
            fwd, img_s, cfg.eval_scales, getcls=True
        )

        def up(x):
            y = jnp.einsum("bph,bhwc->bpwc", m_out_h, x)
            return jnp.einsum("bqw,bpwc->bpqc", m_out_w, y)

        r_cam, r_cam_aux, r_seg = up(cam), up(cam_aux), up(seg)

        cam_label = cam_to_label(r_cam, cls_label, bkg_thre=cfg.bkg_thre)
        cam_aux_label = cam_to_label(r_cam_aux, cls_label, bkg_thre=cfg.bkg_thre)
        seg_raw = jnp.argmax(r_seg, axis=-1)
        seg_vd = jnp.argmax(seg_validation(r_seg, cls_label), axis=-1)

        hists = jnp.stack(
            [
                jax_hist(gt_pad, cam_label, n),
                jax_hist(gt_pad, cam_aux_label, n),
                jax_hist(gt_pad, seg_raw, n),
                jax_hist(gt_pad, seg_vd, n),
            ]
        )

        thr_hists = []
        if thresholds:
            from cosa_tpu.objectives.pseudo import cam_validation

            valid_cam = cam_validation(r_cam, cls_label)
            valid_cam_aux = cam_validation(r_cam_aux, cls_label)
            for thre in thresholds:
                for vc in (valid_cam, valid_cam_aux):
                    lab = cam2mask(
                        img_box=box,
                        cams=vc,
                        cls_labels=cls_label,
                        threshold_high=1.0 - thre,
                        threshold_low=thre,
                        downscale=cfg.par_downscale,
                        ignore_index=cfg.ignore_index,
                    )
                    # pseudo-score convention (utils/evaluation.py:41-44)
                    gt_m = jnp.where(lab == 255, 255, gt_pad)
                    lab_m = jnp.where(lab == 255, 0, lab)
                    thr_hists.append(jax_hist(gt_m, lab_m, n))
        thr = jnp.stack(thr_hists) if thr_hists else jnp.zeros((0, n, n), jnp.int32)

        crf_h = jnp.zeros((0, n, n), jnp.int32)
        if getcrf:
            # DenseCRF refinement fully on device, batched — the reference
            # fetches softmax probs to host and runs pydensecrf per image
            # (evaluation_engine.py:205-211); over the device link that fetch
            # alone is ~84 MB/batch. See eval/crf.py for backend options.
            from cosa_tpu.eval.crf import crf_labels_device
            from cosa_tpu.objectives.pseudo import box_mask

            vd_probs = jax.nn.softmax(seg_validation(r_seg, cls_label), axis=-1)
            valid = box_mask(
                jnp.stack([jnp.zeros_like(hw[:, 0]), hw[:, 0],
                           jnp.zeros_like(hw[:, 1]), hw[:, 1]], axis=1),
                pad, pad,
            ).astype(jnp.float32)
            crf_label = crf_labels_device(
                cfg, img_pad.astype(jnp.float32), vd_probs, valid
            )
            crf_h = jax_hist(gt_pad, crf_label, n)[None]

        probs = jax.nn.sigmoid(cls_f)
        probs_aux = jax.nn.sigmoid(cls_a)
        # everything scalar-ish packs into ONE f32 vector so the host needs a
        # single device->host transfer per image (each fetch pays a full
        # relay round trip)
        packed = jnp.concatenate(
            [
                hists.astype(jnp.float32).reshape(-1),
                thr.astype(jnp.float32).reshape(-1),
                crf_h.astype(jnp.float32).reshape(-1),
                probs.reshape(-1),
                probs_aux.reshape(-1),
            ]
        )
        extras = []
        if return_probs:
            # valid seg probs for the host CRF backends (softmax at GT size)
            # — large, only materialized when actually needed
            extras.append(
                jax.nn.softmax(seg_validation(r_seg, cls_label), axis=-1)
            )
        if return_maps:
            extras.extend([seg_vd, r_cam])
        if getcrf and return_maps:
            extras.append(crf_label)  # per-image CRF maps (submission dumps)
        return (packed, *extras)

    return eval_step


def _unpack(packed: np.ndarray, n: int, n_thr: int, ncls: int, b: int,
            has_crf: bool = False):
    h4 = packed[: 4 * n * n].reshape(4, n, n).astype(np.int64)
    off = 4 * n * n
    thr = packed[off : off + n_thr * n * n].reshape(n_thr, n, n).astype(np.int64)
    off += n_thr * n * n
    crf = np.zeros((n, n), np.int64)
    if has_crf:
        crf = packed[off : off + n * n].reshape(n, n).astype(np.int64)
        off += n * n
    probs = packed[off : off + b * ncls].reshape(b, ncls)
    off += b * ncls
    probs_aux = packed[off : off + b * ncls].reshape(b, ncls)
    return h4, thr, crf, probs, probs_aux


def evaluate(
    cfg,
    model,
    params,
    val_ds,
    writer=None,
    getcrf: bool = False,
    threshold_filters: Optional[Sequence[float]] = None,
    max_images: Optional[int] = None,
    save_dir: Optional[str] = None,
    save_rawcam_dir: Optional[str] = None,
    mesh=None,
) -> Dict:
    """Returns {'CAM': score, 'aux_CAM': ..., 'Seg_ps': ..., 'Seg_vd': ...,
    'cls_aps': (mAP, mAP_aux), [thresholded pseudo scores], ['Seg_crf']}."""
    from cosa_tpu.models.network import require_cosa_interface

    require_cosa_interface(cfg)
    thresholds = tuple(threshold_filters or ())
    # pad to cover the largest val image (VOC <= 500, COCO <= 640)
    sizes = [500 if cfg.dataset == "VOC12" else 640]
    n = cfg.num_classes

    # local shard of the dataset per process
    idxs = list(range(len(val_ds)))
    if max_images and max_images < len(idxs):
        # DEVIATION from the reference (documented): the reference always
        # evaluates the full split (evaluation_engine.py:75; its `fasteval`
        # flag is parsed at args.py:104 but never consumed). When a subset is
        # requested here it is a FIXED seeded random sample — an alphabetical
        # prefix of val.txt would be class-biased and skew best-ckpt picks.
        sub = np.random.default_rng(20240817).permutation(len(idxs))[:max_images]
        idxs = sorted(int(i) for i in sub)
    pidx, pcnt = jax.process_index(), jax.process_count()
    local = idxs[pidx::pcnt]

    pad = sizes[0]
    want_maps = bool(save_dir) or bool(save_rawcam_dir)
    # default: CRF runs on device INSIDE the eval step (batched); the host
    # backends ("native" C++ lattice / "jax" single-image) remain for
    # full-resolution-lattice parity runs and fetch the prob maps instead
    crf_on_device = getcrf and getattr(cfg, "crf_backend", "device") == "device"
    host_crf = getcrf and not crf_on_device
    # host-CRF prob maps are large per-image artifacts: keep that path at
    # batch 1; the map-dump path (save_dir/rawcam) is batched like scoring
    bsz = 1 if host_crf else int(getattr(cfg, "eval_batch", 8))

    # shard the image batch over the mesh's data axis: a plain jit would pin
    # eval to ONE device of a multi-chip host (the train step is SPMD but
    # the reference-style eval loop is not automatically so).
    #   * single process: device_put each batch with a data-axis sharding;
    #   * multi-process: one GLOBAL SPMD batch per step — every process
    #     contributes its local rows via make_array_from_process_local_data
    #     and every chip of every host computes (the reference leaves eval
    #     at bs=1/rank, evaluation_engine.py:75; round 2 of this port left
    #     each process's eval on a single local chip).
    in_shard = None
    mh_spmd = False
    out_sharding = None
    bsz_local = bsz
    if mesh is not None and not host_crf and not want_maps:
        from jax.sharding import NamedSharding, PartitionSpec

        ndata = int(mesh.shape.get("data", 1))
        if pcnt == 1 and ndata > 1:
            bsz = max(bsz, ndata)
            bsz = -(-bsz // ndata) * ndata
            bsz_local = bsz
            in_shard = lambda nd: NamedSharding(
                mesh, PartitionSpec(*(["data"] + [None] * (nd - 1)))
            )
        elif pcnt > 1 and ndata > 1:
            mh_spmd = True
            rows_per_proc = max(ndata // pcnt, 1)
            bsz_local = -(-max(bsz // pcnt, 1) // rows_per_proc) * rows_per_proc
            bsz = bsz_local * pcnt  # global SPMD batch
            in_shard = lambda nd: NamedSharding(
                mesh, PartitionSpec(*(["data"] + [None] * (nd - 1)))
            )
            out_sharding = NamedSharding(mesh, PartitionSpec())
    eval_step = _build_eval_step(
        cfg, model, pad, thresholds, want_maps, host_crf, crf_on_device,
        out_sharding=out_sharding,
    )
    _step_cache: Dict = {}  # compiled programs for oversized pad buckets

    hist_sum = np.zeros((4, n, n), np.int64)
    thr_sum = np.zeros((2 * len(thresholds), n, n), np.int64)
    aps: List[float] = []
    aps_aux: List[float] = []
    crf_hist = np.zeros((n, n), np.int64)

    if host_crf:
        from cosa_tpu.eval.crf import crf_refine_host

    # batch assembly (PIL decode + canvas packing, ~10 ms/image on one
    # core) runs in a prefetch thread so it overlaps device execution —
    # the reference loads each image synchronously between forwards
    # (evaluation_engine.py:75, DataLoader bs=1)
    import queue as _queue
    import threading as _threading

    prefetch: _queue.Queue = _queue.Queue(maxsize=2)
    cancel = _threading.Event()  # consumer died: unblock + stop the producer

    def _put(item) -> bool:
        while not cancel.is_set():
            try:
                prefetch.put(item, timeout=0.5)
                return True
            except _queue.Full:
                continue
        return False

    # every process must run the SAME number of steps in mh_spmd mode (the
    # per-step computation is a collective): derive it from the GLOBAL image
    # count, padding short processes with repeats (gt=255 nullifies them)
    if mh_spmd:
        nlocal_max = -(-len(idxs) // pcnt)
        n_steps = -(-nlocal_max // bsz_local)
    else:
        n_steps = -(-len(local) // bsz_local) if local else 0

    def _assemble():
        try:
            for step_i in range(n_steps):
                if cancel.is_set():
                    return
                c0 = step_i * bsz_local
                chunk = local[c0 : c0 + bsz_local]
                nvalid = len(chunk)
                if not chunk:  # short process in mh_spmd: all-padding step
                    chunk = [local[-1] if local else idxs[0]]
                samples = [val_ds[i] for i in chunk]
                while len(samples) < bsz_local:  # pad tail
                    samples.append(samples[-1])

                pad_i = pad
                if any(max(s["image"].shape[:2]) > pad for s in samples):
                    if mh_spmd:
                        # bucket choice must agree across processes; the
                        # standard splits never exceed the fixed pad
                        raise ValueError(
                            "multi-process SPMD eval requires images <= "
                            f"{pad}px; got "
                            f"{max(max(s['image'].shape[:2]) for s in samples)}"
                        )
                    # bucket oversized pads to the next multiple of 128 (a
                    # compiled program is cached per bucket — otherwise many
                    # heterogeneous large images recompile every batch)
                    biggest = max(max(s["image"].shape[:2]) for s in samples)
                    pad_i = -(-biggest // 128) * 128

                # only raw bytes cross the host->device link: u8 images,
                # u8 GT and the true sizes; the per-image interpolation
                # matrices are built on device (shipping them dominated
                # eval wall-clock: 29 MB/batch)
                img_pad = np.zeros((bsz_local, pad_i, pad_i, 3), np.uint8)
                gt_pad = np.full((bsz_local, pad_i, pad_i), 255, np.uint8)
                cls_labels = np.zeros((bsz_local, n - 1), np.float32)
                hw = np.zeros((bsz_local, 2), np.int32)
                for bi, smp in enumerate(samples):
                    img, gt = smp["image"], smp["label"]
                    h, w = img.shape[:2]
                    img_pad[bi, :h, :w] = img
                    if bi < nvalid:  # padded duplicates contribute nothing
                        gt_pad[bi, :h, :w] = gt
                    cls_labels[bi] = smp["cls_label"]
                    hw[bi] = [h, w]
                if not _put(
                    (samples, nvalid, pad_i, img_pad, gt_pad, cls_labels, hw)
                ):
                    return
        except BaseException as e:  # surface to the consumer
            _put(e)
            return
        _put(None)

    _threading.Thread(target=_assemble, daemon=True).start()

    try:
      while True:
        item = prefetch.get()
        if item is None:
            break
        if isinstance(item, BaseException):
            raise RuntimeError("eval batch assembly failed") from item
        samples, nvalid, pad_i, img_pad, gt_pad, cls_labels, hw = item
        if pad_i != pad:
            key = (pad_i, thresholds, want_maps, host_crf, crf_on_device)
            if key not in _step_cache:
                _step_cache[key] = _build_eval_step(
                    cfg, model, pad_i, thresholds, want_maps, host_crf,
                    crf_on_device,
                )
            eval_step_i = _step_cache[key]
        else:
            eval_step_i = eval_step

        dev_in = [img_pad, gt_pad, cls_labels, hw]
        if mh_spmd:
            # local rows -> one global SPMD batch (shape (bsz, ...) global)
            dev_in = [
                jax.make_array_from_process_local_data(in_shard(a.ndim), a)
                for a in dev_in
            ]
        elif in_shard is not None:
            dev_in = [
                jax.device_put(a, in_shard(a.ndim)) for a in dev_in
            ]
        else:
            dev_in = [jnp.asarray(a) for a in dev_in]
        outs = eval_step_i(params, *dev_in)
        hists, thr, crf_h, probs, probs_aux = _unpack(
            np.asarray(outs[0]), n, 2 * len(thresholds), n - 1, bsz,
            has_crf=crf_on_device,
        )
        crf_hist += crf_h
        extra_i = 1
        vd_probs = None
        if host_crf:
            vd_probs = np.asarray(outs[extra_i])
            extra_i += 1
        if want_maps:
            # maps come back for the WHOLE batch (round 2 forced bsz=1 here;
            # batching them keeps artifact dumps on the fast path)
            seg_maps = np.asarray(outs[extra_i])
            cam_maps = np.asarray(outs[extra_i + 1])
            for bi in range(nvalid):
                smp = samples[bi]
                h, w = smp["image"].shape[:2]
                seg_map_full = seg_maps[bi, :h, :w]
                cam_map = cam_maps[bi, :h, :w]
                if save_rawcam_dir:
                    # reference save_cam_npv2 (evaluation_engine.py:299-309):
                    # per image, a dict {class_idx: cam_map} over present
                    # classes
                    import os as _os

                    _os.makedirs(save_rawcam_dir, exist_ok=True)
                    cam_dict = {
                        int(c): cam_map[..., c]
                        for c in range(cfg.num_classes - 1)
                        if smp["cls_label"][c] > 0
                    }
                    if cam_dict:
                        np.save(
                            _os.path.join(save_rawcam_dir, smp["name"] + ".npy"),
                            cam_dict,  # type: ignore[arg-type]
                        )
                if save_dir:
                    from cosa_tpu.data.datasets import class_list
                    from cosa_tpu.utils.visualize import dump_eval_visuals

                    dump_eval_visuals(
                        save_dir, smp["name"], smp["image"],
                        seg_map_full, cam_map, smp["label"],
                        smp["cls_label"],
                        class_list(cfg.dataset, cfg.split_dir),
                        cfg.num_classes,
                    )
        # padded duplicate rows are nullified in every hist via gt=255
        hist_sum += hists
        if thresholds:
            thr_sum += thr
        row0 = pidx * bsz_local if mh_spmd else 0  # this process's rows in
        # the (replicated) global-batch probs; data-axis rows follow device
        # order, which is process-major for a jax.devices() mesh
        for bi in range(nvalid):
            cl = samples[bi]["cls_label"]
            if cl.sum() > 0:
                aps += compute_mAP(cl[None], probs[row0 + bi : row0 + bi + 1])
                aps_aux += compute_mAP(
                    cl[None], probs_aux[row0 + bi : row0 + bi + 1]
                )
        if host_crf:
            img, gt = samples[0]["image"], samples[0]["label"]
            h, w = img.shape[:2]
            pred_crf = crf_refine_host(cfg, img, vd_probs[0, :h, :w])
            gt_m = gt.astype(np.int64)
            from cosa_tpu.eval.metrics import fast_hist

            crf_hist += fast_hist(gt_m.flatten(), pred_crf.flatten(), n)

    finally:
        # unblock the producer if we exit abnormally (it checks `cancel`
        # between bounded puts); on normal exit it has already finished
        cancel.set()

    # cross-process reduction of the tiny hists (the SPMD path's hists are
    # computed over the GLOBAL batch inside the step — already reduced)
    if pcnt > 1 and not mh_spmd:
        from jax.experimental import multihost_utils

        hist_sum = np.asarray(
            multihost_utils.process_allgather(jnp.asarray(hist_sum))
        ).sum(axis=0)
        thr_sum = np.asarray(
            multihost_utils.process_allgather(jnp.asarray(thr_sum))
        ).sum(axis=0)
        crf_hist = np.asarray(
            multihost_utils.process_allgather(jnp.asarray(crf_hist))
        ).sum(axis=0)

    out = {
        "CAM": scores_from_hist(hist_sum[0]),
        "aux_CAM": scores_from_hist(hist_sum[1]),
        "Seg_ps": scores_from_hist(hist_sum[2]),
        "Seg_vd": scores_from_hist(hist_sum[3]),
        "cls_aps": (float(np.mean(aps)) if aps else 0.0,
                    float(np.mean(aps_aux)) if aps_aux else 0.0),
    }
    for ti, thre in enumerate(thresholds):
        out[f"cam_{thre}"] = scores_from_hist(thr_sum[2 * ti])
        out[f"camaux_{thre}"] = scores_from_hist(thr_sum[2 * ti + 1])
    if getcrf:
        out["Seg_crf"] = scores_from_hist(crf_hist)
    return out
