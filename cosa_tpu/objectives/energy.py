"""Dense-energy (CRF) regularizer, fully on device.

Twin of the reference's ``DenseEnergyLoss`` + ``DenseEnergyLossFunction``
(utils/seg_helper.py:191-230, 864-903) which copies images and seg probs to
host numpy every step, calls the C++ ``bilateralfilter_batch`` and defines
the ad-hoc gradient ``dL/dseg = -2 * AS * ROI / N``. Here the filter is the
on-device Gaussian transform (ops/bilateral.py) and the same gradient
convention is reproduced with ``jax.custom_vjp`` — the whole regularizer
stays inside the compiled train step.

Pipeline (get_energy_loss, utils/seg_helper.py:210-230 + module:199-208):
  * seg logits -> softmax probs (full res)
  * images un-normalized to 0-255; crop ROI mask from img_box
  * everything downscaled by ``scale_factor`` (images/ROIs nearest — torch
    F.interpolate default mode — seg bilinear, labels nearest)
  * Gate = 1 on unlabeled (255) pixels else clip(ROI - max_prob, 0)
  * loss = -(1/B) sum seg_roi * (G @ seg_roi) * Gate, with sigma_xy scaled
    by scale_factor (seg_helper.py:208)
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from cosa_tpu.objectives.pseudo import box_mask
from cosa_tpu.ops.bilateral import (
    exact_gaussian_filter,
    pixel_features,
    rff_gaussian_filter,
)
from cosa_tpu.ops.image import denormalize_u8
from cosa_tpu.ops.resize import resize_bilinear, resize_nearest

@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _dense_energy(seg_roi, feats, gate, filter_kind, rff_features, rff_seed,
                  half, convention=1.0):
    as_gated = _filter(seg_roi, feats, filter_kind, rff_features, rff_seed,
                       half, convention) * gate
    n = seg_roi.shape[0]
    return -jnp.vdot(seg_roi, as_gated) / n


def _filter(seg_roi, feats, filter_kind, rff_features, rff_seed, half=False,
            convention=1.0):
    b, h, w, k = seg_roi.shape
    v = seg_roi.reshape(b, h * w, k)
    f = feats.reshape(b, h * w, -1)
    if filter_kind == "exact":
        out = exact_gaussian_filter(f, v)
    elif filter_kind == "rff":
        # fast approximation of the exact Gaussian transform, rescaled by
        # ``convention`` into the reference lattice's energy scale so the
        # 1e-7 loss weight keeps the reference's meaning. The lattice/exact
        # energy ratio is feature-spread-dependent (~0.52 at toy 16^2-24^2
        # shapes; 0.60/0.66/0.66 measured at 224^2/160^2/112^2
        # natural-statistics images vs the native C++ oracles, with
        # cos(lattice, exact) >= 0.998 and cos(rff_D=1024, lattice) = 0.986
        # at 224^2), so there is no universal constant: training runs
        # auto-calibrate it on the first real batch at the actual energy
        # resolution (resolve_energy_convention below).
        out = convention * rff_gaussian_filter(
            f, v, n_features=rff_features, seed=rff_seed,
            dtype=jnp.bfloat16 if half else jnp.float32,
        )
    elif filter_kind == "lattice":
        # exact reference parity: our JAX permutohedral reproduces the
        # reference C++ output to 0 rel. error (tests/test_permutohedral.py)
        from cosa_tpu.ops.permutohedral import permutohedral_filter

        out = jax.vmap(permutohedral_filter)(f, v)
    else:
        raise ValueError(filter_kind)
    return out.reshape(b, h, w, k)


def _dense_energy_fwd(seg_roi, feats, gate, filter_kind, rff_features, rff_seed,
                      half, convention=1.0):
    as_gated = _filter(seg_roi, feats, filter_kind, rff_features, rff_seed,
                       half, convention) * gate
    n = seg_roi.shape[0]
    loss = -jnp.vdot(seg_roi, as_gated) / n
    return loss, (as_gated, n)


def _dense_energy_bwd(filter_kind, rff_features, rff_seed, half, convention,
                      res, g):
    # reference gradient convention (seg_helper.py:898-903): -2 g AS_gated / N.
    # (The ROI factor is implicit: seg_roi = probs * ROI upstream, so the ROI
    # product is applied by the chain rule through that multiply.)
    as_gated, n = res
    return (-2.0 * g * as_gated / n, None, None)


_dense_energy.defvjp(_dense_energy_fwd, _dense_energy_bwd)


# ---- exact-lattice path with a PRECOMPUTED structure --------------------
# The lattice structure (sort/unique/neighbor tables) depends only on the
# stop-gradient image features, so it is built in its OWN compiled program
# (build_energy_lattice below, called by the train loop once per batch) and
# fed to the step as plain arrays; inside the step the filter is then pure
# segment_sum + gathers (ops/permutohedral.apply_lattice), which embeds in
# the train jit without the round-1/2 compile blowup. Same custom gradient
# convention (-2*AS/N) as the reference (seg_helper.py:898-903).


def _apply_lat_batch(seg_roi, uid, bary, nbr_idx, nbr_ok):
    from cosa_tpu.ops.permutohedral import Lattice, apply_lattice

    b, h, w, k = seg_roi.shape
    v = seg_roi.reshape(b, h * w, k)
    out = jax.vmap(
        lambda u, ba, ni, no, vv: apply_lattice(Lattice(u, ba, ni, no), vv)
    )(uid, bary, nbr_idx, nbr_ok, v)
    return out.reshape(b, h, w, k)


@jax.custom_vjp
def _dense_energy_lat(seg_roi, uid, bary, nbr_idx, nbr_ok, gate):
    as_gated = _apply_lat_batch(seg_roi, uid, bary, nbr_idx, nbr_ok) * gate
    return -jnp.vdot(seg_roi, as_gated) / seg_roi.shape[0]


def _dense_energy_lat_fwd(seg_roi, uid, bary, nbr_idx, nbr_ok, gate):
    as_gated = _apply_lat_batch(seg_roi, uid, bary, nbr_idx, nbr_ok) * gate
    n = seg_roi.shape[0]
    return -jnp.vdot(seg_roi, as_gated) / n, (as_gated, n)


def _dense_energy_lat_bwd(res, g):
    as_gated, n = res
    return (-2.0 * g * as_gated / n, None, None, None, None, None)


_dense_energy_lat.defvjp(_dense_energy_lat_fwd, _dense_energy_lat_bwd)


def build_energy_lattice(cfg, simg_u8):
    """Per-batch lattice structure for the train step's exact dense-energy
    filter. Reproduces get_energy_loss's feature path exactly (normalize ->
    denormalize_u8 -> nearest downscale -> pixel_features with sigma_xy
    scaled by energy_scale); jit this standalone and pass the result into
    the step via the batch dict (train/loop.py)."""
    from cosa_tpu.ops.image import normalize
    from cosa_tpu.ops.permutohedral import build_lattice

    simg = normalize(simg_u8)
    img255 = denormalize_u8(simg)
    b, h, w = img255.shape[0], img255.shape[1], img255.shape[2]
    sh, sw = int(h * cfg.energy_scale), int(w * cfg.energy_scale)
    s_img = resize_nearest(img255, (sh, sw))
    feats = pixel_features(
        s_img, cfg.energy_sigma_rgb, cfg.energy_sigma_xy * cfg.energy_scale
    )
    lat = jax.vmap(build_lattice)(feats.reshape(b, sh * sw, 5))
    return lat._asdict()


def get_energy_loss(
    img: jnp.ndarray,
    seg_logits: jnp.ndarray,
    label: jnp.ndarray,
    img_box: jnp.ndarray,
    weight: float = 1e-7,
    sigma_rgb: float = 15.0,
    sigma_xy: float = 100.0,
    scale_factor: float = 0.5,
    filter_kind: str = "rff",
    rff_features: int = 1024,
    rff_seed: int = 0,
    ignore_index: int = 255,
    half: bool = False,
    convention: float = 1.0,
    lattice=None,
) -> jnp.ndarray:
    """img: normalized NHWC; seg_logits: (B, H, W, C) at label resolution;
    label: (B, H, W) pseudo mask; img_box: (B, 4).

    With ``filter_kind="lattice"`` and a precomputed ``lattice`` dict (from
    build_energy_lattice), the exact reference filter runs with no surrogate
    and no convention rescale."""
    b, h, w, _ = img.shape
    probs = jax.nn.softmax(seg_logits.astype(jnp.float32), axis=-1)
    rois = box_mask(img_box, h, w).astype(jnp.float32)
    img255 = denormalize_u8(img)

    sh, sw = int(h * scale_factor), int(w * scale_factor)
    s_img = resize_nearest(img255, (sh, sw))
    s_probs = resize_bilinear(probs, (sh, sw))
    s_rois = resize_nearest(rois[..., None], (sh, sw))[..., 0]
    s_label = resize_nearest(label[..., None].astype(jnp.int32), (sh, sw))[..., 0]

    unlabeled = s_label == ignore_index
    seg_max = jnp.max(s_probs, axis=-1)
    gate = jnp.clip(s_rois - seg_max, 0.0, None)
    gate = jnp.where(unlabeled, 1.0, gate)[..., None]

    seg_roi = s_probs * s_rois[..., None]
    gate = jax.lax.stop_gradient(gate)
    if filter_kind == "lattice" and lattice is not None:
        loss = _dense_energy_lat(
            seg_roi, lattice["uid"], lattice["bary"], lattice["nbr_idx"],
            lattice["nbr_ok"], gate,
        )
        return weight * loss
    feats = pixel_features(s_img, sigma_rgb, sigma_xy * scale_factor)
    feats = jax.lax.stop_gradient(feats)
    loss = _dense_energy(seg_roi, feats, gate, filter_kind, rff_features,
                         rff_seed, half, float(convention))
    return weight * loss


def resolve_energy_convention(cfg, images_u8, n_probe: int = 2):
    """Auto-calibrate the rff->lattice energy convention on REAL images at
    the ACTUAL energy resolution the run will use.

    Replaces the round-2 baked constant (0.62 — measured shape-dependent
    0.60-0.66, silently wrong at non-224^2 energy resolutions). Procedure:
    features are built exactly like get_energy_loss (nearest-downscaled
    first-batch crops, sigma_xy scaled by energy_scale); probe value maps are
    smooth softmax fields at two sharpness levels (the uniform-ish early-
    training regime and the peaky late-training regime); the returned scale
    is sum(E_lattice)/sum(E_rff) with E = <v, filter(v)>, the ratio of the
    two quadratic forms. The lattice side runs the native C++ oracle
    (cosa_tpu/native, bit-exact vs the reference lattice) on host, falling
    back to the pure-JAX lattice on the CPU backend; the rff side runs the
    exact training configuration (n_features, seed, bf16-ness) so any rff
    bias is absorbed into the calibration.

    Returns (convention, info_dict). Reference for the convention being
    calibrated: utils/bilateralfilter/permutohedral.cpp:443-631 (the
    lattice's splat/blur/slice mass scaling).
    """
    import numpy as np

    imgs = jnp.asarray(images_u8[:4], jnp.float32)
    b, h, w = imgs.shape[0], imgs.shape[1], imgs.shape[2]
    c = cfg.num_classes
    sh, sw = max(1, int(h * cfg.energy_scale)), max(1, int(w * cfg.energy_scale))
    s_img = resize_nearest(imgs, (sh, sw))
    feats = pixel_features(
        s_img, cfg.energy_sigma_rgb, cfg.energy_sigma_xy * cfg.energy_scale
    )
    f_flat = np.asarray(feats).reshape(b, sh * sw, 5)

    rng = np.random.default_rng(cfg.seed + 17)
    gh, gw = max(1, sh // 8), max(1, sw // 8)
    ratios = []
    for probe, amp in zip(range(n_probe), (2.0, 8.0)):
        logits = rng.standard_normal((b, gh, gw, c)).astype(np.float32) * amp
        logits = resize_bilinear(jnp.asarray(logits), (sh, sw))
        v = jax.nn.softmax(logits, axis=-1)
        v_flat = v.reshape(b, sh * sw, c)
        rff_out = rff_gaussian_filter(
            jnp.asarray(f_flat), v_flat,
            n_features=cfg.energy_rff_features, seed=0,
            dtype=jnp.bfloat16 if cfg.mixed_precision else jnp.float32,
        )
        e_rff = float(jnp.vdot(v_flat, rff_out))
        v_np = np.asarray(v_flat)
        try:
            from cosa_tpu.native.build import lattice_gaussian_cpu

            lat = np.stack(
                [lattice_gaussian_cpu(f_flat[i], v_np[i]) for i in range(b)]
            )
        except Exception:  # no C++ toolchain: pure-JAX lattice on CPU
            from cosa_tpu.ops.permutohedral import permutohedral_filter

            cpu = jax.devices("cpu")[0]
            with jax.default_device(cpu):
                lat = np.stack([
                    np.asarray(permutohedral_filter(
                        jnp.asarray(f_flat[i]), jnp.asarray(v_np[i])
                    ))
                    for i in range(b)
                ])
        e_lat = float(np.vdot(v_np, lat))
        ratios.append(e_lat / e_rff)

    conv = float(np.mean(ratios))
    info = dict(
        per_probe=[round(r, 4) for r in ratios],
        spread=round(float(np.max(ratios) - np.min(ratios)), 4),
        energy_res=(sh, sw),
    )
    if not 0.2 < conv < 1.5:
        raise RuntimeError(
            f"energy convention calibration out of sane band: {conv} {info}"
        )
    return conv, info
