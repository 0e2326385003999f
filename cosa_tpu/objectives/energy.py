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

# lattice-energy / exact-energy scale at training-shape statistics (see the
# measurement note in _filter below)
_LATTICE_CONVENTION = 0.62


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _dense_energy(seg_roi, feats, gate, filter_kind, rff_features, rff_seed,
                  half):
    as_gated = _filter(seg_roi, feats, filter_kind, rff_features, rff_seed,
                       half) * gate
    n = seg_roi.shape[0]
    return -jnp.vdot(seg_roi, as_gated) / n


def _filter(seg_roi, feats, filter_kind, rff_features, rff_seed, half=False):
    b, h, w, k = seg_roi.shape
    v = seg_roi.reshape(b, h * w, k)
    f = feats.reshape(b, h * w, -1)
    if filter_kind == "exact":
        out = exact_gaussian_filter(f, v)
    elif filter_kind == "rff":
        # fast approximation of the exact Gaussian transform, rescaled to the
        # lattice's convention so the 1e-7 loss weight keeps the reference's
        # meaning. The lattice/exact energy ratio is feature-spread-dependent:
        # ~0.52 at toy 16^2-24^2 shapes but 0.60/0.66/0.66 measured at the
        # REAL training statistics (224^2/160^2/112^2 natural-statistics
        # images, sigma_xy 50, sigma_rgb 15, vs the native C++ oracles;
        # direction cos(lattice, exact) >= 0.998 throughout, and
        # cos(rff_D=1024, lattice) = 0.986 at 224^2 — see
        # tests/test_energy.py::test_rff_tracks_lattice_at_real_shape).
        # The constant is calibrated for the shape training actually runs.
        out = _LATTICE_CONVENTION * rff_gaussian_filter(
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
                      half):
    as_gated = _filter(seg_roi, feats, filter_kind, rff_features, rff_seed,
                       half) * gate
    n = seg_roi.shape[0]
    loss = -jnp.vdot(seg_roi, as_gated) / n
    return loss, (as_gated, n)


def _dense_energy_bwd(filter_kind, rff_features, rff_seed, half, res, g):
    # reference gradient convention (seg_helper.py:898-903): -2 g AS_gated / N.
    # (The ROI factor is implicit: seg_roi = probs * ROI upstream, so the ROI
    # product is applied by the chain rule through that multiply.)
    as_gated, n = res
    return (-2.0 * g * as_gated / n, None, None)


_dense_energy.defvjp(_dense_energy_fwd, _dense_energy_bwd)


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
) -> jnp.ndarray:
    """img: normalized NHWC; seg_logits: (B, H, W, C) at label resolution;
    label: (B, H, W) pseudo mask; img_box: (B, 4)."""
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
    feats = pixel_features(s_img, sigma_rgb, sigma_xy * scale_factor)
    feats = jax.lax.stop_gradient(feats)
    gate = jax.lax.stop_gradient(gate)
    loss = _dense_energy(seg_roi, feats, gate, filter_kind, rff_features, rff_seed, half)
    return weight * loss
