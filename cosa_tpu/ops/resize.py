"""Torch-parity image resizing as separable interpolation matmuls.

The reference leans on ``F.interpolate`` everywhere (multi-scale TTA
utils/seg_helper.py:247-260, CAM/seg upsampling main.py:167, bicubic
positional-embedding resizing models/vit/vit.py:288-291, nearest-mode
downscaling in the dense-energy loss utils/seg_helper.py:201-204).  To keep
metric parity we reproduce torch's exact ``align_corners=False`` sampling
(half-pixel centers, no antialias) — which `jax.image.resize` does *not*
match (it antialiases on downscale).

TPU-first design: a 1-D resize is a small dense matrix ``M[out, in]`` applied
along one axis, so a 2-D resize is two matmuls — this lands on the MXU and
fuses with neighboring ops, instead of the gather soup a naive port would
generate.  The matrices are built with numpy at trace time (shapes are static
under jit) and folded into the compiled program as constants.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# interpolation weights are sub-1%-scale corrections; single-pass bf16 MXU
# passes visibly shift CAM thresholds, so these matmuls run at HIGH precision
# (bf16x3 synthesis, 24 mantissa bits == f32 fidelity). HIGHEST (bf16x6,
# f64-ish) costs 2x more MXU passes for precision far beyond the f32 inputs.
_PRECISION = jax.lax.Precision.HIGH


@functools.lru_cache(maxsize=512)
def _linear_matrix(in_size: int, out_size: int) -> np.ndarray:
    """Interpolation matrix for torch bilinear, align_corners=False."""
    if in_size == out_size:
        return np.eye(in_size, dtype=np.float32)
    scale = in_size / out_size
    dst = np.arange(out_size, dtype=np.float64)
    src = np.maximum((dst + 0.5) * scale - 0.5, 0.0)
    i0 = np.floor(src).astype(np.int64)
    lam = src - i0
    i0 = np.clip(i0, 0, in_size - 1)
    i1 = np.clip(i0 + 1, 0, in_size - 1)
    m = np.zeros((out_size, in_size), dtype=np.float64)
    np.add.at(m, (dst.astype(np.int64), i0), 1.0 - lam)
    np.add.at(m, (dst.astype(np.int64), i1), lam)
    return m.astype(np.float32)


def _cubic_kernel(x: np.ndarray, a: float = -0.75) -> np.ndarray:
    ax = np.abs(x)
    ax2, ax3 = ax * ax, ax * ax * ax
    w = np.where(
        ax <= 1.0,
        (a + 2.0) * ax3 - (a + 3.0) * ax2 + 1.0,
        np.where(ax < 2.0, a * ax3 - 5.0 * a * ax2 + 8.0 * a * ax - 4.0 * a, 0.0),
    )
    return w


@functools.lru_cache(maxsize=512)
def _linear_matrix_ac(in_size: int, out_size: int) -> np.ndarray:
    """Interpolation matrix for torch bilinear, align_corners=True
    (used by PAR's mask pre-resize, models/PAR.py:66)."""
    if in_size == out_size:
        return np.eye(in_size, dtype=np.float32)
    scale = (in_size - 1) / (out_size - 1) if out_size > 1 else 0.0
    dst = np.arange(out_size, dtype=np.float64)
    src = dst * scale
    i0 = np.clip(np.floor(src).astype(np.int64), 0, in_size - 1)
    lam = src - i0
    i1 = np.clip(i0 + 1, 0, in_size - 1)
    m = np.zeros((out_size, in_size), dtype=np.float64)
    np.add.at(m, (dst.astype(np.int64), i0), 1.0 - lam)
    np.add.at(m, (dst.astype(np.int64), i1), lam)
    return m.astype(np.float32)


@functools.lru_cache(maxsize=512)
def _cubic_matrix(in_size: int, out_size: int) -> np.ndarray:
    """Interpolation matrix for torch bicubic (A=-0.75), align_corners=False."""
    if in_size == out_size:
        return np.eye(in_size, dtype=np.float32)
    scale = in_size / out_size
    dst = np.arange(out_size, dtype=np.float64)
    src = (dst + 0.5) * scale - 0.5
    i0 = np.floor(src).astype(np.int64)
    t = src - i0
    m = np.zeros((out_size, in_size), dtype=np.float64)
    for tap, w in (
        (-1, _cubic_kernel(t + 1.0)),
        (0, _cubic_kernel(t)),
        (1, _cubic_kernel(1.0 - t)),
        (2, _cubic_kernel(2.0 - t)),
    ):
        idx = np.clip(i0 + tap, 0, in_size - 1)
        np.add.at(m, (dst.astype(np.int64), idx), w)
    return m.astype(np.float32)


@functools.lru_cache(maxsize=512)
def _nearest_matrix(in_size: int, out_size: int) -> np.ndarray:
    """Selection matrix for torch 'nearest' (legacy floor) sampling."""
    if in_size == out_size:
        return np.eye(in_size, dtype=np.float32)
    dst = np.arange(out_size, dtype=np.float64)
    src = np.minimum(np.floor(dst * (in_size / out_size)), in_size - 1).astype(
        np.int64
    )
    m = np.zeros((out_size, in_size), dtype=np.float32)
    m[np.arange(out_size), src] = 1.0
    return m


def _apply_separable(
    x: jnp.ndarray, mh: np.ndarray, mw: np.ndarray, precision=None
) -> jnp.ndarray:
    """Apply per-axis matrices along the H, W axes of an NHWC (or HWC/HW) array."""
    # explicit None test: `precision or` would silently drop an explicit
    # Precision.DEFAULT request if jax ever made Precision falsy-valued
    prec = _PRECISION if precision is None else precision
    hw_axis = x.ndim - 3  # H axis for NHWC / HWC; 0 for HW
    if x.ndim == 2:
        return jnp.einsum("oh,hw,pw->op", mh, x, mw, precision=prec)
    dt = x.dtype
    # only float inputs may skip the f32 upcast under DEFAULT (an integer
    # input would truncate the fractional interpolation weights to 0/1)
    skip_upcast = (
        prec == jax.lax.Precision.DEFAULT
        and jnp.issubdtype(dt, jnp.floating)
    )
    xf = x if skip_upcast else x.astype(jnp.float32)
    # contract H then W; keep channel axis last so both contractions are matmuls
    y = jnp.tensordot(
        jnp.asarray(mh, xf.dtype), xf, axes=[[1], [hw_axis]], precision=prec
    )  # (Ho, ..., W, C)
    y = jnp.moveaxis(y, 0, hw_axis)
    y = jnp.tensordot(
        jnp.asarray(mw, xf.dtype), y, axes=[[1], [hw_axis + 1]], precision=prec
    )  # (Wo, ..., Ho, C)
    y = jnp.moveaxis(y, 0, hw_axis + 1)
    return y.astype(dt) if jnp.issubdtype(dt, jnp.floating) else y


def resize_bilinear(
    x: jnp.ndarray, size: Tuple[int, int], flip_w: bool = False,
    precision=None,
) -> jnp.ndarray:
    """NHWC bilinear resize, exact torch ``align_corners=False`` parity.

    ``flip_w=True`` fuses a horizontal flip of the OUTPUT into the resize:
    ``resize_bilinear(x, s, flip_w=True) == hflip(resize_bilinear(x, s))``
    bit-exactly (the W interpolation matrix's rows are reversed, so the same
    products are accumulated — only written to mirrored columns). The TTA
    fuse uses this to kill the materialized `rev` passes on 448^2 tensors.

    ``precision`` overrides the module default (HIGH): callers resizing
    tensors that are ALREADY bf16-quantized and threshold-insensitive (the
    teacher's input images) pass DEFAULT for single-pass bf16 matmuls.
    """
    h, w = x.shape[-3:-1] if x.ndim >= 3 else x.shape
    mw = _linear_matrix(w, size[1])
    if flip_w:
        mw = mw[::-1]
    return _apply_separable(x, _linear_matrix(h, size[0]), mw, precision)


def resize_bilinear_ac(x: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    """NHWC bilinear resize, torch ``align_corners=True`` parity."""
    h, w = x.shape[-3:-1] if x.ndim >= 3 else x.shape
    return _apply_separable(
        x, _linear_matrix_ac(h, size[0]), _linear_matrix_ac(w, size[1])
    )


def resize_bicubic(x: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    h, w = x.shape[-3:-1] if x.ndim >= 3 else x.shape
    return _apply_separable(x, _cubic_matrix(h, size[0]), _cubic_matrix(w, size[1]))


def resize_nearest(x: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    """Nearest (legacy floor) resize; safe for integer label maps."""
    h, w = x.shape[-3:-1] if x.ndim >= 3 else x.shape
    mh, mw = _nearest_matrix(h, size[0]), _nearest_matrix(w, size[1])
    if jnp.issubdtype(x.dtype, jnp.integer):
        # selection matrices are one-hot: gather instead of matmul for ints
        ih = jnp.asarray(mh.argmax(axis=1))
        iw = jnp.asarray(mw.argmax(axis=1))
        ax = x.ndim - 3 if x.ndim >= 3 else 0
        y = jnp.take(x, ih, axis=ax)
        y = jnp.take(y, iw, axis=ax + 1)
        return y
    return _apply_separable(x, mh, mw)


def resize(x: jnp.ndarray, size: Tuple[int, int], method: str = "bilinear") -> jnp.ndarray:
    if method == "bilinear":
        return resize_bilinear(x, size)
    if method == "bicubic":
        return resize_bicubic(x, size)
    if method == "nearest":
        return resize_nearest(x, size)
    raise ValueError(method)


# numpy twins (used by the host-side eval path on variable-size val images)
def np_resize_bilinear(x: np.ndarray, size: Tuple[int, int]) -> np.ndarray:
    """HWC / HW numpy bilinear resize with the same torch parity."""
    h, w = x.shape[:2]
    mh, mw = _linear_matrix(h, size[0]), _linear_matrix(w, size[1])
    y = np.tensordot(mh, x.astype(np.float32), axes=[[1], [0]])
    y = np.tensordot(mw, y, axes=[[1], [1]])
    return np.moveaxis(y, 0, 1)
