"""Fused random-Fourier-feature embedding kernel (Pallas, TPU).

The dense-energy regularizer's RFF filter (ops/bilateral.py) needs
``phi = sqrt(2/D) * cos(feats @ W + b)`` over N = (224*224) pixels with
D = 1024 features. Lowered naively, XLA materializes the f32 projection
``feats @ W`` — 4 * N * D bytes = 822 MB per step at CoSA's training shape —
before the cos fusion can consume it, and that single HBM-bound dot costs
~6 ms/step on v5e (profiled: `jvp()/dot_general`, 124 GB/s effective).

This kernel computes the projection tile-by-tile in VMEM and writes only the
(bf16) cos output: HBM traffic drops to one read of the (N, 5) features and
one write of phi. The phase is computed in f32 (phases span tens of radians;
bf16's 8-bit mantissa would alias them — see ops/bilateral.py), matching the
XLA path bit-for-bit up to cos rounding.

Replaces the host round trip of the reference's C++ bilateral filter
(/root/reference/utils/seg_helper.py:884-890) together with
ops/bilateral.py; the reference has no analogue of this op.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


# Mosaic's full-range cos costs ~4.7 ms over the step's 205M phases
# (measured v5e; proj-only kernel 2.5 ms vs proj+cos 7.2 ms). The output is
# bf16 (2^-9 resolution), so evaluate cos as range reduction + a degree-5
# polynomial in r^2 on [-pi, pi] (max error 1.8e-6, three decades below the
# output quantization): +0.4 ms instead of +4.7.
_U = np.linspace(0.0, np.pi ** 2, 20001)
_COS_POLY = [float(c) for c in np.polyfit(_U, np.cos(np.sqrt(_U)), 5)]
_INV2PI = float(1.0 / (2.0 * np.pi))
_TWOPI = float(2.0 * np.pi)


def _cos_poly(p: jnp.ndarray) -> jnp.ndarray:
    r = p - _TWOPI * jnp.round(p * _INV2PI)
    u = r * r
    c5, c4, c3, c2, c1, c0 = _COS_POLY
    return c0 + u * (c1 + u * (c2 + u * (c3 + u * (c4 + u * c5))))


def _phi_kernel(scale, dim, f_ref, w_ref, b_ref, o_ref):
    # The projection must be TRUE f32: phases span tens of radians and an
    # MXU dot (bf16 passes inside Mosaic) aliases them — measured 0.0024
    # phi error vs f64, 14x the bf16 output quantum. With dim=5 the dot is
    # tiny anyway, so evaluate it as `dim` broadcast FMAs on the VPU, which
    # are exact f32.
    f = f_ref[0]  # (bq, dim) f32
    proj = jnp.broadcast_to(b_ref[:], (f.shape[0], b_ref.shape[1]))
    for i in range(dim):
        proj = proj + f[:, i : i + 1] * w_ref[i : i + 1, :]
    o_ref[0] = (scale * _cos_poly(proj)).astype(o_ref.dtype)


def rff_phi(
    features: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray,
    scale: float,
    dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """features: (B, N, dim) f32; w: (dim, D); b: (D,).

    Returns (B, N, D) ``dtype`` = scale * cos(features @ w + b).
    Rows are processed in 896-row tiles; N pads up internally and the pad
    rows are sliced off (callers that feed the result into a contraction
    over N must zero the corresponding values rows — ops/bilateral.py does).
    """
    bsz, n, dim = features.shape
    d = w.shape[1]
    bq = 896 if n % 896 == 0 else 512
    npp = _round_up(n, bq)
    f = features
    if npp != n:
        f = jnp.pad(f, ((0, 0), (0, npp - n), (0, 0)))
    grid = (bsz, npp // bq)
    out = pl.pallas_call(
        functools.partial(_phi_kernel, scale, dim),
        out_shape=jax.ShapeDtypeStruct((bsz, npp, d), dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, dim), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((dim, d), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * npp * dim * d,
            bytes_accessed=4 * bsz * npp * dim
            + bsz * npp * d * jnp.dtype(dtype).itemsize,
            transcendentals=bsz * npp * d,
        ),
    )(f, w, b.reshape(1, d))
    return out[:, :n] if npp != n else out
