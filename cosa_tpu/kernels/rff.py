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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _phi_kernel(scale, f_ref, w_ref, b_ref, o_ref):
    f = f_ref[0]  # (bq, dim) f32
    proj = jax.lax.dot_general(
        f, w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    proj = proj + b_ref[:]  # (1, D) broadcast over rows
    o_ref[0] = (scale * jnp.cos(proj)).astype(o_ref.dtype)


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
        functools.partial(_phi_kernel, scale),
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
