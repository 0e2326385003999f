"""On-device high-dimensional Gaussian (bilateral) filtering.

The reference computes ``AS = G @ values`` with
``G_ij = exp(-||f_i - f_j||^2 / 2)`` over 5-D features
f = (x/sigma_xy, y/sigma_xy, r/sigma_rgb, g/sigma_rgb, b/sigma_rgb) via a
CPU/OpenMP/SSE permutohedral lattice behind a SWIG binding
(utils/bilateralfilter/bilateralfilter.cpp:4-55, permutohedral.cpp), forcing
a device->host->device round trip every training step
(utils/seg_helper.py:884-890).

TPU-native replacement: a random-Fourier-feature (RFF) factorization of the
Gaussian kernel (Rahimi & Recht, 2007):

    G ~= Phi Phi^T,   Phi[n, d] = sqrt(2/D) cos(w_d . f_n + b_d),
    w_d ~ N(0, I),    b_d ~ U[0, 2pi)

so ``G @ V ~= Phi @ (Phi^T @ V)`` — two MXU matmuls, O(N*D) instead of the
lattice's hash-table scatter. The projection is drawn once from a fixed seed,
making the filter deterministic. Like the permutohedral lattice, this is an
approximation of the exact Gaussian transform; :func:`exact_gaussian_filter`
is the brute-force oracle both are validated against (tests/test_bilateral.py).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def pixel_features(
    image: jnp.ndarray, sigma_rgb: float, sigma_xy: float
) -> jnp.ndarray:
    """(B, H, W, 3) 0-255 image -> (B, H, W, 5) bilateral features
    (reference bilateralfilter.cpp:4-19)."""
    b, h, w, _ = image.shape
    ys = jax.lax.broadcasted_iota(jnp.float32, (b, h, w, 1), 1)
    xs = jax.lax.broadcasted_iota(jnp.float32, (b, h, w, 1), 2)
    return jnp.concatenate(
        [xs / sigma_xy, ys / sigma_xy, image.astype(jnp.float32) / sigma_rgb],
        axis=-1,
    )


@functools.lru_cache(maxsize=16)
def _rff_params(n_features: int, dim: int, seed: int) -> Tuple[np.ndarray, np.ndarray]:
    """Orthogonal random features (Yu et al., 2016): blocks of the Gaussian
    projection are orthogonalized and rescaled by chi-distributed norms —
    same expectation as plain RFF, measurably lower variance."""
    rng = np.random.default_rng(seed)
    blocks = []
    remaining = n_features
    while remaining > 0:
        g = rng.standard_normal((dim, dim))
        q, _ = np.linalg.qr(g)
        norms = np.linalg.norm(rng.standard_normal((dim, dim)), axis=1)
        blocks.append(q * norms[None, :])
        remaining -= dim
    w = np.concatenate(blocks, axis=1)[:, :n_features].astype(np.float32)
    b = rng.uniform(0.0, 2.0 * np.pi, size=(n_features,)).astype(np.float32)
    return w, b


def rff_embed(
    features: jnp.ndarray, n_features: int = 256, seed: int = 0,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """(..., dim) features -> (..., D) random Fourier embedding.

    The cos over the (N, D) projection is the cost center (VPU
    transcendentals, not MXU flops), so the embedding supports bf16: the
    phase is computed in f32 (phases span ~tens of radians — bf16's 8-bit
    mantissa would alias them) and only the cosine output is stored reduced.
    """
    w, b = _rff_params(n_features, features.shape[-1], seed)
    scale = float(np.sqrt(2.0 / n_features))
    if jax.default_backend() == "tpu" and features.ndim == 3:
        # fused Pallas projection+cos: the f32 (N, D) projection never
        # reaches HBM (~6 ms/step saved at the training shape, see
        # kernels/rff.py). Same math to cos rounding; internal row padding
        # is sliced off before return.
        from cosa_tpu.kernels.rff import rff_phi

        return rff_phi(
            features.astype(jnp.float32), jnp.asarray(w), jnp.asarray(b),
            scale, dtype=dtype,
        )
    proj = features.astype(jnp.float32) @ jnp.asarray(w) + jnp.asarray(b)
    return (scale * jnp.cos(proj)).astype(dtype)


def rff_gaussian_filter(
    features: jnp.ndarray,
    values: jnp.ndarray,
    n_features: int = 256,
    seed: int = 0,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """AS ~= G @ values with G_ij = exp(-||f_i-f_j||^2/2).

    features: (B, N, dim); values: (B, N, K). Returns (B, N, K) f32.
    ``dtype`` controls the embedding/matmul precision (bf16 halves the HBM
    traffic of the (N, D) embedding; the result accumulates in f32).
    """
    # NOTE(perf, measured on v5e): a streaming two-pass Pallas kernel that
    # recomputes Phi per tile was tried and LOST to this XLA path (13 vs
    # 7.8 ms at B=4, N=224^2, D=1024) — per-tile K=5 projection matmuls and
    # Mosaic stack temporaries dominate. The XLA einsums below are the
    # faster lowering; cost scales ~linearly in n_features.
    phi = rff_embed(features, n_features, seed, dtype)  # (B, N, D)
    coeff = jnp.einsum(
        "bnd,bnk->bdk", phi, values.astype(dtype),
        preferred_element_type=jnp.float32,
    )
    out = jnp.einsum(
        "bnd,bdk->bnk", phi, coeff.astype(dtype),
        preferred_element_type=jnp.float32,
    )
    return out.astype(jnp.float32)


def exact_gaussian_filter(features: jnp.ndarray, values: jnp.ndarray) -> jnp.ndarray:
    """Brute-force O(N^2) oracle: G @ values. Small inputs only (tests, and
    correctness references for the RFF/lattice paths)."""
    d2 = jnp.sum(
        (features[:, :, None, :] - features[:, None, :, :]) ** 2, axis=-1
    )
    g = jnp.exp(-0.5 * d2)
    return jnp.einsum("bnm,bmk->bnk", g, values)
