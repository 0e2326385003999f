"""PAR — pixel-adaptive refinement (local affinity propagation).

Twin of the reference ``models/PAR.py:26-91``: 8-neighbor affinities at a set
of dilations, built from RGB differences (plus a fixed positional prior),
iteratively propagate mask probabilities. The reference builds the neighbor
stack with grouped conv2d over a one-hot kernel; here each neighbor is an
edge-padded slice, and the propagation step is an unrolled sum of 8*|dilations|
shifted multiply-adds — no (B, C, K, H, W) tensor is materialized for the
mask update, which keeps peak memory at O(K) map-sized buffers.

The reference never enables PAR in its live path (SURVEY.md §2.9) but ships
it; here it is a working, flag-gated (``usepar``) refine step for
:func:`cosa_tpu.objectives.pseudo.cam2mask`.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cosa_tpu.ops.resize import resize_bilinear_ac

# 8-neighborhood offsets, in the reference's kernel order (PAR.py:10-24)
_OFFSETS: Tuple[Tuple[int, int], ...] = (
    (-1, -1), (-1, 0), (-1, 1),
    (0, -1), (0, 1),
    (1, -1), (1, 0), (1, 1),
)
# sqrt(2) for the diagonal kernels (PAR.py:54-58)
_DIST = np.array([np.sqrt(2), 1, np.sqrt(2), 1, 1, np.sqrt(2), 1, np.sqrt(2)])


def _shift(x: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """Edge-padded shifted view: out[y, x] = x[y + dy, x + dx] (replicate)."""
    h, w = x.shape[1:3]
    pad = max(abs(dy), abs(dx))
    xp = jnp.pad(
        x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="edge"
    )
    return jax.lax.dynamic_slice_in_dim(
        jax.lax.dynamic_slice_in_dim(xp, pad + dy, h, axis=1), pad + dx, w, axis=2
    )


def _std_unbiased(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    """torch.std default (ddof=1) used by the reference (PAR.py:76-77)."""
    n = x.shape[axis]
    mean = jnp.mean(x, axis=axis, keepdims=True)
    var = jnp.sum((x - mean) ** 2, axis=axis, keepdims=True) / (n - 1)
    return jnp.sqrt(var)


def par_affinity(
    imgs: jnp.ndarray,
    dilations: Sequence[int] = (1, 2, 4, 8, 12, 24),
    w1: float = 0.3,
    w2: float = 0.01,
) -> jnp.ndarray:
    """(B, H, W, 3) image -> (B, H, W, K) normalized affinities,
    K = 8 * len(dilations) (reference PAR.py:64-85)."""
    neigh = jnp.stack(
        [
            _shift(imgs, dy * d, dx * d)
            for d in dilations
            for (dy, dx) in _OFFSETS
        ],
        axis=3,
    )  # (B, H, W, K, 3)
    center = imgs[:, :, :, None, :]
    diff = jnp.abs(neigh - center)
    std = _std_unbiased(neigh, axis=3)  # (B, H, W, 1, 3)
    aff = -((diff / (std + 1e-8) / w1) ** 2)
    aff = jnp.mean(aff, axis=-1)  # (B, H, W, K)

    pos = jnp.asarray(
        np.concatenate([_DIST * d for d in dilations]), jnp.float32
    )  # (K,)
    pos_std = jnp.sqrt(jnp.sum((pos - pos.mean()) ** 2) / (pos.shape[0] - 1))
    pos_aff = -((pos / (pos_std + 1e-8) / w1) ** 2)

    return jax.nn.softmax(aff, axis=3) + w2 * jax.nn.softmax(pos_aff)


def par_refine(
    imgs: jnp.ndarray,
    masks: jnp.ndarray,
    dilations: Sequence[int] = (1, 2, 4, 8, 12, 24),
    num_iter: int = 10,
    w1: float = 0.3,
    w2: float = 0.01,
) -> jnp.ndarray:
    """Refine (B, h, w, C) mask probabilities against (B, H, W, 3) images
    (reference PAR.forward, models/PAR.py:64-91)."""
    masks = resize_bilinear_ac(masks, imgs.shape[1:3])
    aff = par_affinity(imgs, dilations, w1, w2)  # (B, H, W, K)
    offsets = [
        (dy * d, dx * d) for d in dilations for (dy, dx) in _OFFSETS
    ]
    # NOTE(perf, measured on v5e at 224^2): among XLA lowerings, per-shift
    # small pads beat both a single max-dilation pad with static slices
    # (23.5 vs 34 ms/refine) and a stacked (B,H,W,K,C) einsum (105 ms) —
    # XLA fuses the per-shift slices into the multiply-add chain best here.
    # Tried and REJECTED (r2): a Pallas kernel fusing ALL sweeps in VMEM
    # (channel-chunk grid, replicated-halo scratch, bf16 affinities). It
    # removed the per-sweep HBM traffic but the in-VMEM +-24-lane shifted
    # reads dominate: 61 vs 79 ms per 10-sweep refine, a >5 min Mosaic
    # compile per shape, and 1.6% drift from bf16 affinities compounding
    # across sweeps. The XLA form stays.
    def body(m, _):
        out = 0.0
        for k, (dy, dx) in enumerate(offsets):
            out = out + _shift(m, dy, dx) * aff[:, :, :, k : k + 1]
        return out, None

    masks, _ = jax.lax.scan(body, masks, None, length=num_iter)
    return masks
