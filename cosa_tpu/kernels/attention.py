"""Fused flash attention for TPU (Pallas).

Replaces the reference's materialized softmax(QK^T)V attention
(models/vit/vit.py:119-137). At CoSA's sequence lengths (785 tokens at 448^2,
1765 at the 672^2 TTA scale) the win is avoiding the (B, H, N, N) f32 score
tensor round-tripping through HBM.

API: q, k, v are (B, N, H, D_head); returns (B, N, H, D_head).
Falls back to a fused-by-XLA einsum path off-TPU or for awkward shapes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _xla_attention(q, k, v, scale):
    s = jnp.einsum("bqhd,bkhd->bhqk", q * scale, k)
    p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v)


def flash_attention(q, k, v, scale: float):
    """Dispatch to the Pallas kernel on TPU, einsum elsewhere."""
    if jax.default_backend() == "tpu":
        try:
            return _pallas_attention(q, k, v, scale)
        except NotImplementedError:
            pass
    return _xla_attention(q, k, v, scale)


def _pallas_attention(q, k, v, scale: float):
    from cosa_tpu.kernels.flash import mha

    return mha(q, k, v, scale=scale)
