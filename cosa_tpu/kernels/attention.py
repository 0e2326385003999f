"""Fused attention dispatch for TPU (custom Pallas kernel).

Replaces the reference's materialized softmax(QK^T)V attention
(models/vit/vit.py:119-137). At CoSA's sequence lengths (785 tokens at
448^2, 1765 at the 672^2 TTA scale) the win is avoiding the (B, H, N, N)
f32 score tensor round-tripping through HBM.

API: q, k, v are (B, N, H, D_head); returns (B, N, H, D_head).
``n_valid`` marks the true token count when the caller padded the sequence
axis — keys at or beyond it are masked out of the softmax.
Falls back to a fused-by-XLA einsum path off-TPU.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _xla_attention(q, k, v, scale, n_valid=None):
    s = jnp.einsum("bqhd,bkhd->bhqk", q * scale, k)
    if n_valid is not None and n_valid < q.shape[1]:
        key_ok = jnp.arange(q.shape[1]) < n_valid
        s = jnp.where(key_ok[None, None, None, :], s, -1e30)
    p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v)


def flash_attention(q, k, v, scale: float, n_valid: Optional[int] = None):
    """Dispatch to the Pallas kernel on TPU, einsum elsewhere."""
    if jax.default_backend() == "tpu":
        from cosa_tpu.kernels.flash import mha

        return mha(q, k, v, scale=scale, n_valid=n_valid)
    return _xla_attention(q, k, v, scale, n_valid)
