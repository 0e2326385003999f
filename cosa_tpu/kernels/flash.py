"""Fused flash attention for the ViT encoder (Pallas, TPU).

Replaces the reference's materialized softmax(QK^T)V (models/vit/vit.py:
119-137): no (B, H, N, N) score tensor ever reaches HBM, for both forward
and backward (the op carries a flash backward via custom_vjp).

CoSA's token counts are not lane-aligned (785 at 448^2, 1765 at the 672
TTA scale), so sequences are padded up to the block multiple and the pad is
masked out with segment ids (pad tokens live in segment 1; real tokens in
segment 0 — cross-segment pairs are masked inside the kernel). Padded query
rows are sliced off afterwards.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental.pallas.ops.tpu.flash_attention import (
    BlockSizes,
    SegmentIds,
    flash_attention,
)

# pad sequences to a multiple of the block size (block sizes must divide the
# padded length); pad keys are segment-masked, pad queries sliced off.
# 256 keeps the pad waste low at CoSA's token counts (197/785/1765).
_LANE = 256


def _block_sizes(n: int) -> BlockSizes:
    blk = 512 if n % 512 == 0 else 256
    bq = min(blk, n)
    bk = min(blk, n)
    return BlockSizes(
        block_q=bq,
        block_k_major=bk,
        block_k=bk,
        block_b=1,
        block_q_major_dkv=bq,
        block_k_major_dkv=bk,
        block_k_dkv=bk,
        block_q_dkv=bq,
        block_k_major_dq=bk,
        block_k_dq=bk,
        block_q_dq=bq,
    )


@functools.partial(jax.jit, static_argnames=("scale",))
def mha(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, scale: float) -> jnp.ndarray:
    """q, k, v: (B, N, H, D) -> (B, N, H, D)."""
    b, n, h, d = q.shape
    npad = -n % _LANE
    npp = n + npad

    def to_bhnd(x):
        x = jnp.swapaxes(x, 1, 2)  # (B, H, N, D)
        if npad:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, npad), (0, 0)))
        return x

    qp, kp, vp = to_bhnd(q), to_bhnd(k), to_bhnd(v)
    seg = None
    if npad:
        ids = (jnp.arange(npp) >= n).astype(jnp.int32)
        ids = jnp.broadcast_to(ids, (b, npp))
        seg = SegmentIds(q=ids, kv=ids)
    out = flash_attention(
        qp, kp, vp,
        segment_ids=seg,
        causal=False,
        sm_scale=scale,
        block_sizes=_block_sizes(npp),
    )
    out = out[:, :, :n, :]
    return jnp.swapaxes(out, 1, 2)
