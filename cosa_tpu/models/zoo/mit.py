"""MixVisionTransformer (SegFormer backbone) + SegFormerHead, TPU-native.

Functional twins of the reference's vestigial SegFormer stack
(/root/reference/models/vit/mix_transformer.py:18-439 and
/root/reference/models/decoder/segformer_head.py:26-81; both DEAD in the
live pipeline — the model-factory branch is commented out at
models/__init__.py:25-75 — rebuilt here as working, flag-gated families).

TPU-first differences from the reference:
  * NHWC end to end: the reference round-trips (B,N,C) <-> NCHW around every
    spatial op (sr conv, DWConv, stage exits); here feature maps stay
    (B, H, W, C) and only the attention core flattens to (B, N, C), so XLA
    sees pure reshapes instead of transposes.
  * spatial-reduction attention keeps K/V at (N/sr^2) via one strided conv —
    a single MXU matmul per head group, no materialized giant score tensor
    at stage 1 (N x N/64 instead of the reference's same shape but NCHW).
  * SegFormerHead is mmcv-free: the reference's ConvModule(1x1, SyncBN)
    becomes Conv + BatchNorm + ReLU with cross-replica stats left to the
    caller's mesh (flax BatchNorm ``axis_name`` is deliberately not forced:
    under pjit the 'data' axis is a mesh axis, not a vmap axis).
  * stochastic depth is nn.Dropout with per-sample broadcast (exact
    equivalent of timm DropPath incl. the 1/keep_prob rescale).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from cosa_tpu.ops.resize import resize_bilinear


@dataclasses.dataclass(frozen=True)
class MiTConfig:
    embed_dims: Tuple[int, ...] = (64, 128, 320, 512)
    depths: Tuple[int, ...] = (3, 4, 6, 3)
    num_heads: Tuple[int, ...] = (1, 2, 5, 8)
    mlp_ratios: Tuple[int, ...] = (4, 4, 4, 4)
    sr_ratios: Tuple[int, ...] = (8, 4, 2, 1)
    strides: Tuple[int, ...] = (4, 2, 2, 2)
    qkv_bias: bool = True
    drop_path_rate: float = 0.1
    ln_eps: float = 1e-6


# mix_transformer.py:394-439 (mit_b0..b5); the tiny entry keeps tests fast.
MIT_CONFIGS = {
    "mit_b0": MiTConfig(embed_dims=(32, 64, 160, 256), depths=(2, 2, 2, 2)),
    "mit_b1": MiTConfig(depths=(2, 2, 2, 2)),
    "mit_b2": MiTConfig(depths=(3, 4, 6, 3)),
    "mit_b3": MiTConfig(depths=(3, 4, 18, 3)),
    "mit_b4": MiTConfig(depths=(3, 8, 27, 3)),
    "mit_b5": MiTConfig(depths=(3, 6, 40, 3)),
    "mit_tiny_test": MiTConfig(
        embed_dims=(16, 32, 64, 128), depths=(1, 1, 1, 1),
        num_heads=(1, 2, 4, 8), drop_path_rate=0.0,
    ),
}


class SRAttention(nn.Module):
    """Spatial-reduction attention (mix_transformer.py:56-133).

    Queries attend to a sr x sr strided-conv downsample of the map, so the
    score tensor is (N, N/sr^2)."""

    num_heads: int
    sr_ratio: int
    qkv_bias: bool
    ln_eps: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        nh, hd = self.num_heads, c // self.num_heads
        q = nn.Dense(c, use_bias=self.qkv_bias, dtype=self.dtype, name="q")(x)
        q = q.reshape(b, h * w, nh, hd)
        if self.sr_ratio > 1:
            kv_in = nn.Conv(
                c, (self.sr_ratio, self.sr_ratio),
                strides=(self.sr_ratio, self.sr_ratio),
                dtype=self.dtype, name="sr",
            )(x)
            kv_in = nn.LayerNorm(epsilon=self.ln_eps, dtype=jnp.float32,
                                 name="sr_norm")(kv_in).astype(self.dtype)
        else:
            kv_in = x
        m = kv_in.shape[1] * kv_in.shape[2]
        kv = nn.Dense(2 * c, use_bias=self.qkv_bias, dtype=self.dtype,
                      name="kv")(kv_in.reshape(b, m, c))
        kv = kv.reshape(b, m, 2, nh, hd)
        k, v = kv[:, :, 0], kv[:, :, 1]
        s = jnp.einsum("bqhd,bkhd->bhqk", q * hd ** -0.5, k)
        p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(self.dtype)
        o = jnp.einsum("bhqk,bkhd->bqhd", p, v).reshape(b, h * w, c)
        o = nn.Dense(c, dtype=self.dtype, name="proj")(o)
        return o.reshape(b, h, w, c)


class MixFFN(nn.Module):
    """MLP with a 3x3 depthwise conv between fc1 and GELU
    (mix_transformer.py:18-53 + DWConv :381-392)."""

    hidden: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        x = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        x = nn.Conv(
            self.hidden, (3, 3), padding=((1, 1), (1, 1)),
            feature_group_count=self.hidden, dtype=self.dtype, name="dwconv",
        )(x)
        x = nn.gelu(x, approximate=(self.dtype == jnp.bfloat16))
        return nn.Dense(c, dtype=self.dtype, name="fc2")(x)


class MiTBlock(nn.Module):
    num_heads: int
    mlp_ratio: int
    sr_ratio: int
    qkv_bias: bool
    drop_path: float
    ln_eps: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        c = x.shape[-1]
        # stochastic depth == per-sample dropout on the residual branch,
        # incl. timm DropPath's 1/keep_prob rescale
        dp = nn.Dropout(self.drop_path, broadcast_dims=(1, 2, 3),
                        deterministic=not train or self.drop_path == 0.0)
        y = nn.LayerNorm(epsilon=self.ln_eps, dtype=jnp.float32, name="norm1")(x)
        y = SRAttention(self.num_heads, self.sr_ratio, self.qkv_bias,
                        self.ln_eps, self.dtype, name="attn")(
            y.astype(self.dtype))
        x = x + dp(y)
        y = nn.LayerNorm(epsilon=self.ln_eps, dtype=jnp.float32, name="norm2")(x)
        y = MixFFN(c * self.mlp_ratio, self.dtype, name="mlp")(
            y.astype(self.dtype))
        return x + dp(y)


class MixVisionTransformer(nn.Module):
    """4-stage pyramid ViT; returns the 4 NHWC stage maps
    (mix_transformer.py:219-378 forward_features)."""

    cfg: MiTConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, train: bool = False
    ) -> Tuple[jnp.ndarray, ...]:
        c = self.cfg
        total = sum(c.depths)
        dpr = [c.drop_path_rate * i / max(total - 1, 1) for i in range(total)]
        outs = []
        cur = 0
        for si in range(4):
            patch = 7 if si == 0 else 3
            pad = patch // 2
            x = nn.Conv(
                c.embed_dims[si], (patch, patch),
                strides=(c.strides[si], c.strides[si]),
                padding=((pad, pad), (pad, pad)),
                dtype=self.dtype, name=f"patch_embed{si + 1}",
            )(x.astype(self.dtype))
            x = nn.LayerNorm(epsilon=c.ln_eps, dtype=jnp.float32,
                             name=f"patch_norm{si + 1}")(x)
            for bi in range(c.depths[si]):
                x = MiTBlock(
                    c.num_heads[si], c.mlp_ratios[si], c.sr_ratios[si],
                    c.qkv_bias, dpr[cur + bi], c.ln_eps, self.dtype,
                    name=f"block{si + 1}_{bi}",
                )(x.astype(self.dtype), train=train)
            cur += c.depths[si]
            x = nn.LayerNorm(epsilon=c.ln_eps, dtype=jnp.float32,
                             name=f"norm{si + 1}")(x)
            outs.append(x)
        return tuple(outs)


class SegFormerHead(nn.Module):
    """All-MLP fuse head (segformer_head.py:26-81), mmcv-free.

    Each stage map is linearly embedded, bilinear-upsampled to the stage-1
    grid, concatenated, fused by 1x1 conv + BN + ReLU, and classified."""

    num_classes: int
    embedding_dim: int = 256
    dropout: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, feats: Sequence[jnp.ndarray], train: bool = False
    ) -> jnp.ndarray:
        c1 = feats[0]
        tgt = (c1.shape[1], c1.shape[2])
        embs = []
        # reference fuses in order [c4, c3, c2, c1] (segformer_head.py:77)
        for i in (3, 2, 1, 0):
            e = nn.Dense(self.embedding_dim, dtype=self.dtype,
                         name=f"linear_c{i + 1}")(feats[i].astype(self.dtype))
            if e.shape[1:3] != tgt:
                e = resize_bilinear(e.astype(jnp.float32), tgt).astype(self.dtype)
            embs.append(e)
        x = jnp.concatenate(embs, axis=-1)
        x = nn.Conv(self.embedding_dim, (1, 1), use_bias=False,
                    dtype=self.dtype, name="linear_fuse")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32, name="fuse_bn")(x)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return nn.Conv(self.num_classes, (1, 1), dtype=jnp.float32,
                       name="linear_pred")(x)


class SegFormer(nn.Module):
    """MiT backbone + SegFormerHead: logits at the stage-1 (1/4) grid.

    The natural pairing the reference gestures at with its 'Segformer'
    decoder string (models/__init__.py:20) but never wires up."""

    num_classes: int
    backbone: str = "mit_b1"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        feats = MixVisionTransformer(
            MIT_CONFIGS[self.backbone], self.dtype, name="encoder"
        )(x, train=train)
        return SegFormerHead(self.num_classes, dtype=self.dtype,
                             name="decoder")(feats, train=train)
