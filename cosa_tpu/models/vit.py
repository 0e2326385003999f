"""Vision Transformer encoder (flax), TPU-native.

Functional twin of the reference's modified-timm encoder
(/root/reference/models/vit/vit.py:219-330): per-block token taps, a *frozen*
positional embedding that is bicubic-resized to the input resolution at every
forward (vit.py:236-237, 288-291), and a ``(cls_token, normed_tokens,
aux_tokens)`` triple return with the aux tap at ``aux_layer`` (vit.py:321).

TPU-first differences from the reference:
  * NHWC / (B, N, D) layouts throughout; patch embedding is one strided conv
    that XLA lowers straight onto the MXU.
  * all matmuls run in a configurable compute dtype (bf16 by default on TPU)
    with f32 parameters and f32 LayerNorms; the reference is f32-only.
  * attention is a single fused kernel (Pallas flash attention on TPU,
    einsum fallback elsewhere) instead of materialized (N x N) score tensors
    (reference vit.py:119-137).
  * the pos-embed resize happens at trace time per static input shape, so
    each compiled shape folds its interpolation matrices as constants.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from cosa_tpu.ops.resize import resize_bicubic


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    ln_eps: float = 1e-6
    base_img_size: int = 224  # grid the pretrained pos-embed was trained at
    # DeiT distillation token (reference models/vit/deit.py:21-56:
    # DistilledVisionTransformer prepends [dist, cls] and its pos-embed has
    # num_patches+2 rows). The dist token rides along; CoSA's heads read only
    # the CLS token + patch tokens, matching the reference's x[:, 1]/x[:, 2:].
    distilled: bool = False


# registry mirroring the reference's constructor zoo (models/vit/vit.py:342+
# and the DeiT zoo models/vit/deit.py:69-192); tiny entries keep tests fast.
BACKBONES = {
    "vit_base_patch16_224": ViTConfig(),
    "vit_large_patch16_224": ViTConfig(embed_dim=1024, depth=24, num_heads=16),
    "vit_small_patch16_224": ViTConfig(
        embed_dim=384, depth=12, num_heads=6, qkv_bias=True
    ),
    "vit_tiny_test": ViTConfig(embed_dim=64, depth=3, num_heads=4, base_img_size=64),
    # DeiT variants (deit.py:69-107): plain ones are ViTs at DeiT widths
    "deit_tiny_patch16_224": ViTConfig(embed_dim=192, depth=12, num_heads=3),
    "deit_small_patch16_224": ViTConfig(embed_dim=384, depth=12, num_heads=6),
    "deit_base_patch16_224": ViTConfig(),
    "deit_base_patch16_384": ViTConfig(base_img_size=384),
    # distilled variants (deit.py:112-192)
    "deit_tiny_distilled_patch16_224": ViTConfig(
        embed_dim=192, depth=12, num_heads=3, distilled=True
    ),
    "deit_small_distilled_patch16_224": ViTConfig(
        embed_dim=384, depth=12, num_heads=6, distilled=True
    ),
    "deit_base_distilled_patch16_224": ViTConfig(distilled=True),
    "deit_base_distilled_patch16_384": ViTConfig(
        base_img_size=384, distilled=True
    ),
    "deit_tiny_test_distilled": ViTConfig(
        embed_dim=64, depth=3, num_heads=4, base_img_size=64, distilled=True
    ),
}


class Attention(nn.Module):
    """Multi-head self-attention with a fused softmax(QK^T)V path.

    Reference: models/vit/vit.py:105-137. The reference materializes the
    full attention matrix in f32; here scores never leave registers/VMEM
    when the Pallas kernel is active. ``quant`` switches the qkv/proj
    projections to dynamic int8 (models/quant.py; no-grad teacher only).
    """

    num_heads: int
    qkv_bias: bool = True
    dtype: Any = jnp.float32
    use_flash: bool = False
    n_valid: Optional[int] = None  # tokens beyond this index are padding
    quant: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, n, c = x.shape
        h = self.num_heads
        hd = c // h
        nv = self.n_valid if (self.n_valid and self.n_valid < n) else None
        if self.quant:
            from cosa_tpu.models.quant import QuantDense as _Dense
        else:
            _Dense = nn.Dense
        qkv = _Dense(
            3 * c, use_bias=self.qkv_bias, dtype=self.dtype, name="qkv"
        )(x)
        qkv = qkv.reshape(b, n, 3, h, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (b, n, h, hd)
        if self.use_flash:
            from cosa_tpu.kernels.attention import flash_attention

            o = flash_attention(q, k, v, scale=hd ** -0.5, n_valid=nv)
        else:
            q = q * (hd ** -0.5)
            s = jnp.einsum("bqhd,bkhd->bhqk", q, k)
            if nv is not None:  # mask padded keys
                key_ok = jnp.arange(n) < nv
                s = jnp.where(key_ok[None, None, None, :], s, -1e30)
            p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(self.dtype)
            o = jnp.einsum("bhqk,bkhd->bqhd", p, v)
        o = o.reshape(b, n, c)
        return _Dense(c, dtype=self.dtype, name="proj")(o)


class PatchEmbed(nn.Module):
    """Non-overlapping patch embedding as unfold + one MXU matmul.

    A stride-16 16x16 conv (the reference's PatchEmbed, models/vit/vit.py)
    lowers to a convolution fusion that runs at ~12 GFLOP/s on v5e (profiled
    ~3 ms/step across the TTA scales); the same op as an explicit
    space-to-depth reshape + (N, 768) @ (768, D) dot runs at matmul rate.
    Param layout stays flax-Conv HWIO ``kernel (P, P, 3, D)`` + ``bias`` so
    checkpoint conversion (models/convert.py) is untouched.
    """

    embed_dim: int
    patch_size: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        p = self.patch_size
        b, h, w, c = x.shape
        gh, gw = h // p, w // p
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (p, p, c, self.embed_dim),
            jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.embed_dim,), jnp.float32
        )
        if h != gh * p or w != gw * p:
            # stride-p VALID conv semantics: trailing partial rows/cols are
            # dropped (happens for TTA scales whose size is not a multiple
            # of the patch size, e.g. 448 * 0.7 = 313)
            x = x[:, : gh * p, : gw * p]
        x = x.reshape(b, gh, p, gw, p, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, gh * gw, p * p * c)
        wmat = kernel.reshape(p * p * c, self.embed_dim).astype(self.dtype)
        return x.astype(self.dtype) @ wmat + bias.astype(self.dtype)


class Mlp(nn.Module):
    hidden: int
    dtype: Any = jnp.float32
    quant: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        d = x.shape[-1]
        if self.quant:
            from cosa_tpu.models.quant import QuantDense as _Dense
        else:
            _Dense = nn.Dense
        x = _Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        # torch nn.GELU default is the exact erf form; keep it for f32
        # (CPU/parity paths). Under bf16 use the tanh approximation: its max
        # deviation from exact (~3e-3 near |x|=2) is below bf16's own
        # quantization step there (7.8e-3), so stored activations are
        # indistinguishable — while erf's long rational polynomial costs
        # ~0.9 ms/block of VPU time at the teacher batch (measured v5e:
        # exact-gelu MLP 2.54 ms vs tanh 2.03 vs no-gelu 1.79).
        x = nn.gelu(x, approximate=(self.dtype == jnp.bfloat16))
        x = _Dense(d, dtype=self.dtype, name="fc2")(x)
        return x


class Block(nn.Module):
    num_heads: int
    mlp_ratio: float
    qkv_bias: bool
    ln_eps: float
    dtype: Any = jnp.float32
    use_flash: bool = False
    n_valid: Optional[int] = None
    quant: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        d = x.shape[-1]
        # LayerNorm in f32 for EMA-teacher stability over 32k+ steps
        y = nn.LayerNorm(epsilon=self.ln_eps, dtype=jnp.float32, name="norm1")(x)
        x = x + Attention(
            self.num_heads, self.qkv_bias, self.dtype, self.use_flash,
            self.n_valid, self.quant, name="attn"
        )(y.astype(self.dtype))
        y = nn.LayerNorm(epsilon=self.ln_eps, dtype=jnp.float32, name="norm2")(x)
        x = x + Mlp(int(d * self.mlp_ratio), self.dtype, self.quant, name="mlp")(
            y.astype(self.dtype)
        )
        return x


class VisionTransformer(nn.Module):
    cfg: ViTConfig
    aux_layer: int = -3
    dtype: Any = jnp.float32
    use_flash: bool = False
    quant: bool = False  # int8 projections (no-grad teacher TTA only)

    @nn.compact
    def __call__(
        self, x: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """x: (B, H, W, 3) float. Returns (cls_token, tokens, aux_tokens)."""
        c = self.cfg
        b, hh, ww, _ = x.shape
        gh, gw = hh // c.patch_size, ww // c.patch_size
        gs = c.base_img_size // c.patch_size

        tok = PatchEmbed(
            c.embed_dim, c.patch_size, dtype=self.dtype, name="patch_embed"
        )(x)

        # DeiT-distilled prepends [dist, cls] (deit.py:44: dist FIRST, so the
        # downstream x[:, 1]/x[:, 2:] reads stay CLS/patches); plain ViT
        # prepends [cls] only.
        npre = 2 if c.distilled else 1
        cls_token = self.param(
            "cls_token",
            nn.initializers.truncated_normal(0.02),
            (1, 1, c.embed_dim),
            jnp.float32,
        )
        prefix = [cls_token]
        if c.distilled:
            dist_token = self.param(
                "dist_token",
                nn.initializers.truncated_normal(0.02),
                (1, 1, c.embed_dim),
                jnp.float32,
            )
            prefix = [dist_token, cls_token]
        # frozen pos-embed (reference vit.py:236-237); excluded from the
        # optimizer via the "frozen" param group (train/optimizer.py) rather
        # than a requires_grad flag.
        pos_embed = self.param(
            "pos_embed",
            nn.initializers.truncated_normal(0.02),
            (1, gs * gs + npre, c.embed_dim),
            jnp.float32,
        )
        patch_pos = pos_embed[:, npre:, :].reshape(1, gs, gs, c.embed_dim)
        patch_pos = resize_bicubic(patch_pos, (gh, gw)).reshape(
            1, gh * gw, c.embed_dim
        )
        pos = jnp.concatenate([pos_embed[:, :npre, :], patch_pos], axis=1)

        tok = jnp.concatenate(
            [
                jnp.broadcast_to(
                    jnp.concatenate(prefix, axis=1), (b, npre, c.embed_dim)
                ).astype(self.dtype),
                tok,
            ],
            axis=1,
        )
        tok = tok + pos.astype(self.dtype)

        # pad the token axis to a lane multiple: CoSA's counts (197/785/1765)
        # are ragged; padding is free for the dense path (XLA flattens (B*N)
        # for matmuls) and lets the attention kernel skip per-layer pad
        # copies. Pad keys are masked inside attention via n_valid; pad rows
        # carry garbage that is sliced off before the heads.
        n_tok = gh * gw + npre
        npp = -(-n_tok // 128) * 128
        if npp != n_tok:
            tok = jnp.pad(tok, ((0, 0), (0, npp - n_tok), (0, 0)))

        aux_idx = c.depth + self.aux_layer if self.aux_layer < 0 else self.aux_layer
        aux_tokens = None
        for i in range(c.depth):
            tok = Block(
                c.num_heads,
                c.mlp_ratio,
                c.qkv_bias,
                c.ln_eps,
                self.dtype,
                self.use_flash,
                n_tok if npp != n_tok else None,
                self.quant,
                name=f"blocks_{i}",
            )(tok)
            if i == aux_idx:
                aux_tokens = tok
        tok = tok[:, :n_tok]
        tok = nn.LayerNorm(epsilon=c.ln_eps, dtype=jnp.float32, name="norm")(tok)
        tok = tok.astype(self.dtype)
        if aux_tokens is None:  # aux tap at the final (normed) layer
            aux_tokens = tok
        else:
            aux_tokens = aux_tokens[:, :n_tok]
        # CLS is the last prefix token (position npre-1: [**cls**, patches]
        # for ViT, [dist, **cls**, patches] for DeiT — deit.py:55 x[:, 1])
        return tok[:, npre - 1], tok[:, npre:], aux_tokens[:, npre:]
