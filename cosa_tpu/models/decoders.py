"""Segmentation decoder heads.

``LargeFOV`` — DeepLab-LargeFOV head, reference
models/decoder/conv_head.py:11-41 (two 3x3 dilated(5) 512-ch convs + 1x1,
all bias-free). NHWC here; dilation-5 3x3 convs map cleanly onto XLA's
convolution emitter.

``MaskTransformer`` — Segmenter-style mask transformer, reference
models/decoder/maskformer_head.py:99-164 (2 blocks over patch+class tokens,
normalized patch x class dot-product masks).
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class LargeFOV(nn.Module):
    out_planes: int
    embed_dim: int = 512
    dilation: int = 5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: (B, h, w, D) -> (B, h, w, out_planes) logits."""
        d = self.dilation
        conv = lambda feats, name: nn.Conv(
            feats,
            kernel_size=(3, 3),
            padding=((d, d), (d, d)),
            kernel_dilation=(d, d),
            use_bias=False,
            dtype=self.dtype,
            name=name,
        )
        x = nn.relu(conv(self.embed_dim, "conv6")(x.astype(self.dtype)))
        x = nn.relu(conv(self.embed_dim, "conv7")(x))
        x = nn.Conv(
            self.out_planes,
            kernel_size=(1, 1),
            use_bias=False,
            dtype=self.dtype,
            name="conv8",
        )(x)
        return x


class _DecBlock(nn.Module):
    heads: int
    mlp_dim: int
    ln_eps: float = 1e-6
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, n, c = x.shape
        h, hd = self.heads, c // self.heads
        y = nn.LayerNorm(epsilon=self.ln_eps, dtype=jnp.float32, name="norm1")(x)
        qkv = nn.Dense(3 * c, dtype=self.dtype, name="qkv")(y.astype(self.dtype))
        qkv = qkv.reshape(b, n, 3, h, hd)
        q, k, v = qkv[:, :, 0] * hd ** -0.5, qkv[:, :, 1], qkv[:, :, 2]
        s = jnp.einsum("bqhd,bkhd->bhqk", q, k)
        p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(self.dtype)
        o = jnp.einsum("bhqk,bkhd->bqhd", p, v).reshape(b, n, c)
        x = x + nn.Dense(c, dtype=self.dtype, name="proj")(o)
        y = nn.LayerNorm(epsilon=self.ln_eps, dtype=jnp.float32, name="norm2")(x)
        y = nn.Dense(self.mlp_dim, dtype=self.dtype, name="fc1")(y.astype(self.dtype))
        # exact erf gelu at f32, tanh under bf16 (see models/vit.py Mlp: the
        # tanh deviation is below bf16 quantization and erf is VPU-expensive)
        y = nn.gelu(y, approximate=(self.dtype == jnp.bfloat16))
        y = nn.Dense(c, dtype=self.dtype, name="fc2")(y)
        return x + y


class MaskTransformer(nn.Module):
    n_cls: int
    patch_size: int
    d_model: int
    n_layers: int = 2
    # torch-default LayerNorm eps: the reference head builds plain
    # nn.LayerNorm (maskformer_head.py:73-76,133-134), unlike the ViT
    # encoder's 1e-6
    ln_eps: float = 1e-5
    # MultiMaskTransformer (maskformer_head.py:167-235, DEAD in the
    # reference): also emit masks from the PENULTIMATE block through the
    # same shared mask head -> returns (masks_pen, masks_final)
    multi: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, tokens: jnp.ndarray, im_size: Tuple[int, int]
    ) -> jnp.ndarray:
        """tokens: (B, N, D_enc) patch tokens -> (B, gh, gw, n_cls) masks
        (a pair of them when ``multi``)."""
        b, n, _ = tokens.shape
        dm = self.d_model
        gh = im_size[0] // self.patch_size
        gw = n // gh
        x = nn.Dense(dm, dtype=self.dtype, name="proj_dec")(
            tokens.astype(self.dtype)
        )
        cls_emb = self.param(
            "cls_emb",
            nn.initializers.truncated_normal(0.02),
            (1, self.n_cls, dm),
            jnp.float32,
        )
        x = jnp.concatenate(
            [x, jnp.broadcast_to(cls_emb, (b, self.n_cls, dm)).astype(self.dtype)],
            axis=1,
        )
        for i in range(self.n_layers - 1):
            x = _DecBlock(
                heads=dm // 64,
                mlp_dim=4 * dm,
                ln_eps=self.ln_eps,
                dtype=self.dtype,
                name=f"blocks_{i}",
            )(x)
        x_pen = x
        x = _DecBlock(
            heads=dm // 64,
            mlp_dim=4 * dm,
            ln_eps=self.ln_eps,
            dtype=self.dtype,
            name=f"blocks_{self.n_layers - 1}",
        )(x_pen)

        # the mask head is SHARED between taps (maskformer_head.py:214-219
        # applies the same decoder_norm/projections/mask_norm to both)
        decoder_norm = nn.LayerNorm(
            epsilon=self.ln_eps, dtype=jnp.float32, name="decoder_norm")
        mask_norm = nn.LayerNorm(
            epsilon=self.ln_eps, dtype=jnp.float32, name="mask_norm")
        proj_patch = self.param(
            "proj_patch",
            nn.initializers.normal(dm ** -0.5),
            (dm, dm),
            jnp.float32,
        )
        proj_classes = self.param(
            "proj_classes",
            nn.initializers.normal(dm ** -0.5),
            (dm, dm),
            jnp.float32,
        )

        def cls_forward(xt: jnp.ndarray) -> jnp.ndarray:
            xt = decoder_norm(xt).astype(self.dtype)
            patches, cls_feat = xt[:, : -self.n_cls], xt[:, -self.n_cls:]
            patches = patches @ proj_patch.astype(self.dtype)
            cls_feat = cls_feat @ proj_classes.astype(self.dtype)
            patches = patches / (
                jnp.linalg.norm(patches.astype(jnp.float32), axis=-1,
                                keepdims=True)
            ).astype(self.dtype)
            cls_feat = cls_feat / (
                jnp.linalg.norm(cls_feat.astype(jnp.float32), axis=-1,
                                keepdims=True)
            ).astype(self.dtype)
            masks = jnp.einsum("bnd,bcd->bnc", patches, cls_feat)
            masks = mask_norm(masks.astype(jnp.float32))
            return masks.reshape(b, gh, gw, self.n_cls)

        if self.multi:
            return cls_forward(x_pen), cls_forward(x)
        return cls_forward(x)
