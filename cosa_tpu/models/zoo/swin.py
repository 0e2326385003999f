"""Swin Transformer backbone + SwinNetwork (full CoSA co-training interface),
TPU-native.

Functional twins of the reference's vestigial 'swinend2end' branch
(/root/reference/models/mmsegmodel/__init__.py:77-350: ``MMSWIN`` wraps a
patched mmseg SwinTransformer_ that returns per-block feature maps, adds
the CoSA CAM/cls/seg heads; swin_{t,s,b}.py configs) — DEAD in the live
pipeline (factory branch commented at models/__init__.py:73-75), rebuilt
here mmcv/mmseg-free as a working family. Because Swin is LayerNorm-only
(no BatchNorm), ``SwinNetwork`` plugs straight into the existing
co-training TrainState and train step.

TPU-first notes:
  * NHWC throughout; window partition is reshape+transpose (no gathers).
  * the shifted-window attention mask and the relative-position index are
    computed with numpy at trace time and folded as constants per static
    input shape — no device-side index arithmetic.
  * cyclic shift is jnp.roll (an XLA collective-free slice splice).
  * window padding: inputs are padded up to window multiples and pad keys
    are masked with the same additive-mask path used for shifted windows.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from cosa_tpu.models.decoders import LargeFOV


@dataclasses.dataclass(frozen=True)
class SwinConfig:
    embed_dim: int = 96
    depths: Tuple[int, ...] = (2, 2, 6, 2)
    num_heads: Tuple[int, ...] = (3, 6, 12, 24)
    window: int = 7
    patch_size: int = 4
    mlp_ratio: int = 4
    qkv_bias: bool = True
    drop_path_rate: float = 0.1
    ln_eps: float = 1e-5  # torch nn.LayerNorm default (mmcv 'LN')


# mmsegmodel/swin_{t,s,b}.py configs
SWIN_CONFIGS = {
    "swin-t": SwinConfig(),
    "swin-s": SwinConfig(depths=(2, 2, 18, 2)),
    "swin-b": SwinConfig(embed_dim=128, depths=(2, 2, 18, 2),
                         num_heads=(4, 8, 16, 32), drop_path_rate=0.3),
    "swin_tiny_test": SwinConfig(embed_dim=16, depths=(1, 1, 1, 1),
                                 num_heads=(1, 2, 4, 8), window=4,
                                 drop_path_rate=0.0),
}


def _rel_pos_index(w: int) -> np.ndarray:
    """(w^2, w^2) index into the (2w-1)^2 relative-position bias table."""
    coords = np.stack(np.meshgrid(np.arange(w), np.arange(w), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]  # (2, w^2, w^2)
    rel = rel.transpose(1, 2, 0) + (w - 1)
    return (rel[..., 0] * (2 * w - 1) + rel[..., 1]).astype(np.int32)


def _shift_mask(hp: int, wp: int, w: int, shift: int,
                h_valid: int, w_valid: int) -> np.ndarray:
    """Additive (nW, w^2, w^2) mask: -1e4 across shifted-window region
    boundaries AND for padded key positions; 0 elsewhere."""
    ids = np.zeros((hp, wp), np.int32)
    if shift > 0:
        cnt = 0
        slices = (slice(0, -w), slice(-w, -shift), slice(-shift, None))
        for hs in slices:
            for ws in slices:
                ids[hs, ws] = cnt
                cnt += 1
    # padding keys: the canvas the windows are cut from is POST-roll (the
    # region ids above are constructed in post-roll semantics, like the
    # official Swin img_mask), so the pre-roll pad band [h_valid:, :] must
    # be rolled by (-shift, -shift) along with the data before marking
    pad = np.zeros((hp, wp), bool)
    pad[h_valid:, :] = True
    pad[:, w_valid:] = True
    if shift > 0:
        pad = np.roll(pad, (-shift, -shift), axis=(0, 1))
    ids[pad] = -1  # padding region: always masked as keys
    win = ids.reshape(hp // w, w, wp // w, w).transpose(0, 2, 1, 3)
    win = win.reshape(-1, w * w)
    same = win[:, :, None] == win[:, None, :]
    key_pad = (win == -1)[:, None, :]
    mask = np.where(same & ~key_pad, 0.0, -1e4).astype(np.float32)
    return mask


class WindowAttention(nn.Module):
    num_heads: int
    window: int
    qkv_bias: bool
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xw: jnp.ndarray, mask: Optional[jnp.ndarray]) -> jnp.ndarray:
        """xw: (B*nW, w^2, C); mask: (nW, w^2, w^2) additive or None."""
        bn, n, c = xw.shape
        h, hd, w = self.num_heads, c // self.num_heads, self.window
        qkv = nn.Dense(3 * c, use_bias=self.qkv_bias, dtype=self.dtype,
                       name="qkv")(xw).reshape(bn, n, 3, h, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        s = jnp.einsum("bqhd,bkhd->bhqk", q * hd ** -0.5, k).astype(jnp.float32)
        table = self.param(
            "rel_pos_bias",
            nn.initializers.truncated_normal(0.02),
            ((2 * w - 1) ** 2, h), jnp.float32,
        )
        bias = table[jnp.asarray(_rel_pos_index(w))]  # (w^2, w^2, h)
        s = s + bias.transpose(2, 0, 1)[None]
        if mask is not None:
            nw = mask.shape[0]
            s = s.reshape(bn // nw, nw, h, n, n) + mask[None, :, None]
            s = s.reshape(bn, h, n, n)
        p = jax.nn.softmax(s, axis=-1).astype(self.dtype)
        o = jnp.einsum("bhqk,bkhd->bqhd", p, v).reshape(bn, n, c)
        return nn.Dense(c, dtype=self.dtype, name="proj")(o)


class SwinBlock(nn.Module):
    num_heads: int
    window: int
    shift: int
    mlp_ratio: int
    qkv_bias: bool
    drop_path: float
    ln_eps: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        b, hh, ww, c = x.shape
        w = self.window
        hp, wp = -(-hh // w) * w, -(-ww // w) * w
        shift = self.shift if min(hp, wp) > w else 0  # single window: no shift
        dp = nn.Dropout(self.drop_path, broadcast_dims=(1, 2, 3),
                        deterministic=not train or self.drop_path == 0.0)

        y = nn.LayerNorm(epsilon=self.ln_eps, dtype=jnp.float32,
                         name="norm1")(x).astype(self.dtype)
        if (hp, wp) != (hh, ww):
            y = jnp.pad(y, ((0, 0), (0, hp - hh), (0, wp - ww), (0, 0)))
        if shift:
            y = jnp.roll(y, (-shift, -shift), axis=(1, 2))
        # windows: (B, nH, w, nW, w, C) -> (B*nWin, w^2, C)
        y = y.reshape(b, hp // w, w, wp // w, w, c)
        y = y.transpose(0, 1, 3, 2, 4, 5).reshape(-1, w * w, c)
        need_mask = shift > 0 or (hp, wp) != (hh, ww)
        mask = (
            jnp.asarray(_shift_mask(hp, wp, w, shift, hh, ww))
            if need_mask else None
        )
        y = WindowAttention(self.num_heads, w, self.qkv_bias, self.dtype,
                            name="attn")(y, mask)
        y = y.reshape(b, hp // w, wp // w, w, w, c)
        y = y.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, c)
        if shift:
            y = jnp.roll(y, (shift, shift), axis=(1, 2))
        y = y[:, :hh, :ww]
        x = x + dp(y)

        y = nn.LayerNorm(epsilon=self.ln_eps, dtype=jnp.float32,
                         name="norm2")(x).astype(self.dtype)
        y = nn.Dense(c * self.mlp_ratio, dtype=self.dtype, name="fc1")(y)
        y = nn.gelu(y, approximate=(self.dtype == jnp.bfloat16))
        y = nn.Dense(c, dtype=self.dtype, name="fc2")(y)
        return x + dp(y)


class PatchMerging(nn.Module):
    """2x2 space-to-depth + LayerNorm + Dense 4C->2C (mmcv PatchMerging)."""

    ln_eps: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, hh, ww, c = x.shape
        if hh % 2 or ww % 2:
            x = jnp.pad(x, ((0, 0), (0, hh % 2), (0, ww % 2), (0, 0)))
            hh, ww = x.shape[1], x.shape[2]
        x = x.reshape(b, hh // 2, 2, ww // 2, 2, c)
        # mmcv PatchMerging flattens each 2x2 block with nn.Unfold, whose
        # feature order is CHANNEL-major: index = c*4 + (row*2 + col). Kept
        # identical so mmseg Swin checkpoints map 1:1 onto `reduction`.
        x = x.transpose(0, 1, 3, 5, 2, 4).reshape(b, hh // 2, ww // 2, 4 * c)
        x = nn.LayerNorm(epsilon=self.ln_eps, dtype=jnp.float32, name="norm")(x)
        return nn.Dense(2 * c, use_bias=False, dtype=self.dtype,
                        name="reduction")(x.astype(self.dtype))


class SwinBackbone(nn.Module):
    """4-stage Swin; returns (normed stage outs per out_indices,
    per-block NHWC maps) like the reference's SwinTransformer_
    (mmsegmodel/__init__.py:297-320)."""

    cfg: SwinConfig
    out_indices: Tuple[int, ...] = (0, 1, 2, 3)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, train: bool = False
    ) -> Tuple[List[jnp.ndarray], List[jnp.ndarray]]:
        c = self.cfg
        p = c.patch_size
        b, hh, ww, _ = x.shape
        if hh % p or ww % p:  # mmcv 'corner' padding
            x = jnp.pad(x, ((0, 0), (0, -hh % p), (0, -ww % p), (0, 0)))
        x = nn.Conv(c.embed_dim, (p, p), strides=(p, p), dtype=self.dtype,
                    name="patch_embed")(x.astype(self.dtype))
        x = nn.LayerNorm(epsilon=c.ln_eps, dtype=jnp.float32,
                         name="patch_norm")(x).astype(self.dtype)

        total = sum(c.depths)
        dpr = [c.drop_path_rate * i / max(total - 1, 1) for i in range(total)]
        outs, blocks = [], []
        cur = 0
        for si, depth in enumerate(c.depths):
            for bi in range(depth):
                x = SwinBlock(
                    c.num_heads[si], c.window,
                    0 if bi % 2 == 0 else c.window // 2,
                    c.mlp_ratio, c.qkv_bias, dpr[cur + bi], c.ln_eps,
                    self.dtype, name=f"stage{si}_block{bi}",
                )(x, train)
                blocks.append(x)
            cur += depth
            if si in self.out_indices:
                outs.append(
                    nn.LayerNorm(epsilon=c.ln_eps, dtype=jnp.float32,
                                 name=f"norm{si}")(x).astype(self.dtype)
                )
            if si < len(c.depths) - 1:
                x = PatchMerging(c.ln_eps, self.dtype,
                                 name=f"merge{si}")(x)
        return outs, blocks


class SwinNetwork(nn.Module):
    """MMSWIN equivalent (mmsegmodel/__init__.py:77-175): Swin backbone +
    LargeFOV seg decoder + bias-free CAM/cls heads on the last stage and on
    the ``aux_layer``-indexed block (negative index into the flat per-block
    list, whose channel widths follow the stage schedule).

    Returns the same dict as ``CoSANetwork`` so the co-training train step,
    TTA fuse, and eval engine run unchanged. The reference's MMSWIN accepts
    but ignores ``detach``; here the same 4-way routing as CoSANetwork is
    honored ('none' == reference behavior)."""

    num_classes: int
    backbone: str = "swin-t"
    aux_layer: int = -3
    isgap: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, detach: str = "none",
                 train: bool = False) -> Dict[str, jnp.ndarray]:
        """``train=True`` activates the backbone's stochastic depth (the
        reference MMSWIN trains with drop_path 0.1-0.3; torch .train() makes
        DropPath live) — requires a 'dropout' rng. The teacher/eval path
        stays at the deterministic default."""
        assert detach in ("all", "feat", "none", "cls")
        cfg = SWIN_CONFIGS[self.backbone]
        outs, blocks = SwinBackbone(cfg, (3,), self.dtype,
                                    name="backbone")(x, train=train)
        fmap = outs[-1]
        fmap_aux = blocks[self.aux_layer]
        d, d_aux = fmap.shape[-1], fmap_aux.shape[-1]

        seg = LargeFOV(self.num_classes, dtype=self.dtype,
                       name="decoder")(fmap)
        w_cls = self.param("classifier", nn.initializers.lecun_normal(),
                           (d, self.num_classes - 1), jnp.float32)
        w_aux = self.param("aux_classifier", nn.initializers.lecun_normal(),
                           (d_aux, self.num_classes - 1), jnp.float32)
        wc, wa = w_cls.astype(self.dtype), w_aux.astype(self.dtype)

        sg = jax.lax.stop_gradient
        if detach == "all":
            cam, cam_aux = sg(fmap @ wc), sg(fmap_aux @ wa)
        elif detach == "feat":
            cam, cam_aux = sg(fmap) @ wc, sg(fmap_aux) @ wa
        elif detach == "cls":
            cam, cam_aux = fmap @ sg(wc), fmap_aux @ sg(wa)
        else:
            cam, cam_aux = fmap @ wc, fmap_aux @ wa

        pool = jnp.mean if self.isgap else jnp.max
        f32 = lambda t: t.astype(jnp.float32)
        return dict(
            cls=f32(pool(fmap, axis=(1, 2)) @ wc),
            cls_aux=f32(pool(fmap_aux, axis=(1, 2)) @ wa),
            feat=fmap,
            seg=f32(seg),
            cam=f32(cam),
            cam_aux=f32(cam_aux),
        )
