"""mmseg-config model family (UPerNet-Swin, DeepLabV3/V3+ on ResNetV1c),
TPU-native and mmcv/mmseg-free.

The reference's 'mmseg' factory branch (/root/reference/models/__init__.py:71-72,
mmsegmodel/__init__.py:29-75) builds seg-only models from five mmseg config
files; it is DEAD in the live pipeline and depends on external mmseg/mmcv.
Here the same five configs are first-class flax models built from this
repo's own blocks:

  * ``uper-swin-{t,s,b}``  (cfg_swin_{t,s,b}.py): Swin backbone
    (out_indices 0-3) + UPerHead (PPM pool scales 1/2/3/6, 512 ch) +
    FCNHead aux on stage 2.
  * ``deeplab3``   (deeplab3.py):  ResNetV1c-101 os8 contract_dilation +
    ASPPHead (512 ch, dilations 1/12/24/36) + FCNHead aux.
  * ``deeplab3p``  (deeplab3p.py): same trunk + DepthwiseSeparableASPPHead
    (c1 48-ch skip) + FCNHead aux.

All heads emit logits at their native grid (mmseg upsamples in the loss);
``aux=True`` additionally returns the FCN auxiliary logits, mirroring
mmseg's auxiliary_head (loss_weight 0.4 is the caller's business).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from cosa_tpu.models.zoo.deeplab import DepthwiseSeparableConv
from cosa_tpu.models.zoo.resnet import ConvBN, ResNetD
from cosa_tpu.models.zoo.swin import SWIN_CONFIGS, SwinBackbone
from cosa_tpu.ops.resize import resize_bilinear


def _up(x: jnp.ndarray, hw: Tuple[int, int]) -> jnp.ndarray:
    if (x.shape[1], x.shape[2]) == hw:
        return x
    return resize_bilinear(x.astype(jnp.float32), hw).astype(x.dtype)


def _adaptive_pool_matrix(n: int, s: int) -> jnp.ndarray:
    """(s, n) row-stochastic matrix reproducing torch AdaptiveAvgPool2d bins
    (bin i averages rows floor(i*n/s) .. ceil((i+1)*n/s)-1); built from
    numpy at trace time so it folds into an MXU matmul constant."""
    import numpy as np

    m = np.zeros((s, n), np.float32)
    for i in range(s):
        lo, hi = i * n // s, -(-(i + 1) * n // s)
        m[i, lo:hi] = 1.0 / (hi - lo)
    return jnp.asarray(m)


def adaptive_avg_pool(x: jnp.ndarray, s: int) -> jnp.ndarray:
    """NHWC adaptive average pool to (s, s), exact torch semantics; works
    for s larger than the grid too (overlapping duplicated bins)."""
    mh = _adaptive_pool_matrix(x.shape[1], s).astype(x.dtype)
    mw = _adaptive_pool_matrix(x.shape[2], s).astype(x.dtype)
    return jnp.einsum("ph,bhwc,qw->bpqc", mh, x, mw)


class PPM(nn.Module):
    """Pyramid pooling over the last stage (mmseg UPerHead.psp_modules)."""

    channels: int
    scales: Tuple[int, ...] = (1, 2, 3, 6)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        hw = (x.shape[1], x.shape[2])
        outs = [x]
        for i, s in enumerate(self.scales):
            p = adaptive_avg_pool(x, s)
            p = ConvBN(self.channels, 1, 1, 0, 1, True, dtype=self.dtype,
                       name=f"pool{i}")(p, train)
            outs.append(_up(p, hw))
        x = jnp.concatenate(outs, axis=-1)
        return ConvBN(self.channels, 3, 1, 1, 1, True, dtype=self.dtype,
                      name="bottleneck")(x, train)


class UPerHead(nn.Module):
    """UPerNet decode head (mmseg UPerHead): PPM top + FPN fuse at 1/4."""

    num_classes: int
    channels: int = 512
    dropout: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False) -> jnp.ndarray:
        laterals = [
            ConvBN(self.channels, 1, 1, 0, 1, True, dtype=self.dtype,
                   name=f"lateral{i}")(f, train)
            for i, f in enumerate(feats[:-1])
        ]
        laterals.append(PPM(self.channels, dtype=self.dtype,
                            name="ppm")(feats[-1], train))
        for i in range(len(laterals) - 1, 0, -1):  # top-down pathway
            laterals[i - 1] = laterals[i - 1] + _up(
                laterals[i], laterals[i - 1].shape[1:3])
        outs = [
            ConvBN(self.channels, 3, 1, 1, 1, True, dtype=self.dtype,
                   name=f"fpn{i}")(laterals[i], train)
            for i in range(len(laterals) - 1)
        ] + [laterals[-1]]
        hw = outs[0].shape[1:3]
        x = jnp.concatenate([_up(o, hw) for o in outs], axis=-1)
        x = ConvBN(self.channels, 3, 1, 1, 1, True, dtype=self.dtype,
                   name="fpn_bottleneck")(x, train)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return nn.Conv(self.num_classes, (1, 1), dtype=jnp.float32,
                       name="conv_seg")(x)


class FCNHead(nn.Module):
    """mmseg FCNHead (num_convs=1, concat_input=False)."""

    num_classes: int
    channels: int = 256
    dropout: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = ConvBN(self.channels, 3, 1, 1, 1, True, dtype=self.dtype,
                   name="conv0")(x, train)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return nn.Conv(self.num_classes, (1, 1), dtype=jnp.float32,
                       name="conv_seg")(x)


class ASPPHead(nn.Module):
    """mmseg ASPPHead: dilations (1, r1, r2, r3) + image pool, 3x3 bottleneck."""

    num_classes: int
    channels: int = 512
    rates: Tuple[int, ...] = (12, 24, 36)
    dropout: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = self._aspp(x, train)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return nn.Conv(self.num_classes, (1, 1), dtype=jnp.float32,
                       name="conv_seg")(x)

    def _aspp(self, x, train):
        outs = [ConvBN(self.channels, 1, 1, 0, 1, True, dtype=self.dtype,
                       name="aspp0")(x, train)]
        for i, r in enumerate(self.rates):
            outs.append(ConvBN(self.channels, 3, 1, r, r, True,
                               dtype=self.dtype, name=f"aspp{i + 1}")(x, train))
        pool = jnp.mean(x, axis=(1, 2), keepdims=True)
        pool = ConvBN(self.channels, 1, 1, 0, 1, True, dtype=self.dtype,
                      name="image_pool")(pool, train)
        outs.append(jnp.broadcast_to(pool, outs[0].shape))
        x = jnp.concatenate(outs, axis=-1)
        return ConvBN(self.channels, 3, 1, 1, 1, True, dtype=self.dtype,
                      name="bottleneck")(x, train)


class SepASPPHead(ASPPHead):
    """mmseg DepthwiseSeparableASPPHead: ASPP (separable atrous branches) +
    48-ch c1 skip + two separable fuse convs; logits at the c1 (1/4) grid."""

    c1_channels: int = 48

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False) -> jnp.ndarray:  # type: ignore[override]
        c1, x = feats
        outs = [ConvBN(self.channels, 1, 1, 0, 1, True, dtype=self.dtype,
                       name="aspp0")(x, train)]
        for i, r in enumerate(self.rates):
            outs.append(DepthwiseSeparableConv(
                self.channels, 3, r, r, dtype=self.dtype,
                name=f"sep_aspp{i + 1}")(x, train))
        pool = jnp.mean(x, axis=(1, 2), keepdims=True)
        pool = ConvBN(self.channels, 1, 1, 0, 1, True, dtype=self.dtype,
                      name="image_pool")(pool, train)
        outs.append(jnp.broadcast_to(pool, outs[0].shape))
        x = jnp.concatenate(outs, axis=-1)
        x = ConvBN(self.channels, 3, 1, 1, 1, True, dtype=self.dtype,
                   name="bottleneck")(x, train)
        c1 = ConvBN(self.c1_channels, 1, 1, 0, 1, True, dtype=self.dtype,
                    name="c1_bottleneck")(c1, train)
        x = _up(x, c1.shape[1:3])
        x = jnp.concatenate([x, c1], axis=-1)
        x = DepthwiseSeparableConv(self.channels, 3, 1, 1, dtype=self.dtype,
                                   name="sep_fuse1")(x, train)
        x = DepthwiseSeparableConv(self.channels, 3, 1, 1, dtype=self.dtype,
                                   name="sep_fuse2")(x, train)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return nn.Conv(self.num_classes, (1, 1), dtype=jnp.float32,
                       name="conv_seg")(x)


class UPerSwin(nn.Module):
    """'uper-swin-{t,s,b}' (cfg_swin_*.py): Swin + UPerHead (+FCN aux)."""

    num_classes: int
    backbone: str = "swin-t"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False, aux: bool = False):
        outs, _ = SwinBackbone(SWIN_CONFIGS[self.backbone], (0, 1, 2, 3),
                               self.dtype, name="backbone")(x, train)
        main = UPerHead(self.num_classes, 512, dtype=self.dtype,
                        name="decode_head")(outs, train)
        if not aux:
            return main
        a = FCNHead(self.num_classes, 256, dtype=self.dtype,
                    name="auxiliary_head")(outs[2], train)
        return main, a


class MMSegDeepLab3(nn.Module):
    """'deeplab3' (deeplab3.py): ResNetV1c-101 os8 + ASPPHead (+FCN aux)."""

    num_classes: int
    depth: int = 101
    separable: bool = False  # True = 'deeplab3p'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False, aux: bool = False):
        out = ResNetD(depth=self.depth, variety="resnet-C", output_stride=8,
                      out_indices=(1, 2, 3, 4), contract_dilation=True,
                      multi_grid=False, dtype=self.dtype,
                      name="backbone")(x, train)
        if self.separable:
            main = SepASPPHead(self.num_classes, 512, (12, 24, 36),
                               dtype=self.dtype, name="decode_head")(
                (out[1], out[4]), train)
        else:
            main = ASPPHead(self.num_classes, 512, (12, 24, 36),
                            dtype=self.dtype, name="decode_head")(out[4], train)
        if not aux:
            return main
        a = FCNHead(self.num_classes, 256, dtype=self.dtype,
                    name="auxiliary_head")(out[3], train)
        return main, a
