"""ResNet backbones for the DeepLab zoo, TPU-native (flax, NHWC).

Two distinct ResNet flavors exist in the reference and are kept distinct
here because their pretrained-weight layouts differ:

  * ``MSRAResNet`` — the Kazuto-Nakashima DeepLab backbone
    (/root/reference/models/deeplabs/resnet.py:26-122): stride on the FIRST
    1x1 conv of each bottleneck (original MSRA layout), 7x7 stem +
    ceil-mode maxpool, BN momentum 0.001. Used by DeepLabV1/V2/V3/V3+.
  * ``ResNetD`` — the BECO backbone
    (/root/reference/models/res/modules/backbones/resnet.py:182-384):
    torchvision-style stride-on-3x3 bottleneck, deep 3-conv stem (type C)
    and avg-pool downsample shortcuts (type D), contract_dilation /
    multi-grid options. Used by the BECO DeepLabV3+.

Both are DEAD in the reference's live pipeline (factory branches commented
at models/__init__.py:25-75); rebuilt as working families.

TPU notes: NHWC conv layouts; BatchNorm statistics are per-shard by design
(the reference's 2-GPU DDP also ran per-replica BN except the BECO path's
SyncBN — callers that need cross-replica stats wrap the train step's BN
update in a mesh psum, which XLA fuses; at CoSA's batch sizes per-shard BN
matches the reference's effective behavior). MaxPool ceil-mode is emulated
with explicit edge padding so shapes match torch exactly.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp


class ConvBN(nn.Module):
    """conv + BN (+ optional ReLU) — reference _ConvBnReLU
    (deeplabs/resnet.py:26-47)."""

    features: int
    kernel: int
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    relu: bool = True
    bn_momentum: float = 0.999  # torch momentum 1-0.999 => decay 0.999
    groups: int = 1
    use_bias: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = nn.Conv(
            self.features, (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=((self.padding, self.padding), (self.padding, self.padding)),
            kernel_dilation=(self.dilation, self.dilation),
            feature_group_count=self.groups,
            use_bias=self.use_bias, dtype=self.dtype, name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=self.bn_momentum,
            epsilon=1e-5, dtype=jnp.float32, name="bn",
        )(x)
        return nn.relu(x) if self.relu else x


def max_pool_ceil(x: jnp.ndarray, window: int, stride: int, padding: int) -> jnp.ndarray:
    """torch MaxPool2d(window, stride, padding, ceil_mode=True), NHWC."""
    h, w = x.shape[1], x.shape[2]
    def extra(n):
        # ceil-mode adds up to (stride-1) implicit -inf pixels on the far edge
        out = -(-(n + 2 * padding - window) // stride) + 1
        return (out - 1) * stride + window - (n + 2 * padding)
    pads = ((0, 0), (padding, padding + extra(h)), (padding, padding + extra(w)), (0, 0))
    x = jnp.pad(x, pads, constant_values=-jnp.inf)
    return nn.max_pool(x, (window, window), strides=(stride, stride))


def max_pool_floor(x: jnp.ndarray, window: int, stride: int, padding: int) -> jnp.ndarray:
    """torch MaxPool2d(window, stride, padding) — default floor mode, NHWC.
    flax pads with -inf, matching torch's padded-max semantics."""
    return nn.max_pool(
        x, (window, window), strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
    )


# ---------------------------------------------------------------------------
# Flavor 1: MSRA / Kazuto DeepLab backbone (deeplabs/resnet.py)
# ---------------------------------------------------------------------------


class MSRABottleneck(nn.Module):
    """_Bottleneck (deeplabs/resnet.py:49-70): stride on the reduce 1x1."""

    out_ch: int
    stride: int
    dilation: int
    downsample: bool
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        mid = self.out_ch // 4
        h = ConvBN(mid, 1, self.stride, 0, 1, True, dtype=self.dtype,
                   name="reduce")(x, train)
        h = ConvBN(mid, 3, 1, self.dilation, self.dilation, True,
                   dtype=self.dtype, name="conv3x3")(h, train)
        h = ConvBN(self.out_ch, 1, 1, 0, 1, False, dtype=self.dtype,
                   name="increase")(h, train)
        sc = (
            ConvBN(self.out_ch, 1, self.stride, 0, 1, False,
                   dtype=self.dtype, name="shortcut")(x, train)
            if self.downsample else x
        )
        return nn.relu(h + sc)


class MSRAResLayer(nn.Module):
    """_ResLayer with optional multi-grid (deeplabs/resnet.py:73-97)."""

    n_layers: int
    out_ch: int
    stride: int
    dilation: int
    multi_grids: Optional[Sequence[int]] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        grids = self.multi_grids or [1] * self.n_layers
        for i in range(self.n_layers):
            x = MSRABottleneck(
                self.out_ch,
                self.stride if i == 0 else 1,
                self.dilation * grids[i],
                downsample=(i == 0),
                dtype=self.dtype,
                name=f"block{i + 1}",
            )(x, train)
        return x


class MSRAStem(nn.Module):
    """_Stem: 7x7/2 conv + ceil-mode 3x3/2 maxpool (deeplabs/resnet.py:100-107)."""

    out_ch: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = ConvBN(self.out_ch, 7, 2, 3, 1, True, dtype=self.dtype,
                   name="conv1")(x, train)
        return max_pool_ceil(x, 3, 2, 1)


# ---------------------------------------------------------------------------
# Flavor 2: BECO ResNet-B/C/D (res/modules/backbones/resnet.py)
# ---------------------------------------------------------------------------


class DBottleneck(nn.Module):
    """torchvision-style bottleneck, stride on the 3x3
    (res/modules/backbones/resnet.py:128-180). ``avg_down`` adds the
    ResNet-D 2x2 avg-pool before the shortcut 1x1."""

    planes: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    avg_down: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        out_ch = self.planes * 4
        h = ConvBN(self.planes, 1, 1, 0, 1, True, dtype=self.dtype,
                   name="conv1")(x, train)
        h = ConvBN(self.planes, 3, self.stride, self.dilation, self.dilation,
                   True, dtype=self.dtype, name="conv2")(h, train)
        h = ConvBN(out_ch, 1, 1, 0, 1, False, dtype=self.dtype,
                   name="conv3")(h, train)
        if self.downsample:
            sc = x
            if self.avg_down and self.stride != 1:
                sc = nn.avg_pool(sc, (2, 2), strides=(2, 2))
                sc_stride = 1
            else:
                sc_stride = self.stride
            sc = ConvBN(out_ch, 1, sc_stride, 0, 1, False, dtype=self.dtype,
                        name="shortcut")(sc, train)
        else:
            sc = x
        return nn.relu(h + sc)


class ResNetD(nn.Module):
    """BECO get_convnet equivalent (res/modules/backbones/resnet.py:341-384).

    ``variety`` resnet-B/C/D; output_stride 8 or 16; multi-grid on layer4.
    Returns a dict {0: stem_out, 1..4: layer outs} restricted to
    ``out_indices`` plus always 4 (like the reference's forward dict)."""

    depth: int = 101
    variety: str = "resnet-D"
    output_stride: int = 16
    out_indices: Tuple[int, ...] = (1, 4)
    contract_dilation: bool = False
    multi_grid: bool = True
    dtype: Any = jnp.float32

    LAYERS = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3), 152: (3, 8, 36, 3),
              26: (1, 1, 1, 1)}  # 26 = tiny test entry

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        assert self.variety in ("resnet-B", "resnet-C", "resnet-D")
        type_c = self.variety in ("resnet-C", "resnet-D")
        avg_down = self.variety == "resnet-D"
        if self.output_stride == 16:
            strides, dilations = (1, 2, 2, 1), (1, 1, 1, 2)
        else:
            strides, dilations = (1, 2, 1, 1), (1, 1, 2, 4)
        layers = self.LAYERS[self.depth]
        grids = [1, 2, 4] if self.multi_grid else None

        if type_c:  # deep stem (HeadLayer_C, :53-81)
            x = ConvBN(32, 3, 2, 1, 1, True, dtype=self.dtype, name="stem1")(x, train)
            x = ConvBN(32, 3, 1, 1, 1, True, dtype=self.dtype, name="stem2")(x, train)
            x = ConvBN(64, 3, 1, 1, 1, True, dtype=self.dtype, name="stem3")(x, train)
        else:
            x = ConvBN(64, 7, 2, 3, 1, True, dtype=self.dtype, name="stem1")(x, train)
        # reference res/modules/backbones/resnet.py:42,66: default floor mode
        x = max_pool_floor(x, 3, 2, 1)

        out = {0: x}
        in_planes = 64
        for li, (planes, n, stride, dil) in enumerate(
            zip((64, 128, 256, 512), layers, strides, dilations), start=1
        ):
            if dil != 1:
                stride = 1
            last = li == 4 and grids is not None
            for bi in range(n):
                if last:
                    bdil = dil * grids[min(bi, len(grids) - 1)]
                elif bi == 0 and self.contract_dilation and dil > 1:
                    bdil = dil // 2
                else:
                    bdil = dil
                x = DBottleneck(
                    planes,
                    stride=stride if bi == 0 else 1,
                    dilation=bdil,
                    downsample=(bi == 0 and (stride != 1 or in_planes != planes * 4)),
                    avg_down=avg_down,
                    dtype=self.dtype,
                    name=f"layer{li}_block{bi + 1}",
                )(x, train)
                in_planes = planes * 4
            out[li] = x
        return out
