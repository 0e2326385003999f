"""WideResNet-38 (ResNet38d) classifier trunk + seg variant, TPU-native.

Functional twins of the reference's vestigial 'res38' branch
(/root/reference/models/res/resnet38d.py:6-227 and resnet38_seg.py:8-42;
DEAD in the live pipeline — factory branch commented at
models/__init__.py:26-30 — rebuilt as a working family).

The MXNet-converted WRN-38 uses *pre-activation* residual blocks (BN+ReLU
before every conv) with dilated stages 5-7 at output stride 8. NHWC here;
dropout inside the bottleneck blocks is deterministic unless ``train=True``
with a dropout rng (matching torch eval()/train() semantics).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax.numpy as jnp


class _Conv(nn.Module):
    features: int
    kernel: int
    stride: int = 1
    dilation: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        pad = self.dilation if self.kernel == 3 else 0
        return nn.Conv(
            self.features, (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=((pad, pad), (pad, pad)),
            kernel_dilation=(self.dilation, self.dilation),
            use_bias=False, dtype=self.dtype, name="conv",
        )(x)


class ResBlock(nn.Module):
    """Pre-activation 2-conv residual block (resnet38d.py:7-56)."""

    mid: int
    out: int
    stride: int = 1
    dilation: int = 1
    first_dilation: int = 0  # 0 -> same as dilation (reference None default)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        fd = self.first_dilation or self.dilation
        same = x.shape[-1] == self.out and self.stride == 1
        pre = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                           dtype=jnp.float32, name="bn_branch2a")(x)
        act = nn.relu(pre)
        branch1 = x if same else _Conv(self.out, 1, self.stride,
                                       dtype=self.dtype,
                                       name="conv_branch1")(act)
        b2 = _Conv(self.mid, 3, self.stride, fd, dtype=self.dtype,
                   name="conv_branch2a")(act)
        b2 = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                          dtype=jnp.float32, name="bn_branch2b1")(b2)
        b2 = _Conv(self.out, 3, 1, self.dilation, dtype=self.dtype,
                   name="conv_branch2b1")(nn.relu(b2))
        return branch1 + b2


class ResBlockBot(nn.Module):
    """Pre-activation bottleneck with dropout (resnet38d.py:58-107)."""

    out: int
    stride: int = 1
    dilation: int = 1
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        drop = nn.Dropout(self.dropout, deterministic=not train)
        act = nn.relu(nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                   dtype=jnp.float32, name="bn_branch2a")(x))
        branch1 = _Conv(self.out, 1, self.stride, dtype=self.dtype,
                        name="conv_branch1")(act)
        b2 = _Conv(self.out // 4, 1, self.stride, dtype=self.dtype,
                   name="conv_branch2a")(act)
        b2 = nn.relu(nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                  dtype=jnp.float32, name="bn_branch2b1")(b2))
        b2 = _Conv(self.out // 2, 3, 1, self.dilation, dtype=self.dtype,
                   name="conv_branch2b1")(drop(b2))
        b2 = nn.relu(nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                  dtype=jnp.float32, name="bn_branch2b2")(b2))
        b2 = _Conv(self.out, 1, 1, dtype=self.dtype,
                   name="conv_branch2b2")(drop(b2))
        return branch1 + b2


# (mid, out, stride, dilation, first_dilation) per block, reference
# resnet38d.py:131-157. A tiny width-divided variant keeps tests fast.
def _plan(w: int = 1):
    d = lambda c: max(c // w, 4)
    return [
        ("b2", d(128), d(128), 2, 1, 0), ("b2_1", d(128), d(128), 1, 1, 0),
        ("b2_2", d(128), d(128), 1, 1, 0),
        ("b3", d(256), d(256), 2, 1, 0), ("b3_1", d(256), d(256), 1, 1, 0),
        ("b3_2", d(256), d(256), 1, 1, 0),
        ("b4", d(512), d(512), 2, 1, 0), ("b4_1", d(512), d(512), 1, 1, 0),
        ("b4_2", d(512), d(512), 1, 1, 0), ("b4_3", d(512), d(512), 1, 1, 0),
        ("b4_4", d(512), d(512), 1, 1, 0), ("b4_5", d(512), d(512), 1, 1, 0),
        ("b5", d(512), d(1024), 1, 2, 1), ("b5_1", d(512), d(1024), 1, 2, 0),
        ("b5_2", d(512), d(1024), 1, 2, 0),
    ]


class WRN38Cls(nn.Module):
    """resnet38d.Net (the WRN38_cls export, res/__init__.py:2): returns
    {'conv7': post-bn7 ReLU features (4096ch, os8), 'xb7': pre-bn7}."""

    width_div: int = 1  # >1 = width-divided test variant
    depth_div: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> Dict[str, jnp.ndarray]:
        w = self.width_div
        d = lambda c: max(c // w, 4)
        x = _Conv(d(64), 3, 1, dtype=self.dtype, name="conv1a")(x)
        plan = _plan(w)
        if self.depth_div > 1:  # keep only each stage's first block
            plan = [p for p in plan if "_" not in p[0][2:]]
        for name, mid, out, stride, dil, fd in plan:
            x = ResBlock(mid, out, stride, dil, fd, dtype=self.dtype,
                         name=name)(x, train)
        x = ResBlockBot(d(2048), 1, 4, 0.3, dtype=self.dtype,
                        name="b6")(x, train)
        xb7 = ResBlockBot(d(4096), 1, 4, 0.5, dtype=self.dtype,
                          name="b7")(x, train)
        conv7 = nn.relu(nn.BatchNorm(use_running_average=not train,
                                     momentum=0.9, dtype=jnp.float32,
                                     name="bn7")(xb7))
        return {"conv7": conv7, "xb7": xb7}


class WRN38Seg(nn.Module):
    """resnet38_seg.Net (the WRN38 export): WRN38Cls trunk + two 3x3 d12
    seg convs (fc8_seg_conv1/2, resnet38_seg.py:13-18). Logits at os8."""

    num_classes: int
    width_div: int = 1
    depth_div: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        feats = WRN38Cls(self.width_div, self.depth_div, dtype=self.dtype,
                         name="trunk")(x, train)["conv7"]
        h = nn.Conv(max(512 // self.width_div, 4), (3, 3),
                    padding=((12, 12), (12, 12)), kernel_dilation=(12, 12),
                    dtype=self.dtype, name="fc8_seg_conv1")(feats)
        return nn.Conv(self.num_classes, (3, 3),
                       padding=((12, 12), (12, 12)), kernel_dilation=(12, 12),
                       dtype=jnp.float32, name="fc8_seg_conv2")(nn.relu(h))
