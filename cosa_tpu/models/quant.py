"""int8 dense layers for the no-grad teacher TTA path.

Motivation (round-2 profile, v5e): the EMA teacher's forward passes cost
~24 ms of the 80 ms train step (MLPs ~14.9 ms at ~134 TFLOPS bf16 + qkv
dots ~8.9 ms). v5e's MXU runs int8 at ~2x bf16 rate; the teacher's outputs
only feed CAM fusion -> min-max normalization -> fixed thresholds (0.25 /
0.7) and a softmax at temperature 0.01, all of which tolerate far more
noise than int8 introduces (the same precision-tolerance argument that
justified the round-2 bf16 teacher, one notch further).

Scheme (standard dynamic quantization):
  * weights: symmetric per-output-channel int8, quantized INSIDE the jit
    from the (EMA-updated) f32 params each step — no second copy of the
    teacher is stored, and XLA CSE's the quantize across the TTA scales;
  * activations: symmetric per-row (per-token) int8, scales from a running
    max over the feature axis;
  * accumulate int32 on the MXU, rescale to f32, add bias.

The student path NEVER uses these (gradients need bf16/f32); the flag
``teacher_int8`` wires them into the teacher's TTA forward only.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


def quantize_rows(x: jnp.ndarray):
    """(..., K) float -> int8 rows + (..., 1) f32 scales (symmetric)."""
    xf = x.astype(jnp.float32)
    s = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0
    s = jnp.maximum(s, 1e-12)
    q = jnp.clip(jnp.round(xf / s), -127, 127).astype(jnp.int8)
    return q, s


def quantize_cols(w: jnp.ndarray):
    """(K, N) float kernel -> int8 + (1, N) f32 per-output-channel scales."""
    wf = w.astype(jnp.float32)
    s = jnp.max(jnp.abs(wf), axis=0, keepdims=True) / 127.0
    s = jnp.maximum(s, 1e-12)
    q = jnp.clip(jnp.round(wf / s), -127, 127).astype(jnp.int8)
    return q, s


def int8_matmul(x: jnp.ndarray, kernel: jnp.ndarray,
                bias: jnp.ndarray | None, out_dtype) -> jnp.ndarray:
    """x: (..., K) float; kernel: (K, N) float param. Dynamic int8 matmul."""
    lead = x.shape[:-1]
    k = x.shape[-1]
    xq, xs = quantize_rows(x.reshape(-1, k))
    wq, ws = quantize_cols(kernel)
    acc = jax.lax.dot(xq, wq, preferred_element_type=jnp.int32)
    out = acc.astype(jnp.float32) * xs * ws
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.reshape(*lead, -1).astype(out_dtype)


class QuantDense(nn.Module):
    """Drop-in for nn.Dense with the SAME param tree ('kernel'/'bias'),
    so the teacher's EMA params apply unchanged."""

    features: int
    use_bias: bool = True
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (x.shape[-1], self.features), jnp.float32,
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,),
                       jnp.float32)
            if self.use_bias else None
        )
        return int8_matmul(x, kernel, bias, self.dtype)
