"""Microbenchmark: is int8 MXU matmul worth wiring into the teacher TTA?

The round-2 profile puts the no-grad teacher path at ~24 ms of the 80 ms
step (MLPs 14.9 ms at ~134 TFLOPS bf16 + qkv dots 8.9 ms). v5e's MXU is
spec'd at 2x int8 throughput vs bf16; if that materializes through this
toolchain (including the quantize/dequantize overhead at the boundaries),
an int8 teacher could save ~10 ms/step (0.083 -> ~0.072 s/iter).

Measures, at the teacher's real shapes (B=8 images at 448^2 = 785 tokens,
and the 672^2 TTA scale = 1765 tokens):
  1. bf16 x bf16 -> f32 matmul (the current path)
  2. int8 x int8 -> int32 matmul (raw MXU rate)
  3. int8 end-to-end: dynamic per-row activation quantize + int8 matmul +
     rescale (what a real teacher layer would pay)

Prints one JSON line per case. Run on the live chip AFTER training jobs
finish (compiles contend with the step stream).
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def _timeit(fn, *args, iters=30):
    out = fn(*args)
    jax.tree.map(lambda x: x.block_until_ready(), out)
    float(jnp.sum(out[0] if isinstance(out, tuple) else out).astype(jnp.float32))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    # relay note: block_until_ready does not synchronize; fetch a scalar
    float(jnp.sum(out[0] if isinstance(out, tuple) else out).astype(jnp.float32))
    return (time.perf_counter() - t0) / iters


def main() -> None:
    rng = np.random.default_rng(0)
    # (tokens, in, out) for the ViT-B MLP fc1 at the two TTA shapes
    for n_tok, tag in ((8 * 785, "448"), (8 * 1765, "672")):
        m, k, n = n_tok, 768, 3072
        x = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((k, n)), jnp.bfloat16)
        x8 = jnp.asarray(rng.integers(-127, 128, (m, k)), jnp.int8)
        w8 = jnp.asarray(rng.integers(-127, 128, (k, n)), jnp.int8)

        bf16 = jax.jit(lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32))
        i8 = jax.jit(lambda a, b: jax.lax.dot(a, b, preferred_element_type=jnp.int32))

        def quant_matmul(xf, wq, wscale):
            # dynamic per-row symmetric activation quantization
            s = jnp.max(jnp.abs(xf), axis=-1, keepdims=True).astype(jnp.float32) / 127.0
            xq = jnp.clip(
                jnp.round(xf.astype(jnp.float32) / s), -127, 127
            ).astype(jnp.int8)
            acc = jax.lax.dot(xq, wq, preferred_element_type=jnp.int32)
            return acc.astype(jnp.float32) * s * wscale

        qm = jax.jit(quant_matmul)
        wscale = jnp.float32(0.01)

        flops = 2 * m * k * n
        for name, dt in (
            ("bf16", _timeit(bf16, x, w)),
            ("int8_raw", _timeit(i8, x8, w8)),
            ("int8_e2e", _timeit(qm, x, w8, wscale)),
        ):
            print(json.dumps({
                "case": f"mlp_fc1_{tag}",
                "path": name,
                "ms": round(dt * 1e3, 3),
                "tflops": round(flops / dt / 1e12, 1),
            }), flush=True)


if __name__ == "__main__":
    main()
