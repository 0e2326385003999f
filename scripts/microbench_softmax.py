"""Microbench: can the flash-attention VPU-softmax floor be lifted?

Round-2 profiling pinned attention fwd at ~1.4 ms/block, dominated by the
(BQ, N) exp2 + row reductions on the VPU (kernels/flash.py). This bench
compares the production fwd kernel against two candidate variants at the
training shapes:

  * prod      — f32 exp2 softmax (kernels/flash.py, shipped)
  * bf16exp   — exp2 evaluated on a bf16 tile (halves VPU element width IF
                the transcendental unit runs bf16 at rate; l stays f32 via
                accumulating dot)
  * nomax     — skips the rowmax subtraction (one fewer (BQ, N) pass);
                UNSAFE in general (overflow for |s| > ~120), measured only
                to bound what the max pass costs.

Run on the real chip: python scripts/microbench_softmax.py
"""

import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cosa_tpu.kernels.flash import (
    _LOG2E,
    _attend,
    _bias,
    _choose_bq,
    _round_up,
)


def _fwd_variant(scale, q_ref, k_ref, v_ref, bias_ref, o_ref, *, mode):
    q = (q_ref[0].astype(jnp.float32) * (scale * _LOG2E)).astype(q_ref.dtype)
    k = k_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    s = s + bias_ref[:]
    if mode == "bf16exp":
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp2((s - m).astype(jnp.bfloat16))
        ones = jnp.ones((s.shape[1], 1), jnp.bfloat16)
        l = jax.lax.dot_general(  # f32-accumulating row sum of the bf16 tile
            p, ones, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    elif mode == "nomax":
        p = jnp.exp2(s - 30.0)  # fixed shift stands in for the rowmax
        l = jnp.sum(p, axis=1, keepdims=True)
        p = p.astype(q.dtype)
    else:
        raise ValueError(mode)
    o = jax.lax.dot_general(
        p.astype(q.dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = (o / l).astype(o_ref.dtype)


def attend_variant(q, k, v, scale, n_valid, mode):
    bh, n, d = q.shape
    npp = _round_up(n, 128)
    bq = _choose_bq(npp, cap=896)
    grid = (bh, npp // bq)
    blk_q = pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM)
    blk_full = pl.BlockSpec((1, npp, d), lambda i, j: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    blk_bias = pl.BlockSpec((1, npp), lambda i, j: (0, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_fwd_variant, scale, mode=mode),
        out_shape=jax.ShapeDtypeStruct((bh, npp, d), q.dtype),
        grid=grid,
        in_specs=[blk_q, blk_full, blk_full, blk_bias],
        out_specs=blk_q,
    )(q, k, v, _bias(n_valid, npp))


def main() -> None:
    import json

    for n in (785, 1765):
        npp = _round_up(n, 128)
        bh, d = 8 * 12, 64
        rng = np.random.default_rng(0)
        q, k, v = (
            jnp.asarray(rng.normal(0, 1, (bh, npp, d)), jnp.bfloat16)
            for _ in range(3)
        )
        scale = 1 / 8.0

        ref = _attend(q[:, :n], k[:, :n], v[:, :n], scale, n)

        runs = {"prod": jax.jit(
            lambda q, k, v: _attend(q[:, :n], k[:, :n], v[:, :n], scale, n)
        )}
        for mode in ("bf16exp", "nomax"):
            runs[mode] = jax.jit(
                functools.partial(attend_variant, scale=scale, n_valid=n,
                                  mode=mode)
            )

        for name, fn in runs.items():
            if name == "prod":
                o = fn(q, k, v)
            else:
                o = fn(q, k, v)[:, :n]
            cos = float(
                jnp.sum(o.astype(jnp.float32) * ref.astype(jnp.float32))
                / (jnp.linalg.norm(o.astype(jnp.float32))
                   * jnp.linalg.norm(ref.astype(jnp.float32)))
            )
            # warmup + timed chain; fetch one scalar to sync over the relay
            acc = fn(q, k, v)
            float(jnp.sum(acc.astype(jnp.float32)))
            iters = 30
            t0 = time.perf_counter()
            x = q
            for _ in range(iters):
                acc = fn(x, k, v)
            float(jnp.sum(acc.astype(jnp.float32)))
            dt = (time.perf_counter() - t0) / iters * 1e3
            print(json.dumps({"n": n, "variant": name,
                              "ms": round(dt, 3), "cos_vs_prod": round(cos, 6)}),
                  flush=True)


if __name__ == "__main__":
    main()
