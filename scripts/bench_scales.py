"""A/B bench: teacher-TTA scale count on the training path.

The reference's pseudo_scales=[1.0, 0.5, 1.5] (args.py:53) is the parity
default; this measures the opt-in fast variants (2 scales / 1 scale) that
trade strict reference parity for step time — the remaining lever the
round-2/3 profile identified once the per-kernel floors were reached
(STATUS_r3.md §4). Same harness as bench.py / scripts/bench_lattice.py.

Usage: python scripts/bench_scales.py
Prints one JSON line per variant.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench(pseudo_scales: tuple) -> dict:
    import jax

    from cosa_tpu.config import voc_config
    from cosa_tpu.models import build_model
    from cosa_tpu.parallel import batch_sharding, make_mesh, state_sharding
    from cosa_tpu.train import (
        build_optimizer,
        build_train_step,
        create_train_state,
    )

    global_batch = 4
    cfg = voc_config(batch_size=global_batch, pseudo_scales=pseudo_scales)
    n_dev = jax.device_count()
    mesh = make_mesh(dp=n_dev, tp=1)
    model = build_model(cfg)
    state = create_train_state(cfg, model, global_batch)
    tx = build_optimizer(cfg, state.student)
    step = jax.jit(build_train_step(cfg, model, tx), donate_argnums=0)
    state = jax.device_put(state, state_sharding(state, mesh))

    rng = np.random.default_rng(0)
    s = cfg.crop_size
    batch = dict(
        wimg=rng.integers(0, 255, (global_batch, s, s, 3)).astype(np.uint8),
        simg=rng.integers(0, 255, (global_batch, s, s, 3)).astype(np.uint8),
        cls_label=(rng.random((global_batch, cfg.num_classes - 1)) > 0.8).astype(
            np.float32
        ),
        img_box=np.tile(np.array([[0, s, 0, s]], np.int32), (global_batch, 1)),
    )
    batch = jax.device_put(batch, batch_sharding(mesh))

    t0 = time.perf_counter()
    for _ in range(3):
        state, metrics = step(state, batch)
    float(metrics["overall_loss"])  # relay sync
    compile_s = time.perf_counter() - t0

    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step(state, batch)
    loss = float(metrics["overall_loss"])
    dt = (time.perf_counter() - t0) / iters
    assert np.isfinite(loss)
    return dict(
        metric="voc_train_step_scales_" + "x".join(str(x) for x in pseudo_scales),
        sec_per_iter=round(dt, 4),
        imgs_per_sec=round(global_batch / dt, 2),
        compile_plus_warmup_s=round(compile_s, 1),
        global_batch=global_batch,
        backend=jax.default_backend(),
    )


def main() -> None:
    for scales in ((1.0, 0.5, 1.5), (1.0, 0.5), (1.0,)):
        print(json.dumps(bench(scales)), flush=True)


if __name__ == "__main__":
    main()
