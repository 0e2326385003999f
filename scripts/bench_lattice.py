"""A/B bench: dense-energy filter on the training path — calibrated RFF
surrogate (default) vs the EXACT permutohedral lattice via the two-stage
build/apply split (ops/permutohedral.py, objectives/energy.py).

Measures the full compiled VOC co-training iteration (as bench.py) with
each filter; the lattice variant includes the per-batch structure-build
program exactly as the train loop runs it (train/loop.py lat_fn).

Reference for what the lattice reproduces: the C++ filter the reference
calls from DenseEnergyLossFunction (utils/seg_helper.py:864-903,
utils/bilateralfilter/permutohedral.cpp:443-631).

Usage: python scripts/bench_lattice.py
Prints one JSON line per variant.
"""

from __future__ import annotations

import json
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench(energy_filter: str) -> dict:
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
    cfg = voc_config(
        batch_size=global_batch,
        energy_filter=energy_filter,
        energy_convention=1.0,  # perf bench; rff scale irrelevant
    )
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

    lat_fn = None
    if energy_filter == "lattice":
        from cosa_tpu.objectives.energy import build_energy_lattice

        lat_fn = jax.jit(partial(build_energy_lattice, cfg))

    def one_step(state, batch):
        if lat_fn is not None:
            batch = dict(batch, energy_lattice=lat_fn(batch["simg"]))
        return step(state, batch)

    t0 = time.perf_counter()
    for _ in range(3):
        state, metrics = one_step(state, batch)
    float(metrics["overall_loss"])  # relay sync (block_until_ready is a no-op)
    compile_s = time.perf_counter() - t0

    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = one_step(state, batch)
    loss = float(metrics["overall_loss"])
    dt = (time.perf_counter() - t0) / iters
    assert np.isfinite(loss)
    return dict(
        metric=f"voc_train_step_energy_{energy_filter}",
        sec_per_iter=round(dt, 4),
        imgs_per_sec=round(global_batch / dt, 2),
        compile_plus_warmup_s=round(compile_s, 1),
        global_batch=global_batch,
        backend=jax.default_backend(),
    )


def main() -> None:
    for kind in ("rff", "lattice"):
        print(json.dumps(bench(kind)), flush=True)


if __name__ == "__main__":
    main()
