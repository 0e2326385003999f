"""Benchmark: end-to-end co-training step throughput on real hardware.

Measures the FULL compiled CoSA training iteration — teacher 3-scale+flip
TTA, student forward/backward, CAM->mask pseudo-labeling, dense-energy
regularizer, PolyWarmupAdamW update, EMA teacher — at the reference's VOC
training configuration (ViT-B/16, 448^2 crop, global batch 4).

Baseline: the reference trains VOC at 0.92 s/iter with global batch 4 on
2x RTX 3090 => 4.35 img/s for the whole rig (BASELINE.md / SURVEY.md §6,
assets/logs/voc_log.txt:88). vs_baseline compares one TPU chip against the
full 2-GPU reference rig.

Prints exactly one JSON line:
  {"metric": "voc_train_imgs_per_sec", "value": N, "unit": "img/s",
   "vs_baseline": N/4.35, ...}
"""

from __future__ import annotations

import json
import time

import numpy as np

BASELINE_IMGS_PER_SEC = 4.35  # 2x3090, batch 4, 0.92 s/iter


def main() -> None:
    import jax

    from cosa_tpu.config import voc_config
    from cosa_tpu.models import build_model
    from cosa_tpu.parallel import batch_sharding, make_mesh, state_sharding
    from cosa_tpu.train import (
        build_optimizer,
        build_train_step,
        create_train_state,
    )

    n_dev = jax.device_count()
    cfg = voc_config(batch_size=4 // max(n_dev, 1) or 1)  # global batch 4
    global_batch = max(cfg.batch_size * n_dev, 4)
    cfg = cfg.replace(batch_size=global_batch // n_dev)

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

    # compile + warmup. NOTE: under the axon relay block_until_ready does not
    # synchronize; a host value fetch does. The final scalar depends on the
    # whole step chain through the donated state, so one fetch at the end of
    # the timed chain gives the true amortized step time.
    for _ in range(3):
        state, metrics = step(state, batch)
    float(metrics["overall_loss"])

    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step(state, batch)
    loss = float(metrics["overall_loss"])
    dt = (time.perf_counter() - t0) / iters
    assert np.isfinite(loss)

    imgs_per_sec = global_batch / dt
    print(
        json.dumps(
            {
                "metric": "voc_train_imgs_per_sec",
                "value": round(imgs_per_sec, 3),
                "unit": "img/s",
                "vs_baseline": round(imgs_per_sec / BASELINE_IMGS_PER_SEC, 3),
                "sec_per_iter": round(dt, 4),
                "global_batch": global_batch,
                "n_devices": n_dev,
                "backend": jax.default_backend(),
            }
        )
    )


if __name__ == "__main__":
    main()
