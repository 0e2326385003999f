"""Functional train state: student + EMA teacher + optimizer + GMM queues.

The reference holds two independent nn.Modules, a DDP wrapper and a Python
EMA loop (main.py:45-50, 250-252) plus host-side GMM queues/EMA trackers
(main.py:94-103). Here the entire training state is one pytree, so the EMA
update is a ``tree_map`` inside the compiled step and checkpointing the
*complete* run state (student + teacher + optimizer + step + GMM) is a
single orbax save — full resume, which the reference lacks entirely
(SURVEY.md §5.4: best-weights-only saving, no training resume).
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp

from cosa_tpu.train.optimizer import build_optimizer


@flax.struct.dataclass
class GMMState:
    queue: jnp.ndarray  # (Q, dim) ring buffer of downscaled CAM-max rows
    queue_aux: jnp.ndarray
    ptr: jnp.ndarray  # i32 scalar
    ema_low: jnp.ndarray  # f32 scalars (EMAtracker twins, torch_helper.py:90-99)
    ema_high: jnp.ndarray
    ema_low_aux: jnp.ndarray
    ema_high_aux: jnp.ndarray


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray  # i32 scalar
    student: Any  # param pytree
    teacher: Any  # EMA twin, f32
    opt_state: Any
    gmm: GMMState


def init_gmm_state(cfg, global_batch: int) -> GMMState:
    use_aux = cfg.usegmm if cfg.usegmmaux is None else cfg.usegmmaux
    if cfg.usegmm or use_aux:
        q = global_batch * cfg.queue_update_ratio
        dim = (cfg.crop_size // cfg.gmmscale) ** 2
        # reference seeds the queue with uniform noise (seg_helper.py:949)
        key = jax.random.PRNGKey(cfg.seed + 777)
        k1, k2 = jax.random.split(key)
        queue = jax.random.uniform(k1, (q, dim), jnp.float32)
        queue_aux = jax.random.uniform(k2, (q, dim), jnp.float32)
    else:
        queue = jnp.zeros((1, 1), jnp.float32)
        queue_aux = jnp.zeros((1, 1), jnp.float32)
    return GMMState(
        queue=queue,
        queue_aux=queue_aux,
        ptr=jnp.zeros((), jnp.int32),
        ema_low=jnp.asarray(cfg.low_thre, jnp.float32),
        ema_high=jnp.asarray(cfg.high_thre, jnp.float32),
        ema_low_aux=jnp.asarray(cfg.low_thre_aux, jnp.float32),
        ema_high_aux=jnp.asarray(cfg.high_thre_aux, jnp.float32),
    )


def create_train_state(cfg, model, global_batch: int, rng=None) -> TrainState:
    """Initialize student/teacher with independent seeds (the reference
    builds the two networks separately, main.py:45-46, so their random heads
    start different; the 0.9994-EMA washes the teacher's init out within the
    warmup phase)."""
    rng = jax.random.PRNGKey(cfg.seed) if rng is None else rng
    r_s, r_t = jax.random.split(rng)
    dummy = jnp.zeros((1, cfg.crop_size, cfg.crop_size, 3), jnp.float32)
    student = model.init(r_s, dummy)["params"]
    teacher = model.init(r_t, dummy)["params"]
    # pretrained backbones are identical in both (loaded post-init elsewhere)
    tx = build_optimizer(cfg, student)
    opt_state = tx.init(student)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        student=student,
        teacher=teacher,
        opt_state=opt_state,
        gmm=init_gmm_state(cfg, global_batch),
    )
