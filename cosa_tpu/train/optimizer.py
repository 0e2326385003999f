"""Optimizer: PolyWarmupAdamW with the reference's four parameter groups.

Reference: utils/torch_helper.py:261-293 (schedule) + main.py:57-72 (groups):
  group 0  encoder, non-norm params      lr,            wd
  group 1  encoder norm params           lr (0 frozen), wd * wt_dec_mult
  group 2  classifier + aux classifier   lrscale * lr,  wd
  group 3  decoder                       lrscale * lr,  wd
plus our explicit 'frozen' group for the positional embedding (the reference
freezes it via requires_grad=False, models/vit/vit.py:237).

Implemented as optax.multi_transform over path-derived labels; schedules are
pure functions of the step so the whole update stays inside the jitted
train step.
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
import optax


def poly_warmup_schedule(
    base_lr: float,
    warmup_iter: int = 1500,
    max_iter: int = 40000,
    warmup_ratio: float = 1e-6,
    power: float = 0.9,
    min_mult: float = 0.0,
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """lr(step) exactly as PolyWarmupAdamW.step computes it
    (torch_helper.py:275-293); past max_iter the last multiplier holds."""

    def sched(step):
        s = jnp.minimum(step.astype(jnp.float32), max_iter - 1)
        # cancellation-free form of 1 - (1 - s/w)(1 - ratio)
        warm = s / warmup_iter + (1.0 - s / warmup_iter) * warmup_ratio
        poly = jnp.maximum((1.0 - s / max_iter) ** power, min_mult)
        return base_lr * jnp.where(s < warmup_iter, warm, poly)

    return sched


def param_label(path_str: str) -> str:
    if "pos_embed" in path_str:
        return "frozen"
    if path_str.startswith("encoder"):
        return "norm" if "norm" in path_str else "backbone"
    if "classifier" in path_str:  # classifier / aux_classifier
        return "head"
    if path_str.startswith("decoder"):
        return "decoder"
    return "backbone"


def _labels_for(params: Any) -> Any:
    def f(path, leaf):
        parts = []
        for p in path:
            parts.append(str(getattr(p, "key", getattr(p, "name", p))))
        return param_label("/".join(parts))

    return jax.tree_util.tree_map_with_path(f, params)


def build_optimizer(cfg, params: Any) -> optax.GradientTransformation:
    def adamw(lr_mult: float, wd: float):
        return optax.adamw(
            learning_rate=poly_warmup_schedule(
                cfg.lr * lr_mult,
                warmup_iter=cfg.lr_warmup_iters,
                max_iter=cfg.max_iters,
                warmup_ratio=1e-6,
                power=0.9,
                min_mult=cfg.min_mult,
            ),
            b1=0.9,
            b2=0.999,
            eps=1e-8,
            weight_decay=wd,
        )

    transforms: Dict[str, optax.GradientTransformation] = {
        "backbone": adamw(1.0, cfg.wt_dec),
        "norm": (
            optax.set_to_zero()
            if cfg.freeze_norm
            else adamw(1.0, cfg.wt_dec * cfg.wt_dec_mult)
        ),
        "head": adamw(cfg.lrscale, cfg.wt_dec),
        "decoder": adamw(cfg.lrscale, cfg.wt_dec),
        "frozen": optax.set_to_zero(),
    }
    return optax.multi_transform(transforms, _labels_for(params))
