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


def cos_warmup_schedule(
    base_lr: float,
    warmup_iter: int = 1500,
    max_iter: int = 40000,
    warmup_ratio: float = 1e-6,
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """CosWarmupAdamW's lr(step) (reference utils/torch_helper.py:228-259,
    unused there). Warmup is the reference's ABSOLUTE blend — lr =
    base*s/w + (1-s/w)*ratio, the additive term is not scaled by base —
    then a half-cosine from base to 0 over the remaining iters."""

    def sched(step):
        s = jnp.minimum(step.astype(jnp.float32), max_iter - 1)
        warm = base_lr * (s / warmup_iter) + (1.0 - s / warmup_iter) * warmup_ratio
        t = (s - warmup_iter) / (max_iter - warmup_iter)
        cos = base_lr * (jnp.cos(t * jnp.pi) * 0.5 + 0.5)
        return jnp.where(s < warmup_iter, warm, cos)

    return sched


def poly_sgd_schedule(
    base_lr: float,
    warmup_iter: int = 1500,
    max_iter: int = 40000,
    power: float = 0.9,
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """PolyWarmupSGD's lr(step) (reference utils/torch_helper.py:295-326,
    unused there), quirk preserved: during "warmup" the multiplier is
    (1 - s/w)^power * 10 — a DECAY from 10x to 0 — then the usual poly."""

    def sched(step):
        s = jnp.minimum(step.astype(jnp.float32), max_iter - 1)
        warm = (1.0 - s / warmup_iter) ** power * 10.0
        poly = (1.0 - (s - warmup_iter) / (max_iter - warmup_iter)) ** power
        return base_lr * jnp.where(s < warmup_iter, warm, poly)

    return sched


def poly_cls_schedule(
    base_lr: float,
    max_step: int,
    momentum: float = 0.9,
    constant: bool = False,
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """PolyOptimizer_cls's lr(step) (reference utils/torch_helper.py:327-358,
    unused there): (1 - s/max)^momentum — the exponent really is the
    `momentum` argument — with ``constant=True`` reproducing the group-4
    special case that holds its initial lr (torch_helper.py:345-349)."""

    def sched(step):
        if constant:
            return jnp.asarray(base_lr, jnp.float32)
        s = jnp.minimum(step.astype(jnp.float32), max_step - 1)
        return base_lr * (1.0 - s / max_step) ** momentum

    return sched


def param_label(path_str: str) -> str:
    if "pos_embed" in path_str:
        return "frozen"
    if path_str.startswith("encoder"):
        return "norm" if "norm" in path_str else "backbone"
    if path_str.startswith("backbone"):
        # SwinNetwork ('swinend2end'): the reference MMSWIN routes norms +
        # relative-position bias tables to the norm group via wt_keys
        # (mmsegmodel/__init__.py:88,131-148)
        return (
            "norm"
            if ("norm" in path_str or "rel_pos_bias" in path_str)
            else "backbone"
        )
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
    """The live PolyWarmupAdamW plus the reference's three unused
    constructors (utils/torch_helper.py:228-358), selected by
    ``cfg.optimizer``; all share the four path-derived param groups."""
    kind = getattr(cfg, "optimizer", "poly_adamw")

    def sched_for(lr_mult: float):
        lr = cfg.lr * lr_mult
        if kind == "poly_adamw":
            return poly_warmup_schedule(
                lr, warmup_iter=cfg.lr_warmup_iters, max_iter=cfg.max_iters,
                warmup_ratio=1e-6, power=0.9, min_mult=cfg.min_mult,
            )
        if kind == "cos_adamw":
            return cos_warmup_schedule(
                lr, warmup_iter=cfg.lr_warmup_iters, max_iter=cfg.max_iters,
                warmup_ratio=1e-6,
            )
        if kind == "poly_sgd":
            return poly_sgd_schedule(
                lr, warmup_iter=cfg.lr_warmup_iters, max_iter=cfg.max_iters,
                power=0.9,
            )
        if kind == "poly_cls_sgd":
            # group 4 (the last head group in the reference's cls setup)
            # holds its initial lr; our 'head' label plays that role
            return poly_cls_schedule(
                lr, max_step=cfg.max_iters, momentum=0.9,
                constant=lr_mult != 1.0,
            )
        raise ValueError(f"unknown optimizer {kind}")

    def tx(lr_mult: float, wd: float):
        if kind in ("poly_adamw", "cos_adamw"):
            return optax.adamw(
                learning_rate=sched_for(lr_mult),
                b1=0.9, b2=0.999, eps=1e-8, weight_decay=wd,
            )
        if kind == "poly_sgd":
            # reference: torch.optim.SGD(momentum=0.9, weight_decay=wd)
            return optax.chain(
                optax.add_decayed_weights(wd),
                optax.sgd(learning_rate=sched_for(lr_mult), momentum=0.9),
            )
        # poly_cls_sgd quirk kept verbatim: the reference passes weight_decay
        # POSITIONALLY into torch.optim.SGD's momentum slot
        # (torch_helper.py:330), so SGD momentum = wd and no decay at all.
        return optax.sgd(learning_rate=sched_for(lr_mult), momentum=wd)

    transforms: Dict[str, optax.GradientTransformation] = {
        "backbone": tx(1.0, cfg.wt_dec),
        "norm": (
            optax.set_to_zero()
            if cfg.freeze_norm
            else tx(1.0, cfg.wt_dec * cfg.wt_dec_mult)
        ),
        "head": tx(cfg.lrscale, cfg.wt_dec),
        "decoder": tx(cfg.lrscale, cfg.wt_dec),
        "frozen": optax.set_to_zero(),
    }
    return optax.multi_transform(transforms, _labels_for(params))
