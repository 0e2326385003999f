"""Optimizer parity: the poly-warmup schedule must trace the reference
PolyWarmupAdamW's lr trajectory (utils/torch_helper.py:261-293), and one
AdamW step must match torch.optim.AdamW numerics."""

import numpy as np
import torch

import jax
import jax.numpy as jnp
import optax

from cosa_tpu.config import voc_config
from cosa_tpu.train.optimizer import build_optimizer, param_label, poly_warmup_schedule


def _reference_lr(step, base, warmup_iter=1500, max_iter=40000,
                  warmup_ratio=1e-6, power=0.9, min_mult=0.0):
    """The reference's lr update applied BEFORE each step (global_step
    starts at 0)."""
    if step < warmup_iter:
        mult = 1 - (1 - step / warmup_iter) * (1 - warmup_ratio)
    elif step < max_iter:
        mult = max((1 - step / max_iter) ** power, min_mult)
    else:
        mult = max((1 - (max_iter - 1) / max_iter) ** power, min_mult)
    return base * mult


def test_schedule_matches_reference_trajectory():
    sched = poly_warmup_schedule(6e-5, 1500, 40000, 1e-6, 0.9, 0.0)
    for s in [0, 1, 100, 1499, 1500, 10000, 39999, 40000, 50000]:
        ours = float(sched(jnp.asarray(s)))
        ref = _reference_lr(s, 6e-5)
        # f32 pow/div rounding; differences only show in vanishing-lr tails
        assert abs(ours - ref) <= 1e-3 * max(ref, 1e-10), (s, ours, ref)


def test_param_labels():
    assert param_label("encoder/blocks_0/norm1/scale") == "norm"
    assert param_label("encoder/blocks_0/attn/qkv/kernel") == "backbone"
    assert param_label("encoder/pos_embed") == "frozen"
    assert param_label("encoder/cls_token") == "backbone"
    assert param_label("classifier") == "head"
    assert param_label("aux_classifier") == "head"
    assert param_label("decoder/conv6/kernel") == "decoder"


def test_adamw_step_matches_torch():
    """One update on a toy param with the 'backbone' group settings."""
    cfg = voc_config()
    w0 = np.random.default_rng(0).standard_normal((4, 3)).astype(np.float32)
    g = np.random.default_rng(1).standard_normal((4, 3)).astype(np.float32)

    # torch: lr adjusted to schedule(0) before stepping (reference step())
    lr0 = _reference_lr(0, cfg.lr)
    tw = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    opt = torch.optim.AdamW([tw], lr=lr0, betas=(0.9, 0.999), eps=1e-8,
                            weight_decay=cfg.wt_dec)
    tw.grad = torch.from_numpy(g.copy())
    opt.step()

    params = {"encoder": {"patch_embed": {"kernel": jnp.asarray(w0)}}}
    grads = {"encoder": {"patch_embed": {"kernel": jnp.asarray(g)}}}
    tx = build_optimizer(cfg, params)
    state = tx.init(params)
    updates, _ = tx.update(grads, state, params)
    new = optax.apply_updates(params, updates)

    np.testing.assert_allclose(
        np.asarray(new["encoder"]["patch_embed"]["kernel"]),
        tw.detach().numpy(), rtol=1e-5, atol=1e-7,
    )
