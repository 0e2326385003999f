"""1-D Gaussian-mixture EM for adaptive CAM thresholds — on device.

The reference fits a 3-component sklearn GaussianMixture on a host-side
queue of CAM maxima every step (utils/seg_helper.py:924-943, gated by
``usegmm``), forcing a device->host copy + sklearn EM per iteration
(main.py:138-151). Here the queue lives in the train state and the EM runs
as fixed-iteration, mask-weighted updates inside the compiled step.

Differences vs sklearn (documented, metric-irrelevant given the 0.99-EMA
smoothing of the outputs, utils/torch_helper.py:90-99):
  * fixed ``iters`` EM steps instead of tol-based stopping,
  * filtering (``queue > filter_thre``) is a weight mask instead of a
    dynamic-shape gather.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

_REG_COVAR = 1e-6  # sklearn default regularization
_BIG = 1e30


def _masked_median(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    n = jnp.sum(mask)
    xs = jnp.sort(jnp.where(mask, x, _BIG))
    lo = xs[jnp.maximum((n - 1) // 2, 0)]
    hi = xs[jnp.maximum(n // 2, 0)]
    return 0.5 * (lo + hi)


def fit_gmm_1d(
    x: jnp.ndarray,
    mask: jnp.ndarray,
    n_components: int = 3,
    iters: int = 25,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Weighted EM on 1-D data. x: (N,), mask: (N,) bool.

    Init mirrors the reference (seg_helper.py:930-937): means at
    [min, median, max] (or [min, max] for 2 components), unit variances,
    uniform weights. Returns (means, vars, weights, responsibilities (N,K)).
    """
    x = x.astype(jnp.float32)
    m = mask.astype(jnp.float32)
    n = jnp.maximum(jnp.sum(m), 1.0)

    mn = jnp.min(jnp.where(mask, x, _BIG))
    mx = jnp.max(jnp.where(mask, x, -_BIG))
    if n_components == 3:
        means0 = jnp.stack([mn, _masked_median(x, mask), mx])
    elif n_components == 2:
        means0 = jnp.stack([mn, mx])
    else:
        raise ValueError(n_components)
    vars0 = jnp.ones((n_components,), jnp.float32)
    w0 = jnp.full((n_components,), 1.0 / n_components, jnp.float32)

    def em(carry, _):
        means, vs, ws = carry
        # E step (log domain)
        logp = (
            -0.5 * (x[:, None] - means[None, :]) ** 2 / vs[None, :]
            - 0.5 * jnp.log(2 * jnp.pi * vs[None, :])
            + jnp.log(ws[None, :])
        )
        resp = jax.nn.softmax(logp, axis=1) * m[:, None]
        # M step
        nk = resp.sum(axis=0) + 1e-10
        means = (resp * x[:, None]).sum(axis=0) / nk
        vs = (resp * (x[:, None] - means[None, :]) ** 2).sum(axis=0) / nk
        vs = vs + _REG_COVAR
        ws = nk / n
        return (means, vs, ws), None

    (means, vs, ws), _ = jax.lax.scan(em, (means0, vars0, w0), None, length=iters)
    logp = (
        -0.5 * (x[:, None] - means[None, :]) ** 2 / vs[None, :]
        - 0.5 * jnp.log(2 * jnp.pi * vs[None, :])
        + jnp.log(ws[None, :])
    )
    resp = jax.nn.softmax(logp, axis=1)
    return means, vs, ws, resp


def gmm_thresholds(
    queue: jnp.ndarray,
    filter_thre: float = 0.05,
    n_components: int = 3,
    iters: int = 25,
    em_subsample: int = 8,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Reference ``rungmm`` (seg_helper.py:924-943): fit on queue values
    above ``filter_thre``; low = max of component 0's points, high = min of
    component 2's points (components ordered by the min/median/max init).

    Perf note (measured on v5e): the EM needs its full ~100 iterations to
    match sklearn (10/25-iteration trajectories deviate by up to 0.17/0.09
    in EMA-threshold space — cutting iterations is NOT safe), but it does
    NOT need all ~313k queue points: 3-component 1-D mixture parameters are
    statistically settled with a strided subsample, and a whole-queue
    assignment pass afterwards keeps the low/high extrema exact w.r.t. the
    fitted boundaries. ``em_subsample=8`` cuts the GMM's step cost ~7x with
    thresholds matching the full fit to <2e-3 (tests/test_par_gmm.py).
    """
    x = queue.reshape(-1)
    mask = x > filter_thre
    xs = x[:: max(em_subsample, 1)]
    ms = mask[:: max(em_subsample, 1)]
    means, vs, ws, _ = fit_gmm_1d(xs, ms, n_components, iters)
    # assign the FULL queue with the fitted parameters (one E pass)
    logp = (
        -0.5 * (x[:, None] - means[None, :]) ** 2 / vs[None, :]
        - 0.5 * jnp.log(2 * jnp.pi * vs[None, :])
        + jnp.log(ws[None, :])
    )
    # order components by mean so 0 = lowest mode, K-1 = highest
    order = jnp.argsort(means)
    pred = jnp.argmax(logp[:, order], axis=1)
    lowsel = mask & (pred == 0)
    highsel = mask & (pred == n_components - 1)
    low = jnp.max(jnp.where(lowsel, x, -_BIG))
    high = jnp.min(jnp.where(highsel, x, _BIG))
    return low, high
