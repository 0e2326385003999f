"""DenseCRF mean-field inference for final-eval refinement, on device.

Twin of the reference's pydensecrf post-processing (utils/seg_helper.py:
961-996: DenseCRF(iter_max=1, pos_w=1, pos_xy=1, bi_w=4, bi_xy=121,
bi_rgb=5) applied at final eval, evaluation_engine.py:205-211). pydensecrf
wraps Krähenbühl's C++ (Cython); here the mean-field update

    Q <- softmax( log p + sum_k w_k K̂_k Q ),   K̂ = D^-1/2 K D^-1/2

runs in JAX:
  * the Gaussian (spatial, sigma=1) kernel is EXACT — a separable banded
    matmul at full resolution;
  * the bilateral kernel (sigma_xy=121, sigma_rgb=5) runs through the same
    permutohedral lattice machinery the reference's pydensecrf uses
    (ops/permutohedral.py — verified bit-exact against the reference C++
    lattice), at full resolution by default; ``reduce`` > 1 switches to an
    exact chunked-matmul evaluation at reduced resolution for speed.

Potts compatibility with weight w matches PottsCompatibility::apply
(out = -w * in) and symmetric kernel normalization matches the library
default (NORMALIZE_SYMMETRIC).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cosa_tpu.ops.resize import _linear_matrix, resize_bilinear


@functools.lru_cache(maxsize=32)
def _gauss_band(n: int, sigma: float, radius: int = 4) -> np.ndarray:
    """(n, n) banded 1-D Gaussian filter matrix, truncated at ``radius``."""
    idx = np.arange(n)
    m = np.exp(-0.5 * ((idx[None, :] - idx[:, None]) / sigma) ** 2)
    m[np.abs(idx[None, :] - idx[:, None]) > radius] = 0.0
    return m.astype(np.float32)


def _spatial_filter(q: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """(H, W, C) separable full-res Gaussian transform (incl. self)."""
    h, w = q.shape[:2]
    gh = jnp.asarray(_gauss_band(h, sigma))
    gw = jnp.asarray(_gauss_band(w, sigma))
    y = jnp.einsum("ph,hwc->pwc", gh, q)
    return jnp.einsum("qw,pwc->pqc", gw, y)


def _bilateral_exact_chunked(
    feats: jnp.ndarray, values: jnp.ndarray, chunk: int = 512
) -> jnp.ndarray:
    """(N, d) feats x (N, K) values -> exact G @ values in row chunks."""
    n = feats.shape[0]
    pad = (-n) % chunk
    fpad = jnp.pad(feats, ((0, pad), (0, 0)))
    sq = jnp.sum(feats ** 2, axis=-1)
    sq_pad = jnp.pad(sq, (0, pad))

    def body(i, out):
        rows = jax.lax.dynamic_slice_in_dim(fpad, i * chunk, chunk)
        rsq = jax.lax.dynamic_slice_in_dim(sq_pad, i * chunk, chunk)
        # the cross term MUST be true f32: d2 is a catastrophic cancellation
        # (terms up to ~1e4 cancelling to O(1)) and a default bf16 MXU pass
        # carries +-tens of absolute error -> exp(-d2/2) garbage
        cross = jnp.matmul(rows, feats.T, precision=jax.lax.Precision.HIGHEST)
        d2 = rsq[:, None] + sq[None, :] - 2.0 * cross
        g = jnp.exp(-0.5 * jnp.maximum(d2, 0.0))
        res = g @ values
        return jax.lax.dynamic_update_slice_in_dim(out, res, i * chunk, axis=0)

    out = jnp.zeros((n + pad, values.shape[-1]), values.dtype)
    out = jax.lax.fori_loop(0, (n + pad) // chunk, body, out)
    return out[:n]


def _normalized_message(filter_fn, q: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Symmetric-normalized filtered message restricted to valid pixels."""
    ones = valid
    norm = filter_fn(ones)
    inv_sqrt = jnp.where(norm > 1e-20, jax.lax.rsqrt(norm), 0.0)
    msg = filter_fn(q * inv_sqrt)
    return msg * inv_sqrt


def _crf_core(
    img_pad: jnp.ndarray,  # (P, P, 3) f32 0-255
    probs_pad: jnp.ndarray,  # (P, P, C)
    valid: jnp.ndarray,  # (P, P) f32 {0,1}
    iters: int,
    pos_w: float,
    pos_xy: float,
    bi_w: float,
    bi_xy: float,
    bi_rgb: float,
    reduce: int,
    use_lattice: bool = True,
):
    p = img_pad.shape[0]
    c = probs_pad.shape[-1]
    log_p = jnp.log(jnp.clip(probs_pad, 1e-8, 1.0))

    rp = p // reduce
    if reduce == 1:
        img_r = img_pad
    else:
        # masked downsample: img_pad is zero outside the true image, so a
        # plain bilinear reduce would blend black pad pixels into boundary
        # RGB features (wrong bilateral affinities at the image edge).
        # Renormalizing by the downsampled valid mask keeps boundary features
        # equal to the average of VALID contributing pixels only.
        img_v = resize_bilinear((img_pad * valid[..., None])[None], (rp, rp))[0]
        w_v = resize_bilinear(valid[..., None][None], (rp, rp))[0]
        img_r = img_v / jnp.maximum(w_v, 1e-6)
    ys = jax.lax.broadcasted_iota(jnp.float32, (rp, rp), 0) * reduce
    xs = jax.lax.broadcasted_iota(jnp.float32, (rp, rp), 1) * reduce
    feats = jnp.stack([xs / bi_xy, ys / bi_xy], axis=-1)
    feats = jnp.concatenate([feats, img_r / bi_rgb], axis=-1).reshape(rp * rp, 5)

    if reduce == 1 and use_lattice:
        from cosa_tpu.ops.permutohedral import apply_lattice, build_lattice

        # features are fixed across mean-field iterations: build the lattice
        # structure ONCE and re-apply it per message (2 filters/iteration),
        # keeping the compile-hostile sort/search out of the iteration body
        lat = build_lattice(feats)

        def bilateral_full(qmap):  # (P, P, C or 1), full-res lattice
            out = apply_lattice(lat, qmap.reshape(p * p, -1))
            return out.reshape(p, p, -1)

    else:

        def bilateral_full(qmap):  # exact matmul at 1/reduce res
            if reduce == 1:
                out = _bilateral_exact_chunked(feats, qmap.reshape(p * p, -1))
                return out.reshape(p, p, -1)
            qr = resize_bilinear(qmap[None], (rp, rp))[0]
            out = _bilateral_exact_chunked(feats, qr.reshape(rp * rp, -1))
            out = out.reshape(rp, rp, -1)
            return resize_bilinear(out[None], (p, p))[0]

    def spatial_full(qmap):
        return _spatial_filter(qmap, pos_xy)

    q = jax.nn.softmax(log_p, axis=-1) * valid[..., None]
    vmask = valid[..., None]
    for _ in range(iters):
        m_pos = _normalized_message(spatial_full, q, vmask)
        m_bi = _normalized_message(bilateral_full, q, vmask)
        logits = log_p + pos_w * m_pos + bi_w * m_bi
        q = jax.nn.softmax(logits, axis=-1) * vmask
    return jnp.argmax(q, axis=-1).astype(jnp.int32)


_crf_padded = jax.jit(_crf_core, static_argnums=(3, 4, 5, 6, 7, 8, 9, 10))


def crf_labels_device(cfg, img_pad, probs_pad, valid) -> jnp.ndarray:
    """Batched device mean-field: img_pad (B, P, P, 3) f32 0-255, probs_pad
    (B, P, P, C), valid (B, P, P) f32 -> (B, P, P) i32 refined labels.

    Meant to be traced INSIDE the caller's jit (the eval step calls it right
    after the TTA forward, so the softmax probs never leave the device —
    the reference round-trips them to pydensecrf on host per image,
    evaluation_engine.py:205-211). Uses the exact Gaussian transform at
    ``cfg.crf_reduce``-reduced resolution (crf_reduce=1 runs the exact
    O(N^2) transform at FULL resolution — more faithful than any lattice,
    but ~16x the default's cost) — see crf_refine_host for the host/parity
    alternatives.
    """
    fn = lambda i, p, v: _crf_core(
        i, p, v,
        int(cfg.crf_iter), float(cfg.crf_pos_w), float(cfg.crf_pos_xy),
        float(cfg.crf_bi_w), float(cfg.crf_bi_xy), float(cfg.crf_bi_rgb),
        int(cfg.crf_reduce), False,  # exact transform at every reduce
    )
    return jax.vmap(fn)(img_pad, probs_pad, valid)


def _np_spatial_filter(q: np.ndarray, sigma: float) -> np.ndarray:
    h, w = q.shape[:2]
    gh, gw = _gauss_band(h, sigma), _gauss_band(w, sigma)
    y = np.tensordot(gh, q, axes=[[1], [0]])
    y = np.tensordot(gw, y, axes=[[1], [1]])
    return np.moveaxis(y, 0, 1)


def crf_refine_native(cfg, img: np.ndarray, probs: np.ndarray) -> np.ndarray:
    """Host mean-field with the native C++ lattice (cosa_tpu/native) for the
    bilateral message — the same division of labor as the reference's
    pydensecrf (host C++ at final eval, evaluation_engine.py:205-211)."""
    from cosa_tpu.native.build import lattice_gaussian_cpu

    h, w = img.shape[:2]
    c = probs.shape[-1]
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    feats = np.concatenate(
        [
            (xs / cfg.crf_bi_xy)[..., None],
            (ys / cfg.crf_bi_xy)[..., None],
            img.astype(np.float32) / cfg.crf_bi_rgb,
        ],
        axis=-1,
    ).reshape(-1, 5)

    def bilateral(qmap):  # (H, W, K)
        out = lattice_gaussian_cpu(feats, qmap.reshape(h * w, -1))
        return out.reshape(h, w, -1)

    def normalized(filter_fn, q):
        norm = filter_fn(np.ones((h, w, 1), np.float32))
        inv = np.where(norm > 1e-20, 1.0 / np.sqrt(norm), 0.0)
        return filter_fn(q * inv) * inv

    log_p = np.log(np.clip(probs, 1e-8, 1.0))
    q = probs.astype(np.float32)
    for _ in range(int(cfg.crf_iter)):
        m_pos = normalized(lambda x: _np_spatial_filter(x, cfg.crf_pos_xy), q)
        m_bi = normalized(bilateral, q)
        logits = log_p + cfg.crf_pos_w * m_pos + cfg.crf_bi_w * m_bi
        logits -= logits.max(axis=-1, keepdims=True)
        e = np.exp(logits)
        q = e / e.sum(axis=-1, keepdims=True)
    return np.argmax(q, axis=-1).astype(np.int32)


def crf_refine_host(cfg, img: np.ndarray, probs: np.ndarray) -> np.ndarray:
    """img: (H, W, 3) uint8; probs: (H, W, C) softmax seg probs.
    Returns the refined (H, W) int label map.

    Dispatch honors ``cfg.crf_backend``:
      * "native": host C++ lattice at full res (pydensecrf's division of
        labor) — raises if the native library cannot be built, rather than
        silently producing numbers from a different backend;
      * "jax": jitted single-image mean-field (full-res lattice when
        crf_reduce == 1, else exact transform at 1/crf_reduce res);
      * "device" callers never reach this function (the eval step refines
        in-jit via crf_labels_device), but if called directly it behaves
        like "native" with a "jax" fallback."""
    backend = getattr(cfg, "crf_backend", "device")
    if backend in ("native", "device"):
        try:
            from cosa_tpu.native.build import load_native

            load_native()
            return crf_refine_native(cfg, img, probs)
        except Exception:
            if backend == "native":
                raise
    h, w = img.shape[:2]
    pad = 500 if cfg.dataset == "VOC12" else 640
    pad = max(pad, h, w)
    pad = int(np.ceil(pad / 4) * 4)
    img_pad = np.zeros((pad, pad, 3), np.float32)
    img_pad[:h, :w] = img
    probs_pad = np.zeros((pad, pad, probs.shape[-1]), np.float32)
    probs_pad[:h, :w] = probs
    valid = np.zeros((pad, pad), np.float32)
    valid[:h, :w] = 1.0
    out = _crf_padded(
        jnp.asarray(img_pad),
        jnp.asarray(probs_pad),
        jnp.asarray(valid),
        int(cfg.crf_iter),
        float(cfg.crf_pos_w),
        float(cfg.crf_pos_xy),
        float(cfg.crf_bi_w),
        float(cfg.crf_bi_xy),
        float(cfg.crf_bi_rgb),
        int(getattr(cfg, "crf_reduce", 1)),
    )
    return np.asarray(out)[:h, :w]
