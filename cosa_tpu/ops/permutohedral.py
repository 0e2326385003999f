"""Permutohedral-lattice Gaussian filtering in pure JAX.

The reference's dense-energy loss and DenseCRF both reduce to the
high-dimensional Gaussian transform ``out = G @ values`` with
``G_ij = exp(-||f_i - f_j||^2/2)``, computed by Krähenbühl's C++/SSE
permutohedral lattice behind SWIG (utils/bilateralfilter/permutohedral.cpp)
— a pointer-chasing hash table, hostile to accelerators.

This is a from-scratch, fully vectorized implementation of the lattice
ALGORITHM (Adams, Baek & Davis, "Fast High-Dimensional Filtering Using the
Permutohedral Lattice", Eurographics 2010) on XLA primitives:

  embed     — the hyperplane projection is a d-step linear recurrence,
              evaluated as vectorized prefix ops;
  simplex   — enclosing-simplex ranks come from one argsort over d+1
              residuals per point;
  hashing   — lattice keys pack into a lexicographic triple of int32s
              (15 bits per coordinate, no collisions possible for any
              realistic feature scale), so "hash table" becomes
              sort + unique + vectorized binary search: all O(n log n) XLA
              ops, no serial probing;
  splat     — one segment_sum over the N*(d+1) (vertex, weight) pairs;
  blur      — d+1 axis passes with [1/2, 1, 1/2] stencils; neighbor lookup is
              a batched binary search into the sorted key array;
  slice     — barycentric gather-accumulate.

Everything is static-shape (the lattice is padded to N*(d+1) sites) and runs
inside jit on TPU — pseudo-label filtering never touches the host.

The filter is split into two stages so the expensive-to-compile structure
build (sort + unique + 12 batched binary searches) can live in its OWN
compiled program while the value filtering stays a pure gather/segment_sum
pipeline that embeds cheaply inside large jits (e.g. the train step):

  build_lattice(features) -> Lattice   sort/unique/neighbor tables; depends
                                       only on the (stop-gradient) features
  apply_lattice(lat, values)           splat -> d+1 blur passes -> slice;
                                       linear in values, all precomputed
                                       indices — no sort, no search

``permutohedral_filter`` composes the two and keeps the original API.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_BITS = 15  # per-coordinate bits inside one packed int32 (2 coords / int32)
_OFF = 1 << (_BITS - 1)


def _elevate(f: jnp.ndarray) -> jnp.ndarray:
    """(N, d) features -> (N, d+1) hyperplane embedding (paper §3 step 1)."""
    n, d = f.shape
    inv_std = np.sqrt(2.0 / 3.0) * (d + 1)
    scale = jnp.asarray(
        [inv_std / np.sqrt((i + 1) * (i + 2)) for i in range(d)], jnp.float32
    )
    cf = f * scale  # (N, d)
    rev_cumsum = jnp.cumsum(cf[:, ::-1], axis=1)[:, ::-1]  # sum_{k>=j} cf[k]
    e0 = rev_cumsum[:, :1]
    j = jnp.arange(1, d + 1, dtype=jnp.float32)
    tail = jnp.concatenate(
        [rev_cumsum[:, 1:], jnp.zeros((n, 1), jnp.float32)], axis=1
    )
    ej = tail - j[None, :] * cf
    return jnp.concatenate([e0, ej], axis=1)


def _simplex(elevated: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Enclosing simplex: greedy rounding + rank fixup (paper §3 step 2).

    Returns (rem0 (N, d+1) int32, rank (N, d+1) int32, bary (N, d+1) f32).
    """
    n, dp1 = elevated.shape
    d = dp1 - 1
    v = elevated / dp1
    up = jnp.ceil(v) * dp1
    down = jnp.floor(v) * dp1
    rem0 = jnp.where(up - elevated < elevated - down, up, down)

    diff = elevated - rem0
    order = jnp.argsort(-diff, axis=1, stable=True)
    rank = jnp.argsort(order, axis=1).astype(jnp.int32)

    h = jnp.round(jnp.sum(rem0, axis=1) / dp1).astype(jnp.int32)
    rank = rank + h[:, None]
    low, high = rank < 0, rank > d
    rem0 = rem0 + jnp.where(low, dp1, 0) - jnp.where(high, dp1, 0)
    rank = rank + jnp.where(low, dp1, 0) - jnp.where(high, dp1, 0)

    t = (elevated - rem0) / dp1
    oh_a = jax.nn.one_hot(d - rank, d + 2, dtype=jnp.float32)
    oh_b = jax.nn.one_hot(d + 1 - rank, d + 2, dtype=jnp.float32)
    bary = jnp.einsum("nkc,nk->nc", oh_a - oh_b, t)
    bary = bary.at[:, 0].add(1.0 + bary[:, d + 1])
    return rem0.astype(jnp.int32), rank, bary[:, : d + 1]


def _pack3(keys: jnp.ndarray) -> jnp.ndarray:
    """(M, d<=6) int coords -> (M, 3) int32 lexicographic composite key."""
    d = keys.shape[1]
    k = jnp.clip(keys.astype(jnp.int32) + _OFF, 0, (1 << _BITS) - 1)
    cols = []
    for i in range(0, 6, 2):
        a = k[:, i] if i < d else jnp.zeros_like(k[:, 0])
        b = k[:, i + 1] if i + 1 < d else jnp.zeros_like(k[:, 0])
        cols.append((a << _BITS) | b)
    return jnp.stack(cols, axis=1)  # (M, 3)


def _lex_less(a0, a1, a2, b0, b1, b2):
    return (a0 < b0) | ((a0 == b0) & ((a1 < b1) | ((a1 == b1) & (a2 < b2))))


def _searchsorted3(sorted_keys: jnp.ndarray, queries: jnp.ndarray) -> jnp.ndarray:
    """Left-insertion index of each query row into lexicographically sorted
    (M, 3) keys. Batched binary search (ceil(log2 M) gather rounds)."""
    m = sorted_keys.shape[0]
    nq = queries.shape[0]
    steps = int(np.ceil(np.log2(max(m, 2))))
    q0, q1, q2 = queries[:, 0], queries[:, 1], queries[:, 2]

    lo = jnp.zeros((nq,), jnp.int32)
    hi = jnp.full((nq,), m, jnp.int32)

    def body(_, carry):
        lo, hi = carry
        mid = (lo + hi) >> 1
        s = sorted_keys[jnp.clip(mid, 0, m - 1)]
        less = _lex_less(s[:, 0], s[:, 1], s[:, 2], q0, q1, q2)
        lo = jnp.where(less, mid + 1, lo)
        hi = jnp.where(less, hi, mid)
        return lo, hi

    lo, hi = jax.lax.fori_loop(0, steps + 1, body, (lo, hi))
    return lo


class Lattice(NamedTuple):
    """Precomputed lattice structure (everything data-dependent that is NOT a
    function of the filtered values). All shapes static in n and d."""

    uid: jnp.ndarray      # (n*(d+1),) int32 — lattice row per (point, vertex)
    bary: jnp.ndarray     # (n, d+1) f32 — barycentric splat/slice weights
    nbr_idx: jnp.ndarray  # (d+1, 2, m) int32 — blur neighbor row (clipped)
    nbr_ok: jnp.ndarray   # (d+1, 2, m) bool — neighbor actually exists


def build_lattice(features: jnp.ndarray) -> Lattice:
    """Stage 1: lattice structure from (N, d) features.

    Contains every compile-hostile op (variadic sort, unique, batched binary
    search); compile it standalone, not inside a large program."""
    n, d = features.shape
    dp1 = d + 1

    elevated = _elevate(features)
    rem0, rank, bary = _simplex(elevated)

    keys_list = []
    for r in range(dp1):
        off = jnp.where(rank >= dp1 - r, r - dp1, r)
        keys_list.append((rem0 + off)[:, :d])
    keys = jnp.stack(keys_list, axis=1)  # (N, d+1, d)
    flat_keys = keys.reshape(n * dp1, d)
    packed = _pack3(flat_keys)  # (N*dp1, 3)
    m = n * dp1

    idx0 = jnp.arange(m, dtype=jnp.int32)
    s0, s1, s2, sort_idx = jax.lax.sort(
        (packed[:, 0], packed[:, 1], packed[:, 2], idx0), num_keys=3
    )
    sorted_packed = jnp.stack([s0, s1, s2], axis=1)
    same = (
        (s0[1:] == s0[:-1]) & (s1[1:] == s1[:-1]) & (s2[1:] == s2[:-1])
    )
    is_new = jnp.concatenate(
        [jnp.ones((1,), jnp.int32), (~same).astype(jnp.int32)]
    )
    uid_sorted = (jnp.cumsum(is_new) - 1).astype(jnp.int32)
    uid = jnp.zeros((m,), jnp.int32).at[sort_idx].set(uid_sorted)

    big = jnp.iinfo(jnp.int32).max
    unique_packed = jnp.full((m, 3), big, jnp.int32).at[uid_sorted].set(
        sorted_packed
    )
    unique_keys = jnp.zeros((m, d), jnp.int32).at[uid_sorted].set(
        flat_keys[sort_idx]
    )

    # all 2*(d+1) blur-neighbor key sets resolved by ONE batched binary
    # search (fewer op instances than 12 separate searches)
    deltas = np.ones((dp1, d), np.int32)
    for a in range(d):
        deltas[a, a] -= dp1
    deltas = jnp.asarray(deltas)  # (dp1, d); row d is all-ones
    nk = jnp.stack(
        [
            unique_keys[None, :, :] + deltas[:, None, :],
            unique_keys[None, :, :] - deltas[:, None, :],
        ],
        axis=1,
    )  # (dp1, 2, m, d)
    npacked = _pack3(nk.reshape(dp1 * 2 * m, d))
    pos = _searchsorted3(unique_packed, npacked)
    posc = jnp.clip(pos, 0, m - 1)
    found = jnp.all(unique_packed[posc] == npacked, axis=1)
    return Lattice(
        uid=uid,
        bary=bary,
        nbr_idx=posc.reshape(dp1, 2, m),
        nbr_ok=found.reshape(dp1, 2, m),
    )


def apply_lattice(
    lat: Lattice,
    values: jnp.ndarray,
    with_norm: bool = False,
    gain: float = 1.0,
) -> jnp.ndarray:
    """Stage 2: splat -> (d+1)-axis blur -> slice with precomputed indices.
    Pure segment_sum + gathers — embeds cheaply inside large jits. Linear in
    ``values``; bit-identical to the fused filter."""
    n, dp1 = lat.bary.shape
    m = n * dp1
    if with_norm:
        values = jnp.concatenate([values, jnp.ones((n, 1), values.dtype)], axis=1)
    k = values.shape[1]

    # ---- splat ----
    w = lat.bary.reshape(m, 1)
    vals = jnp.repeat(values, dp1, axis=0)
    lattice = jax.ops.segment_sum(vals * w, lat.uid, num_segments=m)

    # ---- blur along each lattice direction ----
    for a in range(dp1):
        v1 = jnp.where(lat.nbr_ok[a, 0][:, None], lattice[lat.nbr_idx[a, 0]], 0.0)
        v2 = jnp.where(lat.nbr_ok[a, 1][:, None], lattice[lat.nbr_idx[a, 1]], 0.0)
        lattice = lattice + 0.5 * (v1 + v2)

    # ---- slice ----
    d = dp1 - 1
    alpha = 1.0 / (1.0 + 2.0 ** (-d))
    gathered = lattice[lat.uid].reshape(n, dp1, k)
    out = jnp.einsum("nrk,nr->nk", gathered, lat.bary) * (alpha * gain)

    if with_norm:
        norm = out[:, -1:]
        out = out[:, :-1] / jnp.clip(norm, 1e-20, None)
    return out


@functools.partial(jax.jit, static_argnames=("with_norm", "gain"))
def permutohedral_filter(
    features: jnp.ndarray,
    values: jnp.ndarray,
    with_norm: bool = False,
    gain: float = 1.0,
) -> jnp.ndarray:
    """Gaussian transform via the lattice. features: (N, d); values: (N, K).

    Returns ~ gain * G @ values. With ``with_norm`` an all-ones channel is
    appended and the output divided by it (the normalized transform used by
    DenseCRF-style inference; the gain then cancels).
    """
    return apply_lattice(build_lattice(features), values, with_norm, gain)
