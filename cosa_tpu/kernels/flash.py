"""Pallas flash-attention kernel (TPU). Implemented in kernels/flash.py once
the end-to-end pipeline is up; until then the dispatcher falls back to the
XLA einsum path."""

from __future__ import annotations


def mha(q, k, v, scale: float):
    raise NotImplementedError
