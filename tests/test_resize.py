"""Parity tests: cosa_tpu.ops.resize vs torch F.interpolate (the reference's
resizing primitive, e.g. utils/seg_helper.py:247, models/vit/vit.py:289)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from cosa_tpu.ops import resize_bilinear, resize_bicubic, resize_nearest
from cosa_tpu.ops.resize import np_resize_bilinear

SIZES = [((7, 9), (14, 18)), ((448, 448), (224, 224)), ((28, 28), (448, 448)),
         ((13, 17), (5, 3)), ((10, 10), (15, 15))]


def _torch_resize(x, size, mode):
    t = torch.from_numpy(np.moveaxis(x, -1, 1))  # NHWC -> NCHW
    kw = {} if mode == "nearest" else {"align_corners": False}
    y = F.interpolate(t, size=size, mode=mode, **kw)
    return np.moveaxis(y.numpy(), 1, -1)


@pytest.mark.parametrize("insize,outsize", SIZES)
def test_bilinear_matches_torch(insize, outsize):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, *insize, 3), dtype=np.float32)
    ours = np.asarray(resize_bilinear(jnp.asarray(x), outsize))
    ref = _torch_resize(x, outsize, "bilinear")
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("insize,outsize", SIZES)
def test_bicubic_matches_torch(insize, outsize):
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, *insize, 2), dtype=np.float32)
    ours = np.asarray(resize_bicubic(jnp.asarray(x), outsize))
    ref = _torch_resize(x, outsize, "bicubic")
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("insize,outsize", SIZES)
def test_nearest_matches_torch(insize, outsize):
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, *insize, 1), dtype=np.float32)
    ours = np.asarray(resize_nearest(jnp.asarray(x), outsize))
    ref = _torch_resize(x, outsize, "nearest")
    np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-6)


def test_nearest_integer_labels():
    rng = np.random.default_rng(3)
    x = rng.integers(0, 255, size=(2, 11, 13, 1), dtype=np.int32)
    ours = np.asarray(resize_nearest(jnp.asarray(x), (22, 26)))
    ref = _torch_resize(x.astype(np.float32), (22, 26), "nearest").astype(np.int32)
    assert ours.dtype == np.int32
    np.testing.assert_array_equal(ours, ref)


def test_np_twin_matches_jax():
    rng = np.random.default_rng(4)
    x = rng.standard_normal((17, 23, 21), dtype=np.float32)
    a = np_resize_bilinear(x, (30, 40))
    b = np.asarray(resize_bilinear(jnp.asarray(x), (30, 40)))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)
