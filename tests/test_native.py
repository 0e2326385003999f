"""Native C++ filter library: build, and agreement with the JAX lattice and
exact oracle (larger N than the O(N^2) numpy oracle can reach)."""

import numpy as np
import pytest
import jax.numpy as jnp

from cosa_tpu.ops.bilateral import pixel_features
from cosa_tpu.ops.permutohedral import permutohedral_filter

native = pytest.importorskip("cosa_tpu.native.build")


@pytest.fixture(scope="module")
def lib():
    try:
        return native.load_native()
    except Exception as e:  # no compiler in some environments
        pytest.skip(f"native build unavailable: {e}")


def _feats_vals(h=32, w=32, k=8, seed=0):
    r = np.random.default_rng(seed)
    seg = (r.random((4, 4, 3)) * 255).astype(np.float32)
    img = np.clip(
        np.kron(seg, np.ones((h // 4, w // 4, 1))) + r.normal(0, 8, (h, w, 3)),
        0, 255,
    ).astype(np.float32)
    feats = np.asarray(pixel_features(jnp.asarray(img[None]), 15.0, 50.0))
    feats = feats.reshape(-1, 5)
    vals = r.random((h * w, k)).astype(np.float32)
    return feats, vals


def test_cpp_lattice_matches_jax_lattice(lib):
    feats, vals = _feats_vals()
    cpp = native.lattice_gaussian_cpu(feats, vals)
    jax_out = np.asarray(permutohedral_filter(jnp.asarray(feats), jnp.asarray(vals)))
    np.testing.assert_allclose(cpp, jax_out, rtol=2e-4, atol=2e-4)


def test_cpp_exact_matches_jax_lattice_shape(lib):
    feats, vals = _feats_vals(16, 16, 4)
    exact = native.exact_gaussian_cpu(feats, vals)
    lat = native.lattice_gaussian_cpu(feats, vals)
    s = np.vdot(lat, exact) / np.vdot(lat, lat)
    rel = np.linalg.norm(lat * s - exact) / np.linalg.norm(exact)
    assert 1.5 < s < 2.5
    assert rel < 0.15


def test_batched_lattice(lib):
    f1, v1 = _feats_vals(seed=1)
    f2, v2 = _feats_vals(seed=2)
    feats = np.stack([f1, f2])
    vals = np.stack([v1, v2])
    out = native.lattice_gaussian_batch_cpu(feats, vals)
    np.testing.assert_allclose(out[0], native.lattice_gaussian_cpu(f1, v1), rtol=1e-5)
    np.testing.assert_allclose(out[1], native.lattice_gaussian_cpu(f2, v2), rtol=1e-5)
