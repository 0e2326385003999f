"""TPU-only numeric parity checks for the custom Pallas kernels.

The CI suite runs on CPU (conftest forces the platform from
COSA_TEST_PLATFORM, default "cpu") where the kernels are not dispatched;
these tests run the real Mosaic lowerings and are skipped off-TPU. Run
manually with the TPU platform name, e.g.:

    COSA_TEST_PLATFORM=axon python -m pytest tests/test_tpu_kernels.py -q
    # (bare-metal TPU hosts: COSA_TEST_PLATFORM=tpu)

(Plain JAX_PLATFORMS='' does NOT work: conftest.py overwrites it.)
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="needs a real TPU backend"
)


def test_flash_attention_matches_xla_reference():
    from cosa_tpu.kernels.flash import mha

    B, N, H, D = 2, 785, 12, 64
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, N, H, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, N, H, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, N, H, D)), jnp.float32)
    scale = D ** -0.5

    def ref(q, k, v):
        s = jnp.einsum("bqhd,bkhd->bhqk", q * scale, k)
        p = jax.nn.softmax(s.astype(jnp.float32), axis=-1)
        return jnp.einsum("bhqk,bkhd->bqhd", p, v)

    o1 = jax.jit(lambda q, k, v: mha(q, k, v, scale))(q, k, v)
    o2 = jax.jit(ref)(q, k, v)
    # both paths use bf16 MXU passes -> ~2e-3 agreement at f32 inputs
    assert float(jnp.abs(o1 - o2).max()) < 5e-3

    g1 = jax.jit(
        jax.grad(lambda q, k, v: (mha(q, k, v, scale) ** 2).sum(), (0, 1, 2))
    )(q, k, v)
    g2 = jax.jit(
        jax.grad(lambda q, k, v: (ref(q, k, v) ** 2).sum(), (0, 1, 2))
    )(q, k, v)
    for a, b in zip(g1, g2):
        rel = float(jnp.abs(a - b).max() / (jnp.abs(b).max() + 1e-9))
        assert rel < 1e-2, rel


def test_flash_attention_key_masking():
    from cosa_tpu.kernels.flash import mha

    B, N, H, D = 1, 256, 4, 64
    NV = 197
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((B, N, H, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, N, H, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, N, H, D)), jnp.float32)
    o_masked = jax.jit(lambda q, k, v: mha(q, k, v, D ** -0.5, n_valid=NV))(
        q, k, v
    )
    # exact semantics: masking == attending over the first NV tokens only
    o_trunc = jax.jit(lambda q, k, v: mha(q, k, v, D ** -0.5))(
        q[:, :NV], k[:, :NV], v[:, :NV]
    )
    err = float(jnp.abs(o_masked[:, :NV] - o_trunc).max())
    assert err < 5e-3, err


def test_rff_phi_kernel_matches_f64_reference():
    from cosa_tpu.ops.bilateral import _rff_params, rff_embed

    f = jnp.asarray(
        np.random.default_rng(2).standard_normal((2, 896, 5)), jnp.float32
    )
    phi = jax.jit(lambda f: rff_embed(f, 1024, 0, jnp.bfloat16))(f)
    w, b = _rff_params(1024, 5, 0)
    ref = np.sqrt(2 / 1024) * np.cos(np.asarray(f, np.float64) @ w + b)
    err = np.abs(np.asarray(phi, np.float32) - ref).max()
    # bf16 output quantum at |phi| <= 0.0442 is ~1.7e-4; the f32-FMA
    # projection + poly cos stays within it
    assert err < 3e-4, err
