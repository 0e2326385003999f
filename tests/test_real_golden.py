"""Real-photo numeric-drift golden at FULL model size (VERDICT r1 #1b/#2c).

tests/golden/real_image_golden.npz holds the f32 outputs of the torch
oracle of the reference VITNetwork (ViT-B, 92M params, seeded weights) on a
real photograph (grace_hopper.jpg, public domain). This test regenerates
the torch state dict from the seed, converts it through the production
checkpoint converter, runs the JAX forward, and must reproduce the golden
— catching conversion or forward numeric drift on real-image statistics,
at the exact full-size layer count/width the released CoSA checkpoints
have."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cosa_tpu.models import CoSANetwork
from cosa_tpu.models.convert import network_params_from_torch

HERE = os.path.dirname(os.path.abspath(__file__))
GOLDEN = os.path.join(HERE, "golden", "real_image_golden.npz")


@pytest.mark.slow
def test_full_size_conversion_reproduces_real_image_golden():
    from tests.make_real_golden import (
        AUX_LAYER,
        make_full_state_dict,
        preprocess,
    )

    z = np.load(GOLDEN)
    sd = make_full_state_dict(int(z["seed"]))
    params = network_params_from_torch(sd, depth=12)
    n_params = sum(
        x.size for x in jax.tree.leaves(params)
    )
    assert n_params > 90_000_000  # genuinely full-size (92M, voc_log.txt:83)

    x = preprocess(os.path.join(HERE, "golden", "grace_hopper.jpg"))
    model = CoSANetwork(
        num_classes=21, backbone="vit_base_patch16_224", decoder="LargeFOV",
        aux_layer=AUX_LAYER,
    )
    out = model.apply({"params": params}, jnp.asarray(x[None]))

    for key in ("cls", "cls_aux"):
        np.testing.assert_allclose(
            np.asarray(out[key]), z[key], rtol=2e-3, atol=2e-3
        )
    for key in ("seg", "cam", "cam_aux"):
        np.testing.assert_allclose(
            np.asarray(out[key]),
            np.moveaxis(z[key], 1, -1),
            rtol=2e-3, atol=2e-3,
        )
