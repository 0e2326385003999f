"""PAR parity vs a torch oracle of the reference algorithm (models/PAR.py),
and GMM threshold parity vs sklearn (utils/seg_helper.py:924-943)."""

import numpy as np
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from cosa_tpu.ops.gmm import gmm_thresholds
from cosa_tpu.ops.par import par_refine

RNG = np.random.default_rng(0)


def _torch_par(imgs, masks, dilations, num_iter, w1=0.3, w2=0.01):
    """Oracle restating models/PAR.py:26-91 (NCHW)."""
    def get_kernel():
        k = torch.zeros(8, 1, 3, 3)
        pos = [(0, 0), (0, 1), (0, 2), (1, 0), (1, 2), (2, 0), (2, 1), (2, 2)]
        for i, (y, x) in enumerate(pos):
            k[i, 0, y, x] = 1
        return k

    kernel = get_kernel()

    def neighbors(x):
        b, c, h, w = x.shape
        outs = []
        for d in dilations:
            xp = F.pad(x, [d] * 4, mode="replicate")
            xp = xp.reshape(b * c, 1, xp.shape[-2], xp.shape[-1])
            o = F.conv2d(xp, kernel, dilation=d).view(b, c, 8, h, w)
            outs.append(o)
        return torch.cat(outs, dim=2)

    imgs = torch.from_numpy(imgs)
    masks = torch.from_numpy(masks)
    masks = F.interpolate(masks, size=imgs.shape[-2:], mode="bilinear",
                          align_corners=True)
    b, c, h, w = imgs.shape
    _imgs = neighbors(imgs)
    ker = torch.ones(1, 1, 8, 1, 1)
    for i in (0, 2, 5, 7):
        ker[0, 0, i] = np.sqrt(2)
    pos = torch.cat([ker * d for d in dilations], dim=2)

    rep = imgs.unsqueeze(2).repeat(1, 1, _imgs.shape[2], 1, 1)
    pos_rep = pos.repeat(b, 1, 1, h, w)
    aff = -((torch.abs(_imgs - rep) / (_imgs.std(dim=2, keepdim=True) + 1e-8) / w1) ** 2)
    aff = aff.mean(dim=1, keepdim=True)
    pos_aff = -((pos_rep / (pos_rep.std(dim=2, keepdim=True) + 1e-8) / w1) ** 2)
    aff = F.softmax(aff, dim=2) + w2 * F.softmax(pos_aff, dim=2)
    for _ in range(num_iter):
        masks = (neighbors(masks) * aff).sum(2)
    return masks.numpy()


def test_par_matches_torch_oracle():
    imgs = RNG.random((2, 3, 12, 12)).astype(np.float32)
    masks = RNG.random((2, 4, 6, 6)).astype(np.float32)
    ref = _torch_par(imgs, masks, dilations=[1, 2], num_iter=3)
    ours = par_refine(
        jnp.asarray(np.moveaxis(imgs, 1, -1)),
        jnp.asarray(np.moveaxis(masks, 1, -1)),
        dilations=(1, 2),
        num_iter=3,
    )
    np.testing.assert_allclose(
        np.asarray(ours), np.moveaxis(ref, 1, -1), rtol=1e-4, atol=1e-5
    )


def test_gmm_thresholds_close_to_sklearn():
    import sklearn.mixture as skm

    # trimodal CAM-max-like data in [0, 1]
    x = np.concatenate([
        RNG.normal(0.15, 0.05, 2000),
        RNG.normal(0.5, 0.08, 1500),
        RNG.normal(0.85, 0.05, 1500),
    ]).clip(0.0, 1.0).astype(np.float32)

    q = x[x > 0.05].reshape(-1, 1)
    gmm = skm.GaussianMixture(
        3,
        weights_init=[1 / 3] * 3,
        means_init=[[q.min()], [np.median(q)], [q.max()]],
        precisions_init=[[[1.0]], [[1.0]], [[1.0]]],
    )
    pred = gmm.fit_predict(q)
    ref_low = q[pred == 0].max()
    ref_high = q[pred == 2].min()

    # note: sklearn's tol=1e-3 stops its EM after ~3 iterations on this init
    # (unit variances flatten the lower bound); at convergence our EM finds
    # the true modes and the derived thresholds agree to ~0.03.
    low, high = gmm_thresholds(jnp.asarray(x), filter_thre=0.05, iters=100)
    assert abs(float(low) - ref_low) < 0.05, (float(low), ref_low)
    assert abs(float(high) - ref_high) < 0.05, (float(high), ref_high)
    assert float(low) < float(high)

