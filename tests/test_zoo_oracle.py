"""Numeric torch-oracle parity for the zoo transformer primitives.

Each test initializes OUR flax module, rebuilds the same computation with
plain torch ops from the reference's semantics (mix_transformer.py:56-133
spatial-reduction attention + DWConv MixFFN; mmseg Swin window attention
with relative-position bias; mmcv PatchMerging's nn.Unfold flattening), and
asserts elementwise agreement in f32."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from cosa_tpu.models.zoo.mit import MixFFN, SRAttention
from cosa_tpu.models.zoo.swin import (
    PatchMerging,
    WindowAttention,
    _rel_pos_index,
    _shift_mask,
)

RNG = jax.random.PRNGKey(0)


def _t(a):  # flax param -> torch tensor
    return torch.from_numpy(np.asarray(a, np.float32))


def _lin(x, p):  # torch x @ kernel + bias with flax (in, out) kernel
    w = _t(p["kernel"]).T
    return F.linear(x, w, _t(p["bias"]) if "bias" in p else None)


def _ln(x, p, eps):
    return F.layer_norm(x, (x.shape[-1],), _t(p["scale"]), _t(p["bias"]), eps)


def test_sr_attention_matches_torch():
    b, h, w, c, heads, sr = 2, 8, 6, 16, 2, 2
    x = np.random.default_rng(0).standard_normal((b, h, w, c)).astype(np.float32)
    mod = SRAttention(num_heads=heads, sr_ratio=sr, qkv_bias=True, ln_eps=1e-6)
    params = mod.init(RNG, jnp.asarray(x))["params"]
    ours = np.asarray(mod.apply({"params": params}, jnp.asarray(x)))

    tx = torch.from_numpy(x)
    q = _lin(tx.reshape(b, h * w, c), params["q"]).reshape(b, h * w, heads, c // heads)
    # sr conv: flax kernel (kh, kw, cin, cout) -> torch (cout, cin, kh, kw)
    wsr = _t(params["sr"]["kernel"]).permute(3, 2, 0, 1)
    kv_in = F.conv2d(tx.permute(0, 3, 1, 2), wsr, _t(params["sr"]["bias"]),
                     stride=sr)
    kv_in = kv_in.permute(0, 2, 3, 1)  # NHWC
    kv_in = _ln(kv_in, params["sr_norm"], 1e-6)
    m = kv_in.shape[1] * kv_in.shape[2]
    kv = _lin(kv_in.reshape(b, m, c), params["kv"]).reshape(b, m, 2, heads, c // heads)
    k, v = kv[:, :, 0], kv[:, :, 1]
    hd = c // heads
    s = torch.einsum("bqhd,bkhd->bhqk", q * hd ** -0.5, k)
    p = torch.softmax(s, dim=-1)
    o = torch.einsum("bhqk,bkhd->bqhd", p, v).reshape(b, h * w, c)
    ref = _lin(o, params["proj"]).reshape(b, h, w, c).numpy()
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-5)


def test_mix_ffn_matches_torch():
    b, h, w, c, hid = 2, 6, 5, 8, 32
    x = np.random.default_rng(1).standard_normal((b, h, w, c)).astype(np.float32)
    mod = MixFFN(hidden=hid)
    params = mod.init(RNG, jnp.asarray(x))["params"]
    ours = np.asarray(mod.apply({"params": params}, jnp.asarray(x)))

    tx = torch.from_numpy(x)
    y = _lin(tx, params["fc1"])
    # depthwise conv: flax kernel (3, 3, 1, hid) with groups=hid ->
    # torch (hid, 1, 3, 3)
    wd = _t(params["dwconv"]["kernel"]).permute(3, 2, 0, 1)
    y = F.conv2d(y.permute(0, 3, 1, 2), wd, _t(params["dwconv"]["bias"]),
                 padding=1, groups=hid).permute(0, 2, 3, 1)
    y = F.gelu(y)  # erf gelu, same as flax approximate=False at f32
    ref = _lin(y, params["fc2"]).numpy()
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("use_mask", [False, True])
def test_window_attention_matches_torch(use_mask):
    wsz, heads, c = 4, 2, 16
    nw, n = 4, wsz * wsz  # 4 windows of 4x4
    bn = 2 * nw
    x = np.random.default_rng(2).standard_normal((bn, n, c)).astype(np.float32)
    mask_np = (
        _shift_mask(8, 8, wsz, wsz // 2, 7, 8) if use_mask else None
    )
    mod = WindowAttention(num_heads=heads, window=wsz, qkv_bias=True)
    params = mod.init(
        RNG, jnp.asarray(x), jnp.asarray(mask_np) if use_mask else None
    )["params"]
    ours = np.asarray(mod.apply(
        {"params": params}, jnp.asarray(x),
        jnp.asarray(mask_np) if use_mask else None,
    ))

    tx = torch.from_numpy(x)
    hd = c // heads
    qkv = _lin(tx, params["qkv"]).reshape(bn, n, 3, heads, hd)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    s = torch.einsum("bqhd,bkhd->bhqk", q * hd ** -0.5, k)
    table = _t(params["rel_pos_bias"])  # ((2w-1)^2, heads)
    bias = table[torch.from_numpy(_rel_pos_index(wsz)).long()]  # (n, n, h)
    s = s + bias.permute(2, 0, 1)[None]
    if use_mask:
        tm = torch.from_numpy(mask_np)
        s = s.reshape(bn // nw, nw, heads, n, n) + tm[None, :, None]
        s = s.reshape(bn, heads, n, n)
    p = torch.softmax(s, dim=-1)
    o = torch.einsum("bhqk,bkhd->bqhd", p, v).reshape(bn, n, c)
    ref = _lin(o, params["proj"]).numpy()
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("hw,s", [((7, 5), 1), ((7, 5), 2), ((9, 11), 3),
                                  ((6, 6), 6), ((2, 2), 3), ((5, 4), 6)])
def test_adaptive_avg_pool_matches_torch(hw, s):
    """Exact F.adaptive_avg_pool2d parity for the UPerHead PPM, including
    output grids LARGER than the input (the mmseg swin-at-tiny-grid case
    that NaN'd the earlier floor-divide pooling)."""
    from cosa_tpu.models.zoo.mmseg import adaptive_avg_pool

    x = np.random.default_rng(0).standard_normal((2, *hw, 3)).astype(np.float32)
    ours = np.asarray(adaptive_avg_pool(jnp.asarray(x), s))
    ref = F.adaptive_avg_pool2d(
        torch.from_numpy(x).permute(0, 3, 1, 2), s
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-6)


@pytest.mark.parametrize("h,w", [(8, 8), (9, 7), (17, 17), (10, 13)])
@pytest.mark.parametrize("ceil", [True, False])
def test_max_pool_modes_match_torch(h, w, ceil):
    """The zoo stems' 3x3/s2/p1 max pools vs torch MaxPool2d in both
    rounding modes (MSRA DeepLab stem is ceil_mode=True,
    deeplabs/resnet.py:110; BECO/VGG trunks are floor-mode default)."""
    from cosa_tpu.models.zoo.resnet import max_pool_ceil, max_pool_floor

    x = np.random.default_rng(0).standard_normal((2, h, w, 3)).astype(np.float32)
    fn = max_pool_ceil if ceil else max_pool_floor
    ours = np.asarray(fn(jnp.asarray(x), 3, 2, 1))
    ref = F.max_pool2d(
        torch.from_numpy(x).permute(0, 3, 1, 2), 3, 2, 1, ceil_mode=ceil
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref, atol=0)


@pytest.mark.parametrize("train", [False, True])
def test_msra_bottleneck_matches_torch(train):
    """One MSRA bottleneck (stride-on-reduce, dilated 3x3) vs a torch
    conv/BN/ReLU chain built from the same params, in eval AND train mode
    (batch-stats normalization)."""
    from cosa_tpu.models.zoo.resnet import MSRABottleneck

    b, h, w, cin, cout = 2, 9, 7, 8, 16
    x = np.random.default_rng(0).standard_normal((b, h, w, cin)).astype(np.float32)
    mod = MSRABottleneck(out_ch=cout, stride=2, dilation=2, downsample=True)
    vs = mod.init(RNG, jnp.asarray(x))
    ours, _ = mod.apply(vs, jnp.asarray(x), train=train,
                        mutable=["batch_stats"])
    ours = np.asarray(ours)

    def convbn(tx, p, bs, stride, pad, dil, relu):
        wt = _t(p["conv"]["kernel"]).permute(3, 2, 0, 1)
        y = F.conv2d(tx, wt, None, stride=stride, padding=pad, dilation=dil)
        y = F.batch_norm(
            y, _t(bs["bn"]["mean"]), _t(bs["bn"]["var"]),
            _t(p["bn"]["scale"]), _t(p["bn"]["bias"]),
            training=train, eps=1e-5)
        return F.relu(y) if relu else y

    p, bs = vs["params"], vs["batch_stats"]
    tx = torch.from_numpy(x).permute(0, 3, 1, 2)
    hmid = convbn(tx, p["reduce"], bs["reduce"], 2, 0, 1, True)
    hmid = convbn(hmid, p["conv3x3"], bs["conv3x3"], 1, 2, 2, True)
    hmid = convbn(hmid, p["increase"], bs["increase"], 1, 0, 1, False)
    sc = convbn(tx, p["shortcut"], bs["shortcut"], 2, 0, 1, False)
    ref = F.relu(hmid + sc).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref, atol=3e-5, rtol=1e-4)


@pytest.mark.parametrize("hh,ww,shift", [(7, 8, 2), (7, 7, 2), (8, 8, 2),
                                         (5, 6, 2), (7, 8, 0)])
def test_shift_mask_pad_and_region_oracle(hh, ww, shift):
    """_shift_mask ground truth from first principles: the window canvas is
    POST-roll, where position (i, j) holds pre-roll token ((i+shift)%hp,
    (j+shift)%wp). Every pad token must be masked as a key for every query;
    every valid (query, key) pair in the same shift region must be open."""
    from cosa_tpu.models.zoo.swin import _shift_mask

    w = 4
    hp, wp = -(-hh // w) * w, -(-ww // w) * w
    mask = _shift_mask(hp, wp, w, shift, hh, ww)

    # oracle: post-roll pad flags and region ids per position
    def preroll(i, j):
        return (i + shift) % hp, (j + shift) % wp

    def region(i, j):  # official Swin region id of POST-roll position
        def band(x, n):
            if x < n - w:
                return 0
            return 1 if x < n - shift else 2
        if shift == 0:
            return 0
        return band(i, hp) * 3 + band(j, wp)

    nwh, nww = hp // w, wp // w
    for wi in range(nwh * nww):
        wy, wx = divmod(wi, nww)
        cells = [(wy * w + a, wx * w + b) for a in range(w) for b in range(w)]
        for qi, (qy, qx) in enumerate(cells):
            py, px = preroll(qy, qx)
            q_pad = py >= hh or px >= ww
            for ki, (ky, kx) in enumerate(cells):
                ky0, kx0 = preroll(ky, kx)
                k_pad = ky0 >= hh or kx0 >= ww
                open_ = mask[wi, qi, ki] == 0
                if k_pad:
                    assert not open_, (wi, qi, ki, "pad key attendable")
                elif not q_pad:
                    want = region(qy, qx) == region(ky, kx)
                    assert open_ == want, (wi, qi, ki, "region mismatch")
            if not q_pad:  # a valid query must keep at least itself
                assert mask[wi, qi, qi] == 0


def _shapes(tree):
    return jax.tree_util.tree_map(lambda a: tuple(a.shape), tree)


def test_swin_mmseg_checkpoint_converts():
    from cosa_tpu.models.convert import swin_params_from_mmseg
    from cosa_tpu.models.zoo.swin import SWIN_CONFIGS, SwinBackbone

    cfg = SWIN_CONFIGS["swin_tiny_test"]
    model = SwinBackbone(cfg)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    ref = model.init(RNG, x)["params"]

    rng = np.random.default_rng(0)
    t = lambda *s: torch.from_numpy(rng.standard_normal(s).astype(np.float32))
    d, w = cfg.embed_dim, cfg.window
    sd = {
        "backbone.patch_embed.projection.weight": t(d, 3, 4, 4),
        "backbone.patch_embed.projection.bias": t(d),
        "backbone.patch_embed.norm.weight": t(d),
        "backbone.patch_embed.norm.bias": t(d),
    }
    c = d
    for si, depth in enumerate(cfg.depths):
        for bi in range(depth):
            b = f"backbone.stages.{si}.blocks.{bi}."
            sd.update({
                b + "norm1.weight": t(c), b + "norm1.bias": t(c),
                b + "norm2.weight": t(c), b + "norm2.bias": t(c),
                b + "attn.w_msa.qkv.weight": t(3 * c, c),
                b + "attn.w_msa.qkv.bias": t(3 * c),
                b + "attn.w_msa.proj.weight": t(c, c),
                b + "attn.w_msa.proj.bias": t(c),
                b + "attn.w_msa.relative_position_bias_table":
                    t((2 * w - 1) ** 2, cfg.num_heads[si]),
                b + "ffn.layers.0.0.weight": t(4 * c, c),
                b + "ffn.layers.0.0.bias": t(4 * c),
                b + "ffn.layers.1.weight": t(c, 4 * c),
                b + "ffn.layers.1.bias": t(c),
            })
        sd[f"backbone.norm{si}.weight"] = t(c)
        sd[f"backbone.norm{si}.bias"] = t(c)
        if si < 3:
            sd.update({
                f"backbone.stages.{si}.downsample.norm.weight": t(4 * c),
                f"backbone.stages.{si}.downsample.norm.bias": t(4 * c),
                f"backbone.stages.{si}.downsample.reduction.weight": t(2 * c, 4 * c),
            })
            c *= 2
    conv = swin_params_from_mmseg(sd, cfg.depths)
    assert _shapes(ref) == _shapes(conv)
    outs, blocks = model.apply({"params": conv}, x)
    assert np.all(np.isfinite(np.asarray(outs[-1])))


def test_mit_segformer_checkpoint_converts():
    from cosa_tpu.models.convert import mit_params_from_torch
    from cosa_tpu.models.zoo.mit import MIT_CONFIGS, MixVisionTransformer

    cfg = MIT_CONFIGS["mit_tiny_test"]
    model = MixVisionTransformer(cfg)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    ref = model.init(RNG, x)["params"]

    rng = np.random.default_rng(0)
    t = lambda *s: torch.from_numpy(rng.standard_normal(s).astype(np.float32))
    sd = {}
    cin = 3
    for si, depth in enumerate(cfg.depths):
        s, c = si + 1, cfg.embed_dims[si]
        patch = 7 if si == 0 else 3
        sd.update({
            f"patch_embed{s}.proj.weight": t(c, cin, patch, patch),
            f"patch_embed{s}.proj.bias": t(c),
            f"patch_embed{s}.norm.weight": t(c),
            f"patch_embed{s}.norm.bias": t(c),
            f"norm{s}.weight": t(c), f"norm{s}.bias": t(c),
        })
        cin = c
        hid = c * cfg.mlp_ratios[si]
        for bi in range(depth):
            b = f"block{s}.{bi}."
            sd.update({
                b + "norm1.weight": t(c), b + "norm1.bias": t(c),
                b + "norm2.weight": t(c), b + "norm2.bias": t(c),
                b + "attn.q.weight": t(c, c), b + "attn.q.bias": t(c),
                b + "attn.kv.weight": t(2 * c, c), b + "attn.kv.bias": t(2 * c),
                b + "attn.proj.weight": t(c, c), b + "attn.proj.bias": t(c),
                b + "mlp.fc1.weight": t(hid, c), b + "mlp.fc1.bias": t(hid),
                b + "mlp.dwconv.dwconv.weight": t(hid, 1, 3, 3),
                b + "mlp.dwconv.dwconv.bias": t(hid),
                b + "mlp.fc2.weight": t(c, hid), b + "mlp.fc2.bias": t(c),
            })
            if cfg.sr_ratios[si] > 1:
                sd.update({
                    b + "attn.sr.weight": t(c, c, cfg.sr_ratios[si], cfg.sr_ratios[si]),
                    b + "attn.sr.bias": t(c),
                    b + "attn.norm.weight": t(c), b + "attn.norm.bias": t(c),
                })
    conv = mit_params_from_torch(sd, cfg.depths)
    assert _shapes(ref) == _shapes(conv)
    outs = model.apply({"params": conv}, x)
    assert np.all(np.isfinite(np.asarray(outs[-1])))


def test_swin_pretrained_load_into_state():
    """load_pretrained_into_state routes 'swinend2end' checkpoints through
    swin_params_from_mmseg, drops the stage norms SwinNetwork doesn't build
    (strict=False semantics), and overlays student AND teacher."""
    import os
    import tempfile

    from cosa_tpu.config import preset_config
    from cosa_tpu.models import build_model
    from cosa_tpu.models.convert import load_pretrained_into_state
    from cosa_tpu.models.zoo.swin import SWIN_CONFIGS
    from cosa_tpu.train import create_train_state

    scfg = SWIN_CONFIGS["swin_tiny_test"]
    rng = np.random.default_rng(7)
    t = lambda *s: torch.from_numpy(rng.standard_normal(s).astype(np.float32))
    d, w = scfg.embed_dim, scfg.window
    sd = {
        "backbone.patch_embed.projection.weight": t(d, 3, 4, 4),
        "backbone.patch_embed.projection.bias": t(d),
        "backbone.patch_embed.norm.weight": t(d),
        "backbone.patch_embed.norm.bias": t(d),
    }
    c = d
    for si, depth in enumerate(scfg.depths):
        for bi in range(depth):
            b = f"backbone.stages.{si}.blocks.{bi}."
            sd.update({
                b + "norm1.weight": t(c), b + "norm1.bias": t(c),
                b + "norm2.weight": t(c), b + "norm2.bias": t(c),
                b + "attn.w_msa.qkv.weight": t(3 * c, c),
                b + "attn.w_msa.qkv.bias": t(3 * c),
                b + "attn.w_msa.proj.weight": t(c, c),
                b + "attn.w_msa.proj.bias": t(c),
                b + "attn.w_msa.relative_position_bias_table":
                    t((2 * w - 1) ** 2, scfg.num_heads[si]),
                b + "ffn.layers.0.0.weight": t(4 * c, c),
                b + "ffn.layers.0.0.bias": t(4 * c),
                b + "ffn.layers.1.weight": t(c, 4 * c),
                b + "ffn.layers.1.bias": t(c),
            })
        sd[f"backbone.norm{si}.weight"] = t(c)
        sd[f"backbone.norm{si}.bias"] = t(c)
        if si < 3:
            sd.update({
                f"backbone.stages.{si}.downsample.norm.weight": t(4 * c),
                f"backbone.stages.{si}.downsample.norm.bias": t(4 * c),
                f"backbone.stages.{si}.downsample.reduction.weight": t(2 * c, 4 * c),
            })
            c *= 2

    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "swin.pth")
        torch.save(sd, path)
        cfg = preset_config(
            "synthetic", model="swinend2end", backbone="swin_tiny_test",
            mixed_precision=False, pretrained_path=path, batch_size=1,
        )
        model = build_model(cfg)
        state = create_train_state(cfg, model, 1)
        state = load_pretrained_into_state(cfg, state)

    got = np.asarray(
        state.student["backbone"]["stage1_block0"]["attn"]["qkv"]["kernel"])
    want = sd["backbone.stages.1.blocks.0.attn.w_msa.qkv.weight"].numpy().T
    np.testing.assert_allclose(got, want, atol=0)
    # teacher gets the same overlay
    np.testing.assert_allclose(
        np.asarray(state.teacher["backbone"]["patch_norm"]["scale"]),
        sd["backbone.patch_embed.norm.weight"].numpy(), atol=0)


def test_patch_merging_matches_mmcv_unfold():
    b, h, w, c = 2, 6, 8, 5
    x = np.random.default_rng(3).standard_normal((b, h, w, c)).astype(np.float32)
    mod = PatchMerging(ln_eps=1e-5)
    params = mod.init(RNG, jnp.asarray(x))["params"]
    ours = np.asarray(mod.apply({"params": params}, jnp.asarray(x)))

    # mmcv PatchMerging: nn.Unfold(2, stride 2) -> (B, 4C, L) channel-major
    # features -> transpose -> LN -> Linear(4C -> 2C, no bias)
    tx = torch.from_numpy(x).permute(0, 3, 1, 2)
    cols = F.unfold(tx, kernel_size=2, stride=2)  # (B, C*4, L)
    cols = cols.transpose(1, 2).reshape(b, h // 2, w // 2, 4 * c)
    y = _ln(cols, params["norm"], 1e-5)
    ref = F.linear(y, _t(params["reduction"]["kernel"]).T).numpy()
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-5)
