"""Golden parity: CoSANetwork with converted torch weights must reproduce a
torch oracle of the reference VITNetwork forward (models/vit/vit.py +
models/__init__.py:163-206) to float tolerance.

The torch oracle below restates the published ViT-B architecture exactly as
the reference configures it (qkv_bias, LN eps 1e-6, frozen pos-embed with
bicubic resize, aux tap, LargeFOV decoder, bias-free 1x1 CAM convs, max-pool
cls heads)."""

import math

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from cosa_tpu.models import CoSANetwork
from cosa_tpu.models.convert import network_params_from_torch
from cosa_tpu.models.vit import BACKBONES

CFG = BACKBONES["vit_tiny_test"]  # dim 64, depth 3, heads 4, base 64
NUM_CLASSES = 6
AUX_LAYER = -2


def _torch_state_dict(rng):
    d, depth, mlp = CFG.embed_dim, CFG.depth, int(CFG.embed_dim * CFG.mlp_ratio)
    gs = CFG.base_img_size // CFG.patch_size

    def t(*shape):
        return torch.from_numpy(rng.standard_normal(shape).astype(np.float32) * 0.05)

    sd = {
        "encoder.patch_embed.proj.weight": t(d, 3, 16, 16),
        "encoder.patch_embed.proj.bias": t(d),
        "encoder.cls_token": t(1, 1, d),
        "encoder.pos_embed": t(1, gs * gs + 1, d),
        "encoder.norm.weight": 1 + 0.1 * t(d),
        "encoder.norm.bias": t(d),
        "decoder.conv6.weight": t(512, d, 3, 3),
        "decoder.conv7.weight": t(512, 512, 3, 3),
        "decoder.conv8.weight": t(NUM_CLASSES, 512, 1, 1),
        "classifier.weight": t(NUM_CLASSES - 1, d, 1, 1),
        "aux_classifier.weight": t(NUM_CLASSES - 1, d, 1, 1),
    }
    for i in range(depth):
        b = f"encoder.blocks.{i}."
        sd.update({
            b + "norm1.weight": 1 + 0.1 * t(d), b + "norm1.bias": t(d),
            b + "norm2.weight": 1 + 0.1 * t(d), b + "norm2.bias": t(d),
            b + "attn.qkv.weight": t(3 * d, d), b + "attn.qkv.bias": t(3 * d),
            b + "attn.proj.weight": t(d, d), b + "attn.proj.bias": t(d),
            b + "mlp.fc1.weight": t(mlp, d), b + "mlp.fc1.bias": t(mlp),
            b + "mlp.fc2.weight": t(d, mlp), b + "mlp.fc2.bias": t(d),
        })
    return sd


def _torch_forward(sd, x):
    """Oracle forward (NCHW), following vit.py:283-321 + __init__.py:163-206."""
    d, depth, heads = CFG.embed_dim, CFG.depth, CFG.num_heads
    gs = CFG.base_img_size // CFG.patch_size
    B, _, H, W = x.shape
    h, w = H // 16, W // 16

    tok = F.conv2d(x, sd["encoder.patch_embed.proj.weight"],
                   sd["encoder.patch_embed.proj.bias"], stride=16)
    tok = tok.flatten(2).transpose(1, 2)  # (B, N, D)

    pos = sd["encoder.pos_embed"]
    patch_pos = pos[:, 1:, :].reshape(1, gs, gs, -1).permute(0, 3, 1, 2)
    patch_pos = F.interpolate(patch_pos, size=(h, w), mode="bicubic",
                              align_corners=False)
    patch_pos = patch_pos.reshape(1, -1, h * w).permute(0, 2, 1)
    pos = torch.cat((pos[:, :1, :], patch_pos), dim=1)

    cls_tok = sd["encoder.cls_token"].expand(B, -1, -1)
    tok = torch.cat((cls_tok, tok), dim=1) + pos

    def ln(x, wk, bk):
        return F.layer_norm(x, (d,), sd[wk], sd[bk], eps=1e-6)

    embeds = []
    for i in range(depth):
        b = f"encoder.blocks.{i}."
        y = ln(tok, b + "norm1.weight", b + "norm1.bias")
        qkv = F.linear(y, sd[b + "attn.qkv.weight"], sd[b + "attn.qkv.bias"])
        Bn, N, _ = y.shape
        qkv = qkv.reshape(Bn, N, 3, heads, d // heads).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q @ k.transpose(-2, -1)) * (d // heads) ** -0.5
        attn = attn.softmax(dim=-1)
        o = (attn @ v).transpose(1, 2).reshape(Bn, N, d)
        tok = tok + F.linear(o, sd[b + "attn.proj.weight"], sd[b + "attn.proj.bias"])
        y = ln(tok, b + "norm2.weight", b + "norm2.bias")
        y = F.linear(y, sd[b + "mlp.fc1.weight"], sd[b + "mlp.fc1.bias"])
        y = F.gelu(y)
        y = F.linear(y, sd[b + "mlp.fc2.weight"], sd[b + "mlp.fc2.bias"])
        tok = tok + y
        embeds.append(tok)
    tokn = ln(tok, "encoder.norm.weight", "encoder.norm.bias")
    embeds[-1] = tokn
    _x = tokn[:, 1:]
    x_aux = embeds[AUX_LAYER][:, 1:]

    to2d = lambda t: t.transpose(1, 2).reshape(B, d, h, w)
    _x4, _x_aux = to2d(_x), to2d(x_aux)

    s = F.relu(F.conv2d(_x4, sd["decoder.conv6.weight"], padding=5, dilation=5))
    s = F.relu(F.conv2d(s, sd["decoder.conv7.weight"], padding=5, dilation=5))
    seg = F.conv2d(s, sd["decoder.conv8.weight"])

    cam = F.conv2d(_x4, sd["classifier.weight"])
    cam_aux = F.conv2d(_x_aux, sd["aux_classifier.weight"])
    cls = F.conv2d(F.adaptive_max_pool2d(_x4, (1, 1)), sd["classifier.weight"])
    cls_aux = F.conv2d(F.adaptive_max_pool2d(_x_aux, (1, 1)),
                       sd["aux_classifier.weight"])
    return dict(
        cls=cls.flatten(1), cls_aux=cls_aux.flatten(1),
        seg=seg, cam=cam, cam_aux=cam_aux,
    )


@pytest.mark.parametrize("size", [64, 96])
def test_forward_parity_with_torch_oracle(size):
    rng = np.random.default_rng(0)
    sd = _torch_state_dict(rng)
    x = rng.standard_normal((2, 3, size, size)).astype(np.float32)

    ref = _torch_forward(sd, torch.from_numpy(x))

    model = CoSANetwork(
        num_classes=NUM_CLASSES, backbone="vit_tiny_test", decoder="LargeFOV",
        aux_layer=AUX_LAYER,
    )
    init = model.init(jax.random.PRNGKey(0), jnp.zeros((1, size, size, 3)))
    params = network_params_from_torch(
        {k: v for k, v in sd.items()}, depth=CFG.depth
    )
    # structures must match exactly (same keys)
    ref_paths = {jax.tree_util.keystr(p) for p, _ in
                 jax.tree_util.tree_flatten_with_path(init["params"])[0]}
    got_paths = {jax.tree_util.keystr(p) for p, _ in
                 jax.tree_util.tree_flatten_with_path(params)[0]}
    assert ref_paths == got_paths, ref_paths ^ got_paths

    out = model.apply({"params": params}, jnp.asarray(np.moveaxis(x, 1, -1)))

    for key, ours_key in (("cls", "cls"), ("cls_aux", "cls_aux")):
        np.testing.assert_allclose(
            np.asarray(out[ours_key]), ref[key].numpy(), rtol=2e-4, atol=2e-4
        )
    for key in ("seg", "cam", "cam_aux"):
        np.testing.assert_allclose(
            np.asarray(out[key]),
            np.moveaxis(ref[key].numpy(), 1, -1),
            rtol=2e-4, atol=2e-4,
        )


def _torch_maskformer_sd(rng, d, n_layers=2):
    """Reference MaskTransformer weights (maskformer_head.py:99-164):
    proj_dec, cls_emb, 2 Blocks, proj_patch/classes, decoder_norm/mask_norm."""

    def t(*shape):
        return torch.from_numpy(rng.standard_normal(shape).astype(np.float32) * 0.05)

    sd = {
        "decoder.proj_dec.weight": t(d, d), "decoder.proj_dec.bias": t(d),
        "decoder.cls_emb": t(1, NUM_CLASSES, d),
        "decoder.proj_patch": t(d, d), "decoder.proj_classes": t(d, d),
        "decoder.decoder_norm.weight": 1 + 0.1 * t(d),
        "decoder.decoder_norm.bias": t(d),
        "decoder.mask_norm.weight": 1 + 0.1 * t(NUM_CLASSES),
        "decoder.mask_norm.bias": t(NUM_CLASSES),
    }
    mlp = 4 * d
    for i in range(n_layers):
        b = f"decoder.blocks.{i}."
        sd.update({
            b + "norm1.weight": 1 + 0.1 * t(d), b + "norm1.bias": t(d),
            b + "norm2.weight": 1 + 0.1 * t(d), b + "norm2.bias": t(d),
            b + "attn.qkv.weight": t(3 * d, d), b + "attn.qkv.bias": t(3 * d),
            b + "attn.proj.weight": t(d, d), b + "attn.proj.bias": t(d),
            b + "mlp.fc1.weight": t(mlp, d), b + "mlp.fc1.bias": t(mlp),
            b + "mlp.fc2.weight": t(d, mlp), b + "mlp.fc2.bias": t(d),
        })
    return sd


def _torch_maskformer_forward(sd, x, im_size, n_layers=2):
    """Oracle of MaskTransformer.forward (maskformer_head.py:141-164),
    eval mode (dropout/drop-path identity). x: (B, N, d) patch tokens."""
    d = sd["decoder.proj_dec.bias"].shape[0]
    heads = d // 64 if d >= 64 else 4
    GS = im_size[0] // 16

    def ln(v, k, dim):
        return F.layer_norm(v, (dim,), sd[k + ".weight"], sd[k + ".bias"], eps=1e-5)

    x = F.linear(x, sd["decoder.proj_dec.weight"], sd["decoder.proj_dec.bias"])
    cls_emb = sd["decoder.cls_emb"].expand(x.size(0), -1, -1)
    x = torch.cat((x, cls_emb), 1)
    for i in range(n_layers):
        b = f"decoder.blocks.{i}"
        y = ln(x, b + ".norm1", d)
        B, N, _ = y.shape
        qkv = F.linear(y, sd[b + ".attn.qkv.weight"], sd[b + ".attn.qkv.bias"])
        qkv = qkv.reshape(B, N, 3, heads, d // heads).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q @ k.transpose(-2, -1)) * (d // heads) ** -0.5
        attn = attn.softmax(dim=-1)
        o = (attn @ v).transpose(1, 2).reshape(B, N, d)
        x = x + F.linear(o, sd[b + ".attn.proj.weight"], sd[b + ".attn.proj.bias"])
        y = ln(x, b + ".norm2", d)
        y = F.linear(y, sd[b + ".mlp.fc1.weight"], sd[b + ".mlp.fc1.bias"])
        y = F.gelu(y)
        y = F.linear(y, sd[b + ".mlp.fc2.weight"], sd[b + ".mlp.fc2.bias"])
        x = x + y
    x = ln(x, "decoder.decoder_norm", d)
    patches, cls_feat = x[:, :-NUM_CLASSES], x[:, -NUM_CLASSES:]
    patches = patches @ sd["decoder.proj_patch"]
    cls_feat = cls_feat @ sd["decoder.proj_classes"]
    patches = patches / patches.norm(dim=-1, keepdim=True)
    cls_feat = cls_feat / cls_feat.norm(dim=-1, keepdim=True)
    masks = patches @ cls_feat.transpose(1, 2)
    masks = ln(masks, "decoder.mask_norm", NUM_CLASSES)
    b, hw, n = masks.shape
    return masks.permute(0, 2, 1).reshape(b, n, GS, -1)


def test_maskformer_conversion_forward_parity():
    """A reference ``--decoder Maskformer`` checkpoint converts and the full
    network seg output matches the torch oracle (VERDICT r1 missing #3)."""
    rng = np.random.default_rng(3)
    d = CFG.embed_dim
    sd = _torch_state_dict(rng)
    for k in ("decoder.conv6.weight", "decoder.conv7.weight", "decoder.conv8.weight"):
        del sd[k]
    sd.update(_torch_maskformer_sd(rng, d))

    size = 64
    x = rng.standard_normal((2, 3, size, size)).astype(np.float32)

    # oracle: encoder tokens -> maskformer head
    enc = _torch_forward_tokens(sd, torch.from_numpy(x))
    ref_seg = _torch_maskformer_forward(sd, enc, (size, size)).detach().numpy()

    model = CoSANetwork(
        num_classes=NUM_CLASSES, backbone="vit_tiny_test", decoder="Maskformer",
        aux_layer=AUX_LAYER,
    )
    init = model.init(jax.random.PRNGKey(0), jnp.zeros((1, size, size, 3)))
    params = network_params_from_torch(sd, depth=CFG.depth)
    ref_paths = {jax.tree_util.keystr(p) for p, _ in
                 jax.tree_util.tree_flatten_with_path(init["params"])[0]}
    got_paths = {jax.tree_util.keystr(p) for p, _ in
                 jax.tree_util.tree_flatten_with_path(params)[0]}
    assert ref_paths == got_paths, ref_paths ^ got_paths

    out = model.apply({"params": params}, jnp.asarray(np.moveaxis(x, 1, -1)))
    np.testing.assert_allclose(
        np.asarray(out["seg"]), np.moveaxis(ref_seg, 1, -1), rtol=2e-4, atol=2e-4
    )


def _torch_forward_tokens(sd, x):
    """Encoder-only oracle: final LN'd patch tokens (B, N, D), following
    vit.py:283-321."""
    d, depth, heads = CFG.embed_dim, CFG.depth, CFG.num_heads
    gs = CFG.base_img_size // CFG.patch_size
    B, _, H, W = x.shape
    h, w = H // 16, W // 16
    tok = F.conv2d(x, sd["encoder.patch_embed.proj.weight"],
                   sd["encoder.patch_embed.proj.bias"], stride=16)
    tok = tok.flatten(2).transpose(1, 2)
    pos = sd["encoder.pos_embed"]
    patch_pos = pos[:, 1:, :].reshape(1, gs, gs, -1).permute(0, 3, 1, 2)
    patch_pos = F.interpolate(patch_pos, size=(h, w), mode="bicubic",
                              align_corners=False)
    patch_pos = patch_pos.reshape(1, -1, h * w).permute(0, 2, 1)
    pos = torch.cat((pos[:, :1, :], patch_pos), dim=1)
    cls_tok = sd["encoder.cls_token"].expand(B, -1, -1)
    tok = torch.cat((cls_tok, tok), dim=1) + pos

    def ln(x, wk, bk):
        return F.layer_norm(x, (d,), sd[wk], sd[bk], eps=1e-6)

    for i in range(depth):
        b = f"encoder.blocks.{i}."
        y = ln(tok, b + "norm1.weight", b + "norm1.bias")
        qkv = F.linear(y, sd[b + "attn.qkv.weight"], sd[b + "attn.qkv.bias"])
        Bn, N, _ = y.shape
        qkv = qkv.reshape(Bn, N, 3, heads, d // heads).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q @ k.transpose(-2, -1)) * (d // heads) ** -0.5
        attn = attn.softmax(dim=-1)
        o = (attn @ v).transpose(1, 2).reshape(Bn, N, d)
        tok = tok + F.linear(o, sd[b + "attn.proj.weight"], sd[b + "attn.proj.bias"])
        y = ln(tok, b + "norm2.weight", b + "norm2.bias")
        y = F.linear(y, sd[b + "mlp.fc1.weight"], sd[b + "mlp.fc1.bias"])
        y = F.gelu(y)
        y = F.linear(y, sd[b + "mlp.fc2.weight"], sd[b + "mlp.fc2.bias"])
        tok = tok + y
    tokn = ln(tok, "encoder.norm.weight", "encoder.norm.bias")
    return tokn[:, 1:]


def test_augreg_npz_loader(tmp_path):
    """The original-JAX .npz format loads into the same encoder tree shape
    as torch conversion; q/k/v concat order matches the fused qkv layout."""
    from cosa_tpu.models.convert import encoder_params_from_augreg_npz

    rng = np.random.default_rng(0)
    d, depth, heads = CFG.embed_dim, CFG.depth, CFG.num_heads
    hd = d // heads
    gs = CFG.base_img_size // CFG.patch_size
    z = {
        "embedding/kernel": rng.standard_normal((16, 16, 3, d)).astype(np.float32),
        "embedding/bias": rng.standard_normal((d,)).astype(np.float32),
        "cls": rng.standard_normal((1, 1, d)).astype(np.float32),
        "Transformer/posembed_input/pos_embedding":
            rng.standard_normal((1, gs * gs + 1, d)).astype(np.float32),
        "Transformer/encoder_norm/scale": np.ones((d,), np.float32),
        "Transformer/encoder_norm/bias": np.zeros((d,), np.float32),
    }
    for i in range(depth):
        b = f"Transformer/encoderblock_{i}/"
        att = b + "MultiHeadDotProductAttention_1/"
        for nme in ("query", "key", "value"):
            z[att + f"{nme}/kernel"] = rng.standard_normal((d, heads, hd)).astype(np.float32)
            z[att + f"{nme}/bias"] = rng.standard_normal((heads, hd)).astype(np.float32)
        z[att + "out/kernel"] = rng.standard_normal((heads, hd, d)).astype(np.float32)
        z[att + "out/bias"] = rng.standard_normal((d,)).astype(np.float32)
        for ln in ("LayerNorm_0", "LayerNorm_2"):
            z[b + f"{ln}/scale"] = np.ones((d,), np.float32)
            z[b + f"{ln}/bias"] = np.zeros((d,), np.float32)
        z[b + "MlpBlock_3/Dense_0/kernel"] = rng.standard_normal((d, 4 * d)).astype(np.float32)
        z[b + "MlpBlock_3/Dense_0/bias"] = rng.standard_normal((4 * d,)).astype(np.float32)
        z[b + "MlpBlock_3/Dense_1/kernel"] = rng.standard_normal((4 * d, d)).astype(np.float32)
        z[b + "MlpBlock_3/Dense_1/bias"] = rng.standard_normal((d,)).astype(np.float32)
    path = str(tmp_path / "vit.npz")
    np.savez(path, **z)

    enc = encoder_params_from_augreg_npz(path, depth)
    # structure matches a freshly-initialized encoder subtree
    model = CoSANetwork(num_classes=NUM_CLASSES, backbone="vit_tiny_test",
                        aux_layer=AUX_LAYER)
    init = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    ref_paths = {jax.tree_util.keystr(p) for p, _ in
                 jax.tree_util.tree_flatten_with_path(init["params"]["encoder"])[0]}
    got_paths = {jax.tree_util.keystr(p) for p, _ in
                 jax.tree_util.tree_flatten_with_path(enc)[0]}
    assert ref_paths == got_paths
    # shapes agree leaf-by-leaf
    for (pa, a), (pb, b) in zip(
        sorted(jax.tree_util.tree_flatten_with_path(init["params"]["encoder"])[0],
               key=lambda t: jax.tree_util.keystr(t[0])),
        sorted(jax.tree_util.tree_flatten_with_path(enc)[0],
               key=lambda t: jax.tree_util.keystr(t[0])),
    ):
        assert a.shape == b.shape, (jax.tree_util.keystr(pa), a.shape, b.shape)
    # model applies cleanly with the loaded encoder
    params = dict(init["params"])
    params["encoder"] = enc
    out = model.apply({"params": params}, jnp.zeros((1, 64, 64, 3)))
    assert np.isfinite(np.asarray(out["cls"])).all()


# ---------------------------------------------------------------------------
# Torch-free .pth reading (models/pth.py)
# ---------------------------------------------------------------------------

def test_pth_numpy_reader_matches_torch_load(tmp_path):
    """Round-trip every dtype/layout the port path can meet through the
    safelisted unpickler and compare elementwise with torch.load."""
    from cosa_tpu.models.pth import load_pth_numpy

    rng = np.random.default_rng(0)
    base = torch.from_numpy(rng.standard_normal((6, 8)).astype(np.float32))
    sd = {
        "w32": base,
        "noncontig": base.t(),                       # stride-swapped view
        "sliced": base[1:5, 2:7],                     # offset + substride
        "f16": base.to(torch.float16),
        "bf16": base.to(torch.bfloat16),
        "i64": torch.arange(24).reshape(4, 6),
        "scalar": torch.tensor(3.25),
        "b": torch.tensor([True, False, True]),
    }
    p = str(tmp_path / "t.pth")
    torch.save(sd, p)
    got = load_pth_numpy(p)
    assert set(got) == set(sd)
    for k, v in sd.items():
        np.testing.assert_array_equal(
            np.asarray(got[k], np.float32) if k == "bf16" else got[k],
            v.float().numpy() if k == "bf16" else v.numpy(), err_msg=k)


def test_pth_reader_unwraps_container_and_stubs_args(tmp_path):
    """CoSA best_*.pth containers hold {'model', 'args': Namespace, ...}
    (reference utils/torch_helper.py:101-117); non-safelisted globals must
    come back inert, never executed."""
    import argparse

    from cosa_tpu.models.convert import load_torch_checkpoint

    ns = argparse.Namespace(lr=0.1, dataset="VOC12")
    obj = {"model": {"x": torch.ones(2, 3)}, "args": ns, "epoch": 7,
           "s_or_t": "s"}
    p = str(tmp_path / "best_seg.pth")
    torch.save(obj, p)
    sd = load_torch_checkpoint(p)
    np.testing.assert_array_equal(sd["x"], np.ones((2, 3), np.float32))


def test_weight_port_runs_with_torch_blocked(tmp_path, monkeypatch):
    """load_pretrained_into_state from a .pth with `import torch` failing —
    the parity/port host does not need torch. (The .npz route is numpy-only
    by construction, covered by test_augreg_npz_loader.)"""
    import sys

    from cosa_tpu.config import preset_config
    from cosa_tpu.models import build_model
    from cosa_tpu.models.convert import load_pretrained_into_state
    from cosa_tpu.train.state import create_train_state

    rng = np.random.default_rng(1)
    sd = _torch_state_dict(rng)
    pth = str(tmp_path / "net.pth")
    torch.save(sd, pth)

    cfg = preset_config("synthetic", name="portsmoke",
                        backbone="vit_tiny_test", num_classes=NUM_CLASSES,
                        aux_layer=AUX_LAYER, work_dir=str(tmp_path))
    model = build_model(cfg)
    state = create_train_state(cfg, model, cfg.batch_size)

    monkeypatch.setitem(sys.modules, "torch", None)  # import torch -> fails
    cfg.pretrained_path = pth
    state2 = load_pretrained_into_state(cfg, state)
    kern = np.asarray(state2.student["encoder"]["blocks_0"]["attn"]["qkv"]["kernel"])
    want = sd["encoder.blocks.0.attn.qkv.weight"].numpy().T
    np.testing.assert_allclose(kern, want, atol=1e-6)
    # teacher gets the same overlay (reference builds both nets pretrained)
    np.testing.assert_allclose(
        np.asarray(state2.teacher["encoder"]["blocks_0"]["attn"]["qkv"]["kernel"]),
        want, atol=1e-6)
