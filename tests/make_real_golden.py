"""Generate tests/golden/real_image_golden.npz.

A real-photograph numeric-drift golden (VERDICT r1 missing #1b): the
full-size (ViT-B, 92M-param) reference network — restated as the torch
oracle below — is run at f32 on a real photo with weights drawn from a
fixed seed, and its outputs are committed. The weights are NOT stored;
tests regenerate them from the seed and must reproduce these outputs
through the checkpoint converter + JAX forward, which pins

  * torch->flax conversion at full model size (all 12 blocks, 768 dims),
  * forward numerics on real-image statistics (not synthetic blobs),

against drift. Photo: matplotlib's grace_hopper.jpg (public-domain U.S.
Navy photograph), copied into tests/golden/.

Usage: python tests/make_real_golden.py   (writes the npz; commit it)
"""

import os
import shutil
import sys

import numpy as np
import torch
import torch.nn.functional as F
from PIL import Image

HERE = os.path.dirname(os.path.abspath(__file__))
GOLDEN = os.path.join(HERE, "golden")
SEED = 20240816
NUM_CLASSES = 21
AUX_LAYER = -3
D, DEPTH, HEADS, MLP = 768, 12, 12, 3072
GS = 14  # 224/16 pretrained grid


def make_full_state_dict(seed: int = SEED):
    rng = np.random.default_rng(seed)

    def t(*shape, scale=0.02):
        return torch.from_numpy(
            (rng.standard_normal(shape) * scale).astype(np.float32)
        )

    sd = {
        "encoder.patch_embed.proj.weight": t(D, 3, 16, 16),
        "encoder.patch_embed.proj.bias": t(D),
        "encoder.cls_token": t(1, 1, D),
        "encoder.pos_embed": t(1, GS * GS + 1, D),
        "encoder.norm.weight": 1 + 0.1 * t(D),
        "encoder.norm.bias": t(D),
        "decoder.conv6.weight": t(512, D, 3, 3),
        "decoder.conv7.weight": t(512, 512, 3, 3),
        "decoder.conv8.weight": t(NUM_CLASSES, 512, 1, 1),
        "classifier.weight": t(NUM_CLASSES - 1, D, 1, 1),
        "aux_classifier.weight": t(NUM_CLASSES - 1, D, 1, 1),
    }
    for i in range(DEPTH):
        b = f"encoder.blocks.{i}."
        sd.update({
            b + "norm1.weight": 1 + 0.1 * t(D), b + "norm1.bias": t(D),
            b + "norm2.weight": 1 + 0.1 * t(D), b + "norm2.bias": t(D),
            b + "attn.qkv.weight": t(3 * D, D), b + "attn.qkv.bias": t(3 * D),
            b + "attn.proj.weight": t(D, D), b + "attn.proj.bias": t(D),
            b + "mlp.fc1.weight": t(MLP, D), b + "mlp.fc1.bias": t(MLP),
            b + "mlp.fc2.weight": t(D, MLP), b + "mlp.fc2.bias": t(D),
        })
    return sd


def torch_forward(sd, x):
    """Reference VITNetwork forward oracle (vit.py:283-321 +
    models/__init__.py:163-206) at full size, f32."""
    B, _, H, W = x.shape
    h, w = H // 16, W // 16
    tok = F.conv2d(x, sd["encoder.patch_embed.proj.weight"],
                   sd["encoder.patch_embed.proj.bias"], stride=16)
    tok = tok.flatten(2).transpose(1, 2)
    pos = sd["encoder.pos_embed"]
    patch_pos = pos[:, 1:, :].reshape(1, GS, GS, -1).permute(0, 3, 1, 2)
    patch_pos = F.interpolate(patch_pos, size=(h, w), mode="bicubic",
                              align_corners=False)
    patch_pos = patch_pos.reshape(1, -1, h * w).permute(0, 2, 1)
    pos = torch.cat((pos[:, :1, :], patch_pos), dim=1)
    tok = torch.cat((sd["encoder.cls_token"].expand(B, -1, -1), tok), 1) + pos

    def ln(v, wk, bk):
        return F.layer_norm(v, (D,), sd[wk], sd[bk], eps=1e-6)

    embeds = []
    for i in range(DEPTH):
        b = f"encoder.blocks.{i}."
        y = ln(tok, b + "norm1.weight", b + "norm1.bias")
        qkv = F.linear(y, sd[b + "attn.qkv.weight"], sd[b + "attn.qkv.bias"])
        Bn, N, _ = y.shape
        qkv = qkv.reshape(Bn, N, 3, HEADS, D // HEADS).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = ((q @ k.transpose(-2, -1)) * (D // HEADS) ** -0.5).softmax(-1)
        o = (attn @ v).transpose(1, 2).reshape(Bn, N, D)
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
    to2d = lambda t: t.transpose(1, 2).reshape(B, D, h, w)
    _x4, _x_aux = to2d(_x), to2d(x_aux)
    s = F.relu(F.conv2d(_x4, sd["decoder.conv6.weight"], padding=5, dilation=5))
    s = F.relu(F.conv2d(s, sd["decoder.conv7.weight"], padding=5, dilation=5))
    seg = F.conv2d(s, sd["decoder.conv8.weight"])
    cam = F.conv2d(_x4, sd["classifier.weight"])
    cam_aux = F.conv2d(_x_aux, sd["aux_classifier.weight"])
    cls = F.conv2d(F.adaptive_max_pool2d(_x4, (1, 1)), sd["classifier.weight"])
    cls_aux = F.conv2d(F.adaptive_max_pool2d(_x_aux, (1, 1)),
                       sd["aux_classifier.weight"])
    return dict(cls=cls.flatten(1), cls_aux=cls_aux.flatten(1), seg=seg,
                cam=cam, cam_aux=cam_aux)


def load_photo():
    import matplotlib

    src = os.path.join(os.path.dirname(matplotlib.__file__), "mpl-data",
                       "sample_data", "grace_hopper.jpg")
    dst = os.path.join(GOLDEN, "grace_hopper.jpg")
    if not os.path.exists(dst):
        shutil.copy(src, dst)
    return dst


def preprocess(path):
    """Reference val preprocessing: resize to 448^2 bilinear, ImageNet
    normalize x255 (dataloaders/transforms.py normalize_img)."""
    img = np.asarray(Image.open(path).convert("RGB").resize((448, 448),
                                                            Image.BILINEAR))
    mean = np.array([123.675, 116.28, 103.53], np.float32)
    std = np.array([58.395, 57.12, 57.375], np.float32)
    return ((img - mean) / std).astype(np.float32)


def main():
    os.makedirs(GOLDEN, exist_ok=True)
    photo = load_photo()
    x = preprocess(photo)  # (448, 448, 3)
    sd = make_full_state_dict()
    with torch.no_grad():
        out = torch_forward(sd, torch.from_numpy(np.moveaxis(x, -1, 0)[None]))
    np.savez_compressed(
        os.path.join(GOLDEN, "real_image_golden.npz"),
        seed=SEED,
        cls=out["cls"].numpy(),
        cls_aux=out["cls_aux"].numpy(),
        seg=out["seg"].numpy(),
        cam=out["cam"].numpy(),
        cam_aux=out["cam_aux"].numpy(),
    )
    print("golden written:", {k: v.shape for k, v in
                              np.load(os.path.join(GOLDEN, "real_image_golden.npz")).items()
                              if hasattr(v, "shape")})


if __name__ == "__main__":
    main()
