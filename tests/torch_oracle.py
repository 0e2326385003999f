"""Shared torch/numpy oracles restating the reference semantics for tests.

These re-state the published architecture + the reference's formulas
(independently written, NCHW torch) so the JAX implementations can be
verified end to end."""

import numpy as np
import torch
import torch.nn.functional as F

from cosa_tpu.models.vit import BACKBONES

CFG = BACKBONES["vit_tiny_test"]


def make_state_dict(rng, num_classes=6):
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
        "decoder.conv8.weight": t(num_classes, 512, 1, 1),
        "classifier.weight": t(num_classes - 1, d, 1, 1),
        "aux_classifier.weight": t(num_classes - 1, d, 1, 1),
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


def forward(sd, x, aux_layer=-2, num_classes=6):
    """VITNetwork forward oracle (models/vit/vit.py:283-321 +
    models/__init__.py:163-206), NCHW. Returns dict like CoSANetwork."""
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
    tok = torch.cat((sd["encoder.cls_token"].expand(B, -1, -1), tok), dim=1) + pos

    def ln(t_, wk, bk):
        return F.layer_norm(t_, (d,), sd[wk], sd[bk], eps=1e-6)

    embeds = []
    for i in range(depth):
        b = f"encoder.blocks.{i}."
        y = ln(tok, b + "norm1.weight", b + "norm1.bias")
        qkv = F.linear(y, sd[b + "attn.qkv.weight"], sd[b + "attn.qkv.bias"])
        Bn, N, _ = y.shape
        qkv = qkv.reshape(Bn, N, 3, heads, d // heads).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = ((q @ k.transpose(-2, -1)) * (d // heads) ** -0.5).softmax(-1)
        o = (attn @ v).transpose(1, 2).reshape(Bn, N, d)
        tok = tok + F.linear(o, sd[b + "attn.proj.weight"], sd[b + "attn.proj.bias"])
        y = ln(tok, b + "norm2.weight", b + "norm2.bias")
        y = F.linear(y, sd[b + "mlp.fc1.weight"], sd[b + "mlp.fc1.bias"])
        tok = tok + F.linear(F.gelu(y), sd[b + "mlp.fc2.weight"], sd[b + "mlp.fc2.bias"])
        embeds.append(tok)
    tokn = ln(tok, "encoder.norm.weight", "encoder.norm.bias")
    embeds[-1] = tokn
    _x = tokn[:, 1:]
    x_aux = embeds[aux_layer][:, 1:]

    to2d = lambda t_: t_.transpose(1, 2).reshape(B, d, h, w)
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


def multi_scale_camseg(sd, imgs, scales, aux_layer=-2, num_classes=6):
    """Teacher TTA fuse oracle (utils/seg_helper.py:232-275), NCHW."""
    B, _, H, W = imgs.shape
    cam_sum, cam_aux_last, seg_sum = 0, None, 0
    for s in scales:
        x = imgs if s == 1.0 else F.interpolate(
            imgs, size=(int(s * H), int(s * W)), mode="bilinear",
            align_corners=False)
        xc = torch.cat([x, x.flip(-1)], dim=0)
        out = forward(sd, xc, aux_layer, num_classes)
        _cam = F.interpolate(out["cam"], size=(H, W), mode="bilinear",
                             align_corners=False)
        _cam = torch.max(_cam[:B], _cam[B:].flip(-1))
        _ca = F.interpolate(out["cam_aux"], size=(H, W), mode="bilinear",
                            align_corners=False)
        _ca = torch.max(_ca[:B], _ca[B:].flip(-1))
        _seg = F.interpolate(out["seg"], size=(H, W), mode="bilinear",
                             align_corners=False)
        cam_sum = cam_sum + F.relu(_cam)
        cam_aux_last = F.relu(_ca)
        seg_sum = seg_sum + _seg[:B] + _seg[B:].flip(-1)

    def mm(t):
        t = t + F.adaptive_max_pool2d(-t, (1, 1))
        return t / (F.adaptive_max_pool2d(t, (1, 1)) + 1e-5)

    return mm(cam_sum), mm(cam_aux_last), seg_sum


def cam2mask(img_boxes, cams, cls_labels, th, tl, downscale=2):
    """Reference per-image cam2mask oracle (seg_helper.py:721-797), NCHW."""
    cams = torch.from_numpy(np.moveaxis(np.asarray(cams), -1, 1).copy()) \
        if isinstance(cams, np.ndarray) else cams
    cls_labels = torch.as_tensor(cls_labels)
    b, _, h, w = cams.shape
    tmp = torch.ones((b, 1, h, w))
    hi = torch.cat([tmp * th, cams], dim=1)
    lo = torch.cat([tmp * tl, cams], dim=1)
    if downscale:
        hi = F.interpolate(hi, size=(h // downscale, w // downscale),
                           mode="bilinear", align_corners=False)
        lo = F.interpolate(lo, size=(h // downscale, w // downscale),
                           mode="bilinear", align_corners=False)
    lab_bk = torch.cat([torch.ones(b, 1), cls_labels.float()], dim=1)
    out_h = torch.full((b, h, w), 255.0)
    out_l = torch.full((b, h, w), 255.0)
    for i, coord in enumerate(img_boxes):
        keys = torch.nonzero(lab_bk[i])[:, 0]
        for src, dst in ((hi, out_h), (lo, out_l)):
            act = src[i, keys].unsqueeze(0).softmax(dim=1)
            act = F.interpolate(act, size=(h, w), mode="bilinear",
                                align_corners=False)
            lab = keys[act.argmax(dim=1)]
            dst[i, coord[0]:coord[1], coord[2]:coord[3]] = lab[
                0, coord[0]:coord[1], coord[2]:coord[3]].float()
    merged = out_h.clone()
    merged[out_h == 0] = 255
    merged[(out_h + out_l) == 0] = 0
    return merged


def seg_loss(seg_pred, mask_label, fg_alpha=0.5, ignore=255):
    """Reference utils/seg_helper.py:800-813."""
    bg = mask_label.clone()
    bg[mask_label != 0] = ignore
    bg_loss = F.cross_entropy(seg_pred, bg.long(), ignore_index=ignore,
                              reduction="sum") / ((bg != ignore).sum() + 1e-6)
    fg = mask_label.clone()
    fg[mask_label == 0] = ignore
    fg_loss = F.cross_entropy(seg_pred, fg.long(), ignore_index=ignore,
                              reduction="sum") / ((fg != ignore).sum() + 1e-6)
    return (1 - fg_alpha) * bg_loss + fg_alpha * fg_loss
