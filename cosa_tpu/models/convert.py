"""Torch-checkpoint -> params converter.

Maps either a timm ``jx_vit_base_p16_224`` ImageNet state_dict (what the
reference downloads, models/vit/vit.py:366-377) or a released CoSA
``best_seg.pth``/``best_cam.pth`` VITNetwork state_dict
(utils/torch_helper.py:101-117) onto this package's flax parameter tree, for
weight-level parity evaluation and pretrained initialization.

Layout mapping (torch -> flax):
  patch_embed.proj.weight (D,3,P,P)   -> encoder/patch_embed/kernel (P,P,3,D)
  blocks.N.attn.qkv.weight (3D,D)     -> encoder/blocks_N/attn/qkv/kernel (D,3D)
  blocks.N.norm*.weight/bias          -> .../norm*/scale,bias
  decoder.convK.weight (O,I,3,3)      -> decoder/convK/kernel (3,3,I,O)
  classifier.weight (C-1,D,1,1)       -> classifier (D,C-1)
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np


def _t(w) -> np.ndarray:
    try:
        return np.asarray(w.detach().cpu().numpy(), np.float32)
    except AttributeError:
        return np.asarray(w, np.float32)


def encoder_params_from_torch(sd: Dict[str, Any], depth: int = 12) -> Dict:
    """ViT encoder subtree from a timm/CoSA torch state_dict (keys without
    the 'encoder.' prefix)."""
    p: Dict[str, Any] = {}
    p["patch_embed"] = {
        "kernel": _t(sd["patch_embed.proj.weight"]).transpose(2, 3, 1, 0),
        "bias": _t(sd["patch_embed.proj.bias"]),
    }
    p["cls_token"] = _t(sd["cls_token"])
    if "dist_token" in sd:
        # DeiT-distilled (reference models/vit/deit.py:21-56): the dist
        # token converts 1:1 and pos_embed simply has num_patches+2 rows
        p["dist_token"] = _t(sd["dist_token"])
    p["pos_embed"] = _t(sd["pos_embed"])
    for i in range(depth):
        b = f"blocks.{i}."
        p[f"blocks_{i}"] = {
            "norm1": {"scale": _t(sd[b + "norm1.weight"]), "bias": _t(sd[b + "norm1.bias"])},
            "norm2": {"scale": _t(sd[b + "norm2.weight"]), "bias": _t(sd[b + "norm2.bias"])},
            "attn": {
                "qkv": {
                    "kernel": _t(sd[b + "attn.qkv.weight"]).T,
                    **(
                        {"bias": _t(sd[b + "attn.qkv.bias"])}
                        if b + "attn.qkv.bias" in sd
                        else {}
                    ),
                },
                "proj": {
                    "kernel": _t(sd[b + "attn.proj.weight"]).T,
                    "bias": _t(sd[b + "attn.proj.bias"]),
                },
            },
            "mlp": {
                "fc1": {"kernel": _t(sd[b + "mlp.fc1.weight"]).T, "bias": _t(sd[b + "mlp.fc1.bias"])},
                "fc2": {"kernel": _t(sd[b + "mlp.fc2.weight"]).T, "bias": _t(sd[b + "mlp.fc2.bias"])},
            },
        }
    p["norm"] = {"scale": _t(sd["norm.weight"]), "bias": _t(sd["norm.bias"])}
    return p


def maskformer_params_from_torch(sd: Dict[str, Any], prefix: str = "decoder.") -> Dict:
    """MaskTransformer decoder subtree from a reference ``--decoder
    Maskformer`` state_dict (models/decoder/maskformer_head.py:99-164:
    proj_dec linear, cls_emb, 2 Blocks, proj_patch/proj_classes matrices,
    decoder_norm/mask_norm LayerNorms)."""
    ln = lambda k: {"scale": _t(sd[prefix + k + ".weight"]),
                    "bias": _t(sd[prefix + k + ".bias"])}
    lin = lambda k: {"kernel": _t(sd[prefix + k + ".weight"]).T,
                     "bias": _t(sd[prefix + k + ".bias"])}
    p: Dict[str, Any] = {
        "proj_dec": lin("proj_dec"),
        "cls_emb": _t(sd[prefix + "cls_emb"]),
        "proj_patch": _t(sd[prefix + "proj_patch"]),
        "proj_classes": _t(sd[prefix + "proj_classes"]),
        "decoder_norm": ln("decoder_norm"),
        "mask_norm": ln("mask_norm"),
    }
    i = 0
    while prefix + f"blocks.{i}.norm1.weight" in sd:
        b = f"blocks.{i}."
        p[f"blocks_{i}"] = {
            "norm1": ln(b + "norm1"),
            "norm2": ln(b + "norm2"),
            "qkv": lin(b + "attn.qkv"),
            "proj": lin(b + "attn.proj"),
            "fc1": lin(b + "mlp.fc1"),
            "fc2": lin(b + "mlp.fc2"),
        }
        i += 1
    return p


def network_params_from_torch(sd: Dict[str, Any], depth: int = 12) -> Dict:
    """Full CoSANetwork tree from a VITNetwork state_dict (reference
    models/__init__.py:82-124 layout), either decoder flavor."""
    enc_sd = {k[len("encoder."):]: v for k, v in sd.items() if k.startswith("encoder.")}
    out: Dict[str, Any] = {"encoder": encoder_params_from_torch(enc_sd, depth)}
    if "decoder.conv6.weight" in sd:  # LargeFOV
        out["decoder"] = {
            f"conv{i}": {"kernel": _t(sd[f"decoder.conv{i}.weight"]).transpose(2, 3, 1, 0)}
            for i in (6, 7, 8)
        }
    elif "decoder.cls_emb" in sd:  # Maskformer
        out["decoder"] = maskformer_params_from_torch(sd)
    out["classifier"] = _t(sd["classifier.weight"])[:, :, 0, 0].T
    out["aux_classifier"] = _t(sd["aux_classifier.weight"])[:, :, 0, 0].T
    return out


def load_torch_checkpoint(path: str) -> Dict[str, Any]:
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "model" in obj:  # CoSA best_*.pth container
        return obj["model"]
    return obj


def encoder_params_from_augreg_npz(path: str, depth: int = 12) -> Dict:
    """ViT encoder subtree from an original google-research
    vision_transformer / augreg .npz checkpoint (the upstream source of the
    timm jx_vit_* weights the reference downloads, models/vit/vit.py:54)."""
    z = np.load(path)

    def g(k):
        return np.asarray(z[k], np.float32)

    d = g("embedding/bias").shape[0]
    p: Dict[str, Any] = {
        "patch_embed": {"kernel": g("embedding/kernel"), "bias": g("embedding/bias")},
        "cls_token": g("cls"),
        "pos_embed": g("Transformer/posembed_input/pos_embedding"),
        "norm": {
            "scale": g("Transformer/encoder_norm/scale"),
            "bias": g("Transformer/encoder_norm/bias"),
        },
    }
    for i in range(depth):
        b = f"Transformer/encoderblock_{i}/"
        att = b + "MultiHeadDotProductAttention_1/"
        qkv_k = np.concatenate(
            [g(att + f"{n}/kernel").reshape(d, -1) for n in ("query", "key", "value")],
            axis=1,
        )
        qkv_b = np.concatenate(
            [g(att + f"{n}/bias").reshape(-1) for n in ("query", "key", "value")]
        )
        p[f"blocks_{i}"] = {
            "norm1": {"scale": g(b + "LayerNorm_0/scale"), "bias": g(b + "LayerNorm_0/bias")},
            "norm2": {"scale": g(b + "LayerNorm_2/scale"), "bias": g(b + "LayerNorm_2/bias")},
            "attn": {
                "qkv": {"kernel": qkv_k, "bias": qkv_b},
                "proj": {
                    "kernel": g(att + "out/kernel").reshape(-1, d),
                    "bias": g(att + "out/bias"),
                },
            },
            "mlp": {
                "fc1": {"kernel": g(b + "MlpBlock_3/Dense_0/kernel"),
                        "bias": g(b + "MlpBlock_3/Dense_0/bias")},
                "fc2": {"kernel": g(b + "MlpBlock_3/Dense_1/kernel"),
                        "bias": g(b + "MlpBlock_3/Dense_1/bias")},
            },
        }
    return p


def _merge(dst: Dict, src: Dict) -> Dict:
    out = dict(dst)
    for k, v in src.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = _merge(out[k], v)
        else:
            out[k] = v
    return out


def load_pretrained_into_state(cfg, state):
    """Overlay a checkpoint (torch .pth or original-ViT .npz) on student AND
    teacher (both reference networks are built with the same pretrained
    backbone, main.py:45-46)."""
    from cosa_tpu.models.vit import BACKBONES

    depth = BACKBONES[cfg.backbone].depth
    if cfg.pretrained_path.endswith(".npz"):
        overlay = {"encoder": encoder_params_from_augreg_npz(cfg.pretrained_path, depth)}
    else:
        sd = load_torch_checkpoint(cfg.pretrained_path)
        if any(k.startswith("encoder.") for k in sd.keys()):
            overlay = network_params_from_torch(sd, depth)
        else:
            overlay = {"encoder": encoder_params_from_torch(sd, depth)}
    new_student = _merge(state.student, overlay)
    new_teacher = _merge(state.teacher, overlay)
    return state.replace(student=new_student, teacher=new_teacher)
