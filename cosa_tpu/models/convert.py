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
    """Read a torch .pth — torch-FREE for the zip serialization format
    (torch >= 1.6, every reference-era checkpoint) via models/pth.py's
    safelisted unpickler; torch.load only as a fallback for pre-1.6 legacy
    pickles, so torch is an optional dependency of the weight-port path."""
    import zipfile

    try:
        from cosa_tpu.models.pth import load_pth_numpy

        obj = load_pth_numpy(path)
    except zipfile.BadZipFile:
        import torch  # legacy (pre-zip) serialization only

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


def swin_params_from_mmseg(sd: Dict[str, Any], depths) -> Dict:
    """SwinBackbone subtree from an mmseg/mmcv Swin checkpoint (the weights
    the reference's MMSWIN/MMSegModel wrappers load; module structure
    vendored at models/mmsegmodel/__init__.py:176-320). Accepts keys with or
    without the mmseg ``backbone.`` prefix.

    Key map (mmseg -> flax):
      patch_embed.projection (C,3,p,p)            -> patch_embed (p,p,3,C)
      patch_embed.norm                            -> patch_norm
      stages.I.blocks.J.attn.w_msa.{qkv,proj}     -> stageI_blockJ/attn/{qkv,proj}
      ...attn.w_msa.relative_position_bias_table  -> .../attn/rel_pos_bias
      ...ffn.layers.0.0 / ffn.layers.1            -> .../fc1 / fc2
      stages.I.downsample.{norm,reduction}        -> mergeI/{norm,reduction}
      normI                                       -> normI
    (relative_position_index is not copied — it is a deterministic constant
    our WindowAttention recomputes with the same standard Swin formula.)"""
    if any(k.startswith("backbone.") for k in sd):
        sd = {k[len("backbone."):]: v for k, v in sd.items()
              if k.startswith("backbone.")}
    ln = lambda k: {"scale": _t(sd[k + ".weight"]), "bias": _t(sd[k + ".bias"])}
    lin = lambda k: {"kernel": _t(sd[k + ".weight"]).T,
                     **({"bias": _t(sd[k + ".bias"])} if k + ".bias" in sd else {})}
    p: Dict[str, Any] = {
        "patch_embed": {
            "kernel": _t(sd["patch_embed.projection.weight"]).transpose(2, 3, 1, 0),
            "bias": _t(sd["patch_embed.projection.bias"]),
        },
        "patch_norm": ln("patch_embed.norm"),
    }
    for si, depth in enumerate(depths):
        for bi in range(depth):
            b = f"stages.{si}.blocks.{bi}."
            p[f"stage{si}_block{bi}"] = {
                "norm1": ln(b + "norm1"),
                "norm2": ln(b + "norm2"),
                "attn": {
                    "qkv": lin(b + "attn.w_msa.qkv"),
                    "proj": lin(b + "attn.w_msa.proj"),
                    "rel_pos_bias": _t(
                        sd[b + "attn.w_msa.relative_position_bias_table"]),
                },
                "fc1": lin(b + "ffn.layers.0.0"),
                "fc2": lin(b + "ffn.layers.1"),
            }
        if f"stages.{si}.downsample.reduction.weight" in sd:
            p[f"merge{si}"] = {
                "norm": ln(f"stages.{si}.downsample.norm"),
                "reduction": lin(f"stages.{si}.downsample.reduction"),
            }
        if f"norm{si}.weight" in sd:
            p[f"norm{si}"] = ln(f"norm{si}")
    return p


def mit_params_from_torch(sd: Dict[str, Any], depths) -> Dict:
    """MixVisionTransformer subtree from an official SegFormer (NVlabs)
    checkpoint — the exact module the reference vendors at
    models/vit/mix_transformer.py:18-378.

    Key map (torch -> flax), stages s = 1..4:
      patch_embed{s}.proj (conv)          -> patch_embed{s}
      patch_embed{s}.norm                 -> patch_norm{s}
      block{s}.J.attn.{q,kv,proj}         -> block{s}_J/attn/{q,kv,proj}
      block{s}.J.attn.sr (conv) + .norm   -> .../attn/{sr,sr_norm}
      block{s}.J.mlp.fc1 / dwconv.dwconv / fc2 -> .../mlp/{fc1,dwconv,fc2}
      norm{s}                             -> norm{s}
    DWConv weight (hid,1,3,3) -> (3,3,1,hid)."""
    ln = lambda k: {"scale": _t(sd[k + ".weight"]), "bias": _t(sd[k + ".bias"])}
    lin = lambda k: {"kernel": _t(sd[k + ".weight"]).T,
                     **({"bias": _t(sd[k + ".bias"])} if k + ".bias" in sd else {})}
    conv = lambda k: {"kernel": _t(sd[k + ".weight"]).transpose(2, 3, 1, 0),
                      "bias": _t(sd[k + ".bias"])}
    p: Dict[str, Any] = {}
    for si, depth in enumerate(depths):
        s = si + 1
        p[f"patch_embed{s}"] = conv(f"patch_embed{s}.proj")
        p[f"patch_norm{s}"] = ln(f"patch_embed{s}.norm")
        for bi in range(depth):
            b = f"block{s}.{bi}."
            attn: Dict[str, Any] = {
                "q": lin(b + "attn.q"),
                "kv": lin(b + "attn.kv"),
                "proj": lin(b + "attn.proj"),
            }
            if b + "attn.sr.weight" in sd:
                attn["sr"] = conv(b + "attn.sr")
                attn["sr_norm"] = ln(b + "attn.norm")
            p[f"block{s}_{bi}"] = {
                "norm1": ln(b + "norm1"),
                "norm2": ln(b + "norm2"),
                "attn": attn,
                "mlp": {
                    "fc1": lin(b + "mlp.fc1"),
                    "dwconv": conv(b + "mlp.dwconv.dwconv"),
                    "fc2": lin(b + "mlp.fc2"),
                },
            }
        p[f"norm{s}"] = ln(f"norm{s}")
    return p


def _merge(dst: Dict, src: Dict) -> Dict:
    out = dict(dst)
    for k, v in src.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = _merge(out[k], v)
        else:
            out[k] = v
    return out


def _filter_to(dst: Dict, src: Dict) -> Dict:
    """Drop overlay keys the model tree does not have (e.g. mmseg Swin
    checkpoints carry all four stage-exit norms while SwinNetwork only
    builds norm3) — the torch equivalent of load_state_dict(strict=False)."""
    out = {}
    for k, v in src.items():
        if k not in dst:
            continue
        out[k] = (
            _filter_to(dst[k], v)
            if isinstance(v, dict) and isinstance(dst[k], dict)
            else v
        )
    return out


def load_pretrained_into_state(cfg, state):
    """Overlay a checkpoint (torch .pth or original-ViT .npz) on student AND
    teacher (both reference networks are built with the same pretrained
    backbone, main.py:45-46). Zoo families load their upstream formats:
    'swinend2end' takes an mmseg/mmcv Swin checkpoint, 'segformer' an
    official SegFormer (NVlabs) one."""
    model = getattr(cfg, "model", "vit")
    if model == "swinend2end":
        from cosa_tpu.models.zoo.swin import SWIN_CONFIGS

        sd = load_torch_checkpoint(cfg.pretrained_path)
        overlay = {"backbone": swin_params_from_mmseg(
            sd, SWIN_CONFIGS[cfg.backbone].depths)}
    elif model == "segformer":
        from cosa_tpu.models.zoo.mit import MIT_CONFIGS

        sd = load_torch_checkpoint(cfg.pretrained_path)
        overlay = {"encoder": mit_params_from_torch(
            sd, MIT_CONFIGS[cfg.backbone].depths)}
    elif cfg.pretrained_path.endswith(".npz"):
        from cosa_tpu.models.vit import BACKBONES

        depth = BACKBONES[cfg.backbone].depth
        overlay = {"encoder": encoder_params_from_augreg_npz(cfg.pretrained_path, depth)}
    else:
        from cosa_tpu.models.vit import BACKBONES

        depth = BACKBONES[cfg.backbone].depth
        sd = load_torch_checkpoint(cfg.pretrained_path)
        if any(k.startswith("encoder.") for k in sd.keys()):
            overlay = network_params_from_torch(sd, depth)
        else:
            overlay = {"encoder": encoder_params_from_torch(sd, depth)}
    overlay = _filter_to(state.student, overlay)
    new_student = _merge(state.student, overlay)
    new_teacher = _merge(state.teacher, overlay)
    return state.replace(student=new_student, teacher=new_teacher)
