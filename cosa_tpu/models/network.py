"""The CoSA dual-task network: ViT encoder + seg decoder + CAM/cls heads.

Functional twin of the reference ``VITNetwork``
(/root/reference/models/__init__.py:82-206):

  * two bias-free 1x1-conv CAM classifiers over the last / aux feature maps
    (here plain (D, C-1) matmuls on NHWC feature maps),
  * the *same* classifier weights produce image-level logits through a
    global max pool (adaptive_max_pool2d in the reference, __init__.py:197-204),
  * a 4-way ``detach`` switch routing gradients around the CAM branch
    (__init__.py:180-192) — here static `lax.stop_gradient` branches,
  * LargeFOV (default) or MaskTransformer decoder.

Outputs are a dict instead of a positional 6-tuple; all maps are NHWC.
XLA dead-code-eliminates unused heads per jitted caller, which subsumes the
reference's ``cam_only``/``seg_only`` short-circuit flags.
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from cosa_tpu.models.decoders import LargeFOV, MaskTransformer
from cosa_tpu.models.vit import BACKBONES, VisionTransformer, ViTConfig


class CoSANetwork(nn.Module):
    num_classes: int
    backbone: str = "vit_base_patch16_224"
    decoder: str = "LargeFOV"
    aux_layer: int = -3
    isgap: bool = False
    dtype: Any = jnp.float32
    use_flash: bool = False
    quant: bool = False  # int8 encoder projections (no-grad teacher only)

    @nn.compact
    def __call__(self, x: jnp.ndarray, detach: str = "none") -> Dict[str, jnp.ndarray]:
        """x: (B, H, W, 3) normalized image.

        Returns dict with:
          cls, cls_aux: (B, C-1) image-level logits
          feat:         (B, h, w, D) final feature map
          seg:          (B, h, w, C) segmentation logits
          cam, cam_aux: (B, h, w, C-1) CAMs
        """
        assert detach in ("all", "feat", "none", "cls")
        cfg: ViTConfig = BACKBONES[self.backbone]
        b, hh, ww, _ = x.shape
        gh, gw = hh // cfg.patch_size, ww // cfg.patch_size

        _, tokens, aux_tokens = VisionTransformer(
            cfg,
            aux_layer=self.aux_layer,
            dtype=self.dtype,
            use_flash=self.use_flash,
            quant=self.quant,
            name="encoder",
        )(x)
        d = cfg.embed_dim
        fmap = tokens.reshape(b, gh, gw, d)
        fmap_aux = aux_tokens.reshape(b, gh, gw, d)

        if self.decoder == "LargeFOV":
            seg = LargeFOV(self.num_classes, dtype=self.dtype, name="decoder")(fmap)
        elif self.decoder == "Maskformer":
            seg = MaskTransformer(
                n_cls=self.num_classes,
                patch_size=cfg.patch_size,
                d_model=d,
                dtype=self.dtype,
                name="decoder",
            )(tokens, (hh, ww))
        else:
            raise NotImplementedError(self.decoder)

        w_cls = self.param(
            "classifier", nn.initializers.lecun_normal(), (d, self.num_classes - 1),
            jnp.float32,
        )
        w_aux = self.param(
            "aux_classifier", nn.initializers.lecun_normal(),
            (d, self.num_classes - 1), jnp.float32,
        )
        wc, wa = w_cls.astype(self.dtype), w_aux.astype(self.dtype)

        sg = jax.lax.stop_gradient
        if detach == "all":
            cam = sg(fmap @ wc)
            cam_aux = sg(fmap_aux @ wa)
        elif detach == "feat":
            cam = sg(fmap) @ wc
            cam_aux = sg(fmap_aux) @ wa
        elif detach == "cls":
            cam = fmap @ sg(wc)
            cam_aux = fmap_aux @ sg(wa)
        else:
            cam = fmap @ wc
            cam_aux = fmap_aux @ wa

        pool = jnp.mean if self.isgap else jnp.max
        cls_logits = pool(fmap, axis=(1, 2)) @ wc
        cls_aux_logits = pool(fmap_aux, axis=(1, 2)) @ wa

        f32 = lambda t: t.astype(jnp.float32)
        return dict(
            cls=f32(cls_logits),
            cls_aux=f32(cls_aux_logits),
            feat=fmap,
            seg=f32(seg),
            cam=f32(cam),
            cam_aux=f32(cam_aux),
        )


def require_cosa_interface(cfg) -> None:
    """The co-training/eval pipelines need the full CoSA output dict
    (cls/cls_aux/seg/cam/cam_aux). Only 'vit' and 'swinend2end' provide it;
    the seg-only zoo families (res38/mmseg/segformer) are library-use only —
    exactly the reference's status, where their factory branches are
    commented out and main.py would TypeError on their single-tensor
    forward. Fail loudly at the entry point instead of deep in the step."""
    if cfg.model not in ("vit", "swinend2end"):
        raise NotImplementedError(
            f"model '{cfg.model}' is a seg-only zoo family (library use: "
            "cosa_tpu.models.zoo); the co-training/eval pipelines require "
            "the CoSA interface — use model 'vit' or 'swinend2end'"
        )


def build_model(cfg, quant: bool = False):
    """Model factory (reference models/__init__.py:13-79).

    The 'vit' branch (the live pipeline) builds CoSANetwork here; every
    other family — the reference's commented-out zoo branches ('res38',
    'mmseg', 'swinend2end') plus 'segformer' — dispatches to
    models/zoo/__init__.py::build_zoo_model. 'swinend2end' returns the
    full CoSA interface and co-trains; the rest are seg-only models like
    their reference counterparts.

    ``quant=True`` builds the int8-projection twin (same param tree) used
    for the no-grad teacher TTA when cfg.teacher_int8 is on."""
    if cfg.model != "vit":
        from cosa_tpu.models.zoo import build_zoo_model

        assert not quant, "int8 teacher twin is ViT-only"
        return build_zoo_model(cfg)
    import jax.numpy as jnp

    dtype = jnp.bfloat16 if cfg.mixed_precision else jnp.float32
    use_flash = bool(cfg.flash_attention) and jax.default_backend() not in (
        "cpu",
    )
    return CoSANetwork(
        num_classes=cfg.num_classes,
        backbone=cfg.backbone,
        decoder=cfg.decoder,
        aux_layer=cfg.aux_layer,
        isgap=cfg.isgap,
        dtype=dtype,
        use_flash=use_flash,
        quant=quant,
    )
