from cosa_tpu.models.network import (  # noqa: F401
    CoSANetwork,
    build_model,
    require_cosa_interface,
)
from cosa_tpu.models.vit import BACKBONES, ViTConfig, VisionTransformer  # noqa: F401
from cosa_tpu.models.decoders import LargeFOV, MaskTransformer  # noqa: F401
