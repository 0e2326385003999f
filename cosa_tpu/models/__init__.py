from cosa_tpu.models.network import CoSANetwork, build_model  # noqa: F401
from cosa_tpu.models.vit import BACKBONES, ViTConfig, VisionTransformer  # noqa: F401
from cosa_tpu.models.decoders import LargeFOV, MaskTransformer  # noqa: F401
