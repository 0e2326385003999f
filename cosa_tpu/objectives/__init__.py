from cosa_tpu.objectives.losses import (  # noqa: F401
    multilabel_soft_margin,
    seg_loss,
    cam_loss_v1,
    cam_loss_v2,
    cam_loss_v3,
    cross_entropy_ignore,
)
from cosa_tpu.objectives.pseudo import (  # noqa: F401
    cam_validation,
    cam_to_label,
    cam2mask,
    minmax_norm,
    multi_scale_camseg,
    seg_refine_by_label,
    seg_validation,
)
from cosa_tpu.objectives.variants import (  # noqa: F401
    mask_to_onehot,
    multi_scale_camseg_v2,
    multi_scale_camseg_v4,
    multi_scale_cls,
    multi_scale_seg,
    seg_get_pseudo,
    seg_loss_v2,
    seg_softloss,
    seg_softloss_v2,
    seg_weightloss,
)
