from cosa_tpu.config import preset_config
from cosa_tpu.train.loop import train

cfg = preset_config(
    "synthetic",
    crop_size=448,
    batch_size=4,
    num_classes=21,
    max_iters=200,
    eval_iters=100,
    log_iters=20,
    warmup_iters=50,
    lr_warmup_iters=50,
    eval_scales=(1.0, 0.5, 1.5),
    fasteval=True,
    finalval=False,
    output_dir="work_dirs/liverun_tpu",
    num_workers=8,
)
res = train(cfg)
print("FINAL", {k: (v if isinstance(v, float) else "...") for k, v in res.items()})
