from cosa_tpu.utils.logging import AverageMeter, MetricWriter, format_iou_table  # noqa: F401
