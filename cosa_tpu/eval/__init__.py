from cosa_tpu.eval.metrics import fast_hist, scores, pseudo_scores, compute_mAP  # noqa: F401
from cosa_tpu.eval.engine import evaluate  # noqa: F401
