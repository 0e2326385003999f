from cosa_tpu.train.optimizer import build_optimizer, poly_warmup_schedule  # noqa: F401
from cosa_tpu.train.state import TrainState, create_train_state  # noqa: F401
from cosa_tpu.train.step import build_train_step  # noqa: F401
