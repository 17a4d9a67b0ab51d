from radian_tpu.train.optimizers import build_optimizer  # noqa: F401
from radian_tpu.train.trainer import Trainer, TrainConfig  # noqa: F401
