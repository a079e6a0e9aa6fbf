from scann_tpu.train.schedules import SGDRSchedule, make_cosine_lr  # noqa: F401
from scann_tpu.train.loop import Trainer, TrainState  # noqa: F401
