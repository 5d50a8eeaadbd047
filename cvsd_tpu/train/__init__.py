from cvsd_tpu.train.optim import EarlyStopping, build_optimizer, build_schedule  # noqa: F401
from cvsd_tpu.train.loop import TrainState, Trainer, train_from_config  # noqa: F401
