from tlsan_tpu.train.state import TrainState, make_optimizer, lr_schedule
from tlsan_tpu.train.loop import Trainer
