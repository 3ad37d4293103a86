from r3d_tpu.train.optim import linear_warmup_cosine_schedule, make_optimizer
from r3d_tpu.train.state import TrainState, create_train_state
from r3d_tpu.train.loop import Trainer
