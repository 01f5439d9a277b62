from occm_tpu.train.state import TrainState, create_train_state
from occm_tpu.train.loop import make_train_step, train

__all__ = ["TrainState", "create_train_state", "make_train_step", "train"]
