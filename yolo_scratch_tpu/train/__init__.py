from yolo_scratch_tpu.train.optim import cosine_epoch_schedule, make_optimizer  # noqa: F401
from yolo_scratch_tpu.train.state import TrainState, create_train_state  # noqa: F401
from yolo_scratch_tpu.train.steps import make_train_step, make_eval_step  # noqa: F401
