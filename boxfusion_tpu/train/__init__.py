from boxfusion_tpu.train.loss import detection_loss, greedy_match
from boxfusion_tpu.train.step import TrainState, make_train_step

__all__ = ["detection_loss", "greedy_match", "TrainState", "make_train_step"]
