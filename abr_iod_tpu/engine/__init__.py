from .train import TrainState, Batch, make_train_step, forward_detection_losses
from .inference import make_eval_step

__all__ = [
    "TrainState",
    "Batch",
    "make_train_step",
    "forward_detection_losses",
    "make_eval_step",
]
