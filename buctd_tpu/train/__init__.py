from .state import TrainState, create_train_state, make_lr_schedule, make_train_step

__all__ = ["TrainState", "create_train_state", "make_lr_schedule", "make_train_step"]
