from .train_state import TrainState, build_optimizer, make_lr_schedule

__all__ = ["TrainState", "build_optimizer", "make_lr_schedule"]
