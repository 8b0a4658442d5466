from .train_step import TrainState, freeze_gates, jit_train_step, make_train_step

__all__ = ["TrainState", "freeze_gates", "jit_train_step", "make_train_step"]
