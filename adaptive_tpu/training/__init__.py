from adaptive_tpu.training.train_loop import main_train

__all__ = ["main_train"]
