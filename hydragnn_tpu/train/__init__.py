from hydragnn_tpu.train.loop import Trainer, train_validate_test
from hydragnn_tpu.train.optimizer import make_optimizer

__all__ = ["Trainer", "train_validate_test", "make_optimizer"]
