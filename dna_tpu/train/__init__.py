from dna_tpu.train import optim, tasks  # noqa: F401  (registers entries)
from dna_tpu.train.optim import build_optimizer
from dna_tpu.train.state import TrainState, create_train_state, param_count
from dna_tpu.train.step import make_eval_step, make_predict_step, make_train_step
from dna_tpu.train.tasks import get_task

__all__ = [
    "TrainState",
    "build_optimizer",
    "create_train_state",
    "get_task",
    "make_eval_step",
    "make_predict_step",
    "make_train_step",
    "param_count",
]
