from dex_tts_tpu.train.preemption import PreemptionGuard
from dex_tts_tpu.train.state import TrainState, create_train_state
from dex_tts_tpu.train.trainer import Trainer, make_train_step

__all__ = [
    "TrainState",
    "create_train_state",
    "Trainer",
    "make_train_step",
    "PreemptionGuard",
]
