from fall_multimodal_tpu.train.loop import (
    EvalResult,
    FitResult,
    evaluate,
    fit,
    make_eval_epoch,
    make_train_epoch,
    make_train_step,
)
from fall_multimodal_tpu.train.losses import cross_entropy, smooth_labels
from fall_multimodal_tpu.train.metrics import (
    classification_report,
    confusion_matrix,
    prf_from_confusion,
    top_k_accuracy,
)
from fall_multimodal_tpu.train.optim import build_optimizer, build_schedule
from fall_multimodal_tpu.train.state import TrainState, create_train_state, param_count

__all__ = [
    "EvalResult",
    "FitResult",
    "TrainState",
    "build_optimizer",
    "build_schedule",
    "classification_report",
    "confusion_matrix",
    "create_train_state",
    "cross_entropy",
    "evaluate",
    "fit",
    "make_eval_epoch",
    "make_train_epoch",
    "make_train_step",
    "param_count",
    "prf_from_confusion",
    "smooth_labels",
    "top_k_accuracy",
]
