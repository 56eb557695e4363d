from shm_tpu.evals.metrics import (
    confusion_matrix,
    accuracy,
    precision_recall_fscore,
    roc_curve,
    auc,
    roc_auc_score,
    precision_recall_curve,
    average_precision_score,
    binary_prf,
    classification_report_dict,
)

__all__ = [
    "confusion_matrix",
    "accuracy",
    "precision_recall_fscore",
    "roc_curve",
    "auc",
    "roc_auc_score",
    "precision_recall_curve",
    "average_precision_score",
    "binary_prf",
    "classification_report_dict",
]
