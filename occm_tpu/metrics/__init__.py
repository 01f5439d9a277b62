from occm_tpu.metrics.eer import (
    compute_det_curve,
    compute_eer,
    calculate_confusion_matrix,
)

__all__ = ["compute_det_curve", "compute_eer", "calculate_confusion_matrix"]
