from occm_tpu.losses.oneclass import (
    pairwise_distance,
    compactness_loss,
    descriptiveness_loss,
    triplet_loss,
    euclidean_distance_loss,
    one_class_loss,
)
from occm_tpu.losses.angle import angle_loss, AngleLossState

__all__ = [
    "pairwise_distance",
    "compactness_loss",
    "descriptiveness_loss",
    "triplet_loss",
    "euclidean_distance_loss",
    "one_class_loss",
    "angle_loss",
    "AngleLossState",
]
