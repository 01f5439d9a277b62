from occm_tpu.ops.pool import (
    adaptive_avg_pool2d,
    max_pool2d,
    global_avg_pool2d,
)
from occm_tpu.ops.mfm import mfm_max

__all__ = [
    "adaptive_avg_pool2d",
    "max_pool2d",
    "global_avg_pool2d",
    "mfm_max",
]
