from occm_tpu.audio.frontend import (
    pad as pad_numpy,
    repeat_pad_crop,
    batch_repeat_pad_crop,
    zero_pad_to_max,
)

__all__ = [
    "pad_numpy",
    "repeat_pad_crop",
    "batch_repeat_pad_crop",
    "zero_pad_to_max",
]
