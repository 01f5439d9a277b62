from occm_tpu.utils.logging import MetricsLogger
from occm_tpu.utils.profiling import profile_trace, StepTimer

__all__ = ["MetricsLogger", "profile_trace", "StepTimer"]
