from adaptive_tpu.utils.logging import MetricWriter, HMS
from adaptive_tpu.utils.profiling import Timer, profile_trace

__all__ = ["MetricWriter", "HMS", "Timer", "profile_trace"]
