from .misc import MetricLogger, PhaseTimer, SmoothedValue, profiler_trace

__all__ = ["MetricLogger", "PhaseTimer", "SmoothedValue", "profiler_trace"]
