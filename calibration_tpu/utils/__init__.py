from . import profiling
from .profiling import Timer, device_trace, lm_cost_trace
