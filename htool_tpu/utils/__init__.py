from .logger import Logger, LogLevel, logger
from .options import SolverOptions
from .profiling import Timer, annotate, device_trace

__all__ = [
    "Logger",
    "LogLevel",
    "logger",
    "SolverOptions",
    "Timer",
    "annotate",
    "device_trace",
]
