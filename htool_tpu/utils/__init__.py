from .logger import Logger, LogLevel, logger
from .options import SolverOptions

__all__ = ["Logger", "LogLevel", "logger", "SolverOptions"]
