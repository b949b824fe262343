from .logger import Logger, LogLevel, logger

__all__ = ["Logger", "LogLevel", "logger"]
