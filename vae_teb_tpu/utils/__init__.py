"""Utilities: logging, profiling, observability."""

from .logging import StreamToLogger, get_logger, setup_logging
from .profiling import (StepTimer, device_memory_stats, find_max_batch_size,
                        trace)

__all__ = ["StreamToLogger", "get_logger", "setup_logging",
           "StepTimer", "device_memory_stats", "find_max_batch_size",
           "trace"]
