from .padding import round_up, pad_rows, grow_capacity
from .tracing import get_logger, PerfMonitor

__all__ = ["round_up", "pad_rows", "grow_capacity", "get_logger", "PerfMonitor"]
