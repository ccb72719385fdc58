"""Utility subsystems: tracing/timing."""

from .timing import end_timer, start_timer, timed

__all__ = ["start_timer", "end_timer", "timed"]
