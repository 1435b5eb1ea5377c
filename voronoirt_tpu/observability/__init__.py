"""Metrics, timing, tracing (SURVEY.md §5)."""

from .metrics import PhaseTimer, throughput, device_trace, nan_guard
