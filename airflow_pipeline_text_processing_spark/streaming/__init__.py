"""Structured Streaming ingest + driver-side reliability machinery."""

from .reliability import RetryManager, CircuitBreaker, CircuitOpenError
from .ingest import streaming_ingest

__all__ = ["RetryManager", "CircuitBreaker", "CircuitOpenError", "streaming_ingest"]
