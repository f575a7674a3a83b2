"""Structured Streaming layer: micro-batch webhook pipeline."""

from .webhook_source import StreamingGateway, ENVELOPE_SCHEMA

__all__ = ["StreamingGateway", "ENVELOPE_SCHEMA"]
