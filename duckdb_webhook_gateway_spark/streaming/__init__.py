"""Structured Streaming layer: micro-batch webhook pipeline."""
