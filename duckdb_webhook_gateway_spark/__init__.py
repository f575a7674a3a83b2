"""PySpark-native analytics engine with the query and data-processing
capabilities of ``patricktrainer/duckdb-webhook-gateway``.

The reference (snapshot at /root/reference) is a FastAPI service where DuckDB
is both storage and compute (reference: src/app.py:4-8).  This package is a
brand-new, Spark-first re-expression of the same capabilities:

- :mod:`.engine`     — SQL-on-JSON transform/filter executors, catalog,
  audit store, reference tables, runtime UDFs, the per-event pipeline and
  the ad-hoc query gateway (reference: src/app.py).
- :mod:`.operators`  — large-scale training-data operators (dedup families,
  similarity search, text analysis, multimodal plumbing) that go beyond the
  reference surface but run on the same engine core.
- :mod:`.functions`  — SQL dialect shims (``json_extract``) and
  deterministic hashing primitives shared with the DuckDB oracle.
- :mod:`.sources`    — file readers (CSV/JSON/Parquet) for reference tables.
- :mod:`.plans`      — read-only plan guard for the ad-hoc gateway.
- :mod:`.streaming`  — Structured Streaming micro-batch webhook pipeline.
- :mod:`.api`        — FastAPI shell (import-gated; optional).

Everything here is built only on public Apache Spark / PySpark APIs.
"""

from .session import get_spark, stop_spark

__all__ = ["get_spark", "stop_spark"]

__version__ = "0.1.0"
