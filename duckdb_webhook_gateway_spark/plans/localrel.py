"""Arrow-backed local literal relations.

``spark.createDataFrame(list_of_tuples, schema)`` builds a PICKLED
PYTHON RDD: every job that touches the relation — even as the tiny
broadcast side of a join, even a 16-row write — pays a Python-worker
round trip, and the plan shows ``Scan ExistingRDD``.  Routed through
pandas (Arrow conversion happens ONCE, driver-side), the same rows
become a JVM-local ``LocalTableScan``: measured 4.05 s -> 0.16 s for a
16-row parquet write job, and ~0.3-0.4 s saved for every job whose
plan scans such a relation (rank-pick broadcast sides, PQ codebooks,
quantile label tables).  The engine's payload path learned this in
round 5 (``engine/executors.py::payload_to_df``); this helper applies
it to the operator/workload literal relations.

Caveat: rows must not carry NULLs in numeric columns (pandas would
coerce them to float NaN before Arrow sees the schema); every caller
here builds fully-populated literal tuples.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def local_df(spark: SparkSession, rows, schema) -> DataFrame:
    """``createDataFrame(rows, schema)`` that yields a LocalTableScan.

    ``schema`` is a DDL string ("a bigint, b array<double>") or a
    ``StructType``; ``rows`` are tuples (positional) or dicts (aligned
    by field name — missing keys surface as nulls via pandas, so only
    nullable fields may be absent).  Empty ``rows`` take the plain
    empty-relation path (no scan either way).
    """
    rows = list(rows)
    if not rows:
        return spark.createDataFrame([], schema)
    import pandas as pd

    from pyspark.sql.types import StructType, _parse_datatype_string

    st = (
        schema
        if isinstance(schema, StructType)
        else _parse_datatype_string(schema)
    )
    names = st.fieldNames()
    if isinstance(rows[0], dict):
        pdf = pd.DataFrame.from_records(rows, columns=names)
    else:
        pdf = pd.DataFrame(rows, columns=names)
    return spark.createDataFrame(pdf, st)
