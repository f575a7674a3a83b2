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


def local_df(spark: SparkSession, rows, schema: str) -> DataFrame:
    """``createDataFrame(rows, schema)`` that yields a LocalTableScan.

    ``schema`` is a DDL string ("a bigint, b array<double>"); empty
    ``rows`` take the plain empty-relation path (no scan either way).
    """
    if not rows:
        return spark.createDataFrame([], schema)
    import pandas as pd

    from pyspark.sql.types import _parse_datatype_string

    st = _parse_datatype_string(schema)
    pdf = pd.DataFrame(list(rows), columns=st.fieldNames())
    return spark.createDataFrame(pdf, st)
