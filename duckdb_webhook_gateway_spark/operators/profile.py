"""Deequ-style table profiling: one pass, one summary row per column.

The data-quality preflight every large-scale pipeline runs before
training: null counts, exact distinct cardinality, and min/max per
column, computed in a SINGLE aggregate over the table (Catalyst compiles
the multi-distinct aggregate into one Expand + paired partial/final
HashAggregates — the table is scanned once no matter how many columns).

Value rendering is type-driven and engine-portable so the DuckDB oracle
hashes identically: numerics print as %.6f, timestamps as
'yyyy-MM-dd HH:mm:ss', everything else casts to string.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _repr_expr(field: T.StructField):
    c = F.col(field.name)
    dt = field.dataType
    if isinstance(dt, (T.DoubleType, T.FloatType, T.DecimalType)):
        return lambda col: F.format_string("%.6f", col)
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType, T.DateType)):
        return lambda col: F.date_format(col, "yyyy-MM-dd HH:mm:ss")
    return lambda col: col.cast("string")


def table_profile(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """(column_name, n_rows, n_nulls, n_distinct, min_repr, max_repr) per
    profiled column, from one aggregate pass over ``df``."""
    fields = [
        f
        for f in df.schema.fields
        if columns is None or f.name in columns
        if not isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
    ]
    aggs = [F.count(F.lit(1)).cast("bigint").alias("_n_rows")]
    for f in fields:
        rep = _repr_expr(f)
        c = F.col(f.name)
        aggs += [
            F.count(c).cast("bigint").alias(f"_nn_{f.name}"),
            F.count_distinct(c).cast("bigint").alias(f"_nd_{f.name}"),
            rep(F.min(c)).alias(f"_mn_{f.name}"),
            rep(F.max(c)).alias(f"_mx_{f.name}"),
        ]
    one = df.agg(*aggs)
    stack = ", ".join(
        f"'{f.name}', _nn_{f.name}, _nd_{f.name}, _mn_{f.name}, _mx_{f.name}"
        for f in fields
    )
    return one.select(
        F.expr(
            f"stack({len(fields)}, {stack}) AS "
            "(column_name, _nn, n_distinct, min_repr, max_repr)"
        ),
        F.col("_n_rows").alias("n_rows"),
    ).select(
        "column_name",
        "n_rows",
        (F.col("n_rows") - F.col("_nn")).cast("bigint").alias("n_nulls"),
        "n_distinct",
        "min_repr",
        "max_repr",
    )
