"""Deequ-style table profiling: null counts, exact distinct cardinality,
and min/max per column — the data-quality preflight a training pipeline
runs before ingesting a new source.

Plan shape (chosen over the obvious single multi-distinct aggregate):
one column-pruned scan per column, each feeding a HASH partial/final
aggregate keyed on the column's values, then a tiny rollup over the
distinct relation.  The multi-distinct form compiles to Expand(xN+1)
followed by SortAggregate — min/max over STRING columns has a
non-mutable aggregation buffer, so Spark abandons hash aggregation and
full-sorts the expanded corpus (measured 3.1 s vs 0.6 s on 10k rows;
at 100 TB it is a corpus x columns sort).  Per-column jobs keep every
corpus-touching aggregate hash-based; only the distinct-cardinality
rollup (where min/max run) sort-aggregates.  Total IO equals one full
scan — parquet reads exactly one column per job (ReadSchema pruning).

Value rendering is type-driven and engine-portable so the DuckDB oracle
hashes identically: numerics print as %.6f, timestamps as
'yyyy-MM-dd HH:mm:ss', everything else casts to string.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _repr_expr(field: T.StructField):
    dt = field.dataType
    if isinstance(dt, (T.DoubleType, T.FloatType, T.DecimalType)):
        return lambda col: F.format_string("%.6f", col)
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType, T.DateType)):
        return lambda col: F.date_format(col, "yyyy-MM-dd HH:mm:ss")
    return lambda col: col.cast("string")


def table_profile(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """(column_name, n_rows, n_nulls, n_distinct, min_repr, max_repr) per
    profiled column."""
    fields = [
        f
        for f in df.schema.fields
        if columns is None or f.name in columns
        if not isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
    ]
    parts = []
    for f in fields:
        rep = _repr_expr(f)
        per_value = df.groupBy(F.col(f.name).alias("v")).agg(
            F.count(F.lit(1)).alias("cnt")
        )
        parts.append(
            per_value.agg(
                # coalesce: an EMPTY table must profile as n_rows=0, not
                # NULL (sum over zero rows is NULL)
                F.coalesce(F.sum("cnt"), F.lit(0))
                .cast("bigint")
                .alias("n_rows"),
                F.coalesce(
                    F.sum(F.when(F.col("v").isNull(), F.col("cnt"))), F.lit(0)
                )
                .cast("bigint")
                .alias("n_nulls"),
                F.count("v").cast("bigint").alias("n_distinct"),
                rep(F.min("v")).alias("min_repr"),
                rep(F.max("v")).alias("max_repr"),
            ).select(
                F.lit(f.name).alias("column_name"),
                "n_rows",
                "n_nulls",
                "n_distinct",
                "min_repr",
                "max_repr",
            )
        )
    if not parts:
        # no profilable (scalar) field matched — an empty relation with
        # the profile schema, not an opaque reduce() TypeError
        return df.sparkSession.createDataFrame(
            [],
            "column_name string, n_rows bigint, n_nulls bigint, "
            "n_distinct bigint, min_repr string, max_repr string",
        )
    return reduce(lambda a, b: a.unionByName(b), parts)


def functional_dependencies(df, cols):
    """Discover which functional dependencies X -> Y hold among ``cols``.

    X -> Y holds iff COUNT(DISTINCT X) == COUNT(DISTINCT (X, Y)) — adding
    Y to the key creates no new groups.  All k + k(k-1) distinct counts
    are computed in ONE aggregate over ONE scan (Spark plans multi-
    distinct aggregates through a single Expand), and the 1-row result is
    unpivoted to (lhs, rhs, ...) rows with ``stack`` — no driver-side
    action, no per-pair rescan.  At 100 TB this is k² profile metrics for
    the price of one pass; the naive per-pair loop is k² scans.

    Returns (lhs, rhs, n_lhs_distinct, n_pair_distinct, holds) for every
    ordered pair of distinct columns.  NULL handling: Spark's
    countDistinct(x, y) drops a row when EITHER column is NULL, while
    DuckDB's COUNT(DISTINCT (x, y)) keeps partial-NULL structs — the two
    agree only on null-free inputs, which is what the paired workload
    oracle uses; on nullable columns this operator reports Spark's
    semantics (FD verdict over rows where both sides are non-NULL).
    """
    from pyspark.sql import functions as F

    # aliases are POSITIONAL (d_0, p_0_1), never derived from the column
    # names — name-derived aliases collide for names like 'a_'+'b' vs
    # 'a'+'_b', and the labels in stack() are quote-escaped, so arbitrary
    # column names are safe
    aggs = []
    for i, c in enumerate(cols):
        aggs.append(F.countDistinct(F.col(c)).alias(f"d_{i}"))
    for i, x in enumerate(cols):
        for j, y in enumerate(cols):
            if i != j:
                aggs.append(
                    F.countDistinct(F.col(x), F.col(y)).alias(f"p_{i}_{j}")
                )
    one = df.agg(*aggs)

    def _lit(name: str) -> str:
        return "'" + name.replace("'", "''") + "'"

    stack_args = []
    for i, x in enumerate(cols):
        for j, y in enumerate(cols):
            if i != j:
                stack_args.append(
                    f"{_lit(x)}, {_lit(y)}, `d_{i}`, `p_{i}_{j}`"
                )
    n = sum(1 for x in cols for y in cols if x != y)
    stacked = one.select(
        F.expr(
            f"stack({n}, {', '.join(stack_args)}) "
            "AS (lhs, rhs, n_lhs_distinct, n_pair_distinct)"
        )
    )
    return stacked.select(
        "lhs",
        "rhs",
        "n_lhs_distinct",
        "n_pair_distinct",
        (F.col("n_lhs_distinct") == F.col("n_pair_distinct")).alias("holds"),
    )
