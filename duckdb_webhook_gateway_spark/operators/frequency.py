"""Skew-safe doc-frequency attachment.

The pattern ``count().over(Window.partitionBy(key))`` on a token/ngram
key is a 100 TB scale hazard: count windows get NO map-side partial
aggregation, and AQE's skew handling applies only to joins — a
stop-word or hot-trigram key pins its entire corpus-scale row set on
ONE task.  The helper here replaces it with the partial-aggregate
shape: ``groupBy(key).count()`` (map-side combine collapses a hot key
to one row per map task) joined back.  The join's probe side is still
skewed on the hot key, but it is a JOIN — AQE's OptimizeSkewedJoin can
split the oversized partition — and its build side is key-cardinality
(exactly one row per key), so every split holds.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def attach_group_count(
    rel: DataFrame, keys: Sequence[str], out_col: str
) -> DataFrame:
    """Attach the per-``keys`` row count of ``rel`` as ``out_col``.

    Drop-in, result-identical replacement for
    ``rel.withColumn(out_col, F.count(lit(1)).over(Window.partitionBy(*keys)))``
    with the skew posture described in the module docstring.  The count
    relation aggregates with map-side partials (hot keys collapse before
    the wire) and the join back is AQE-skew-splittable.  Under AQE the
    exchange feeding ``rel`` is reused across the probe and count
    branches, so upstream lineage does not re-execute.
    """
    counts = rel.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("bigint").alias(out_col)
    )
    return rel.join(counts, list(keys))
