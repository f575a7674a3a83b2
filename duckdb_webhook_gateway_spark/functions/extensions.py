"""Extensions beyond the reference's function surface (SURVEY §2B lists
UDAF/UDTF as "not present" in the reference; Spark provides both).

- ``json_kv_udtf``   — Python UDTF (Spark 3.5+): explode a JSON object
  into (key, value) rows; the table-function complement to the scalar
  ``json_extract`` shim.
- ``grouped_zscore`` — applyInPandas grouped transform (the UDAF-shaped
  extension point): per-group standardization with Arrow batching, the
  pattern to copy for any custom grouped aggregate the built-ins lack.
"""

from __future__ import annotations

import json
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def register_json_kv_udtf(spark: SparkSession, name: str = "json_kv") -> None:
    """Register a UDTF: ``SELECT * FROM json_kv('{"a": 1}')`` ->
    rows (key, value_json)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="key string, value_json string")
    class JsonKv:
        def eval(self, blob: str):  # noqa: D401
            if blob is None:
                return
            try:
                obj = json.loads(blob)
            except ValueError:
                return
            if not isinstance(obj, dict):
                return
            for k, v in obj.items():
                yield (k, json.dumps(v))

    spark.udtf.register(name, JsonKv)


def grouped_zscore(
    df: DataFrame, group_col: str, value_col: str
) -> DataFrame:
    """Per-group z-score via applyInPandas.

    Each group arrives as one pandas DataFrame (Arrow transfer); the
    group-level mean/std are computed in numpy and broadcast down the
    rows.  Groups are independent — one shuffle by ``group_col``, then
    embarrassingly parallel.  Population std (ddof=0) for determinism.
    """
    out_schema = f"{group_col} string, {value_col} double, zscore double"

    def standardize(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf[value_col].astype("float64")
        mu = v.mean()
        sigma = v.std(ddof=0)
        z = (v - mu) / sigma if sigma > 0 else v * 0.0
        return pd.DataFrame(
            {
                group_col: pdf[group_col].astype(str),
                value_col: v,
                "zscore": z.round(6),
            }
        )

    return (
        df.select(group_col, value_col)
        .groupBy(group_col)
        .applyInPandas(standardize, schema=out_schema)
    )
