"""Transform and filter executors — the hot path of the engine.

Reference semantics reproduced here:

- payload dict -> 1-row relation; payload list -> N-row relation
  (reference: src/app.py:448-458, 541-551)
- ``{{payload}}`` macro substituted with a unique temp-view name
  (reference: src/app.py:462; validation at src/app.py:64-69)
- transform = run substituted SELECT, shape rows per the 0/1/N contract
  (reference: src/app.py:434-522)
- filter = bare WHERE predicate evaluated as an existence gate; ``None`` or
  blank filter always passes (reference: src/app.py:524-579)
- temp views are UUID-named and dropped in ``finally`` for isolation
  (reference: src/app.py:448, 509-522, 541, 567-579)

Spark-first notes: payloads are materialized through ``spark.read.json`` so
nested objects become ``StructType`` (dot access ``nested.key1`` works
natively — the reference relied on DuckDB's struct inference for the same,
tests/test_event_processing.py:56-70) and arrays of objects become
``ArrayType(StructType)`` (stronger than the reference, which documented
array element access as broken, tests/test_event_processing.py:71).
Schema is inferred per event, never cached — two events on one path may
differ in shape, exactly like the reference.
"""

from __future__ import annotations

import json
import uuid
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from ..functions import rewrite_dialect
from .results import shape_result

PAYLOAD_MACRO = "{{payload}}"


def _infer_spark_type(values: list):
    """Driver-side JSON -> Spark type inference, mirroring spark.read.json:
    int->Long, float->Double (int+float widen to Double), bool->Boolean,
    str->String, dict->Struct (keys unioned across rows), list->Array.
    Returns None when the values are not uniformly typeable (caller falls
    back to executor-side read.json inference)."""
    from pyspark.sql import types as T

    non_null = [v for v in values if v is not None]
    if not non_null:
        return T.StringType()
    kinds = {type(v) for v in non_null}
    if kinds == {bool}:
        return T.BooleanType()
    if kinds <= {int} and not kinds & {bool}:
        return T.LongType()
    if kinds <= {int, float} and not kinds & {bool}:
        return T.DoubleType()
    if kinds == {str}:
        return T.StringType()
    if kinds == {dict}:
        keys: list[str] = []
        for v in non_null:
            for k in v:
                if k not in keys:
                    keys.append(k)
        fields = []
        for k in keys:
            ft = _infer_spark_type([v.get(k) for v in non_null])
            if ft is None:
                return None
            fields.append(T.StructField(k, ft, True))
        return T.StructType(fields)
    if kinds == {list}:
        elems = [e for v in non_null for e in v]
        et = _infer_spark_type(elems) if elems else T.StringType()
        if et is None:
            return None
        return T.ArrayType(et, True)
    return None  # mixed/unsupported -> fall back


def _arrow_type(dtype):
    """Spark type (from ``_infer_spark_type``) -> pyarrow type."""
    import pyarrow as pa
    from pyspark.sql import types as T

    if isinstance(dtype, T.LongType):
        return pa.int64()
    if isinstance(dtype, T.DoubleType):
        return pa.float64()
    if isinstance(dtype, T.BooleanType):
        return pa.bool_()
    if isinstance(dtype, T.StringType):
        return pa.string()
    if isinstance(dtype, T.StructType):
        return pa.struct(
            [pa.field(f.name, _arrow_type(f.dataType)) for f in dtype.fields]
        )
    if isinstance(dtype, T.ArrayType):
        return pa.list_(_arrow_type(dtype.elementType))
    raise TypeError(f"no arrow mapping for {dtype}")


def payload_to_df(spark: SparkSession, payload: dict | list) -> DataFrame:
    """JSON payload -> DataFrame with inferred (possibly nested) schema.

    dict -> one row; list -> one row per element
    (reference: src/app.py:451-454).

    Fast path: the schema is inferred driver-side (pure Python walk of the
    JSON — the same type rules spark.read.json applies) and the relation
    is stood up as a pyarrow Table, which ``createDataFrame`` turns into
    a JVM-side **LocalTableScan**.  That matters twice over: no inference
    job, and — unlike the pickled-row ``createDataFrame(rows, schema)``
    this replaces, whose ``Scan ExistingRDD`` re-ran a Python worker
    round-trip on EVERY query over the view (~0.5 s per filter probe) —
    every subsequent query over the payload view evaluates entirely in
    the JVM, usually driver-local without launching a job.  Column order
    follows dict insertion order — matching the reference's pandas
    construction (src/app.py:451-454) where read.json would sort keys.
    Shapes the walker can't type uniformly (mixed scalar kinds,
    int64-overflowing literals) fall back to spark.read.json.
    """
    if isinstance(payload, dict):
        records = [payload]
    elif isinstance(payload, list):
        records = payload
    else:
        raise TypeError(f"payload must be dict or list, got {type(payload).__name__}")

    if records and all(isinstance(r, dict) for r in records):
        schema = _infer_spark_type(records)
        from pyspark.sql import types as T

        if isinstance(schema, T.StructType) and len(schema.fields) > 0:
            try:
                import pyarrow as pa

                tbl = pa.Table.from_pylist(
                    records,
                    schema=pa.schema(
                        [
                            pa.field(f.name, _arrow_type(f.dataType))
                            for f in schema.fields
                        ]
                    ),
                )
                return spark.createDataFrame(tbl)
            except Exception:
                pass  # fall back to authoritative inference
    # One tiny partition: a per-event relation must not fan out across the
    # cluster; inference + scan happen on a single task.
    rdd = spark.sparkContext.parallelize([json.dumps(r) for r in records], 1)
    return spark.read.json(rdd)


def _register_temp_payload(
    spark: SparkSession, payload: dict | list, prefix: str
) -> tuple[str, DataFrame]:
    name = f"{prefix}_{uuid.uuid4().hex}"
    df = payload_to_df(spark, payload)
    df.createOrReplaceTempView(name)
    return name, df


def substitute_macro(transform_query: str, view_name: str) -> str:
    """``{{payload}}`` -> temp view name (reference: src/app.py:462), plus
    DuckDB-dialect rewrites (json_extract -> get_json_object)."""
    return rewrite_dialect(transform_query.replace(PAYLOAD_MACRO, view_name))


def transform_to_df(
    spark: SparkSession, transform_query: str, payload: dict | list
) -> tuple[DataFrame, str]:
    """Build (but do not collect) the transform DataFrame.

    Returns (df, temp_view_name); caller must drop the view when done.
    Exposed separately so the streaming layer can compose transforms
    without driver-side collection.
    """
    view, _ = _register_temp_payload(spark, payload, "temp_payload")
    try:
        df = spark.sql(substitute_macro(transform_query, view))
    except Exception:
        spark.catalog.dropTempView(view)
        raise
    return df, view


def execute_transform(
    spark: SparkSession, transform_query: str, payload: dict | list
) -> dict[str, Any]:
    """Run a transform query against a payload; shape per the 0/1/N contract
    (reference: execute_transform, src/app.py:434-522)."""
    df, view = transform_to_df(spark, transform_query, payload)
    try:
        return shape_result(df)
    finally:
        spark.catalog.dropTempView(view)


def execute_event(
    spark: SparkSession,
    filter_query: str | None,
    transform_query: str,
    payload: dict | list,
) -> tuple[bool, dict[str, Any]]:
    """Fused filter + transform over ONE payload materialization.

    The reference registers separate temp views for filter and transform
    (src/app.py:448, 541) — unobservable implementation detail; sharing a
    single view halves the per-event Spark jobs (payload inference runs
    once).  Semantics identical: filter gates on the raw payload first,
    blank/None filter passes, 0/1/N shaping applies to the transform.

    Returns (passed_filter, shaped_result); result is ``{}`` when gated.
    """
    view, _ = _register_temp_payload(spark, payload, "temp_payload")
    try:
        if filter_query is not None and str(filter_query).strip():
            probe = spark.sql(
                f"SELECT 1 AS hit FROM {view} WHERE {filter_query} LIMIT 1"
            )
            if not probe.take(1):
                return False, {}
        df = spark.sql(substitute_macro(transform_query, view))
        return True, shape_result(df)
    finally:
        spark.catalog.dropTempView(view)


def apply_filter(
    spark: SparkSession, filter_query: str | None, payload: dict | list
) -> bool:
    """Evaluate a bare WHERE predicate as a pass/drop gate.

    ``None``/blank predicate always passes (reference: src/app.py:537-538).
    The reference runs ``SELECT COUNT(*) FROM tmp WHERE <pred>`` and checks
    ``> 0`` (src/app.py:555-560); an existence probe (``LIMIT 1``) is
    semantically identical and stops at the first qualifying row instead of
    counting them all — the version that survives a wide payload relation.
    """
    if filter_query is None or not str(filter_query).strip():
        return True
    view, _ = _register_temp_payload(spark, payload, "temp_filter")
    try:
        probe = spark.sql(f"SELECT 1 AS hit FROM {view} WHERE {filter_query} LIMIT 1")
        return len(probe.take(1)) > 0
    finally:
        spark.catalog.dropTempView(view)
