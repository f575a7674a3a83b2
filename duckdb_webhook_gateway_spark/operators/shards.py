"""Training-shard export: the sink end of the data pipeline.

Writes a curated corpus as N deterministic shards of parquet, the layout
training jobs consume (one worker streams one shard; epoch order is
shard-major).  Design for 100 TB:

- shard assignment is a pure in-row hash (md5 of the id column, mod
  n_shards) — no global sort, no single-partition cumsum window, no
  driver state; the same doc lands in the same shard on any cluster,
  any partitioning, any run.
- the write repartitions BY the shard column (one shuffle), sorts
  within partitions by the id hash so shard files are byte-stable, and
  emits hive-partitioned ``shard_id=K/`` directories with
  ``maxRecordsPerFile`` bounding individual file sizes.
- the returned manifest (one row per shard: docs, tokens) is what the
  training launcher reads to schedule workers; it is re-derivable from
  the written files (count over each partition) — no side state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import md5_int_expr


def with_shard(
    df: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Add deterministic ``shard_id`` (0..n_shards-1) from md5(id).

    NULL ids hash as the empty string: without the coalesce they would
    get a NULL shard_id, land in Hive's default partition, and silently
    drop out of the 0..n_shards-1 manifest spine — rows no worker would
    ever stream."""
    h = md5_int_expr(f"coalesce(CAST({id_col} AS STRING), '')", "spark")
    return df.withColumn(
        "shard_id", (F.expr(h) % n_shards).cast("int")
    )


def write_training_shards(
    df: DataFrame,
    out_dir: str,
    n_shards: int = 8,
    id_col: str = "doc_id",
    token_col: str | None = None,
    max_records_per_file: int = 1_000_000,
) -> DataFrame:
    """Write ``df`` as hive-partitioned training shards; return the
    manifest (shard_id, n_docs, n_tokens ─ null when no token_col)."""
    sharded = with_shard(df, n_shards, id_col)
    (
        sharded.repartition(n_shards, "shard_id")
        .sortWithinPartitions(F.expr(md5_int_expr(f"CAST({id_col} AS STRING)", "spark")))
        .write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy("shard_id")
        .parquet(out_dir)
    )
    spark = df.sparkSession
    written = spark.read.parquet(out_dir)
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n_docs")]
    if token_col is not None:
        aggs.append(F.sum(token_col).cast("bigint").alias("n_tokens"))
    else:
        aggs.append(F.lit(None).cast("bigint").alias("n_tokens"))
    counted = written.groupBy(
        F.col("shard_id").cast("int").alias("shard_id")
    ).agg(*aggs)
    # full 0..n_shards-1 spine: a shard that received zero rows gets an
    # explicit (id, 0, 0/null) manifest row — a launcher iterating the
    # manifest must see every shard, not silently fewer than n_shards
    spine = spark.range(n_shards).select(F.col("id").cast("int").alias("shard_id"))
    n_tokens_fill = (
        F.lit(None).cast("bigint") if token_col is None else F.lit(0).cast("bigint")
    )
    return (
        spine.join(counted, "shard_id", "left")
        .select(
            "shard_id",
            F.coalesce("n_docs", F.lit(0)).cast("bigint").alias("n_docs"),
            F.coalesce("n_tokens", n_tokens_fill).alias("n_tokens"),
        )
        .orderBy("shard_id")
    )
