"""Headline workloads: the SQL operator surface of SURVEY.md §2B plus the
large-scale training-data operators, each paired with a DuckDB oracle.

Every entry is ``name -> (spark_fn, oracle_sql_or_None)`` where
``spark_fn(spark, sf_dir) -> DataFrame`` and the oracle is ANSI SQL DuckDB
can run over the same parquet tables.  Column names/aliases match exactly
between the two — the driver's comparator sorts columns by name before
hashing values.
"""

from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]
Entry = tuple[QueryFn, Optional[str]]

from . import analytics, datapipe  # noqa: E402

# The correctness driver checks the first 50 registered queries per round.
# Rotation policy: every query is driver-re-verified at least every third
# round.  Round-6 _CHECK_FIRST = the 26 queries last green in r3 (they hit
# the staleness limit this round) + the 24 r5-green entries with the
# OLDEST prior history (last green in r2 before r5).  The 50 r4-green
# entries sit unlisted in the middle (due r7, rotate in next round); the
# remaining 26 r5-green entries — including the three r5 additions, whose
# history is youngest — rotate to _CHECK_LAST (due r8).
_CHECK_FIRST = (
    # last driver-green in round 3 (staleness limit this round):
    "join_key_skew",
    "salted_join_orders",
    "embedding_near_dup_lsh",
    "text_char_stats",
    "dataset_split",
    "corpus_top_bigrams",
    "multimodal_audio_features",
    "multimodal_image_features",
    "dedup_keeplist",
    "stratified_sample",
    "split_contamination",
    "dedup_clusters",
    "text_pattern_scrub",
    "passage_dedup",
    "split_divergence",
    "ann_q8_topk",
    "text_repetition",
    "sequence_packing",
    "source_mixture",
    "boilerplate_ratio",
    "doc_chunk_manifest",
    "quality_funnel",
    "bpe_merge_candidates",
    "mixture_resample",
    "split_ngram_decontamination",
    "leakage_safe_split",
    # r5-green with the oldest prior history (r2 before r5):
    "order_priority_rate",
    "dedup_exact",
    "events_recent_topk",
    "events_pivot_by_type",
    "text_language_id",
    "text_quality",
    "doc_fingerprint",
    "ann_lsh_buckets",
    "window_top_orders_per_customer",
    "events_funnel",
    "rollup_region_nation",
    "events_json_bucket",
    "customer_order_counts",
    "part_filter_like_in",
    "events_type_rate",
    "corpus_stats",
    "doc_length_histogram",
    "part_projection",
    "region_keys_union",
    "nation_key_intersect",
    "supplier_string_funcs",
    "lineitem_distinct_counts",
    "top_orders_by_value",
    "cube_order_status",
)
# Freshest r5-green queries (checked last round) — rotate to the
# unchecked tail; the parity suite still covers them at sf0.1 every round.
_CHECK_LAST = (
    "customers_without_orders",
    "part_size_class",
    "orders_per_month",
    "customers_with_urgent_orders",
    "parts_never_ordered",
    "events_hourly",
    "orders_value_quartiles",
    "supplier_revenue_having",
    "lineitem_price_quantiles",
    "part_avg_qty_subquery",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "events_runtime_udf",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "text_token_stats",
    "ann_cosine_topk",
    "embedding_near_dup",
    "multimodal_features",
    "ann_ivf_topk",
    "text_tfidf_top_terms",
    "substring_dup_spans_sa",
    "gopher_quality_gate",
    "gopher_repetition_report",
)


def all_entries() -> dict[str, Entry]:
    entries: dict[str, Entry] = {}
    entries.update(analytics.ENTRIES)
    entries.update(datapipe.ENTRIES)
    ordered: dict[str, Entry] = {}
    # A typo'd or renamed rotation name must FAIL here, not silently
    # shrink the driver's 50-query verification window.
    missing = [n for n in (*_CHECK_FIRST, *_CHECK_LAST) if n not in entries]
    if missing:
        raise KeyError(
            f"rotation names not in the query registry: {missing}"
        )
    for name in _CHECK_FIRST:
        ordered[name] = entries[name]
    for name, e in entries.items():
        if name not in _CHECK_FIRST and name not in _CHECK_LAST:
            ordered[name] = e
    for name in _CHECK_LAST:
        ordered[name] = entries[name]
    return ordered
