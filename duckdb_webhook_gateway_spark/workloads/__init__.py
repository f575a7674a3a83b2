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
# round.  Round-5 _CHECK_FIRST = new round-5 queries (never checked) +
# the 50-minus-new OLDEST-verified entries (34 last green in r2 + the
# oldest r3 tail, per the CORRECTNESS_r0{1..4}.json union); the 50
# r4-green entries rotate to _CHECK_LAST; the remaining r3-green block
# sits in the middle and rotates in next round.
_CHECK_FIRST = (
    # round-5 additions (never driver-checked):
    "substring_dup_spans_sa",
    "gopher_quality_gate",
    "gopher_repetition_report",
    # last driver-green in round 2:
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
    # last driver-green in round 3 (oldest first-registered):
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
)
# r4-green queries (checked last round) — rotate to the unchecked tail;
# the parity suite still covers them at sf0.1 every round.
_CHECK_LAST = (
    "part_basket_pairs",
    "events_hourly_gapfill",
    "customer_functional_deps",
    "events_hopping_windows",
    "doc_prefix_jaccard_join",
    "nation_trade_matrix",
    "part_pagerank",
    "part_name_fuzzy_pairs",
    "orderkey_hll_distinct",
    "q10_returned_revenue",
    "region_status_grouping_sets",
    "monthly_revenue_incremental",
    "events_markov_transitions",
    "embedding_dim_stats",
    "events_sessionize",
    "token_heavy_hitters",
    "bloom_prefilter_join",
    "weighted_sample_topk",
    "customer_scd2_snapshot",
    "value_quantile_sketch",
    "source_overlap_kmv",
    "events_multitouch_attribution",
    "brand_top_parts",
    "token_freq_cm_sketch",
    "semantic_dedup",
    "lm_perplexity_filter",
    "dsir_selection",
    "substring_dup_spans",
    "events_profile",
    "streaming_hourly_counts",
    "corpus_zipf_stats",
    "multimodal_image_resize",
    "source_quality_deciles",
    "source_temperature_mixture",
    "multimodal_video_features",
    "embedding_label_quality",
    "corpus_pmi_pairs",
    "events_rolling_features",
    "distinct_kmv_sketch",
    "events_range_join",
    "source_lang_mix",
    "passage_savings",
    "dedup_incremental",
    "ensemble_near_dup",
    "events_anomaly_zscore",
    "training_order_manifest",
    "vocab_oov_rate",
    "cross_source_overlap",
    "events_cohort_retention",
    "events_asof_attribution",
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
