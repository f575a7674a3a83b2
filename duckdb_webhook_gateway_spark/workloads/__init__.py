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
# round, and every query whose PHYSICAL PLAN changed re-certifies the
# same round.  Round-9 _CHECK_FIRST = the EIGHT queries whose plans
# changed this round (q3: shuffle-hash hint; q5: selective join order;
# orders_value_quartiles + lm_perplexity_filter: global_ntile replaces
# the single-task global window; doc_prefix_jaccard_join +
# doc_containment_pairs: exploded-stream checkpoint, containment also
# gains the positional filter; part_triangle_count: corner explode +
# oriented checkpoint; ann_ivf_recall: shared one-collect head), the 34
# entries last driver-green in round 6 (staleness limit this round) —
# events_json_bucket among them also picked up a plan change (gated
# hash repartition) — and 8 r7-green entries promoted one round early.
# The remaining 35 r7-green entries sit unlisted in the middle (due
# r10); the 48-entry tail (42 r8-green + the 6 r7-green the plan-change
# re-certs and the new-query slot displaced from the early promotion)
# is due r10/r11 via the parity suite and the next rotation.  The new
# round-9 queries (orders_price_exact_quantiles, corpus_token_coverage)
# take their first driver certification slots at the head.
_CHECK_FIRST = (
    "corpus_token_coverage",
    "orders_price_exact_quantiles",
    "q3_shipping_priority",
    "q5_region_revenue",
    "orders_value_quartiles",
    "lm_perplexity_filter",
    "doc_prefix_jaccard_join",
    "part_triangle_count",
    "doc_containment_pairs",
    "ann_ivf_recall",
    "top_orders_by_value",
    "part_projection",
    "part_filter_like_in",
    "customer_order_counts",
    "order_priority_rate",
    "events_json_bucket",
    "events_recent_topk",
    "events_type_rate",
    "window_top_orders_per_customer",
    "region_keys_union",
    "lineitem_distinct_counts",
    "rollup_region_nation",
    "supplier_string_funcs",
    "nation_key_intersect",
    "cube_order_status",
    "events_funnel",
    "dedup_exact",
    "text_language_id",
    "text_quality",
    "doc_fingerprint",
    "ann_lsh_buckets",
    "events_pivot_by_type",
    "corpus_stats",
    "doc_length_histogram",
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
    "events_cohort_retention",
    "events_anomaly_zscore",
    "bloom_prefilter_join",
    "customer_scd2_snapshot",
    "value_quantile_sketch",
    "brand_top_parts",
)
# Queries checked in round 8 — rotate to the unchecked tail (due r11);
# the parity suite still covers them at sf0.1 every round.
_CHECK_LAST = (
    "doc_bm25_topk",
    "source_ngram_novelty",
    "hybrid_rank_fusion",
    "q1_pricing_summary",
    "supplier_revenue_having",
    "orders_per_month",
    "part_avg_qty_subquery",
    "customers_without_orders",
    "part_size_class",
    "events_hourly",
    "lineitem_price_quantiles",
    "parts_never_ordered",
    "customers_with_urgent_orders",
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
    "part_pagerank",
    "part_basket_pairs",
    "part_name_fuzzy_pairs",
    "orderkey_hll_distinct",
    "q10_returned_revenue",
    "region_status_grouping_sets",
    "monthly_revenue_incremental",
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
