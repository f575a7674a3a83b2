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
# round.  Round-8 _CHECK_FIRST = the THREE round-8 additions and the
# THREE round-7 additions (first driver certification), the 26 entries
# last driver-green in round 5 (staleness limit this round), the two
# r7-green queries whose physical plans changed this round
# (lm_perplexity_filter and doc_prefix_jaccard_join pick up the
# partial-agg doc-frequency relation — re-certify after the plan change),
# and 16 r6-green entries promoted one round early.  The remaining
# r6-green entries sit unlisted in the middle (due r9); the other 48
# r7-green entries rotate to _CHECK_LAST (due r10).
_CHECK_FIRST = (
    # round-8 additions — first driver certification:
    "part_triangle_count",
    "doc_containment_pairs",
    "ann_ivf_recall",
    # round-7 additions — first driver certification:
    "doc_bm25_topk",
    "source_ngram_novelty",
    "hybrid_rank_fusion",
    # last driver-green in round 5 (staleness limit this round):
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "supplier_revenue_having",
    "orders_per_month",
    "part_avg_qty_subquery",
    "customers_without_orders",
    "part_size_class",
    "events_hourly",
    "orders_value_quartiles",
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
    # r7-green but plan-changed this round (partial-agg df) — re-certify:
    "lm_perplexity_filter",
    "doc_prefix_jaccard_join",
    # r6-green promoted one round early:
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
)
# Queries checked in round 7 — rotate to the unchecked tail (due r10);
# the parity suite still covers them at sf0.1 every round.
_CHECK_LAST = (
    "events_cohort_retention",
    "events_anomaly_zscore",
    "bloom_prefilter_join",
    "customer_scd2_snapshot",
    "value_quantile_sketch",
    "brand_top_parts",
    "part_basket_pairs",
    "part_pagerank",
    "part_name_fuzzy_pairs",
    "orderkey_hll_distinct",
    "q10_returned_revenue",
    "region_status_grouping_sets",
    "monthly_revenue_incremental",
    "events_markov_transitions",
    "nation_trade_matrix",
    "events_hopping_windows",
    "customer_functional_deps",
    "events_hourly_gapfill",
    "dedup_incremental",
    "events_sessionize",
    "events_asof_attribution",
    "training_order_manifest",
    "vocab_oov_rate",
    "cross_source_overlap",
    "ensemble_near_dup",
    "source_lang_mix",
    "passage_savings",
    "events_rolling_features",
    "distinct_kmv_sketch",
    "events_range_join",
    "corpus_pmi_pairs",
    "embedding_label_quality",
    "multimodal_video_features",
    "source_temperature_mixture",
    "source_quality_deciles",
    "multimodal_image_resize",
    "corpus_zipf_stats",
    "streaming_hourly_counts",
    "semantic_dedup",
    "dsir_selection",
    "substring_dup_spans",
    "events_profile",
    "token_heavy_hitters",
    "weighted_sample_topk",
    "source_overlap_kmv",
    "events_multitouch_attribution",
    "token_freq_cm_sketch",
    "embedding_dim_stats",
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
