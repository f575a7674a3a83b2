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
# same round.  Round-10 _CHECK_FIRST (exactly 50) =
#   (a) the TWO new queries taking their first driver certifications
#       (ann_pq_topk, ann_ivfpq_topk);
#   (b) ALL 35 r7-green middle entries due this round (staleness limit)
#       — several also picked up round-10 plan changes and re-certify
#       for both reasons (passage_savings + substring_dup_spans:
#       count-window purge; events_sessionize, events_markov_transitions,
#       distinct_kmv_sketch, events_hopping_windows,
#       events_multitouch_attribution: NULL-semantics alignment);
#   (c) the 13 non-due queries whose plans changed this round:
#       part_pagerank (degree partial-agg rides ranks), ann_lsh_buckets
#       + embedding_near_dup_lsh (skew-safe bucket_size + blocked
#       scoring), doc_bm25_topk + dedup_simhash + leakage_safe_split
#       (count/min windows -> partial-agg join-back; leakage also gains
#       the NULL-sentinel hash), join_key_skew + split_divergence
#       (1-row broadcast totals), doc_containment_pairs +
#       doc_prefix_jaccard_join (lazy per_doc checkpoints),
#       events_json_bucket (try_cast robustness),
#       gopher_repetition_report (NULL rows + try_divide),
#       doc_chunk_manifest (NULL fingerprint guard).
# text_tfidf_top_terms / lm_perplexity_filter had FLAG-only
# eager->lazy checkpoint changes (physical plan identical, values
# identical) and rotate normally at the tail rather than displacing a
# due or expression-changed entry; embedding_finite_gate (third new
# query) lands mid-registry — the parity suite covers it now, first
# driver certification r11.  The remaining r8-green middle entries are
# due r11 at the latest; the tail is the round-9-certified block (due
# r12 via the next rotations).  The parity suite still covers all 137
# registry entries at sf0.1 every round.
_CHECK_FIRST = (
    "ann_pq_topk",
    "ann_ivfpq_topk",
    "doc_prefix_jaccard_join",
    "gopher_repetition_report",
    "doc_chunk_manifest",
    "events_json_bucket",
    "part_pagerank",
    "ann_lsh_buckets",
    "embedding_near_dup_lsh",
    "doc_bm25_topk",
    "dedup_simhash",
    "leakage_safe_split",
    "join_key_skew",
    "split_divergence",
    "doc_containment_pairs",
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
# Queries checked in round 9 — rotate to the unchecked tail (due r12);
# the parity suite still covers them at sf0.1 every round.
_CHECK_LAST = (
    "text_tfidf_top_terms",
    "lm_perplexity_filter",
    "corpus_token_coverage",
    "orders_price_exact_quantiles",
    "q3_shipping_priority",
    "q5_region_revenue",
    "orders_value_quartiles",
    "part_triangle_count",
    "ann_ivf_recall",
    "top_orders_by_value",
    "part_projection",
    "part_filter_like_in",
    "customer_order_counts",
    "order_priority_rate",
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
    "events_pivot_by_type",
    "corpus_stats",
    "doc_length_histogram",
    "text_repetition",
    "sequence_packing",
    "source_mixture",
    "boilerplate_ratio",
    "quality_funnel",
    "bpe_merge_candidates",
    "mixture_resample",
    "split_ngram_decontamination",
    "events_cohort_retention",
    "events_anomaly_zscore",
    "bloom_prefilter_join",
    "customer_scd2_snapshot",
    "value_quantile_sketch",
    "brand_top_parts",
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
