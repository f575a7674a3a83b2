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
# round CAPACITY PERMITTING, and every query whose PHYSICAL PLAN changed
# re-certifies the same round.  The registry outgrew the window's
# 3-round capacity late in round 11 (153 entries > 3 x 50 slots), so the
# policy gained a mechanical second tier: when a round's due set exceeds
# 50, the window is filled with dues STALEST-FIRST and only the
# least-stale dues defer (by construction at most one round — the
# tools/rotation.py HARD_CEILING of 4 rounds is unconditional and
# arithmetically satisfiable at 4 x 50 = 200 >= registry size).
# tests/test_rotation.py enforces both tiers; tools/rotation.py
# prioritized_dues() emits the exact window order to use.
# Since round 11 the due set is MECHANICAL, not narrated:
# tools/rotation.py derives each entry's last green round from the
# CORRECTNESS_r*.json history and tests/test_rotation.py fails the suite
# if this window misses any due entry — the round-10 slip (six
# r7-certified queries missed their r10 window while comments claimed
# "zero slips") cannot silently recur.  Round-11 _CHECK_FIRST
# (exactly 50) =
#   (a) the SIX r7-stale queries the round-10 verdict flagged, first;
#   (b) the seven first certifications: embedding_finite_gate
#       (registered mid-r10 behind the window) and the six new
#       round-11 queries ann_pq_trained_topk + image_near_dup_phash +
#       audio_near_dup_fp + video_near_dup_phash + part_kcore +
#       ann_ivfq8_topk;
#   (c) ann_ivf_recall — not due (r9-green) but its exact arm changed
#       plan this round (cosine_topk now rides the cosine_scores fused
#       corpus pass);
#   (d) ALL 36 r8-green entries due this round by the staleness rule —
#       hybrid_rank_fusion (one-exchange fusion rewrite) and
#       ann_cosine_topk (cosine_scores) also changed plans this round;
#   (e) NO r9-green promotions this round: the part_kcore +
#       ann_ivfq8_topk first certifications took the final two slots
#       (first certs outrank promotions — part_triangle_count /
#       q5_region_revenue held them until these landed; they are
#       r9-green, due r12 with the rest of their block).
# The tail is the round-10-certified block (due r13); the r9-green
# remainder sits mid-registry (due r12).  The parity suite still covers
# EVERY registry entry at sf0.1 every round (count-free on purpose —
# tools/rotation.py is the ledger now, not this comment).
# First-certification ledger for entries registered mid-round BEHIND an
# already-full driver window: a never-certified entry becomes due the
# round AFTER its registration round (the embedding_finite_gate
# precedent, registered mid-r10 → first certification r11).  The r11
# window was exactly full (49 genuinely-due entries + the plan-changed
# ann_ivf_recall), so the late-r11 additions below are due r12 —
# tools/rotation.py consumes this map and tests/test_rotation.py
# asserts every never-certified registry entry is annotated here (an
# unannotated new entry FAILS the suite, so the ledger cannot drift).
_REGISTERED_ROUND = {
    "embedding_finite_gate": 10,
    "ann_pq_trained_topk": 11,
    "image_near_dup_phash": 11,
    "audio_near_dup_fp": 11,
    "video_near_dup_phash": 11,
    "part_kcore": 11,
    "ann_ivfq8_topk": 11,
    # late-r11 registrations (window full) — first certification r12:
    "part_communities_lpa": 11,
    "ann_rerank_topk": 11,
    "embedding_hard_negatives": 11,
    "streaming_user_sessions": 11,
    "ann_mmr_topk": 11,
    "doc_cdc_chunks": 11,
    "streaming_dedup_events": 11,
    "embedding_pca_topdir": 11,
    "doc_winnow_pairs": 11,
    "ann_ivf_pruned_topk": 11,
    "doc_cdc_dup_chunks": 11,
}

_CHECK_FIRST = (
    # (a) r7-stale — the round-10 rotation slip, served first
    "monthly_revenue_incremental",
    "orderkey_hll_distinct",
    "part_basket_pairs",
    "part_name_fuzzy_pairs",
    "q10_returned_revenue",
    "region_status_grouping_sets",
    # (b) first driver certifications
    "embedding_finite_gate",
    "ann_pq_trained_topk",
    "image_near_dup_phash",
    "audio_near_dup_fp",
    "video_near_dup_phash",
    "part_kcore",
    "ann_ivfq8_topk",
    # (c) plan-changed, not otherwise due
    "ann_ivf_recall",
    # (d) the 36 r8-green dues (incl. plan-changed hybrid_rank_fusion,
    # ann_cosine_topk)
    "hybrid_rank_fusion",
    "ann_cosine_topk",
    "ann_ivf_topk",
    "ann_q8_topk",
    "corpus_top_bigrams",
    "customers_with_urgent_orders",
    "customers_without_orders",
    "dataset_split",
    "dedup_clusters",
    "dedup_keeplist",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "embedding_near_dup",
    "events_hourly",
    "events_runtime_udf",
    "gopher_quality_gate",
    "lineitem_price_quantiles",
    "multimodal_audio_features",
    "multimodal_features",
    "multimodal_image_features",
    "orders_per_month",
    "part_avg_qty_subquery",
    "part_size_class",
    "parts_never_ordered",
    "passage_dedup",
    "q1_pricing_summary",
    "salted_join_orders",
    "source_ngram_novelty",
    "split_contamination",
    "stratified_sample",
    "substring_dup_spans_sa",
    "supplier_revenue_having",
    "text_char_stats",
    "text_pattern_scrub",
    "text_tfidf_top_terms",
    "text_token_stats",
)
# Queries checked in round 10 — rotate to the unchecked tail (due r13);
# the parity suite still covers them at sf0.1 every round.
_CHECK_LAST = (
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
