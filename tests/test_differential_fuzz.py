"""Randomized DIFFERENTIAL fuzzing of the documents-table query family.

The oracle-parity suite proves Spark == DuckDB on the driver's fixed
synthetic corpus; every divergence the round-6 review hunt found lived
OFF that corpus (single-token docs crashing text_repetition, zero
denominators, degenerate repetition runs).  This harness closes that
gap as a standing test: seeded random corpora — deliberately salted
with empty texts, single tokens, long repeated runs, unicode and
near-duplicate pairs — are written as documents.parquet and a battery
of oracle-paired queries runs on BOTH engines, compared value-by-value
(NULL-safe, float-rounded the same 1e-6 the oracles use).

Determinism: corpora derive from fixed seeds, so a failure reproduces
exactly.  Runtime: one Spark session, ~15 queries x 3 corpora.
"""

from __future__ import annotations

import math
import os
import random
from collections import Counter

import duckdb
import pytest

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

# documents-only queries safe to run on an arbitrary corpus
QUERIES = [
    "corpus_stats",
    "doc_length_histogram",
    "text_char_stats",
    "text_token_stats",
    "text_language_id",
    "text_quality",
    "text_repetition",
    "doc_fingerprint",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "gopher_quality_gate",
    "gopher_repetition_report",
    "lm_perplexity_filter",
    "dsir_selection",
    "substring_dup_spans",
    "substring_dup_spans_sa",
    # the round-6 rewrites, fuzzed end-to-end against their oracles
    "doc_prefix_jaccard_join",
    "dedup_minhash_lsh",
    "text_tfidf_top_terms",
    "corpus_top_bigrams",
    "boilerplate_ratio",
    "doc_chunk_manifest",
    "text_pattern_scrub",
    # round-7 rewrite (in-pass stream total riding the MG summary)
    "token_heavy_hitters",
    # round-7 additions (BM25 terms overlap VOCAB by design)
    "doc_bm25_topk",
    "source_ngram_novelty",
    # round-8 addition: containment prefix bound fuzzed against the
    # naive-candidate oracle.  kind==3 plants EXACT duplicates (the
    # x.n == y.n path); kind==4 plants PROPER-SUBSET docs (a contiguous
    # token slice of an earlier long doc — the asymmetric x.n < y.n
    # prefix-bound path containment exists for).
    "doc_containment_pairs",
    # round-9 addition: cumulative-mass vocabulary cutoffs (ranks.py);
    # empty texts / single tokens stress the zero-weight and tiny-total
    # threshold edges on both engines
    "corpus_token_coverage",
    # round-11 fourth batch: content-defined chunk boundaries (pure
    # integer rolling hash; NULL text -> NULL manifest, empty -> 0
    # chunks, the 4000-CHAR both-engine cap rides the kind-6 long doc)
    "doc_cdc_chunks",
    # round-11 sixth batch: winnowing/MOSS fingerprint pairs — repeated
    # tokens exercise the rightmost-minimum tie rule, dup/subset docs
    # the shared-run guarantee, the stop filter the boilerplate grams
    "doc_winnow_pairs",
    # ...and the CDC chunk-dedup ledger (all-integer; exact-dup docs
    # produce shared chunk hashes, NULL/empty docs contribute nothing)
    "doc_cdc_dup_chunks",
    # round-11 multimodal near-dup queries: their blobs derive from
    # (doc_id, n_chars) only, so random corpora fuzz the full
    # decode->fingerprint->band->Hamming replay — NULL-text docs carry
    # n_chars = 0 (image: 2x2 BMP still hashes; audio: < 16-sample
    # filter drops them on both engines identically)
    "image_near_dup_phash",
    "audio_near_dup_fp",
    "video_near_dup_phash",
]

VOCAB = [
    "the", "cat", "sat", "on", "mat", "data", "spark", "duck", "row",
    "col", "joinkey", "x1", "y2", "z3", "naïve", "über", "東京", "a",
]


def _rand_corpus(seed: int, n_docs: int = 40) -> list[tuple]:
    rng = random.Random(seed)
    rows = []
    for i in range(n_docs):
        kind = rng.randrange(8)
        if kind == 0:
            text = ""  # empty
        elif kind == 1:
            text = rng.choice(VOCAB)  # single token
        elif kind == 2:
            text = " ".join([rng.choice(VOCAB)] * rng.randrange(2, 30))
        elif kind == 3 and rows:
            text = rows[rng.randrange(len(rows))][1]  # exact duplicate
        elif kind == 4 and any(
            len((r[1] or "").split()) >= 10 for r in rows
        ):
            # proper-subset doc: a contiguous token slice of an earlier
            # long doc.  Its 3-gram shingle set is a strict subset of
            # the source doc's, so containment = 1.0 with n_min < n_max
            # — the asymmetric short-doc-quoted-in-long-doc path.
            cands = [
                (r[1] or "").split()
                for r in rows
                if len((r[1] or "").split()) >= 10
            ]
            toks = cands[rng.randrange(len(cands))]
            start = rng.randrange(0, len(toks) - 6)
            span = rng.randrange(5, len(toks) - start + 1)
            text = " ".join(toks[start : start + span])
        elif kind == 5:
            # whitespace pathologies (round 10): double-space runs emit
            # EMPTY tokens through both engines' single-space split,
            # leading/trailing spaces shift positional fingerprints, and
            # embedded tabs are ordinary token characters — every text
            # operator must agree on all of it (probed clean across 29
            # doc queries before becoming a standing kind).
            base = [rng.choice(VOCAB) for _ in range(rng.randrange(2, 12))]
            sep = rng.choice(["  ", " ", "   "])
            text = sep.join(base)
            if rng.random() < 0.5:
                text = " " + text
            if rng.random() < 0.5:
                text = text + " "
            if rng.random() < 0.3:
                text = text.replace(" ", "\t", 1)
        elif kind == 6 and i == 0:
            # oracle token-table boundary (round 10): the shared oracle
            # CTE indexes tokens through a 4000-row numbers relation, so
            # the differential contract holds for docs up to EXACTLY
            # 4000 tokens (probed: 4000 matches, 4001 truncates on the
            # oracle side only).  One boundary-sized doc per corpus
            # keeps the cap honest; full 18-token VOCAB keeps the SA
            # oracle's dup-window pair join from exploding.
            text = " ".join(
                rng.choice(VOCAB) for _ in range(rng.randrange(3990, 4001))
            )
        elif kind == 7 and i > 0:
            # NULL text (round 10, probed clean across 52 queries): the
            # doc still counts in per-source aggregates, its signals are
            # NULL/0 per the oracle's LEFT JOIN semantics, its split
            # cluster is the NULL-sentinel group, and its chunk
            # fingerprint is NULL.  i > 0 keeps doc 0 textual (several
            # oracles seed from the lowest ids).
            text = None
        else:
            text = " ".join(
                rng.choice(VOCAB) for _ in range(rng.randrange(2, 80))
            )
        lang = rng.choice(["en", "de", "zh", None])
        source = rng.choice(["s0", "s1"])
        rows.append((i, text, lang, source, len(text or "")))
    return rows


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    return v


@pytest.fixture(scope="module")
def entries():
    from duckdb_webhook_gateway_spark.workloads import all_entries

    return all_entries()


@pytest.mark.parametrize("seed", [11, 23, 47])
def test_documents_queries_match_oracle_on_random_corpora(
    spark, tmp_path_factory, entries, seed
):
    d = str(tmp_path_factory.mktemp(f"fuzz{seed}"))
    rows = _rand_corpus(seed)
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(d, "documents.parquet")
    )

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM read_parquet("
        f"'{os.path.join(d, 'documents.parquet')}/*.parquet')"
    )

    failures = []
    for name in QUERIES:
        fn, sql = entries[name]
        try:
            # Counter = multiset compare (rows may contain None, which
            # Python's tuple sort cannot order)
            srows = Counter(
                tuple(_norm(v) for v in r)
                for r in fn(spark, d).collect()
            )
        except Exception as ex:
            failures.append((name, f"SPARK ERROR: {ex}"))
            continue
        try:
            drows = Counter(
                tuple(_norm(v) for v in r)
                for r in con.execute(sql).fetchall()
            )
        except Exception as ex:
            failures.append((name, f"ORACLE ERROR: {ex}"))
            continue
        if srows != drows:
            diff_s = list((srows - drows).keys())[:3]
            diff_d = list((drows - srows).keys())[:3]
            failures.append(
                (name, f"spark-only {diff_s} vs duck-only {diff_d}")
            )
    assert failures == [], failures


EVENT_QUERIES = [
    "events_type_rate",
    "events_hourly",
    "events_pivot_by_type",
    "events_json_bucket",
    "events_sessionize",
    "events_funnel",
    "events_markov_transitions",
    "events_anomaly_zscore",
    "events_cohort_retention",
    "events_hourly_gapfill",
    "events_rolling_features",
    "events_multitouch_attribution",
    "events_hopping_windows",
    "events_profile",
    # r13: the histogram-located exact-pick rewrite — random streams
    # exercise NULL/negative values and tiny per-type groups against
    # the oracle's direct full-sort order-statistic replay
    "value_quantile_sketch",
]


def _rand_events(seed: int, n: int = 120) -> list[tuple]:
    import datetime as dt

    rng = random.Random(seed)
    base = dt.datetime(2024, 1, 1)
    rows = []
    for i in range(n):
        kind = rng.randrange(10)
        if kind == 0 and rows:
            # exact same timestamp as an earlier event (tie-break fuzz)
            ts = rows[rng.randrange(len(rows))][1]
        elif kind == 1:
            # NULL timestamp (round 10, probed clean): excluded from
            # sessions/windows identically on both engines — Spark
            # orders NULLS FIRST ascending where DuckDB orders them
            # LAST, so any query that SORTS a nullable ts must filter
            ts = None
        else:
            ts = base + dt.timedelta(seconds=rng.randrange(0, 6 * 3600))
        user = None if kind == 2 else rng.randrange(1, 6)
        etype = (
            None
            if kind == 3
            else rng.choice(["view", "click", "purchase", "error"])
        )
        # props corners (round 10, probed clean first): malformed JSON
        # (get_json_object -> NULL; oracle's json_valid guard), a
        # non-numeric "$.k" (try_cast -> NULL on both engines — an ANSI
        # cast crashed the Spark side before the fix), json null, empty
        # and NULL props, and a missing key.  value corners: NULL and
        # negative.
        props_kind = rng.randrange(12)
        if props_kind == 0:
            props = "{k: 1"                 # malformed
        elif props_kind == 1:
            props = '{"k": "x%d"}' % rng.randrange(5)  # non-numeric k
        elif props_kind == 2:
            props = rng.choice(["", "null", None, '{"other": 9}'])
        else:
            props = '{"k": %d}' % rng.randrange(100)
        value_kind = rng.randrange(12)
        if value_kind == 0:
            value = None
        elif value_kind == 1:
            value = -rng.randrange(0, 10000) / 100.0
        else:
            value = rng.randrange(0, 10000) / 100.0
        rows.append((i, ts, user, etype, value, props))
    return rows


@pytest.mark.parametrize("seed", [5, 17])
def test_events_queries_match_oracle_on_random_streams(
    spark, tmp_path_factory, entries, seed
):
    import pyspark.sql.functions as F

    d = str(tmp_path_factory.mktemp(f"efuzz{seed}"))
    rows = _rand_events(seed)
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(d, "events.parquet")
    )

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM read_parquet("
        f"'{os.path.join(d, 'events.parquet')}/*.parquet')"
    )

    failures = []
    for name in EVENT_QUERIES:
        fn, sql = entries[name]
        try:
            srows = Counter(
                tuple(_norm(v) for v in r)
                for r in fn(spark, d).collect()
            )
        except Exception as ex:
            failures.append((name, f"SPARK ERROR: {ex}"))
            continue
        try:
            drows = Counter(
                tuple(_norm(v) for v in r)
                for r in con.execute(sql).fetchall()
            )
        except Exception as ex:
            failures.append((name, f"ORACLE ERROR: {ex}"))
            continue
        if srows != drows:
            diff_s = list((srows - drows).keys())[:3]
            diff_d = list((drows - srows).keys())[:3]
            failures.append(
                (name, f"spark-only {diff_s} vs duck-only {diff_d}")
            )
    assert failures == [], failures


# ---------------------------------------------------------------------------
# skewed-corpus case for the doc-frequency family (round-8 skew-hardened
# partial-agg df shape): one stop word lands in ~50% of ALL documents and
# one boilerplate trigram repeats across half the corpus, so the df keys
# are maximally hot — the exact distribution where the old token-keyed
# count windows concentrated the corpus on one task.  Results must still
# match the oracles bit-for-bit.

SKEW_QUERIES = [
    "text_tfidf_top_terms",
    "lm_perplexity_filter",
    "source_ngram_novelty",
    "doc_prefix_jaccard_join",
    "doc_bm25_topk",
    "dedup_ngram_jaccard",
]


def _skewed_corpus(seed: int, n_docs: int = 60) -> list[tuple]:
    rng = random.Random(seed)
    rows = []
    for i in range(n_docs):
        toks = []
        if i % 2 == 0:
            # hot stop word in 50% of docs, repeated
            toks += ["the"] * rng.randrange(2, 12)
        if i % 2 == 1:
            # hot boilerplate trigram in the other 50%
            toks += ["all", "rights", "reserved"] * rng.randrange(1, 4)
        toks += [rng.choice(VOCAB) for _ in range(rng.randrange(3, 40))]
        rng.shuffle(toks)
        lang = rng.choice(["en", "de"])
        source = rng.choice(["s0", "s1", "s2"])
        text = " ".join(toks)
        rows.append((i, text, lang, source, len(text)))
    return rows


@pytest.mark.parametrize("seed", [13, 29])
def test_df_family_matches_oracle_on_skewed_corpus(
    spark, tmp_path_factory, entries, seed
):
    d = str(tmp_path_factory.mktemp(f"skewfuzz{seed}"))
    rows = _skewed_corpus(seed)
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(d, "documents.parquet")
    )

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM read_parquet("
        f"'{os.path.join(d, 'documents.parquet')}/*.parquet')"
    )

    failures = []
    for name in SKEW_QUERIES:
        fn, sql = entries[name]
        try:
            srows = Counter(
                tuple(_norm(v) for v in r)
                for r in fn(spark, d).collect()
            )
        except Exception as ex:
            failures.append((name, f"SPARK ERROR: {ex}"))
            continue
        try:
            drows = Counter(
                tuple(_norm(v) for v in r)
                for r in con.execute(sql).fetchall()
            )
        except Exception as ex:
            failures.append((name, f"ORACLE ERROR: {ex}"))
            continue
        if srows != drows:
            diff_s = list((srows - drows).keys())[:3]
            diff_d = list((drows - srows).keys())[:3]
            failures.append(
                (name, f"spark-only {diff_s} vs duck-only {diff_d}")
            )
    assert failures == [], failures


# ---------------------------------------------------------------------------
# basket/graph family: random co-occurrence structure for the pair-mining
# and integer-PageRank queries, salted with a single-item basket (zero
# pairs), an in-basket duplicate (collect_set/DISTINCT dedup on both
# engines), and a DEGENERATE >MAX_BASKET_ITEMS basket that exercises the
# 1024-item truncation cap and its row_number oracle mirror.

# part_kcore at k=80 on this corpus: the organic 40-part graph peels to
# nothing (degrees ~20) while basket 9999's truncated 1024-item clique
# survives whole — a planted non-trivial core exercising both the
# avalanche and the survivor paths of the unrolled oracle chain.
BASKET_QUERIES = ["part_basket_pairs", "part_pagerank", "part_kcore"]


def _rand_lineitem(seed: int) -> list[tuple]:
    rng = random.Random(seed)
    rows: list[tuple] = []
    for ok in range(1, 61):
        k = rng.randint(1, 8)
        for pk in rng.sample(range(1, 41), k):
            rows.append((ok, pk))
    rows.append((1, rows[0][1]))  # duplicate (basket, item) row
    rows.append((9001, 7))  # single-item basket: contributes no pairs
    # degenerate basket past the truncation cap (keeps smallest 1024)
    for pk in range(1, 1101):
        rows.append((9999, pk))
    return rows


@pytest.mark.parametrize("seed", [5, 31])
def test_basket_graph_queries_match_oracle_on_random_inputs(
    spark, tmp_path_factory, entries, seed
):
    d = str(tmp_path_factory.mktemp(f"bfuzz{seed}"))
    spark.createDataFrame(
        _rand_lineitem(seed), "l_orderkey long, l_partkey long"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(d, "lineitem.parquet")
    )

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW lineitem AS SELECT * FROM read_parquet("
        f"'{os.path.join(d, 'lineitem.parquet')}/*.parquet')"
    )

    failures = []
    for name in BASKET_QUERIES:
        fn, sql = entries[name]
        try:
            srows = Counter(
                tuple(_norm(v) for v in r) for r in fn(spark, d).collect()
            )
        except Exception as ex:
            failures.append((name, f"SPARK ERROR: {ex}"))
            continue
        try:
            drows = Counter(
                tuple(_norm(v) for v in r)
                for r in con.execute(sql).fetchall()
            )
        except Exception as ex:
            failures.append((name, f"ORACLE ERROR: {ex}"))
            continue
        if srows != drows:
            diff_s = list((srows - drows).keys())[:3]
            diff_d = list((drows - srows).keys())[:3]
            failures.append(
                (name, f"spark-only {diff_s} vs duck-only {diff_d}")
            )
    assert failures == [], failures


# ---------------------------------------------------------------------------
# triangle family: separate corpus from BASKET_QUERIES — that one plants
# a 1024-item degenerate basket (the truncation-cap case), which as a
# CLIQUE holds C(1024,3) ~ 1.8e8 triangles and would swamp both engines.
# Here the degenerate case is a 30-item clique basket (4,060 triangles)
# plus random small baskets, exercising the same orientation/count logic.


def _rand_lineitem_tri(seed: int) -> list[tuple]:
    rng = random.Random(seed)
    rows: list[tuple] = []
    for ok in range(1, 51):
        k = rng.randint(1, 7)
        for pk in rng.sample(range(1, 36), k):
            rows.append((ok, pk))
    rows.append((1, rows[0][1]))  # duplicate (basket, item) row
    rows.append((8001, 3))  # single-item basket: no pairs, no triangles
    for pk in range(100, 130):  # 30-clique basket
        rows.append((8999, pk))
    return rows


@pytest.mark.parametrize("seed", [13, 37])
def test_triangle_query_matches_oracle_on_random_inputs(
    spark, tmp_path_factory, entries, seed
):
    d = str(tmp_path_factory.mktemp(f"tfuzz{seed}"))
    spark.createDataFrame(
        _rand_lineitem_tri(seed), "l_orderkey long, l_partkey long"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(d, "lineitem.parquet")
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW lineitem AS SELECT * FROM read_parquet("
        f"'{os.path.join(d, 'lineitem.parquet')}/*.parquet')"
    )
    fn, sql = entries["part_triangle_count"]
    srows = Counter(
        tuple(_norm(v) for v in r) for r in fn(spark, d).collect()
    )
    drows = Counter(
        tuple(_norm(v) for v in r) for r in con.execute(sql).fetchall()
    )
    assert srows == drows


# ---------------------------------------------------------------------------
# embeddings family: random vectors for the ANN / near-dup / cluster
# queries, salted with a ZERO vector (cosine undefined — both engines
# must agree on NULL-vs-rank placement), exact duplicates (cosine 1.0
# tie-breaks), scaled duplicates (cosine 1.0 through different float
# paths), and tiny magnitudes (float32 underflow territory).  Dim is 64
# — several oracles hard-code it (ann_lsh_buckets' plane grid,
# embedding_label_quality's 64 avg terms).

EMB_QUERIES = [
    "ann_cosine_topk",
    "ann_q8_topk",
    "ann_ivf_topk",
    "ann_lsh_buckets",
    "embedding_near_dup",
    "embedding_near_dup_lsh",
    "embedding_dim_stats",
    "embedding_label_quality",
    "semantic_dedup",
    "hybrid_rank_fusion",
    # round-8 addition: recall@5 eval join of the ivf arm vs brute force
    "ann_ivf_recall",
    # round-10 addition: PQ/ADC ranking (L2 — defined on zero vectors);
    # ann_pq_topk retired r12 — the trained entry fuzzes pq_train AND
    # pq_topk through the same ADC/nano contract
    "ann_pq_trained_topk",
    "ann_ivfpq_topk",
    # round-11 third batch: label-filtered mining + q8→float cascade
    "embedding_hard_negatives",
    "ann_rerank_topk",
    # round-11 fourth batch: greedy MMR over the shortlist — zero-norm
    # NULL cosines must sort last and nanmax must mirror SQL max's
    # NULL-skipping through every greedy round
    "ann_mmr_topk",
    # round-11 fifth batch: power-iteration PCA — the iteration runs on
    # identical rounded sums in both engines; zero vectors are ordinary
    # cloud members here (they pull the mean, project to -mu.v)
    "embedding_pca_topdir",
    # round-11 seventh entry: the IVF-partitioned layout round-trip must
    # change NOTHING — same oracle as ann_ivf_topk, scored off the
    # pruned partitioned scan (zero-norm centroids/vectors included)
    "ann_ivf_pruned_topk",
]


def _rand_embeddings(seed: int, n: int = 40, dim: int = 64) -> list[tuple]:
    rng = random.Random(seed)
    rows: list[tuple] = []
    for i in range(n):
        kind = rng.randrange(10)
        if kind == 0:
            vec = [0.0] * dim  # zero norm: cosine undefined
        elif kind == 1 and rows:
            vec = list(rows[rng.randrange(len(rows))][1])  # exact dup
        elif kind == 2 and rows:
            # scaled duplicate: cosine exactly 1 via a different float path
            vec = [2.5 * x for x in rows[rng.randrange(len(rows))][1]]
        elif kind == 3:
            vec = [
                rng.choice([-1.0, 1.0]) * 1e-4 * rng.random()
                for _ in range(dim)
            ]
        else:
            vec = [rng.uniform(-1.0, 1.0) for _ in range(dim)]
        rows.append((i, vec, rng.randrange(1, 4)))
    return rows


@pytest.mark.parametrize("seed", [7, 29])
def test_embedding_queries_match_oracle_on_random_vectors(
    spark, tmp_path_factory, entries, seed
):
    d = str(tmp_path_factory.mktemp(f"vfuzz{seed}"))
    spark.createDataFrame(
        _rand_embeddings(seed),
        "vec_id long, embedding array<float>, label int",
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(d, "embeddings.parquet")
    )
    # hybrid_rank_fusion reads documents too
    spark.createDataFrame(
        _rand_corpus(seed),
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(d, "documents.parquet")
    )

    con = duckdb.connect()
    for t in ("embeddings", "documents"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet("
            f"'{os.path.join(d, t + '.parquet')}/*.parquet')"
        )

    failures = []
    for name in EMB_QUERIES:
        fn, sql = entries[name]
        try:
            srows = Counter(
                tuple(_norm(v) for v in r) for r in fn(spark, d).collect()
            )
        except Exception as ex:
            failures.append((name, f"SPARK ERROR: {ex}"))
            continue
        try:
            drows = Counter(
                tuple(_norm(v) for v in r)
                for r in con.execute(sql).fetchall()
            )
        except Exception as ex:
            failures.append((name, f"ORACLE ERROR: {ex}"))
            continue
        if srows != drows:
            diff_s = list((srows - drows).keys())[:3]
            diff_d = list((drows - srows).keys())[:3]
            failures.append(
                (name, f"spark-only {diff_s} vs duck-only {diff_d}")
            )
    assert failures == [], failures


@pytest.mark.parametrize("seed", [11, 23])
def test_finite_gate_matches_oracle_on_nonfinite_vectors(
    spark, tmp_path_factory, entries, seed
):
    """The NaN/Inf CONTRACT step (round 10): embedding_finite_gate must
    agree with its oracle on corpora full of non-finite elements — the
    input class the rest of the similarity family explicitly does NOT
    accept (the engines disagree structurally: DuckDB sorts NaN as the
    largest double where Spark's Arrow bridge nulls it, and non-finite
    casts error on both).  The gate is what keeps that class out."""
    d = str(tmp_path_factory.mktemp(f"gfuzz{seed}"))
    rng = random.Random(seed)
    rows = []
    for i in range(40):
        v = [rng.uniform(-1.0, 1.0) for _ in range(64)]
        k = rng.randrange(6)
        if k == 0:
            v[rng.randrange(64)] = float("nan")
        elif k == 1:
            v[rng.randrange(64)] = float("inf")
        elif k == 2:
            v[rng.randrange(64)] = float("-inf")
        elif k == 3:
            v = [float("nan")] * 64
        rows.append((i, v, rng.randrange(1, 4)))
    spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(d, "embeddings.parquet")
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM read_parquet("
        f"'{os.path.join(d, 'embeddings.parquet')}/*.parquet')"
    )
    fn, sql = entries["embedding_finite_gate"]
    srows = [tuple(r) for r in fn(spark, d).collect()]
    drows = [tuple(r) for r in con.execute(sql).fetchall()]
    assert srows == drows
    assert any(not r[2] for r in srows)      # the corpus was dirty
    assert any(r[2] for r in srows)          # and partly clean


@pytest.mark.parametrize("seed", [7, 29])
def test_ivfq8_matches_oracle_on_random_nonzero_vectors(
    spark, tmp_path_factory, entries, seed
):
    """ann_ivfq8_topk on the random corpora with the zero-norm salt
    REMOVED (zero vectors are the operator's documented reject class —
    int8 scale undefined); on everything else (exact dups, scaled dups,
    tiny magnitudes) it must match the composed oracle value-by-value.
    The salted corpus itself must RAISE, not silently diverge."""
    d = str(tmp_path_factory.mktemp(f"iqfuzz{seed}"))
    salted = _rand_embeddings(seed)
    clean = [r for r in salted if any(x != 0.0 for x in r[1])]
    assert len(clean) < len(salted)  # the salt was present
    spark.createDataFrame(
        clean, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(d, "embeddings.parquet")
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM read_parquet("
        f"'{os.path.join(d, 'embeddings.parquet')}/*.parquet')"
    )
    fn, sql = entries["ann_ivfq8_topk"]
    srows = Counter(
        tuple(_norm(v) for v in r) for r in fn(spark, d).collect()
    )
    drows = Counter(
        tuple(_norm(v) for v in r) for r in con.execute(sql).fetchall()
    )
    assert srows == drows

    dz = str(tmp_path_factory.mktemp(f"iqfuzzz{seed}"))
    spark.createDataFrame(
        salted, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(dz, "embeddings.parquet")
    )
    with pytest.raises(Exception, match="zero vectors"):
        fn(spark, dz).collect()


def test_new_r11_queries_match_oracle_on_degenerate_inputs(
    spark, tmp_path_factory, entries
):
    """Degenerate-input corner probes for the round-11 second batch:
    part_kcore on an EMPTY fact table (the kcore zero-edge early break
    must agree with the oracle's vacuous CTE chain) and on a one-edge
    graph (immediate avalanche); ann_ivfq8_topk on a 3-vector corpus
    (fewer candidates than k, fewer rows than num_centroids) and on a
    gappy id space that still has ids below the query/centroid cutoffs."""
    import random

    def run(name, d, views):
        con = duckdb.connect()
        for t, p in views.items():
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet("
                f"'{p}/*.parquet')"
            )
        fn, sql = entries[name]
        srows = sorted(
            tuple(_norm(v) for v in r) for r in fn(spark, d).collect()
        )
        drows = sorted(
            tuple(_norm(v) for v in r) for r in con.execute(sql).fetchall()
        )
        assert srows == drows, (name, srows[:3], drows[:3])

    d1 = str(tmp_path_factory.mktemp("kc_empty"))
    spark.createDataFrame(
        [], "l_orderkey long, l_partkey long"
    ).coalesce(1).write.parquet(os.path.join(d1, "lineitem.parquet"))
    run("part_kcore", d1, {"lineitem": os.path.join(d1, "lineitem.parquet")})

    d2 = str(tmp_path_factory.mktemp("kc_one"))
    spark.createDataFrame(
        [(1, 7), (1, 9)], "l_orderkey long, l_partkey long"
    ).coalesce(1).write.parquet(os.path.join(d2, "lineitem.parquet"))
    run("part_kcore", d2, {"lineitem": os.path.join(d2, "lineitem.parquet")})

    rng = random.Random(3)
    d3 = str(tmp_path_factory.mktemp("iq_tiny"))
    rows = [(i, [rng.uniform(-1, 1) for _ in range(64)], 1) for i in range(3)]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.parquet(os.path.join(d3, "embeddings.parquet"))
    run(
        "ann_ivfq8_topk", d3,
        {"embeddings": os.path.join(d3, "embeddings.parquet")},
    )

    d4 = str(tmp_path_factory.mktemp("iq_gappy"))
    rows = [
        (i * 3, [rng.uniform(-1, 1) for _ in range(64)], 1)
        for i in range(12)
    ]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.parquet(os.path.join(d4, "embeddings.parquet"))
    run(
        "ann_ivfq8_topk", d4,
        {"embeddings": os.path.join(d4, "embeddings.parquet")},
    )


def test_new_r11_third_batch_queries_on_degenerate_inputs(
    spark, tmp_path_factory, entries
):
    """Degenerate-input corner probes for the late-round-11 batch:
    part_communities_lpa on an EMPTY fact table and on a graph whose
    every pair co-occurs only once (the >= 2 threshold empties the edge
    set — both engines must return zero communities, exercising the
    empty-arc LPA loop vs the vacuous CTE chain); on a doubled
    two-triangle graph (threshold passes, hand-checkable communities);
    embedding_hard_negatives when EVERY label matches the anchors'
    (zero negatives exist) and on a 3-vector corpus (fewer candidates
    than k); ann_rerank_topk on the same tiny corpus (m far exceeds the
    corpus).  An empty query block (gappy id space with nothing below
    the vec_id < 10 device) must RAISE loudly, not np.stack-crash."""
    import random

    def run(name, d, views):
        con = duckdb.connect()
        for t, p in views.items():
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet("
                f"'{p}/*.parquet')"
            )
        fn, sql = entries[name]
        srows = sorted(
            tuple(_norm(v) for v in r) for r in fn(spark, d).collect()
        )
        drows = sorted(
            tuple(_norm(v) for v in r) for r in con.execute(sql).fetchall()
        )
        assert srows == drows, (name, srows[:3], drows[:3])
        return srows

    d1 = str(tmp_path_factory.mktemp("lpa_empty"))
    spark.createDataFrame(
        [], "l_orderkey long, l_partkey long"
    ).coalesce(1).write.parquet(os.path.join(d1, "lineitem.parquet"))
    assert run(
        "part_communities_lpa",
        d1,
        {"lineitem": os.path.join(d1, "lineitem.parquet")},
    ) == []

    # every pair co-occurs exactly once -> thresholded edge set empty
    d2 = str(tmp_path_factory.mktemp("lpa_sparse"))
    spark.createDataFrame(
        [(1, 7), (1, 9), (2, 7), (2, 11)], "l_orderkey long, l_partkey long"
    ).coalesce(1).write.parquet(os.path.join(d2, "lineitem.parquet"))
    assert run(
        "part_communities_lpa",
        d2,
        {"lineitem": os.path.join(d2, "lineitem.parquet")},
    ) == []

    # two triangles + bridge, every basket duplicated so each edge has
    # n_baskets = 2; LPA(4) settles each triangle on its min label
    d3 = str(tmp_path_factory.mktemp("lpa_tri"))
    baskets = [(1, 2, 3), (4, 5, 6), (3, 4)]
    rows = []
    ok = 0
    for copy in range(2):
        for items in baskets:
            ok += 1
            rows += [(ok, it) for it in items]
    spark.createDataFrame(
        rows, "l_orderkey long, l_partkey long"
    ).coalesce(1).write.parquet(os.path.join(d3, "lineitem.parquet"))
    got = run(
        "part_communities_lpa",
        d3,
        {"lineitem": os.path.join(d3, "lineitem.parquet")},
    )
    assert sorted(got) == [(1, 3), (3, 3)]  # the two triangle communities

    rng = random.Random(11)

    # all labels identical: zero hard negatives exist on either engine
    d4 = str(tmp_path_factory.mktemp("hn_onelabel"))
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(64)], 1) for i in range(40)
    ]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.parquet(os.path.join(d4, "embeddings.parquet"))
    assert run(
        "embedding_hard_negatives",
        d4,
        {"embeddings": os.path.join(d4, "embeddings.parquet")},
    ) == []

    # 3-vector corpus: fewer candidates than k for both queries
    d5 = str(tmp_path_factory.mktemp("hn_tiny"))
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(64)], i % 2) for i in range(3)
    ]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.parquet(os.path.join(d5, "embeddings.parquet"))
    run(
        "embedding_hard_negatives",
        d5,
        {"embeddings": os.path.join(d5, "embeddings.parquet")},
    )
    run(
        "ann_rerank_topk",
        d5,
        {"embeddings": os.path.join(d5, "embeddings.parquet")},
    )

    # gappy id space with NOTHING below the query device cutoff: the
    # fused pass must reject the empty query block loudly
    d6 = str(tmp_path_factory.mktemp("hn_gappy"))
    rows = [
        (100 + i, [rng.uniform(-1, 1) for _ in range(64)], i % 3)
        for i in range(12)
    ]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.parquet(os.path.join(d6, "embeddings.parquet"))
    fn, _ = entries["embedding_hard_negatives"]
    with pytest.raises(ValueError, match="empty query block"):
        fn(spark, d6).collect()
    fn, _ = entries["ann_rerank_topk"]
    with pytest.raises(ValueError, match="empty query block"):
        fn(spark, d6).collect()


def test_new_r11_fourth_batch_queries_on_degenerate_inputs(
    spark, tmp_path_factory, entries
):
    """Degenerate-input corner probes for the late-round-11 fourth/fifth
    batch: ann_mmr_topk on a 3-vector corpus (fewer candidates than k —
    both engines emit the short selection) and on a gappy id space with
    nothing below the vec_id < 10 device (the fused pass must RAISE
    loudly, the cosine_scores contract); streaming_dedup_events on an
    EMPTY events table (the replay drains zero envelopes and the batch
    aggregate, like the oracle, returns zero rows); doc_cdc_chunks on a
    single-doc table whose text is exactly the 8-char window (one
    boundary candidate position — the smallest non-trivial input)."""
    import random

    def run(name, d, views):
        con = duckdb.connect()
        for t, p in views.items():
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet("
                f"'{p}/*.parquet')"
            )
        fn, sql = entries[name]
        srows = sorted(
            tuple(_norm(v) for v in r) for r in fn(spark, d).collect()
        )
        drows = sorted(
            tuple(_norm(v) for v in r) for r in con.execute(sql).fetchall()
        )
        assert srows == drows, (name, srows[:3], drows[:3])
        return srows

    rng = random.Random(23)

    d1 = str(tmp_path_factory.mktemp("mmr_tiny"))
    rows = [(i, [rng.uniform(-1, 1) for _ in range(64)]) for i in range(3)]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    ).coalesce(1).write.parquet(os.path.join(d1, "embeddings.parquet"))
    got = run(
        "ann_mmr_topk", d1, {"embeddings": os.path.join(d1, "embeddings.parquet")}
    )
    assert len(got) == 6  # 3 queries x 2 candidates each

    d2 = str(tmp_path_factory.mktemp("mmr_gappy"))
    rows = [
        (100 + i, [rng.uniform(-1, 1) for _ in range(64)]) for i in range(8)
    ]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    ).coalesce(1).write.parquet(os.path.join(d2, "embeddings.parquet"))
    fn, _ = entries["ann_mmr_topk"]
    with pytest.raises(ValueError, match="empty query block"):
        fn(spark, d2).collect()

    d3 = str(tmp_path_factory.mktemp("sdedup_empty"))
    spark.createDataFrame(
        [],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).coalesce(1).write.parquet(os.path.join(d3, "events.parquet"))
    assert run(
        "streaming_dedup_events",
        d3,
        {"events": os.path.join(d3, "events.parquet")},
    ) == []

    d4 = str(tmp_path_factory.mktemp("cdc_window"))
    spark.createDataFrame(
        [(0, "exactly8", "en", "s0", 8)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.parquet(os.path.join(d4, "documents.parquet"))
    got = run(
        "doc_cdc_chunks",
        d4,
        {"documents": os.path.join(d4, "documents.parquet")},
    )
    assert len(got) == 1 and got[0][2] in (1, 2)  # n_chunks
