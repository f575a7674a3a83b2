"""Text-analysis operators for training-data curation.

All pure column expressions (whole-stage codegen, no UDFs): token stats,
quality scoring, stopword-based language heuristic, and a positional
document fingerprint.  Every arithmetic path is integer-exact or a single
deterministic division, so the DuckDB oracle reproduces results exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import md5_int_expr

_STOPWORDS = ("the", "a", "of", "to", "in", "and", "is")


def _tok(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return docs.select(
        F.col(id_col).alias("doc_id"), F.split(F.col(text_col), " ").alias("t")
    )


def token_stats(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-doc counting: chars, whitespace tokens, distinct tokens, mean
    token length, and a BPE-ish size estimate (chars/4, the usual
    English-text approximation)."""
    per_tok = (
        _tok(docs, id_col, text_col)
        .select("doc_id", F.explode("t").alias("token"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.countDistinct("token").alias("n_distinct_tokens"),
            F.sum(F.length("token")).alias("total_token_chars"),
        )
    )
    base = docs.select(
        F.col(id_col).alias("doc_id"), F.length(text_col).alias("n_chars_calc")
    )
    return (
        base.join(per_tok, "doc_id")
        .withColumn(
            "avg_token_len",
            F.round(
                F.col("total_token_chars").cast("double") / F.col("n_tokens"), 6
            ),
        )
        .withColumn(
            "est_bpe_tokens",
            F.ceil(F.col("n_chars_calc") / F.lit(4.0)).cast("bigint"),
        )
        .select(
            "doc_id",
            "n_chars_calc",
            "n_tokens",
            "n_distinct_tokens",
            "avg_token_len",
            "est_bpe_tokens",
        )
    )


def language_id(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Stopword-ratio language heuristic (the n-gram-free version: with a
    closed stopword list this is the classic cheap lang-ID signal).

    Deterministic rule so the oracle can reproduce the guess: ratio of
    English stopwords >= 0.05 -> 'en', else 'other'.
    """
    stop_list = ", ".join(f"'{w}'" for w in _STOPWORDS)
    tok = _tok(docs, id_col, text_col).select(
        "doc_id", F.explode("t").alias("token")
    )
    agg = tok.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(F.expr(f"CASE WHEN token IN ({stop_list}) THEN 1 ELSE 0 END")).alias(
            "stop_hits"
        ),
    )
    return (
        agg.withColumn(
            "stop_ratio",
            F.round(F.col("stop_hits").cast("double") / F.col("n_tokens"), 6),
        )
        .withColumn(
            "lang_guess",
            F.when(F.col("stop_ratio") >= 0.05, F.lit("en")).otherwise(
                F.lit("other")
            ),
        )
        .select("doc_id", "n_tokens", "stop_hits", "stop_ratio", "lang_guess")
    )


def quality_score(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Composite quality signal: length saturation × lexical diversity.

    score = 0.5·min(1, n_tokens/100) + 0.5·(distinct/total), rounded.
    Both terms are ratios of integers — deterministic across engines.
    """
    tok = _tok(docs, id_col, text_col).select(
        "doc_id", F.explode("t").alias("token")
    )
    agg = tok.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.countDistinct("token").alias("n_distinct"),
    )
    return (
        agg.withColumn(
            "type_token_ratio",
            F.round(F.col("n_distinct").cast("double") / F.col("n_tokens"), 6),
        )
        .withColumn(
            "quality_score",
            F.round(
                F.least(F.lit(1.0), F.col("n_tokens") / F.lit(100.0)) * 0.5
                + (F.col("n_distinct").cast("double") / F.col("n_tokens")) * 0.5,
                6,
            ),
        )
        .select("doc_id", "n_tokens", "n_distinct", "type_token_ratio", "quality_score")
    )


def fingerprint(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Positional rolling-hash document fingerprint.

    fp = ( Σ_pos pos · md5int(token_pos) ) mod (2³¹-1) — order-sensitive
    (re-ordered tokens change the fingerprint), integer-exact, and
    commutative in the summation so partition order doesn't matter.

    Each TERM is reduced mod 2³¹-1 BEFORE the sum (the modular identity
    keeps the result bit-identical): products p·h8 stay < 2⁵³, but the
    unreduced running SUM would pass 2⁶³ near ~65k tokens (h8 < 2³², so
    Σ ≈ 2³¹·n²) and Spark's non-ANSI BIGINT would wrap silently while
    DuckDB promotes to HUGEINT — breaking both the value and the oracle
    parity on long documents.  With per-term reduction the sum is
    < n·2³¹: safe to ~2³² tokens.
    """
    h8 = md5_int_expr("token", "spark")
    tok = (
        _tok(docs, id_col, text_col)
        .select("doc_id", F.posexplode("t"))
        .select(
            "doc_id",
            (F.col("pos") + 1).alias("p"),
            F.col("col").alias("token"),
        )
    )
    return (
        tok.withColumn("term", F.expr(f"(p * {h8}) % 2147483647"))
        .groupBy("doc_id")
        .agg((F.sum("term") % F.lit(2147483647)).cast("bigint").alias("fingerprint"))
    )


def tfidf_top_terms(
    docs: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_docs: int | None = None,
) -> DataFrame:
    """Top-k TF-IDF terms per document — whole-stage codegen end to end,
    zero joins, nothing broadcast.

    tf = in-doc term count, idf = ln(N / df); score rounded to 1e-6 before
    ranking (ln differs across libm implementations only in the last ulp).

    Plan shape: if the scan is under-split (small local files), documents
    are repartitioned ONCE keyed on ``doc_id`` — Generate preserves child
    partitioning, so the (doc_id, token) tf aggregation that follows the
    token explode is satisfied by ``hash(doc_id)`` clustering and runs as
    a single in-place hash aggregate with NO exchange of the raw token
    stream.  (On a well-split cluster input the repartition is skipped
    and the tf aggregate's own partial/final pair combines map-side —
    either way the raw token stream never crosses the wire.)  df attaches
    via the SKEW-SAFE partial-aggregate shape (operators/frequency.py):
    ``groupBy(token).count()`` — map-side combine collapses a hot
    stop-word key to one row per task — joined back on token with an
    AQE-skew-splittable sort-merge join.  (An earlier count-window
    formulation kept one fewer exchange but partitioned the distinct
    (doc, token, tf) stream by token with NO partial aggregation and no
    AQE rescue — a corpus-scale single task on any hot token.)  The
    doc_id pre-partition exchange is reused across the probe and count
    branches, and the top-k re-nest (in-row struct sort + slice +
    posexplode) shuffles ONCE by doc_id.  Every operator is codegen.
    """
    spark = docs.sparkSession
    # size the pre-partition like every other shuffle in the session
    # (bench sessions size shuffle.partitions to the data; production
    # sets it 2-3x total cores) — NOT defaultParallelism, which would
    # fan the map stage wider than the downstream shuffles
    target = int(spark.conf.get("spark.sql.shuffle.partitions"))
    base = docs.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
    )
    # Split-estimate probe (plans/spread.py): driver-side metadata only —
    # no plan-to-RDD conversion — and byte-aware, so a single LARGE file
    # that already scans as many row-group splits skips the shuffle.
    # Derived (non-file-scan) inputs report no files and get the
    # repartition, which is the safe direction.
    from ..plans.spread import scan_splits

    if scan_splits(docs.sparkSession, docs) < target:
        base = base.repartition(target, "doc_id")
    # Materialized ONCE: the df count branch and the join probe push
    # different prunings into the tf aggregate, which defeats exchange
    # reuse and would re-run the explode lineage twice (the DSIR /
    # lm_perplexity pattern; measured −28% at sf0.1).  LAZY: both
    # consumers share one action, so eager's blocking job boundary buys
    # nothing (interleaved A/B, round 10).
    exploded = (
        base.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=False)
    )
    if n_docs is None:
        # Scalar N; deterministic.  Callers that know the source (e.g. a
        # parquet path) should pass n_docs from footer metadata instead —
        # this count is a full extra Spark job (and re-runs any upstream
        # repartition) just to fetch one number.
        n_docs = docs.count()
    from .frequency import attach_group_count

    scored = attach_group_count(exploded, ("token",), "df").withColumn(
        "tfidf",
        F.round(F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 6),
    )
    # Sort key struct(-tfidf, token): default ASCENDING field-order struct
    # comparison == (tfidf DESC, token ASC) — stays on the codegen
    # comparator instead of an interpreted lambda (measured ~30% faster).
    ranked = "array_sort(collect_list(struct(-tfidf AS ntf, token, tf, df, tfidf)))"
    return (
        scored.groupBy("doc_id")
        .agg(F.expr(f"slice({ranked}, 1, {k})").alias("top"))
        .select("doc_id", F.posexplode("top"))
        .select(
            "doc_id",
            F.col("col.token").alias("token"),
            F.col("col.tf").alias("tf"),
            F.col("col.df").alias("df"),
            F.col("col.tfidf").alias("tfidf"),
            (F.col("pos") + 1).cast("int").alias("term_rank"),
        )
    )


def lm_doc_scores(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_tokens: int = 4000,
) -> DataFrame:
    """Per-document bigram-LM scores — the model-statistics stage of
    :func:`lm_perplexity`, exposed separately so its plan (partial-agg
    model stats over the checkpointed contingency relation) stays
    directly inspectable: the decile stage checkpoints, which truncates
    the visible lineage.  Returns (doc_id, n_bigrams, bits_per_bigram).

    CCNet-style LM quality filter (Wenzek et al. 2020, arXiv:1911.00359):
    score every document by the cross-entropy of an add-one-smoothed
    bigram LM trained on the corpus itself, then decile-bucket so the
    high-perplexity tail (gibberish, boilerplate, OCR noise) can be
    dropped.

    bits(w1,w2) = -log2((c(w1,w2)+1) / (c(w1)+V)); a document's score is
    the mean over its bigrams, rounded to 1e-6 before the decile window
    (sum-order FP drift is ~1e-13, so rounding makes the NTILE ordering
    engine-portable; ties break on doc_id).

    Plan shape: ONE corpus explode produces a combined position stream
    (w1 = token at i, w2 = token at i+1, NULL at document end), which
    reduces immediately into a (doc_id, w1, w2, occ) CONTINGENCY
    relation — a map-side-combined aggregate bounded by per-doc
    DISTINCT bigrams.  Every model statistic derives from that one
    relation (its exchange is reused across all consumers, so the
    explode lineage runs once): c(w1) and c(w1,w2) are partial
    aggregates over it — map-side combine collapses hot keys, the
    SKEW-SAFE shape (an earlier count-window formulation partitioned
    the OCCURRENCE stream by the heavily skewed w1 with no partial agg
    and no AQE rescue — a corpus-scale single task on any stop word) —
    joined back on (w1, w2) then (w1) with AQE-skew-splittable
    sort-merge joins whose build sides are vocab-cardinality (one row
    per key).  |V| is a one-row broadcast subtree counting the c(w1)
    relation, never the stream.  The per-doc score is the
    occurrence-weighted mean Σ(occ·bits)/Σ(occ) — identical to the
    per-occurrence mean, computed on contingency-cardinality rows.
    The final NTILE is exact but NOT a single global window: it runs
    through operators/ranks.py::global_ntile (range-partitioned rank
    composition), so the decile assignment both scales and replays
    bit-for-bit on the DuckDB oracle.
    """
    t = docs.select(
        F.col(id_col).alias("doc_id"),
        F.slice(F.split(F.col(text_col), " "), 1, max_tokens).alias("t"),
    )
    # combined stream: one row per token POSITION; w2 is the successor
    # token (NULL at the last position).  Unigrams = all rows, bigrams =
    # rows with a successor — both relations from one explode.
    pos = (
        t.filter(F.size("t") >= 1)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(t)), i -> "
                    "struct(element_at(t, i) AS w1, "
                    "IF(i < size(t), element_at(t, i + 1), NULL) AS w2))"
                )
            ).alias("b"),
        )
        .select("doc_id", "b.w1", "b.w2")
    )
    # contingency relation: one row per (doc, w1, w2) incl. w2=NULL rows
    # for document-final positions, so unigram counts derive from it too.
    # Materialized ONCE: the three statistic consumers below push
    # DIFFERENT filters/prunings into the aggregate (isnotnull(w2) for
    # the bigram sides, none for c(w1), w1-only pruning for |V|), which
    # defeats exchange reuse and would re-run the corpus explode per
    # consumer — the DSIR pattern (dsir_weights) applied to bigrams.
    # LAZY: the first consumer's job materializes the blocks in-line
    # (A/B round 10: 1.19 -> 1.00 s at sf0.1).
    doc_bg = (
        pos.groupBy("doc_id", "w1", "w2")
        .agg(F.count(F.lit(1)).cast("bigint").alias("occ"))
        .localCheckpoint(eager=False)
    )
    c1_rel = doc_bg.groupBy("w1").agg(
        F.sum("occ").cast("bigint").alias("c1")
    )
    bg_rel = (
        doc_bg.filter(F.col("w2").isNotNull())
        .groupBy("w1", "w2")
        .agg(F.sum("occ").cast("bigint").alias("cb"))
    )
    vocab = c1_rel.agg(F.count(F.lit(1)).cast("bigint").alias("vocab"))
    scored = (
        doc_bg.filter(F.col("w2").isNotNull())
        .join(bg_rel, ["w1", "w2"])
        .join(c1_rel, "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "doc_id",
            "occ",
            (
                -F.log2(
                    (F.col("cb") + F.lit(1.0))
                    / (F.col("c1") + F.col("vocab"))
                )
            ).alias("bits"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.sum("occ").cast("bigint").alias("n_bigrams"),
        F.round(
            F.sum(F.col("occ") * F.col("bits")) / F.sum("occ"), 6
        ).alias("bits_per_bigram"),
    )


def lm_perplexity(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_tokens: int = 4000,
) -> DataFrame:
    """:func:`lm_doc_scores` plus the exact perplexity decile.

    The decile is EXACT but NOT a single-task global window at corpus
    scale (the naive ``ntile(10).over(Window.orderBy(...))`` funnels
    every doc score through one task): global_ntile (operators/ranks.py)
    range-partitions the total order, auto-routing to the plain window
    while the source corpus's statable bytes say the doc-cardinality
    score relation is one-task safe.  Both paths are bit-replayable by
    the DuckDB oracle.
    """
    from ..plans.spread import scan_bytes
    from .ranks import global_ntile

    # NOTE: stays on the range-composition large route (no order_spec):
    # the score relation is DERIVED and expensive (the bigram
    # contingency lineage), so the r14 bracket path's three aggregate
    # scans would re-execute it — the range path's single checkpoint
    # materializes it once, which is the right trade for non-source
    # inputs (the bracket path is for source-backed relations whose
    # re-scan is a column-pruned parquet read).
    return global_ntile(
        lm_doc_scores(docs, id_col, text_col, max_tokens),
        10,
        [F.asc("bits_per_bigram"), F.asc("doc_id")],
        tile_col="ppl_decile",
        input_bytes=scan_bytes(docs),
    ).select("doc_id", "n_bigrams", "bits_per_bigram", "ppl_decile")


def dsir_weights(
    docs: DataFrame,
    target,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 1024,
    max_tokens: int = 4000,
) -> DataFrame:
    """DSIR data selection (Xie et al. 2023, arXiv:2302.03169): weight
    every document by how much its hashed-bigram feature distribution
    looks like a TARGET domain rather than the raw corpus.

    ``target`` is a boolean Column marking target-domain docs (e.g.
    ``F.col("lang") == "en"``).  Features are word bigrams hashed into
    ``n_buckets`` buckets; both the raw and target bucket distributions
    are add-one smoothed, and a document's weight is the mean
    log2(p_target/p_raw) over its bigram occurrences.  ``selected`` =
    weight > 0 (importance-ratio above 1).

    Plan shape: the target flag is evaluated in-row BEFORE the bigram
    explode, so distribution-building needs no doc-id join at all — ONE
    (doc, bucket)-keyed aggregation reduces the explode+hash stream to a
    contingency relation bounded by docs x n_buckets, materialized once
    with ``localCheckpoint``.  The per-bucket distribution is summed
    from it (n_buckets rows — a fixed-width CONSTANT, like a k-means
    centroid set), collected, and the learned log-ratios are baked into
    the scoring pass as an array LITERAL indexed by bucket: scoring is
    join-free (no broadcast exchange, no lookup shuffle) and reads the
    materialized contingency blocks, never the corpus again.  Exactly
    ONE corpus pass total.
    """
    import json
    import math
    from ..functions.hashing import md5_int_expr

    t = docs.select(
        F.col(id_col).alias("doc_id"),
        F.slice(F.split(F.col(text_col), " "), 1, max_tokens).alias("t"),
        target.alias("is_tgt"),
    )
    feats = (
        t.filter(F.size("t") >= 2)
        .select(
            "doc_id",
            "is_tgt",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(t) - 1), i -> "
                    "concat_ws(' ', element_at(t, i), element_at(t, i + 1)))"
                )
            ).alias("feat"),
        )
        .select(
            "doc_id",
            "is_tgt",
            (F.expr(md5_int_expr("feat", "spark")) % n_buckets).alias("bucket"),
        )
    )
    # ONE corpus pass total: the explode+hash stream reduces to a
    # (doc, bucket) contingency relation — bounded by docs x n_buckets,
    # far below occurrence cardinality — which is materialized once and
    # feeds BOTH the distribution build and the scoring aggregate
    # (LAZY: the bucket_rows collect materializes it in-line).
    doc_bucket = (
        feats.groupBy("doc_id", "is_tgt", "bucket")
        .agg(F.count("*").cast("bigint").alias("cnt"))
        .localCheckpoint(eager=False)
    )
    bucket_rows = (
        doc_bucket.groupBy("bucket")
        .agg(
            F.sum("cnt").cast("bigint").alias("cr"),
            F.sum(F.when(F.col("is_tgt"), F.col("cnt")).otherwise(0))
            .cast("bigint")
            .alias("ct"),
        )
        .collect()
    )
    cr = [0] * n_buckets
    ct = [0] * n_buckets
    for r in bucket_rows:
        cr[r["bucket"]] = r["cr"]
        ct[r["bucket"]] = r["ct"]
    nr, nt = sum(cr), sum(ct)
    # log2 computed as log(x)/log(2) — the same formula Spark's LOG2 and
    # DuckDB's log2 evaluate, keeping cross-engine drift at the 1-ulp
    # level the round(..., 6) below absorbs
    ln2 = math.log(2.0)
    lr = [
        (
            math.log((ct[b] + 1.0) / (nt + float(n_buckets))) / ln2
            - math.log((cr[b] + 1.0) / (nr + float(n_buckets))) / ln2
        )
        for b in range(n_buckets)
    ]
    # scoring: join-free pass over the MATERIALIZED contingency relation
    # (the corpus is never re-read) — element_at on a constant array,
    # occurrence-weighted mean == the per-occurrence mean exactly.
    # The constant ships as a JSON string literal decoded by from_json
    # and constant-folded JVM-side: F.lit(python_list) pays a ~0.45 s
    # py4j element-by-element conversion PER CALL, the JSON string is one
    # round-trip (doubles serialized via repr — shortest-round-trip, so
    # the JVM parses back the identical bits)
    lr_arr = F.from_json(F.lit(json.dumps(lr)), "array<double>")
    scored = (
        doc_bucket.withColumn(
            "lr", F.element_at(lr_arr, F.col("bucket").cast("int") + 1)
        )
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").cast("bigint").alias("n_features"),
            F.round(
                F.sum(F.col("cnt") * F.col("lr")) / F.sum("cnt"), 6
            ).alias("logratio_per_feature"),
        )
    )
    return scored.select(
        "doc_id",
        "n_features",
        "logratio_per_feature",
        (F.col("logratio_per_feature") > 0).alias("selected"),
    )


GOPHER_STOP_WORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality_rules(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_stop_words: int = 2,
    carry: tuple = (),
) -> DataFrame:
    """Per-document Gopher quality-rule verdicts (Rae et al. 2021,
    arXiv:2112.11446 §A1.1 — the public rule set behind MassiveText and
    most later pretraining pipelines).

    Rules, each integer-exact (cross-multiplied thresholds, no float
    ratios — the determinism convention of this repo's oracles):

    - ``r_words``    word count in [min_words, max_words]
    - ``r_wordlen``  mean word length in [3, 10] chars
    - ``r_symbol``   symbol-to-word ratio ('#' or ellipsis) < 0.1
    - ``r_alpha``    >= 80% of words contain an alphabetic character
    - ``r_stop``     >= min_stop_words DISTINCT stop words present

    ``passed`` is the conjunction.  Pure single-scan projection: no
    shuffle, no join, nothing broadcast; mean word length derives from
    ``length(text)`` and the word count (single-space tokenization
    identity), so no second tokenize pass.  The only non-codegen
    expression is the alpha-word lambda filter (per-doc, bounded).
    ``carry`` names extra input columns to pass through (e.g. the source
    for per-source gating) so callers never need a join back.
    """
    stop_arr = ", ".join(f"'{w}'" for w in GOPHER_STOP_WORDS)
    d = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("text"),
        F.split(F.col(text_col), " ").alias("t"),
        *[F.col(c) for c in carry],
    ).select(
        "doc_id",
        *carry,
        F.size("t").cast("bigint").alias("n_words"),
        (
            F.length("text") - (F.size("t") - F.lit(1))
        ).cast("bigint").alias("nonspace"),
        (
            (F.length("text") - F.length(F.regexp_replace("text", "#", "")))
            + (
                F.length("text")
                - F.length(F.regexp_replace("text", "…", ""))
            )
        ).cast("bigint").alias("n_sym"),
        F.expr("size(filter(t, w -> w rlike '[a-zA-Z]'))")
        .cast("bigint")
        .alias("n_alpha"),
        F.expr(
            f"size(array_intersect(array_distinct(t), array({stop_arr})))"
        )
        .cast("bigint")
        .alias("n_stop"),
    )
    rules = d.select(
        "doc_id",
        *carry,
        "n_words",
        F.col("n_words").between(min_words, max_words).alias("r_words"),
        (
            (F.lit(3) * F.col("n_words") <= F.col("nonspace"))
            & (F.col("nonspace") <= F.lit(10) * F.col("n_words"))
        ).alias("r_wordlen"),
        (F.lit(10) * F.col("n_sym") < F.col("n_words")).alias("r_symbol"),
        (F.lit(5) * F.col("n_alpha") >= F.lit(4) * F.col("n_words")).alias(
            "r_alpha"
        ),
        (F.col("n_stop") >= F.lit(min_stop_words)).alias("r_stop"),
    )
    return rules.withColumn(
        "passed",
        F.col("r_words")
        & F.col("r_wordlen")
        & F.col("r_symbol")
        & F.col("r_alpha")
        & F.col("r_stop"),
    )


def gopher_repetition_signals(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    carry: tuple = (),
    max_positions: int = 4000,
    top_n: int = 2,
    dup_n: int = 5,
) -> DataFrame:
    """Per-document Gopher repetition signals (Rae et al. 2021 §A1.1):
    the n-gram pair of their repetitious-text rule set applicable to
    unstructured text —

    - ``top2_chars``: characters covered by occurrences of the MOST
      frequent word ``top_n``-gram — count × the gram's NON-SPACE
      character length (sum of its token lengths, matching the
      ``total_chars`` denominator, which also excludes spaces); ties
      broken by gram string ascending — the deterministic variant of the
      paper's rule; they filter when this fraction exceeds 0.20; paper
      n = 2..4.  Occurrences are counted OVERLAPPING, as in the public
      Dolma/DataTrove implementations, so on degenerate runs (e.g.
      ``a a a a``) the fraction can still exceed 1.0
    - ``dup5_chars``: characters of tokens covered by ANY word
      ``dup_n``-gram occurring more than once in the document, each
      position counted once (position marking, as in the public
      Dolma/NeMo-Curator implementations; paper threshold 0.15,
      n = 5..10)
    - ``total_chars``: non-space character total, the denominator

    Column names keep the paper's canonical 2/5 labels for a stable
    cross-engine schema; ``top_n``/``dup_n`` pick the actual sizes.

    Counts are exact integers (fractions left to the caller so source-
    level aggregates can ratio exact sums).  Executed as one Arrow
    ``mapInPandas`` pass: the statistic is per-document, so shuffling
    the token stream to group n-grams would move corpus-scale data for
    doc-local counting, and the in-row SQL alternative is an O(n²)
    interpreted lambda per doc.  Python sees each doc once, O(tokens)
    with two Counters.  ``max_positions`` bounds n-gram START positions
    (the oracle convention shared with the substring-dedup family);
    ``total_chars`` always covers the full document.
    """
    import pandas as pd  # noqa: F401

    mp, tn, dn = max_positions, top_n, dup_n

    def rep(batches):
        from collections import Counter

        import pandas as pd

        for pdf in batches:
            out = []
            keys = list(zip(*[pdf[c] for c in ("doc_id", *carry)]))
            for key, text in zip(keys, pdf["txt"]):
                # NULL text: the doc still counts (the oracle's n_docs
                # does), total_chars is NULL (sum-ignores-NULL — an
                # all-NULL group totals NULL like the oracle's
                # len(NULL) path) while the n-gram signals coalesce to
                # 0 per doc exactly as the oracle's LEFT JOIN +
                # coalesce(_, 0) does.  .split on None would crash the
                # worker besides.
                if text is None:
                    out.append(tuple(key) + (None, 0, 0))
                    continue
                t = text.split(" ")
                total = sum(len(x) for x in t)
                n = len(t)
                bound2 = min(n - tn + 1, mp)
                g2 = Counter(
                    " ".join(t[i : i + tn]) for i in range(max(0, bound2))
                )
                if g2:
                    gram, cnt = min(
                        g2.items(), key=lambda kv: (-kv[1], kv[0])
                    )
                    # non-space characters only: the joining spaces are
                    # excluded from total_chars, so they must not count
                    # toward coverage either
                    top2 = cnt * (len(gram) - (tn - 1))
                else:
                    top2 = 0
                bound5 = min(n - dn + 1, mp)
                g5 = Counter(
                    tuple(t[i : i + dn]) for i in range(max(0, bound5))
                )
                covered = bytearray(n)
                for i in range(max(0, bound5)):
                    if g5[tuple(t[i : i + dn])] > 1:
                        covered[i : i + dn] = b"\x01" * dn
                dup5 = sum(len(t[j]) for j in range(n) if covered[j])
                out.append(tuple(key) + (total, top2, dup5))
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id",
                    *carry,
                    "total_chars",
                    "top2_chars",
                    "dup5_chars",
                ],
            )

    carry_schema = "".join(
        f", {c} {docs.schema[c].dataType.simpleString()}" for c in carry
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("txt"),
        *[F.col(c) for c in carry],
    ).mapInPandas(
        rep,
        f"doc_id {docs.schema[id_col].dataType.simpleString()}"
        + carry_schema
        + ", total_chars bigint, top2_chars bigint, dup5_chars bigint",
    )


def bm25_topk(
    docs: DataFrame,
    terms: tuple[str, ...],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Okapi BM25 retrieval (Robertson & Zaragoza 2009): score every
    document against a fixed bag of query terms, return the top-k.

    idf(t) = ln((N - df + 0.5)/(df + 0.5) + 1)  (the Lucene non-negative
    variant); per-term scores are scaled to INTEGER nano-units before the
    per-document sum, so the reduction is exact BIGINT addition — immune
    to FP sum-order drift across partitionings and engines (the same
    micro-unit trick as pagerank_micro).

    Plan shape: the corpus token explode is filtered to the query terms
    IN THE SAME CODEGEN STAGE it is produced (an In predicate over a
    literal list), so only term-matched rows — a |terms|-bounded fraction
    of the stream — ever reach the (doc_id, token) tf shuffle, and dl
    rides the explode in-row (size(t)): no document-length join.  df
    attaches with the skew-safe partial-agg + join-back
    (``operators/frequency.py``) over the lazily checkpointed tf
    relation — a count window over (token) would pin a stop-word
    term's ENTIRE posting list on one task (count windows get no
    map-side combine and no AQE skew split); the checkpoint keeps the
    explode lineage single-execution across the df and probe branches.
    N and avgdl are ONE 1-row broadcast stats subtree
    (a second corpus pass of in-row lengths, partial-agg combined
    map-side — 2 corpus passes total).  The r8 single-pass variant —
    a pos-0 sentinel row per doc carrying dl through the explode, both
    statistics from one lazily-checkpointed stream — was built, parity-
    verified, and REJECTED on measurement: the stats pass is an
    explode-free columnar length scan (cheap), while the sentinel
    stream's materialization cost more than it saved (interleaved A/B
    at sf0.1: 0.75 s two-pass vs 1.18 s folded).  Top-k is
    orderBy+limit = TakeOrderedAndProject; the rank window runs on the
    k-row result only.  Nothing corpus-cardinality is broadcast,
    collected, or globally sorted.
    """
    spark = docs.sparkSession
    from ..plans.spread import scan_splits

    target = int(spark.conf.get("spark.sql.shuffle.partitions"))
    scanned = docs.select(
        F.col(id_col).alias("doc_id"),
        F.split(F.col(text_col), " ").alias("t"),
    )
    # The repartition feeds ONLY the explode path (its CPU-heavy map
    # stage); the stats pass is a pure partial-agg of in-row lengths —
    # routing it through the repartition would shuffle the corpus just
    # to average a column.
    base = scanned
    if scan_splits(spark, docs) < target:
        base = scanned.repartition(target, "doc_id")
    lens = scanned.select("doc_id", F.size("t").cast("bigint").alias("dl"))
    stats = lens.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.avg("dl").alias("avgdl"),
    )
    tf = (
        base.select(
            "doc_id",
            F.size("t").cast("bigint").alias("dl"),
            F.explode("t").alias("token"),
        )
        .filter(F.col("token").isin(list(terms)))
        .groupBy("doc_id", "token")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("tf"),
            F.max("dl").alias("dl"),
        )
        .localCheckpoint(eager=False)
    )
    from .frequency import attach_group_count

    term_scores = (
        attach_group_count(tf, ("token",), "df")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            F.round(
                F.lit(1e9)
                * F.log(
                    (F.col("n").cast("double") - F.col("df") + 0.5)
                    / (F.col("df") + 0.5)
                    + 1.0
                )
                * (F.col("tf") * F.lit(k1 + 1.0))
                / (
                    F.col("tf")
                    + F.lit(k1)
                    * (
                        F.lit(1.0 - b)
                        + F.lit(b) * F.col("dl") / F.col("avgdl")
                    )
                )
            )
            .cast("bigint")
            .alias("score_nano"),
        )
    )
    scored = term_scores.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_terms"),
        F.sum("score_nano").cast("bigint").alias("score_nano"),
    )
    topk = scored.orderBy(F.col("score_nano").desc(), "doc_id").limit(k)
    w = Window.orderBy(F.col("score_nano").desc(), "doc_id")
    return topk.select(
        "doc_id",
        "n_terms",
        F.round(F.col("score_nano") / 1e9, 6).alias("score"),
        F.row_number().over(w).cast("int").alias("rank"),
    )



def ngram_novelty(
    docs: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """Per-group n-gram novelty: of each document's DISTINCT n-grams, the
    share that occur in NO other document corpus-wide (doc frequency 1) —
    a memorization/diversity signal for corpus curation (high novelty =
    fresh text; low = templated/boilerplate-heavy sources).

    All aggregation is integer counting; the single division happens once
    per output row — no FP reductions anywhere, so the result is
    bit-identical under any partitioning and across engines.

    Plan shape: n-grams are built IN-ROW from the split array (transform
    over sequence — no position join, the token stream never carries
    offsets), then ONE distinct shuffle on (doc, group, ngram) — the
    widest exchange, of id+ngram-width rows, reused across both
    consumers below.  The output needs no per-row doc frequency: a
    novel (df = 1) n-gram belongs to exactly ONE document, hence one
    group, so novelty counts come from a ``groupBy(ngram)`` PARTIAL
    aggregate (count + that singleton's group; map-side combine
    collapses hot boilerplate n-grams — the skew-safe shape; an earlier
    count-window formulation partitioned the distinct stream by ngram
    with no partial agg and no AQE rescue, a corpus-scale single task
    on any hot trigram) filtered to df = 1 and re-aggregated to group
    cardinality.  Totals come from one group-keyed aggregate of the
    same distinct relation.  The only join pairs two GROUP-cardinality
    relations.  Nothing is broadcast or collected; docs shorter than n
    tokens contribute no n-grams and drop out, exactly as the oracle's
    position join emits none.
    """
    parts = ", ' ', ".join(f"element_at(t, i + {j})" for j in range(n))
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(group_col).alias("grp"),
        F.split(F.col(text_col), " ").alias("t"),
    )
    ngrams = base.filter(F.size("t") >= n).select(
        "doc_id",
        "grp",
        F.explode(
            F.expr(
                f"transform(sequence(1, size(t) - {n - 1}), i -> "
                f"concat({parts}))"
            )
        ).alias("ngram"),
    )
    # Materialized ONCE: the totals and novelty consumers push different
    # prunings into the distinct aggregate, defeating exchange reuse
    # (the DSIR / lm_perplexity pattern).  Lazy like its siblings —
    # A/B-neutral here, one fewer job boundary at scale.
    distinct = (
        ngrams.select("doc_id", "grp", "ngram")
        .distinct()
        .localCheckpoint(eager=False)
    )
    totals = distinct.groupBy(F.col("grp")).agg(
        F.count_distinct("doc_id").cast("bigint").alias("n_docs"),
        F.count(F.lit(1)).cast("bigint").alias("total_ngrams"),
    )
    # df=1 n-grams have a unique owning (doc, grp): max(grp) IS that
    # group.  Hot n-grams collapse in the partial aggregate and are
    # dropped by the df=1 filter before anything joins.
    novel = (
        distinct.groupBy("ngram")
        .agg(
            F.count(F.lit(1)).alias("doc_freq"),
            F.max("grp").alias("grp"),
        )
        .filter(F.col("doc_freq") == 1)
        .groupBy("grp")
        .agg(F.count(F.lit(1)).cast("bigint").alias("novel_ngrams"))
    )
    return (
        totals.join(novel, "grp", "left")
        .select(
            F.col("grp").alias(group_col),
            "n_docs",
            F.coalesce(F.col("novel_ngrams"), F.lit(0))
            .cast("bigint")
            .alias("novel_ngrams"),
            "total_ngrams",
        )
        .withColumn(
            "novelty",
            F.round(
                F.col("novel_ngrams") / F.col("total_ngrams").cast("double"),
                6,
            ),
        )
    )
