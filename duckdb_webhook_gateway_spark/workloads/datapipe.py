"""Training-data pipeline workload: dedup / similarity / text analysis /
multimodal entries over the driver's ``documents`` and ``embeddings``
tables, each paired with a DuckDB oracle that reproduces the result
bit-for-bit (md5-based hashing + integer-exact arithmetic + 1e-6 rounding
on float outputs — see operators/ and functions/hashing.py).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import epoch_us
from ..functions.hashing import hex_to_int_expr, md5_int_expr
from ..plans.spread import spread as _spread_impl
from ..sources.files import read_table
from ..operators import dedup as D
from ..operators import multimodal as M
from ..operators import similarity as S
from ..operators import sketches as SK
from ..operators import text as X


def _spread(spark: SparkSession, df: DataFrame) -> DataFrame:
    """Ensure the scan has at least core-count partitions.

    The datapipe operators are CPU-heavy per row (tokenize, shingle, hash),
    so a small single-file parquet scan — one partition — would serialize
    the whole map stage on one core.  At cluster scale inputs arrive in
    many splits and this is a no-op; locally it costs one shuffle of the
    raw rows (a few MB) to unlock full parallelism.
    """
    # Split-estimate probe (file count AND bytes/maxPartitionBytes, see
    # plans/spread.py) instead of .rdd.getNumPartitions(): no plan-to-RDD
    # conversion per query construction, and a single LARGE parquet file
    # — which Spark already scans as many row-group splits — skips the
    # shuffle too.
    return _spread_impl(spark, df)


def _docs(spark: SparkSession, sf_dir: str, spread: bool = False) -> DataFrame:
    """``spread=True`` for tokenize/shingle/hash-heavy operators; cheap
    per-row queries (md5, length) skip the extra shuffle."""
    df = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    return _spread(spark, df) if spread else df


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Embedding ops are Arrow/numpy-vectorized; splitting a small corpus
    # into per-core batches costs more in batch overhead than it buys.
    return spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))


def _footer_rows(path: str) -> int | None:
    """Row count from the parquet footer (sub-ms, driver-side, no Spark
    job).  Returns None for directory-style parquet or unreadable footers
    — callers fall back to a Spark count.  Only valid as the cardinality
    of the UNFILTERED table the path names; operators that filter first
    must count the filtered frame instead.  Delegates to the shared
    reader (``plans/spread.py::footer_rows``, consolidated r14)."""
    from ..plans.spread import footer_rows

    return footer_rows(path)


# Shared oracle CTEs: tokens / shingles via a constant numbers relation
# (DuckDB 1.0 has neither lateral range nor WITH ORDINALITY).
#
# ORACLE CONVENTION — 4000-token index table: the inequality join
# ``nums ON i <= len(t)`` costs n_docs x |nums| comparisons in DuckDB,
# so the table is sized to the differential gate's corpora (every
# driver/fuzz doc is <= 4000 tokens; probed exact at the boundary —
# a 4000-token doc matches, a 4001-token doc would be silently
# truncated ON THE ORACLE SIDE ONLY, with the Spark values being the
# true ones).  The substring-dedup family is different: it caps
# ``max_positions`` at 4000 on BOTH engines explicitly, so those
# queries agree at any document length.
_ORACLE_TOKS = """
nums AS (SELECT i FROM range(1, 4001) r(i)),
toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
tok AS (SELECT doc_id, i AS p, t[i] AS token FROM toks JOIN nums ON i <= len(t))
"""

# 8-token non-overlapping chunk hashes, built in-row.  Shared verbatim by
# passage_dedup / boilerplate_ratio / split_ngram_decontamination — the
# three must stay byte-identical or their semantics silently diverge.
# The n>=8 CASE keeps Spark's DESCENDING sequence(0, -1) from fabricating
# chunks on short docs (the oracle's join condition emits none).
_CHUNK8_EXPR = (
    "CASE WHEN size(split(text,' ')) >= 8 THEN "
    "transform(sequence(0, CAST(floor(size(split(text,' '))/8) AS INT) - 1), "
    "i -> md5(concat_ws(' ', slice(split(text,' '), i*8+1, 8)))) "
    "ELSE array() END"
)

# Matching DuckDB form: one row per (doc_id, chunk_hash) occurrence.
_ORACLE_CHUNK8 = """
nums AS (SELECT i FROM range(0, 500) r(i)),
toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
chunk8 AS (
  SELECT doc_id, md5(array_to_string(t[i*8+1 : i*8+8], ' ')) AS chunk_hash
  FROM toks JOIN nums ON i*8+8 <= len(t)
)
"""

_ORACLE_SHINGLES = """
nums AS (SELECT i FROM range(1, 4001) r(i)),
toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
sh AS (
  SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
  FROM toks JOIN nums ON i <= len(t) - 2
  WHERE len(t) >= 3
)
"""

_ORACLE_JACCARD_TAIL = """
counts AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
pairs AS (
  SELECT doc_a, doc_b, CAST(shared AS BIGINT) AS shared_shingles,
         round(CAST(shared AS DOUBLE) / (ca.n + cb.n - shared), 6) AS jaccard
  FROM inter
  JOIN counts ca ON ca.doc_id = doc_a
  JOIN counts cb ON cb.doc_id = doc_b
)
"""


# ---------------------------------------------------------------------------
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.exact_dedup(_docs(spark, sf_dir))


DEDUP_EXACT_SQL = """
SELECT md5(text) AS content_hash,
       min(doc_id) AS keeper_id,
       count(*)    AS n_copies
FROM documents
GROUP BY md5(text)
"""


# ---------------------------------------------------------------------------
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    # max_shingle_df=64 (operator default) is mirrored in the oracle's
    # ``rare`` CTE: hot shingles are dropped from the PAIRING stage only;
    # denominators stay exact (see ngram_jaccard_dedup docstring).
    # hash_shingles (operator default) is mirrored by the oracle's ``shh``
    # CTE — both engines key the index on the same 60-bit md5-derived
    # integer, so a collision (2^-60-scale) merges identically on both
    # sides and the differential identity is exact, not probabilistic.
    return D.ngram_jaccard_dedup(_docs(spark, sf_dir, spread=True), threshold=0.6)


DEDUP_NGRAM_SQL = f"""
WITH {_ORACLE_SHINGLES.strip()},
shh AS (SELECT DISTINCT doc_id,
               {hex_to_int_expr("md5(shingle)", 15, "duckdb")} AS shingle
        FROM sh),
counts AS (SELECT doc_id, count(*) AS n FROM shh GROUP BY doc_id),
rare AS (SELECT shingle FROM shh GROUP BY shingle HAVING count(*) <= 64),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
  FROM shh a
  JOIN shh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  JOIN rare r ON r.shingle = a.shingle
  GROUP BY 1, 2
),
pairs AS (
  SELECT doc_a, doc_b, CAST(shared AS BIGINT) AS shared_shingles,
         round(CAST(shared AS DOUBLE) / (ca.n + cb.n - shared), 6) AS jaccard
  FROM inter
  JOIN counts ca ON ca.doc_id = doc_a
  JOIN counts cb ON cb.doc_id = doc_b
)
SELECT doc_a, doc_b, shared_shingles, jaccard
FROM pairs WHERE jaccard >= 0.6
"""


# ---------------------------------------------------------------------------
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.minhash_lsh_dedup(_docs(spark, sf_dir, spread=True), threshold=0.5)


# Shared oracle CTE chain: per-doc banded minhash signatures (16 hashes /
# 4 bands, affine family over one md5 per shingle) — must stay identical
# between the full-LSH and incremental oracles.
_ORACLE_MINHASH_BANDS = f"""
shb AS (SELECT doc_id, shingle, {md5_int_expr('shingle', 'duckdb')} AS base FROM sh),
seeds AS (SELECT s FROM range(0, 16) r(s)),
mh AS (
  SELECT doc_id, s,
         min(((s * 131071 + 65537) * base + s * 97531) % 2147483647) AS h
  FROM shb, seeds GROUP BY doc_id, s
),
bands AS (
  SELECT doc_id, CAST(s // 4 AS INTEGER) AS band_id,
         md5(string_agg(CAST(h AS VARCHAR), '|' ORDER BY s)) AS band_key
  FROM mh GROUP BY doc_id, CAST(s // 4 AS INTEGER)
)
"""

DEDUP_MINHASH_SQL = f"""
WITH {_ORACLE_SHINGLES.strip()},
{_ORACLE_MINHASH_BANDS.strip()},
bsz AS (
  SELECT band_id, band_key FROM bands
  GROUP BY band_id, band_key HAVING count(*) BETWEEN 2 AND 256
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a
  JOIN bands b ON a.band_id = b.band_id AND a.band_key = b.band_key
             AND a.doc_id < b.doc_id
  JOIN bsz s ON s.band_id = a.band_id AND s.band_key = a.band_key
),
{_ORACLE_JACCARD_TAIL.strip()}
SELECT p.doc_a, p.doc_b, p.shared_shingles, p.jaccard
FROM pairs p JOIN cand c ON p.doc_a = c.doc_a AND p.doc_b = c.doc_b
WHERE p.jaccard >= 0.5
"""


# ---------------------------------------------------------------------------
def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Steady-state ingest dedup: the 10% of docs with doc_id % 10 == 0
    play the NEW batch; the rest are the existing corpus whose band-key
    signature store is probed without re-shingling corpus text (see
    ``operators/dedup.py::incremental_minhash_dedup``)."""
    docs = _docs(spark, sf_dir, spread=True)
    new = docs.filter(F.col("doc_id") % 10 == 0)
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    return D.incremental_minhash_dedup(new, corpus, threshold=0.5)


DEDUP_INCREMENTAL_SQL = f"""
WITH {_ORACLE_SHINGLES.strip()},
{_ORACLE_MINHASH_BANDS.strip()},
m AS (
  SELECT s.doc_id AS store_id, n.doc_id AS new_id, s.band_id, s.band_key
  FROM bands s
  JOIN bands n ON s.band_id = n.band_id AND s.band_key = n.band_key
  WHERE s.doc_id % 10 <> 0 AND n.doc_id % 10 = 0
),
capped AS (
  SELECT band_id, band_key FROM m
  GROUP BY band_id, band_key HAVING count(DISTINCT store_id) <= 256
),
cand AS (
  SELECT DISTINCT least(m.store_id, m.new_id) AS doc_a,
                  greatest(m.store_id, m.new_id) AS doc_b
  FROM m JOIN capped c ON c.band_id = m.band_id AND c.band_key = m.band_key
),
{_ORACLE_JACCARD_TAIL.strip()}
SELECT p.doc_a, p.doc_b, p.shared_shingles, p.jaccard
FROM pairs p JOIN cand c ON p.doc_a = c.doc_a AND p.doc_b = c.doc_b
WHERE p.jaccard >= 0.5
"""


# ---------------------------------------------------------------------------
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.simhash_dedup(_docs(spark, sf_dir, spread=True))


DEDUP_SIMHASH_SQL = f"""
WITH {_ORACLE_TOKS.strip()},
th AS (SELECT doc_id, substr(md5(token), 1, 8) AS h8 FROM tok),
bits AS (SELECT j FROM range(0, 32) r(j)),
tb AS (
  SELECT doc_id, j,
    CASE WHEN (
      (strpos('0123456789abcdef', substr(h8, CAST(j // 4 AS INTEGER) + 1, 1)) - 1)
      & (CASE CAST(j % 4 AS INTEGER) WHEN 0 THEN 8 WHEN 1 THEN 4 WHEN 2 THEN 2 ELSE 1 END)
    ) > 0 THEN 1 ELSE -1 END AS vote
  FROM th, bits
),
v AS (SELECT doc_id, j, sum(vote) AS s FROM tb GROUP BY doc_id, j),
simh AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN s > 0 THEN CAST(pow(2, 31 - j) AS BIGINT) ELSE 0 END) AS BIGINT) AS simhash
  FROM v GROUP BY doc_id
)
SELECT doc_id, simhash,
       CAST(count(*) OVER (PARTITION BY simhash) AS BIGINT) AS n_bucket
FROM simh
"""


# ---------------------------------------------------------------------------
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return X.token_stats(_docs(spark, sf_dir, spread=True))


TEXT_TOKEN_STATS_SQL = f"""
WITH {_ORACLE_TOKS.strip()},
per AS (
  SELECT doc_id,
         count(*)              AS n_tokens,
         count(DISTINCT token) AS n_distinct_tokens,
         CAST(sum(length(token)) AS BIGINT) AS total_chars
  FROM tok GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(length(d.text) AS INTEGER)               AS n_chars_calc,
       p.n_tokens,
       p.n_distinct_tokens,
       round(CAST(p.total_chars AS DOUBLE) / p.n_tokens, 6) AS avg_token_len,
       CAST(ceil(length(d.text) / 4.0) AS BIGINT)    AS est_bpe_tokens
FROM documents d JOIN per p ON d.doc_id = p.doc_id
"""


# ---------------------------------------------------------------------------
def text_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return X.language_id(_docs(spark, sf_dir, spread=True))


TEXT_LANGUAGE_ID_SQL = f"""
WITH {_ORACLE_TOKS.strip()},
agg AS (
  SELECT doc_id, count(*) AS n_tokens,
         CAST(sum(CASE WHEN token IN ('the','a','of','to','in','and','is')
                       THEN 1 ELSE 0 END) AS BIGINT) AS stop_hits
  FROM tok GROUP BY doc_id
)
SELECT doc_id, n_tokens, stop_hits,
       round(CAST(stop_hits AS DOUBLE) / n_tokens, 6) AS stop_ratio,
       CASE WHEN round(CAST(stop_hits AS DOUBLE) / n_tokens, 6) >= 0.05
            THEN 'en' ELSE 'other' END AS lang_guess
FROM agg
"""


# ---------------------------------------------------------------------------
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    return X.quality_score(_docs(spark, sf_dir, spread=True))


TEXT_QUALITY_SQL = f"""
WITH {_ORACLE_TOKS.strip()},
agg AS (
  SELECT doc_id, count(*) AS n_tokens, count(DISTINCT token) AS n_distinct
  FROM tok GROUP BY doc_id
)
SELECT doc_id, n_tokens, n_distinct,
       round(CAST(n_distinct AS DOUBLE) / n_tokens, 6) AS type_token_ratio,
       round(least(1.0, n_tokens / 100.0) * 0.5
             + (CAST(n_distinct AS DOUBLE) / n_tokens) * 0.5, 6) AS quality_score
FROM agg
"""


# ---------------------------------------------------------------------------
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return X.fingerprint(_docs(spark, sf_dir, spread=True))


DOC_FINGERPRINT_SQL = f"""
WITH {_ORACLE_TOKS.strip()}
SELECT doc_id,
       CAST(sum((p * {md5_int_expr('token', 'duckdb')}) % 2147483647)
            % 2147483647 AS BIGINT) AS fingerprint
FROM tok GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
_ORACLE_COS = (
    "list_sum(list_transform(list_zip({a}, {b}), "
    "x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) / "
    "(sqrt(list_sum(list_transform({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) * "
    "sqrt(list_sum(list_transform({b}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))"
)


def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    return S.cosine_topk(emb.filter(F.col("vec_id") < 10), emb, k=5)


ANN_COSINE_TOPK_SQL = f"""
WITH scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         round({_ORACLE_COS.format(a='q.embedding', b='c.embedding')}, 6) AS cosine
  FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
  WHERE q.vec_id < 10
),
ranked AS (
  SELECT query_id, neighbor_id, cosine,
         CAST(row_number() OVER (PARTITION BY query_id
                                 ORDER BY cosine DESC, neighbor_id) AS INTEGER) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, cosine, rank FROM ranked WHERE rank <= 5
"""


# ---------------------------------------------------------------------------
def embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = _footer_rows(os.path.join(sf_dir, "embeddings.parquet"))
    return S.near_dup_pairs(_emb(spark, sf_dir), threshold=0.45, n_rows=n)


EMBEDDING_NEAR_DUP_SQL = f"""
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round({_ORACLE_COS.format(a='a.embedding', b='b.embedding')}, 6) AS cosine
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE round({_ORACLE_COS.format(a='a.embedding', b='b.embedding')}, 6) >= 0.45
"""


# ---------------------------------------------------------------------------
def ann_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    return S.lsh_buckets(_emb(spark, sf_dir), num_tables=4, planes_per_table=4)


ANN_LSH_BUCKETS_SQL = f"""
WITH dims AS (SELECT d FROM range(1, 65) r(d)),
planes AS (SELECT j FROM range(0, 16) r(j)),
comps AS (
  SELECT e.vec_id, p.j, d.d,
         CAST(e.embedding[d.d] AS DOUBLE) AS val,
         (({md5_int_expr("CAST(p.j AS VARCHAR) || '_' || CAST(d.d AS VARCHAR)", 'duckdb')})
          / 2147483648.0) - 1.0 AS w
  FROM embeddings e, planes p, dims d
),
proj AS (
  SELECT vec_id, j, round(sum(w * val), 9) AS proj
  FROM comps GROUP BY vec_id, j
),
buckets AS (
  SELECT vec_id, CAST(j // 4 AS INTEGER) AS table_id,
         CAST(sum(CASE WHEN proj > 0 THEN CAST(pow(2, j % 4) AS BIGINT) ELSE 0 END) AS BIGINT) AS bucket
  FROM proj GROUP BY vec_id, CAST(j // 4 AS INTEGER)
)
SELECT vec_id, table_id, bucket,
       CAST(count(*) OVER (PARTITION BY table_id, bucket) AS BIGINT) AS bucket_size
FROM buckets
"""


# ---------------------------------------------------------------------------
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    return M.extract_features(M.to_binary_table(_docs(spark, sf_dir)))


MULTIMODAL_FEATURES_SQL = """
SELECT doc_id,
       CAST(length(text) AS BIGINT)               AS byte_len,
       md5(text)                                  AS content_hash,
       CAST(length(text) % 7 + 1 AS INTEGER)      AS n_frames
FROM documents
"""


ENTRIES: dict = {
    "dedup_exact": (dedup_exact, DEDUP_EXACT_SQL),
    "dedup_ngram_jaccard": (dedup_ngram_jaccard, DEDUP_NGRAM_SQL),
    "dedup_minhash_lsh": (dedup_minhash_lsh, DEDUP_MINHASH_SQL),
    "dedup_incremental": (dedup_incremental, DEDUP_INCREMENTAL_SQL),
    "dedup_simhash": (dedup_simhash, DEDUP_SIMHASH_SQL),
    "text_token_stats": (text_token_stats, TEXT_TOKEN_STATS_SQL),
    "text_language_id": (text_language_id, TEXT_LANGUAGE_ID_SQL),
    "text_quality": (text_quality, TEXT_QUALITY_SQL),
    "doc_fingerprint": (doc_fingerprint, DOC_FINGERPRINT_SQL),
    "ann_cosine_topk": (ann_cosine_topk, ANN_COSINE_TOPK_SQL),
    "embedding_near_dup": (embedding_near_dup, EMBEDDING_NEAR_DUP_SQL),
    "ann_lsh_buckets": (ann_lsh_buckets, ANN_LSH_BUCKETS_SQL),
    "multimodal_features": (multimodal_features, MULTIMODAL_FEATURES_SQL),
}


# ---------------------------------------------------------------------------
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sessions import session_stats
    from ..sources.files import read_table

    # a session needs both a user and a timestamp; beyond semantics,
    # the engines ORDER NULL timestamps differently (Spark ASC = NULLS
    # FIRST, DuckDB = NULLS LAST), which would split sessions
    # differently — excluded identically on both sides
    ev = read_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    )
    return session_stats(ev, gap_minutes=30)


EVENTS_SESSIONIZE_SQL = """
WITH flagged AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 30 * 60 * 1000000
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WHERE ts IS NOT NULL AND user_id IS NOT NULL
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
  SELECT user_id, event_id, ts, value,
         CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
  FROM flagged
)
SELECT user_id, session_seq,
       count(*) AS n_events,
       round(CAST(epoch_us(max(ts)) - epoch_us(min(ts)) AS DOUBLE) / 1000000.0, 6)
         AS duration_s,
       round(sum(value), 2) AS session_value
FROM sessions
GROUP BY user_id, session_seq
"""

ENTRIES["events_sessionize"] = (events_sessionize, EVENTS_SESSIONIZE_SQL)


# ---------------------------------------------------------------------------
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    return S.ivf_topk(
        emb.filter(F.col("vec_id") < 10), emb, num_centroids=16, nprobe=2, k=3
    )


ANN_IVF_TOPK_SQL = f"""
WITH cent AS (
  SELECT vec_id AS centroid_id, embedding AS cv FROM embeddings WHERE vec_id < 16
),
assign0 AS (
  SELECT e.vec_id, c.centroid_id,
         round({_ORACLE_COS.format(a='e.embedding', b='c.cv')}, 6) AS c_cos
  FROM embeddings e, cent c
),
lists AS (
  SELECT vec_id, centroid_id FROM (
    SELECT vec_id, centroid_id,
           row_number() OVER (PARTITION BY vec_id ORDER BY c_cos DESC, centroid_id) AS rn
    FROM assign0
  ) WHERE rn = 1
),
probes AS (
  SELECT query_id, centroid_id FROM (
    SELECT vec_id AS query_id, centroid_id,
           row_number() OVER (PARTITION BY vec_id ORDER BY c_cos DESC, centroid_id) AS rn
    FROM assign0 WHERE vec_id < 10
  ) WHERE rn <= 2
),
cand AS (
  SELECT DISTINCT p.query_id, l.vec_id AS neighbor_id
  FROM probes p JOIN lists l ON p.centroid_id = l.centroid_id
  WHERE p.query_id <> l.vec_id
),
scored AS (
  SELECT c.query_id, c.neighbor_id,
         round({_ORACLE_COS.format(a='q.embedding', b='n.embedding')}, 6) AS cosine
  FROM cand c
  JOIN embeddings q ON q.vec_id = c.query_id
  JOIN embeddings n ON n.vec_id = c.neighbor_id
)
SELECT query_id, neighbor_id, cosine, rank FROM (
  SELECT query_id, neighbor_id, cosine,
         CAST(row_number() OVER (PARTITION BY query_id
                                 ORDER BY cosine DESC, neighbor_id) AS INTEGER) AS rank
  FROM scored
) WHERE rank <= 3
"""


# ---------------------------------------------------------------------------
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    # N from the parquet footer (sub-ms, driver-side) instead of a
    # dedicated Spark count job; None (directory-style parquet) falls
    # back to the operator's count.  No spread: the operator repartitions
    # by doc_id itself so its tf aggregate reuses that partitioning.
    n = _footer_rows(os.path.join(sf_dir, "documents.parquet"))
    return X.tfidf_top_terms(_docs(spark, sf_dir), k=3, n_docs=n)


TEXT_TFIDF_SQL = f"""
WITH {_ORACLE_TOKS.strip()},
tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY doc_id, token),
dfr AS (SELECT token, count(DISTINCT doc_id) AS df FROM tf GROUP BY token),
n_docs AS (SELECT count(*) AS n FROM documents),
scored AS (
  SELECT tf.doc_id, tf.token, tf.tf, dfr.df,
         round(tf.tf * ln(CAST(n_docs.n AS DOUBLE) / dfr.df), 6) AS tfidf
  FROM tf JOIN dfr ON tf.token = dfr.token, n_docs
)
SELECT doc_id, token, tf, df, tfidf, term_rank FROM (
  SELECT doc_id, token, tf, df, tfidf,
         CAST(row_number() OVER (PARTITION BY doc_id
                                 ORDER BY tfidf DESC, token) AS INTEGER) AS term_rank
  FROM scored
) WHERE term_rank <= 3
"""


# ---------------------------------------------------------------------------
def events_pivot_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: one column per event type (sum of value) per user bucket."""
    from ..sources.files import read_table

    ev = read_table(spark, sf_dir, "events")
    types = ["click", "error", "purchase", "signup", "view"]
    return (
        ev.withColumn("user_bucket", (F.col("user_id") % 10).cast("bigint"))
        .groupBy("user_bucket")
        .pivot("event_type", types)
        .agg(F.round(F.sum("value"), 2))
        .orderBy("user_bucket")
    )


EVENTS_PIVOT_SQL = """
SELECT CAST(user_id % 10 AS BIGINT) AS user_bucket,
       round(sum(CASE WHEN event_type = 'click'    THEN value END), 2) AS click,
       round(sum(CASE WHEN event_type = 'error'    THEN value END), 2) AS error,
       round(sum(CASE WHEN event_type = 'purchase' THEN value END), 2) AS purchase,
       round(sum(CASE WHEN event_type = 'signup'   THEN value END), 2) AS signup,
       round(sum(CASE WHEN event_type = 'view'     THEN value END), 2) AS view
FROM events
GROUP BY 1
ORDER BY user_bucket
"""


ENTRIES.update(
    {
        "ann_ivf_topk": (ann_ivf_topk, ANN_IVF_TOPK_SQL),
        "text_tfidf_top_terms": (text_tfidf_top_terms, TEXT_TFIDF_SQL),
        "events_pivot_by_type": (events_pivot_by_type, EVENTS_PIVOT_SQL),
    }
)


# ---------------------------------------------------------------------------
def corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level aggregates: one row of vocabulary/volume stats."""
    docs = _docs(spark, sf_dir)
    tok = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    )
    return tok.agg(
        F.count(F.lit(1)).alias("total_tokens"),
        F.countDistinct("token").alias("vocab_size"),
        F.countDistinct("doc_id").alias("n_docs"),
        F.round(
            F.count(F.lit(1)).cast("double") / F.countDistinct("doc_id"), 6
        ).alias("mean_doc_len"),
    )


CORPUS_STATS_SQL = f"""
WITH {_ORACLE_TOKS.strip()}
SELECT count(*) AS total_tokens,
       count(DISTINCT token) AS vocab_size,
       count(DISTINCT doc_id) AS n_docs,
       round(CAST(count(*) AS DOUBLE) / count(DISTINCT doc_id), 6) AS mean_doc_len
FROM tok
"""


# ---------------------------------------------------------------------------
def doc_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-length distribution in 100-char buckets."""
    docs = _docs(spark, sf_dir)
    return (
        docs.withColumn(
            "bucket", (F.floor(F.col("n_chars") / 100) * 100).cast("bigint")
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        )
        .orderBy("bucket")
    )


DOC_LENGTH_HISTOGRAM_SQL = """
SELECT CAST(floor(n_chars / 100) * 100 AS BIGINT) AS bucket,
       count(*) AS n_docs,
       round(avg(n_chars), 4) AS avg_chars
FROM documents
GROUP BY 1
ORDER BY bucket
"""


# ---------------------------------------------------------------------------
def salted_join_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resistant salted join, oracle-checked against the PLAIN join —
    the proof that salting changes the physical distribution only."""
    from ..operators.joins import salted_join
    from ..sources.files import read_table

    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    return salted_join(orders, cust, "o_custkey", salt_factor=8).select(
        "o_orderkey", "o_custkey", "c_name", "o_totalprice", "c_mktsegment"
    )


SALTED_JOIN_ORDERS_SQL = """
SELECT o_orderkey, o_custkey, c_name, o_totalprice, c_mktsegment
FROM orders JOIN customer ON o_custkey = c_custkey
"""


ENTRIES.update(
    {
        "corpus_stats": (corpus_stats, CORPUS_STATS_SQL),
        "doc_length_histogram": (doc_length_histogram, DOC_LENGTH_HISTOGRAM_SQL),
        "salted_join_orders": (salted_join_orders, SALTED_JOIN_ORDERS_SQL),
    }
)


# ---------------------------------------------------------------------------
def embedding_near_dup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    # planes_per_table pinned (not "auto"): the oracle below hard-codes
    # the 16-plane table build, so the registered query must be
    # replayable without engine metadata.  At every certification scale
    # auto resolves to the same 4 (corpora <= 20k vectors).
    return S.near_dup_pairs_lsh(
        _emb(spark, sf_dir), threshold=0.45, planes_per_table=4
    )


EMBEDDING_NEAR_DUP_LSH_SQL = f"""
WITH dims AS (SELECT d FROM range(1, 65) r(d)),
planes AS (SELECT j FROM range(0, 16) r(j)),
comps AS (
  SELECT e.vec_id, p.j, d.d,
         CAST(e.embedding[d.d] AS DOUBLE) AS val,
         (({md5_int_expr("CAST(p.j AS VARCHAR) || '_' || CAST(d.d AS VARCHAR)", 'duckdb')})
          / 2147483648.0) - 1.0 AS w
  FROM embeddings e, planes p, dims d
),
proj AS (
  SELECT vec_id, j, round(sum(w * val), 9) AS proj
  FROM comps GROUP BY vec_id, j
),
buckets AS (
  SELECT vec_id, CAST(j // 4 AS INTEGER) AS table_id,
         CAST(sum(CASE WHEN proj > 0 THEN CAST(pow(2, j % 4) AS BIGINT) ELSE 0 END) AS BIGINT) AS bucket
  FROM proj GROUP BY vec_id, CAST(j // 4 AS INTEGER)
),
cand AS (
  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM buckets a
  JOIN buckets b ON a.table_id = b.table_id AND a.bucket = b.bucket
               AND a.vec_id < b.vec_id
)
SELECT c.vec_a, c.vec_b,
       round({_ORACLE_COS.format(a='x.embedding', b='y.embedding')}, 6) AS cosine
FROM cand c
JOIN embeddings x ON x.vec_id = c.vec_a
JOIN embeddings y ON y.vec_id = c.vec_b
WHERE round({_ORACLE_COS.format(a='x.embedding', b='y.embedding')}, 6) >= 0.45
"""

ENTRIES["embedding_near_dup_lsh"] = (
    embedding_near_dup_lsh,
    EMBEDDING_NEAR_DUP_LSH_SQL,
)


# ---------------------------------------------------------------------------
def text_char_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-class ratios (alpha/digit/space/punct) — the length/punct
    half of the classic quality triple (stopword ratio lives in
    text_language_id)."""
    docs = _docs(spark, sf_dir)
    n = F.length("text")
    n_alpha = F.length(F.regexp_replace("text", "[^a-zA-Z]", ""))
    n_digit = F.length(F.regexp_replace("text", "[^0-9]", ""))
    n_space = F.length(F.regexp_replace("text", "[^ ]", ""))
    return docs.select(
        "doc_id",
        n.alias("n_chars_total"),
        n_alpha.alias("n_alpha"),
        n_digit.alias("n_digit"),
        n_space.alias("n_space"),
        (n - n_alpha - n_digit - n_space).alias("n_punct"),
        # try_divide: empty text -> NULL ratios in BOTH engines (ANSI
        # Spark errors on /0, DuckDB's x/0 is NULL)
        F.round(F.try_divide(n_alpha.cast("double"), n), 6).alias(
            "alpha_ratio"
        ),
        F.round(
            F.try_divide((n - n_alpha - n_digit - n_space).cast("double"), n),
            6,
        ).alias("punct_ratio"),
    )


TEXT_CHAR_STATS_SQL = """
SELECT doc_id,
       CAST(length(text) AS INTEGER) AS n_chars_total,
       CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS INTEGER) AS n_alpha,
       CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS INTEGER)   AS n_digit,
       CAST(length(regexp_replace(text, '[^ ]', '', 'g')) AS INTEGER)     AS n_space,
       CAST(length(text) - length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
            - length(regexp_replace(text, '[^0-9]', '', 'g'))
            - length(regexp_replace(text, '[^ ]', '', 'g')) AS INTEGER)   AS n_punct,
       round(CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
             / length(text), 6) AS alpha_ratio,
       round(CAST(length(text) - length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
             - length(regexp_replace(text, '[^0-9]', '', 'g'))
             - length(regexp_replace(text, '[^ ]', '', 'g')) AS DOUBLE)
             / length(text), 6) AS punct_ratio
FROM documents
"""

ENTRIES["text_char_stats"] = (text_char_stats, TEXT_CHAR_STATS_SQL)


# ---------------------------------------------------------------------------
def dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test split by content-stable hash.

    Splitting on md5(doc_id) rather than random() makes the assignment
    reproducible across runs/engines AND stable under re-partitioning —
    the property a training pipeline needs so a document never migrates
    between train and test when the corpus is rebuilt.
    """
    docs = _docs(spark, sf_dir)
    bucket = F.expr(
        f"{md5_int_expr('CAST(doc_id AS STRING)', 'spark')} % 100"
    )
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    )
    return (
        docs.withColumn("split", split)
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("n_chars"), 4).alias("avg_chars"),
            F.min("doc_id").alias("min_doc_id"),
        )
        .orderBy("split")
    )


DATASET_SPLIT_SQL = f"""
WITH assigned AS (
  SELECT doc_id, n_chars,
         CASE WHEN {md5_int_expr("CAST(doc_id AS VARCHAR)", 'duckdb')} % 100 < 80 THEN 'train'
              WHEN {md5_int_expr("CAST(doc_id AS VARCHAR)", 'duckdb')} % 100 < 90 THEN 'val'
              ELSE 'test' END AS split
  FROM documents
)
SELECT split, count(*) AS n_docs, round(avg(n_chars), 4) AS avg_chars,
       min(doc_id) AS min_doc_id
FROM assigned GROUP BY split ORDER BY split
"""


# ---------------------------------------------------------------------------
def corpus_top_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 word bigrams across the corpus with doc frequency."""
    docs = _docs(spark, sf_dir)
    toks = docs.select("doc_id", F.split("text", " ").alias("t")).filter(
        F.size("t") >= 2
    )
    bigram_expr = (
        "transform(sequence(1, size(t) - 1), "
        "i -> concat_ws(' ', element_at(t, i), element_at(t, i + 1)))"
    )
    bg = toks.select("doc_id", F.explode(F.expr(bigram_expr)).alias("bigram"))
    return (
        bg.groupBy("bigram")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct("doc_id").alias("doc_freq"),
        )
        .orderBy(F.desc("n_occurrences"), F.asc("bigram"))
        .limit(20)
    )


CORPUS_TOP_BIGRAMS_SQL = """
WITH nums AS (SELECT i FROM range(1, 4001) r(i)),
toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
bg AS (
  SELECT doc_id, t[i] || ' ' || t[i+1] AS bigram
  FROM toks JOIN nums ON i <= len(t) - 1
  WHERE len(t) >= 2
)
SELECT bigram, count(*) AS n_occurrences,
       count(DISTINCT doc_id) AS doc_freq
FROM bg GROUP BY bigram
ORDER BY n_occurrences DESC, bigram
LIMIT 20
"""

# ---------------------------------------------------------------------------
# corpus_token_coverage — cumulative-mass vocabulary cutoffs: the FIRST
# token (in frequency-desc order) at which the running occurrence count
# reaches 50% / 90% / 99% of all occurrences (Zipf truncation — "how
# big a vocabulary covers X% of the corpus").  The one-task SQL form is
# SUM() OVER (ORDER BY ...) — a global running window; the Spark plan is
# operators/ranks.py::global_cumulative_cutoff (range-partitioned prefix
# sums, driver locates crossing partitions from partition-cardinality
# offsets, only crossing partitions are window-scanned).  Thresholds
# are ceil(num*W/den) in INTEGER arithmetic on both engines.
def corpus_token_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.ranks import global_cumulative_cutoff
    from ..plans.spread import scan_bytes

    docs = _docs(spark, sf_dir)
    tok = docs.select(
        F.explode(F.slice(F.split("text", " "), 1, 4000)).alias("token")
    ).filter(F.col("token") != "")
    freq = tok.groupBy("token").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_occurrences")
    )
    # materialized ONCE (lazy): the cutoff's total-weight subtree and
    # the running-window probe are different plans above the frequency
    # aggregate, so the corpus explode would otherwise execute twice
    # (the tfidf/prefix-join pattern)
    freq = freq.localCheckpoint(eager=False)
    return global_cumulative_cutoff(
        freq,
        weight_col="n_occurrences",
        fracs=[(1, 2), (9, 10), (99, 100)],
        label_col="coverage",
        rank_col="cutoff_rank",
        cum_col="cum_weight",
        input_bytes=scan_bytes(docs),
        # r14: primary == weight unlocks the value-histogram large
        # route (V <= sqrt(2W) value rows; freq never exchanged or
        # checkpointed past its groupBy)
        order_spec=[("n_occurrences", True), ("token", False)],
    ).orderBy("coverage")


CORPUS_TOKEN_COVERAGE_SQL = f"""
WITH {_ORACLE_TOKS.strip()},
freq AS (SELECT token, CAST(count(*) AS BIGINT) AS n_occurrences
         FROM tok WHERE token <> '' GROUP BY token),
ranked AS (
  SELECT token, n_occurrences,
         row_number() OVER (ORDER BY n_occurrences DESC, token) AS rnk,
         CAST(sum(n_occurrences) OVER (ORDER BY n_occurrences DESC, token
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
         CAST(sum(n_occurrences) OVER () AS BIGINT) AS w
  FROM freq)
SELECT CAST(q.num AS DOUBLE) / q.den AS coverage,
       CAST(r.rnk AS BIGINT) AS cutoff_rank,
       r.cum AS cum_weight,
       r.token,
       r.n_occurrences
FROM (VALUES (1, 2), (9, 10), (99, 100)) q(num, den)
JOIN ranked r
  ON r.cum >= (r.w * q.num + q.den - 1) // q.den
 AND r.cum - r.n_occurrences < (r.w * q.num + q.den - 1) // q.den
ORDER BY coverage
"""

ENTRIES["corpus_token_coverage"] = (
    corpus_token_coverage,
    CORPUS_TOKEN_COVERAGE_SQL,
)


ENTRIES["dataset_split"] = (dataset_split, DATASET_SPLIT_SQL)
ENTRIES["corpus_top_bigrams"] = (corpus_top_bigrams, CORPUS_TOP_BIGRAMS_SQL)


# ---------------------------------------------------------------------------
# Real media codec round-trips: the Spark side synthesizes genuine
# WAV/BMP blobs (content a deterministic function of doc_id/n_chars),
# DECODES them with the real decoders, and aggregates; the oracle
# reproduces the same features from the generating formula — a hash
# match proves the encode→decode path, not just the plumbing.
def multimodal_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    return M.audio_features(M.synth_audio_table(_docs(spark, sf_dir)))


MULTIMODAL_AUDIO_SQL = """
WITH nums AS (SELECT i FROM range(0, 4001) r(i)),
s AS (
  SELECT d.doc_id, d.n_chars,
         ((d.doc_id * 31 + i * 7) % 65536) - 32768 AS v
  FROM documents d JOIN nums ON i < d.n_chars
)
SELECT doc_id,
       CAST(8000 AS INTEGER) AS sample_rate,
       CAST(n_chars AS BIGINT) AS n_samples,
       round(n_chars / 8000.0, 6) AS duration_s,
       round(sqrt(CAST(sum(CAST(v AS BIGINT) * v) AS DOUBLE) / n_chars), 4) AS rms
FROM s
GROUP BY doc_id, n_chars
"""


def multimodal_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    return M.image_features(M.synth_image_table(_docs(spark, sf_dir)))


MULTIMODAL_IMAGE_SQL = """
WITH xs AS (SELECT i AS x FROM range(0, 33) r(i)),
ys AS (SELECT i AS y FROM range(0, 19) r(i)),
px AS (
  SELECT d.doc_id,
         (d.n_chars % 31) + 2 AS w,
         (d.n_chars % 17) + 2 AS h,
         (d.doc_id + 3 * x + 5 * y) % 256     AS r,
         (d.doc_id * 7 + x + 2 * y) % 256     AS g,
         (d.doc_id + x * y) % 256             AS b
  FROM documents d
  JOIN xs ON x < (d.n_chars % 31) + 2
  JOIN ys ON y < (d.n_chars % 17) + 2
)
SELECT doc_id,
       CAST(w AS INTEGER) AS width,
       CAST(h AS INTEGER) AS height,
       round(CAST(sum(r) AS DOUBLE) / (w * h), 6) AS mean_r,
       round(CAST(sum(g) AS DOUBLE) / (w * h), 6) AS mean_g,
       round(CAST(sum(b) AS DOUBLE) / (w * h), 6) AS mean_b
FROM px
GROUP BY doc_id, w, h
"""

ENTRIES["multimodal_audio_features"] = (
    multimodal_audio_features,
    MULTIMODAL_AUDIO_SQL,
)
ENTRIES["multimodal_image_features"] = (
    multimodal_image_features,
    MULTIMODAL_IMAGE_SQL,
)


# ---------------------------------------------------------------------------
def dedup_keeplist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end dedup OUTPUT: the surviving corpus after applying both
    the exact and the near-dup (3-gram Jaccard >= 0.6) rules.

    Keep rule (deterministic): drop a doc if (a) an identical doc with a
    smaller id exists, or (b) it is the doc_b (higher id) of a near-dup
    pair.  This is the materialization step a training pipeline actually
    ships — the pair relations alone are diagnostics.  Anti-joins keep
    the plan shuffle-light: both drop relations are tiny next to the
    corpus and join on the bare id.
    """
    docs = _docs(spark, sf_dir, spread=True)
    exact_drops = (
        D.exact_dedup(docs)
        .filter(F.col("n_copies") > 1)
        .join(
            docs.select(F.md5("text").alias("content_hash"), "doc_id"),
            "content_hash",
        )
        .filter(F.col("doc_id") > F.col("keeper_id"))
        .select("doc_id")
    )
    ngram_drops = (
        # exact-string shingles: this oracle replays string equality
        D.ngram_jaccard_dedup(docs, threshold=0.6, hash_shingles=False)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    drops = exact_drops.union(ngram_drops).distinct()
    return (
        docs.join(drops, "doc_id", "left_anti")
        .select("doc_id", "n_chars")
    )


DEDUP_KEEPLIST_SQL = f"""
WITH {_ORACLE_SHINGLES.strip()},
counts AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
rare AS (SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= 64),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
  FROM sh a
  JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  JOIN rare r ON r.shingle = a.shingle
  GROUP BY 1, 2
),
ngram_drops AS (
  SELECT DISTINCT doc_b AS doc_id
  FROM inter
  JOIN counts ca ON ca.doc_id = doc_a
  JOIN counts cb ON cb.doc_id = doc_b
  WHERE round(CAST(shared AS DOUBLE) / (ca.n + cb.n - shared), 6) >= 0.6
),
keepers AS (SELECT md5(text) AS h, min(doc_id) AS k FROM documents GROUP BY 1),
exact_drops AS (
  SELECT d.doc_id FROM documents d
  JOIN keepers g ON md5(d.text) = g.h AND d.doc_id > g.k
),
drops AS (SELECT doc_id FROM exact_drops UNION SELECT doc_id FROM ngram_drops)
SELECT d.doc_id, d.n_chars
FROM documents d LEFT JOIN drops x ON d.doc_id = x.doc_id
WHERE x.doc_id IS NULL
"""


# ---------------------------------------------------------------------------
def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-deterministic 20% sample within each length-bucket stratum.

    Sampling on md5(doc_id) (not rand()) makes the sample reproducible
    across runs, engines, and repartitioning — the property that lets a
    pipeline re-derive the exact same subset at any scale.  Output is the
    per-stratum audit: population, sample size, min sampled id.
    """
    docs = _docs(spark, sf_dir)
    bucket = (F.floor(F.col("n_chars") / 100) * 100).cast("bigint")
    sample_hash = md5_int_expr("CAST(doc_id AS STRING) || '_s'", "spark")
    in_sample = F.expr(f"{sample_hash} % 10") < 2
    return (
        docs.withColumn("stratum", bucket)
        .withColumn("sampled", in_sample)
        .groupBy("stratum")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("sampled").cast("bigint")).alias("n_sampled"),
            F.min(F.when(F.col("sampled"), F.col("doc_id"))).alias(
                "min_sampled_id"
            ),
        )
        .orderBy("stratum")
    )


STRATIFIED_SAMPLE_SQL = f"""
WITH tagged AS (
  SELECT CAST(floor(n_chars / 100) * 100 AS BIGINT) AS stratum, doc_id,
         ({md5_int_expr("CAST(doc_id AS VARCHAR) || '_s'", 'duckdb')} % 10) < 2 AS sampled
  FROM documents
)
SELECT stratum, count(*) AS n_docs,
       CAST(sum(CASE WHEN sampled THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
       min(CASE WHEN sampled THEN doc_id END) AS min_sampled_id
FROM tagged GROUP BY stratum ORDER BY stratum
"""


# ---------------------------------------------------------------------------
def split_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test contamination check: exact-content collisions across the
    hash-stable dataset_split assignment.

    The eval-leakage gate every training pipeline needs before shipping a
    split: join train and test on content hash (32-byte keys — the
    documents themselves never co-shuffle) and count offending docs/pairs.
    """
    docs = _docs(spark, sf_dir)
    bucket = F.expr(f"{md5_int_expr('CAST(doc_id AS STRING)', 'spark')} % 100")
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    )
    tagged = docs.select(
        "doc_id", F.md5("text").alias("h"), split.alias("split")
    )
    train = tagged.filter(F.col("split") == "train").select(
        F.col("doc_id").alias("train_id"), "h"
    )
    test = tagged.filter(F.col("split") == "test").select(
        F.col("doc_id").alias("test_id"), "h"
    )
    hits = train.join(test, "h")
    return hits.agg(
        F.count(F.lit(1)).alias("n_cross_pairs"),
        F.countDistinct("test_id").alias("n_contaminated_test_docs"),
    )


SPLIT_CONTAMINATION_SQL = f"""
WITH tagged AS (
  SELECT doc_id, md5(text) AS h,
         CASE WHEN {md5_int_expr("CAST(doc_id AS VARCHAR)", 'duckdb')} % 100 < 80 THEN 'train'
              WHEN {md5_int_expr("CAST(doc_id AS VARCHAR)", 'duckdb')} % 100 < 90 THEN 'val'
              ELSE 'test' END AS split
  FROM documents
),
hits AS (
  SELECT tr.doc_id AS train_id, te.doc_id AS test_id
  FROM tagged tr JOIN tagged te ON tr.h = te.h
  WHERE tr.split = 'train' AND te.split = 'test'
)
SELECT count(*) AS n_cross_pairs,
       count(DISTINCT test_id) AS n_contaminated_test_docs
FROM hits
"""

ENTRIES["dedup_keeplist"] = (dedup_keeplist, DEDUP_KEEPLIST_SQL)
ENTRIES["stratified_sample"] = (stratified_sample, STRATIFIED_SAMPLE_SQL)
ENTRIES["split_contamination"] = (split_contamination, SPLIT_CONTAMINATION_SQL)


# ---------------------------------------------------------------------------
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERS: connected components over the union of exact
    (same content hash) and 3-gram-Jaccard >= 0.6 pair evidence.

    Pairwise relations are diagnostics; clustering is what dedup actually
    needs — transitive closure groups A~B~C into one cluster even when
    A~C alone misses the threshold, and ``cluster_id`` = min member id
    gives the canonical representative to keep.  Components via min-label
    propagation (``operators/dedup.py::connected_components``): the graph
    stage only ever shuffles id pairs, never text.  Oracle: DuckDB
    recursive CTE computing min reachable id per node.
    """
    docs = _docs(spark, sf_dir, spread=True)
    hashed = docs.select(F.md5("text").alias("h"), "doc_id")
    keepers = hashed.groupBy("h").agg(F.min("doc_id").alias("k"))
    epairs = (
        hashed.join(keepers, "h")
        .filter(F.col("doc_id") > F.col("k"))
        .select(F.col("k").alias("doc_a"), F.col("doc_id").alias("doc_b"))
    )
    npairs = D.ngram_jaccard_dedup(
        docs, threshold=0.6, hash_shingles=False
    ).select("doc_a", "doc_b")
    pairs = npairs.union(epairs).distinct()
    cc = D.connected_components(pairs)
    return cc.select(
        F.col("node").alias("doc_id"), "cluster_id"
    ).orderBy("doc_id")


DEDUP_CLUSTERS_SQL = f"""
WITH RECURSIVE {_ORACLE_SHINGLES.strip()},
counts AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
rare AS (SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= 64),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
  FROM sh a
  JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  JOIN rare r ON r.shingle = a.shingle
  GROUP BY 1, 2
),
npairs AS (
  SELECT doc_a, doc_b FROM inter
  JOIN counts ca ON ca.doc_id = doc_a
  JOIN counts cb ON cb.doc_id = doc_b
  WHERE round(CAST(shared AS DOUBLE) / (ca.n + cb.n - shared), 6) >= 0.6
),
keepers AS (SELECT md5(text) AS h, min(doc_id) AS k FROM documents GROUP BY 1),
epairs AS (
  SELECT g.k AS doc_a, d.doc_id AS doc_b
  FROM documents d JOIN keepers g ON md5(d.text) = g.h AND d.doc_id > g.k
),
allp AS (SELECT doc_a, doc_b FROM npairs UNION SELECT doc_a, doc_b FROM epairs),
edges AS (SELECT doc_a AS s, doc_b AS d FROM allp UNION SELECT doc_b, doc_a FROM allp),
reach(node, lab) AS (
  SELECT DISTINCT s, s FROM edges
  UNION
  SELECT e.s, r.lab FROM edges e JOIN reach r ON r.node = e.d
)
SELECT node AS doc_id, min(lab) AS cluster_id FROM reach GROUP BY node ORDER BY doc_id
"""

ENTRIES["dedup_clusters"] = (dedup_clusters, DEDUP_CLUSTERS_SQL)


# ---------------------------------------------------------------------------
def text_pattern_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Policy/PII-style pattern scrub: per-doc match counts + a hash of
    the redacted text proving both engines produce the identical scrub.

    The machinery is exactly what an email/phone/ssn scrubber runs —
    ``regexp_extract_all`` to count, ``regexp_replace`` to redact — the
    pattern set is just instantiated with terms that occur in this
    corpus (the synthetic text is digit-free).  Pure codegen expressions,
    linear scan, no shuffle: the 100 TB cost is one pass over the text.
    """
    pat = "(customer|query|key)"
    docs = _docs(spark, sf_dir)
    return (
        docs.select(
            "doc_id",
            F.size(F.expr(f"regexp_extract_all(text, '{pat}', 0)"))
            .cast("bigint")
            .alias("n_hits"),
            F.md5(F.regexp_replace("text", pat, "<PII>")).alias("redacted_md5"),
        )
        .filter(F.col("n_hits") > 0)
        .orderBy("doc_id")
    )


TEXT_PATTERN_SCRUB_SQL = """
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '(customer|query|key)')) AS BIGINT) AS n_hits,
       md5(regexp_replace(text, '(customer|query|key)', '<PII>', 'g')) AS redacted_md5
FROM documents
WHERE len(regexp_extract_all(text, '(customer|query|key)')) > 0
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
def passage_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Passage-level (sub-document) dedup: hash non-overlapping 8-token
    chunks and report chunks appearing in >= 2 distinct docs — the
    boilerplate / repeated-passage detector that document-level dedup
    misses (a doc can be unique while half its content is copied).

    Chunk hashes are built IN-ROW (transform over sequence, md5 per
    chunk) so the only shuffle is the groupBy on the 16-byte chunk hash
    — document text never co-shuffles.  Linear at 100 TB.
    """
    docs = _docs(spark, sf_dir, spread=True)
    chunks = docs.select(
        "doc_id", F.explode(F.expr(_CHUNK8_EXPR)).alias("chunk_hash")
    )
    return (
        chunks.groupBy("chunk_hash")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
            F.min("doc_id").alias("min_doc_id"),
        )
        .filter(F.col("n_docs") >= 2)
        .orderBy("chunk_hash")
    )


PASSAGE_DEDUP_SQL = f"""
WITH {_ORACLE_CHUNK8.strip()}
SELECT chunk_hash, count(DISTINCT doc_id) AS n_docs, count(*) AS n_occurrences,
       min(doc_id) AS min_doc_id
FROM chunk8 GROUP BY chunk_hash HAVING count(DISTINCT doc_id) >= 2
ORDER BY chunk_hash
"""


# ---------------------------------------------------------------------------
def split_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train-vs-test token-distribution drift over the hash-stable split:
    per-token probabilities and absolute drift for the top-20 train
    tokens.  The QA gate that catches a skewed split / domain shift
    before training sees it.  One explode + two-level agg; token counts
    shuffle, text does not.
    """
    docs = _docs(spark, sf_dir, spread=True)
    bucket = F.expr(f"{md5_int_expr('CAST(doc_id AS STRING)', 'spark')} % 100")
    split = F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    toks = docs.select(split.alias("split"), F.explode(F.split("text", " ")).alias("token"))
    counts = (
        toks.filter(F.col("split").isin("train", "test"))
        .groupBy("token")
        .agg(
            F.sum(F.when(F.col("split") == "train", 1).otherwise(0)).alias("n_train"),
            F.sum(F.when(F.col("split") == "test", 1).otherwise(0)).alias("n_test"),
        )
    )
    # Totals via a 1-row broadcast stats branch over the lazily
    # checkpointed counts relation — an unpartitioned window would pump
    # the whole VOCAB-cardinality count stream through one task, and
    # the checkpoint keeps the explode+groupBy lineage single-execution
    # across the totals and probe branches (the lm_perplexity pattern).
    counts = counts.localCheckpoint(eager=False)
    totals = counts.agg(
        F.sum("n_train").alias("tot_train"),
        F.sum("n_test").alias("tot_test"),
    )
    return (
        counts.crossJoin(F.broadcast(totals))
        .select(
            "token",
            "n_train",
            "n_test",
            F.round(F.col("n_train") / F.col("tot_train"), 6).alias("p_train"),
            F.round(F.col("n_test") / F.col("tot_test"), 6).alias("p_test"),
            F.round(
                F.abs(
                    F.col("n_train") / F.col("tot_train")
                    - F.col("n_test") / F.col("tot_test")
                ),
                6,
            ).alias("abs_drift"),
        )
        .orderBy(F.desc("n_train"), "token")
        .limit(20)
    )


SPLIT_DIVERGENCE_SQL = f"""
WITH tagged AS (
  SELECT doc_id, text,
         CASE WHEN {md5_int_expr("CAST(doc_id AS VARCHAR)", 'duckdb')} % 100 < 80 THEN 'train'
              WHEN {md5_int_expr("CAST(doc_id AS VARCHAR)", 'duckdb')} % 100 < 90 THEN 'val'
              ELSE 'test' END AS split
  FROM documents
),
nums AS (SELECT i FROM range(1, 4001) r(i)),
toks AS (SELECT split, string_split(text, ' ') AS t FROM tagged WHERE split IN ('train', 'test')),
tok AS (SELECT split, t[i] AS token FROM toks JOIN nums ON i <= len(t)),
counts AS (
  SELECT token,
         CAST(sum(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS BIGINT) AS n_train,
         CAST(sum(CASE WHEN split = 'test' THEN 1 ELSE 0 END) AS BIGINT) AS n_test
  FROM tok GROUP BY token
),
totals AS (SELECT sum(n_train) AS tot_train, sum(n_test) AS tot_test FROM counts)
SELECT token, n_train, n_test,
       round(CAST(n_train AS DOUBLE) / tot_train, 6) AS p_train,
       round(CAST(n_test AS DOUBLE) / tot_test, 6) AS p_test,
       round(abs(CAST(n_train AS DOUBLE) / tot_train - CAST(n_test AS DOUBLE) / tot_test), 6) AS abs_drift
FROM counts, totals
ORDER BY n_train DESC, token
LIMIT 20
"""

ENTRIES["text_pattern_scrub"] = (text_pattern_scrub, TEXT_PATTERN_SCRUB_SQL)
# passage_dedup was RETIRED from the registry in round 13 (r12 verdict
# task 8 — the registry must shrink toward the 150 = 3x50 rotation
# capacity, and each surplus certification displaces a due re-cert):
# every plan element it certified is pinned by other entries sharing
# the very same expressions — the in-row _CHUNK8_EXPR chunking by
# passage_savings / split_ngram_decontamination / boilerplate_ratio,
# the chunk-hash keyed countDistinct aggregate by doc_cdc_dup_chunks
# and lineitem_distinct_counts.  Its DISTINCTIVE assertion (a unique
# document whose copied passage is caught at chunk granularity while
# document-level exact dedup misses it) moved to
# tests/test_datapipe_semantics.py::test_passage_dedup_semantics_retired_entry,
# which still differentially replays the full operator vs
# PASSAGE_DEDUP_SQL on a planted corpus.  History: driver-green r11
# (1.01x sf0.1); the function and oracle stay importable below.
ENTRIES["split_divergence"] = (split_divergence, SPLIT_DIVERGENCE_SQL)


# ---------------------------------------------------------------------------
def ann_q8_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k neighbors by INT8-quantized cosine (4× less memory traffic
    than float32 brute force; integer dots are exact, so unlike the float
    path this one hashes bit-for-bit against the oracle with no
    summation-order caveat).  Same query set / k / tie-breaks as
    ``ann_cosine_topk`` so the two are directly comparable."""
    emb = _emb(spark, sf_dir)
    return S.quantized_topk(emb.filter(F.col("vec_id") < 10), emb, k=5)


_ORACLE_Q8 = (
    "list_transform({v}, x -> CAST(round(CAST(x AS DOUBLE) * 127.0 / "
    "list_max(list_transform({v}, y -> abs(CAST(y AS DOUBLE))))) AS BIGINT))"
)

ANN_Q8_TOPK_SQL = f"""
WITH qv AS (
  SELECT vec_id, {_ORACLE_Q8.format(v='embedding')} AS q
  FROM embeddings
),
sized AS (
  SELECT vec_id, q,
         CAST(list_sum(list_transform(q, x -> x * x)) AS BIGINT) AS sq
  FROM qv
),
scored AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         round(
           CAST(list_sum(list_transform(list_zip(a.q, b.q), x -> x[1] * x[2])) AS DOUBLE)
           / (sqrt(CAST(a.sq AS DOUBLE)) * sqrt(CAST(b.sq AS DOUBLE))), 6) AS q8_cosine
  FROM sized a JOIN sized b ON a.vec_id <> b.vec_id
  WHERE a.vec_id < 10
),
ranked AS (
  SELECT query_id, neighbor_id, q8_cosine,
         CAST(row_number() OVER (PARTITION BY query_id
                                 ORDER BY q8_cosine DESC, neighbor_id) AS INTEGER) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, q8_cosine, rank FROM ranked WHERE rank <= 5
"""

ENTRIES["ann_q8_topk"] = (ann_q8_topk, ANN_Q8_TOPK_SQL)


# ---------------------------------------------------------------------------
def ann_rerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage retrieve-then-rerank cascade (operators/similarity.py::
    rerank_topk): an int8-quantized scan shortlists m=20 candidates per
    query, exact float cosine re-scores ONLY the shortlist and keeps the
    top 5 — the standard production ANN shape (cheap representation over
    everything, expensive scoring over almost nothing; the float matmul
    touches Q×m vectors regardless of corpus size).  Same query set /
    k / tie-breaks as ``ann_cosine_topk``/``ann_q8_topk`` so the
    cascade's recall repair is directly measurable against both
    single-stage arms; q8_rank carries the stage-1 position.  The
    oracle replays both stages declaratively: the shortlist CTEs are
    ``ANN_Q8_TOPK_SQL``'s, the rerank re-scores with
    ``ANN_COSINE_TOPK_SQL``'s exact-cosine expression, composed."""
    emb = _emb(spark, sf_dir)
    return S.rerank_topk(emb.filter(F.col("vec_id") < 10), emb, m=20, k=5)


ANN_RERANK_TOPK_SQL = f"""
WITH qv AS (
  SELECT vec_id, embedding, {_ORACLE_Q8.format(v='embedding')} AS q
  FROM embeddings
),
sized AS (
  SELECT vec_id, embedding, q,
         CAST(list_sum(list_transform(q, x -> x * x)) AS BIGINT) AS sq
  FROM qv
),
s1 AS (
  SELECT query_id, neighbor_id, q8_rank FROM (
    SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
           CAST(row_number() OVER (
             PARTITION BY a.vec_id
             ORDER BY round(
               CAST(list_sum(list_transform(list_zip(a.q, b.q),
                                            x -> x[1] * x[2])) AS DOUBLE)
               / (sqrt(CAST(a.sq AS DOUBLE)) * sqrt(CAST(b.sq AS DOUBLE))),
               6) DESC, b.vec_id) AS INTEGER) AS q8_rank
    FROM sized a JOIN sized b ON a.vec_id <> b.vec_id
    WHERE a.vec_id < 10
  ) WHERE q8_rank <= 20
),
rescored AS (
  SELECT s.query_id, s.neighbor_id, s.q8_rank,
         round({_ORACLE_COS.format(a='q.embedding', b='c.embedding')}, 6)
           AS cosine
  FROM s1 s
  JOIN embeddings q ON q.vec_id = s.query_id
  JOIN embeddings c ON c.vec_id = s.neighbor_id
),
ranked AS (
  SELECT query_id, neighbor_id, cosine, q8_rank,
         CAST(row_number() OVER (PARTITION BY query_id
                                 ORDER BY cosine DESC, neighbor_id)
              AS INTEGER) AS rank
  FROM rescored
)
SELECT query_id, neighbor_id, cosine, q8_rank, rank
FROM ranked WHERE rank <= 5
"""

ENTRIES["ann_rerank_topk"] = (ann_rerank_topk, ANN_RERANK_TOPK_SQL)


# ---------------------------------------------------------------------------
def ann_mmr_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR-diversified retrieval (operators/similarity.py::mmr_topk):
    cosine top-20 shortlist per probe (vec_id < 10), then greedy
    Maximal-Marginal-Relevance selection of 5 at lam=0.7 — each pick
    trades relevance against similarity to what is already selected,
    the standard redundancy filter over a near-dup-heavy corpus.  The
    oracle unrolls the same greedy rounds as SQL stages (argmax +
    NOT-EXISTS exclusion per round), so every selection, score, and
    tie-break is replayed end-to-end."""
    emb = _emb(spark, sf_dir)
    return S.mmr_topk(
        emb.filter(F.col("vec_id") < 10), emb, k=5, m=20, lam=0.7
    )


def _mmr_sql(k: int = 5, m: int = 20, lam: float = 0.7) -> str:
    """Unrolled greedy-MMR oracle: stage n scores every unselected
    shortlist member as round(lam*rel - (1-lam)*max sim-to-selected, 7)
    and takes the per-query argmax (ties on neighbor_id).  ``1 - lam``
    is spelled via repr() so the SQL multiplies by the SAME IEEE double
    the Spark greedy uses (1.0 - 0.7 != literal 0.3 at the last bit);
    the 7dp (not 6dp) mmr rounding is the half-way-point fix — see
    mmr_topk's docstring."""
    cos = _ORACLE_COS.format(a="q.embedding", b="c.embedding")
    pcos = _ORACLE_COS.format(a="e1.embedding", b="e2.embedding")
    lam_r = repr(float(lam))
    oml_r = repr(1.0 - float(lam))
    parts = [
        f"""
WITH scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         round({cos}, 6) AS cosine
  FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
  WHERE q.vec_id < 10
),
sl AS (
  SELECT query_id, neighbor_id, cosine FROM (
    SELECT query_id, neighbor_id, cosine,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY cosine DESC, neighbor_id) AS rnk
    FROM scored) WHERE rnk <= {m}
),
ps AS (
  SELECT s1.query_id, s1.neighbor_id AS a, s2.neighbor_id AS b,
         round({pcos}, 6) AS sim
  FROM sl s1
  JOIN sl s2 ON s1.query_id = s2.query_id
            AND s1.neighbor_id <> s2.neighbor_id
  JOIN embeddings e1 ON e1.vec_id = s1.neighbor_id
  JOIN embeddings e2 ON e2.vec_id = s2.neighbor_id
),
sel1 AS (
  SELECT query_id, neighbor_id, cosine, mmr FROM (
    SELECT query_id, neighbor_id, cosine,
           round({lam_r} * cosine, 7) AS mmr,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY round({lam_r} * cosine, 7) DESC,
                                       neighbor_id) AS rr
    FROM sl) WHERE rr = 1
),
acc1 AS (SELECT query_id, neighbor_id FROM sel1)"""
    ]
    for n in range(2, k + 1):
        parts.append(
            f""",
cand{n} AS (
  SELECT p.query_id, p.a AS neighbor_id, max(p.sim) AS msim
  FROM ps p
  JOIN acc{n - 1} v ON v.query_id = p.query_id AND v.neighbor_id = p.b
  WHERE NOT EXISTS (SELECT 1 FROM acc{n - 1} w
                    WHERE w.query_id = p.query_id
                      AND w.neighbor_id = p.a)
  GROUP BY p.query_id, p.a
),
sel{n} AS (
  SELECT query_id, neighbor_id, cosine, mmr FROM (
    SELECT c.query_id, c.neighbor_id, s.cosine,
           round({lam_r} * s.cosine - {oml_r} * c.msim, 7) AS mmr,
           row_number() OVER (PARTITION BY c.query_id
                              ORDER BY round({lam_r} * s.cosine
                                             - {oml_r} * c.msim, 7) DESC,
                                       c.neighbor_id) AS rr
    FROM cand{n} c
    JOIN sl s ON s.query_id = c.query_id
             AND s.neighbor_id = c.neighbor_id)
  WHERE rr = 1
),
acc{n} AS (SELECT query_id, neighbor_id FROM acc{n - 1}
           UNION ALL SELECT query_id, neighbor_id FROM sel{n})"""
        )
    union = "\nUNION ALL\n".join(
        f"SELECT query_id, neighbor_id, cosine, mmr, "
        f"CAST({i} AS INTEGER) AS rank FROM sel{i}"
        for i in range(1, k + 1)
    )
    parts.append(f"\n{union}")
    return "".join(parts)


ANN_MMR_TOPK_SQL = _mmr_sql(k=5, m=20, lam=0.7)

ENTRIES["ann_mmr_topk"] = (ann_mmr_topk, ANN_MMR_TOPK_SQL)


# ---------------------------------------------------------------------------
def embedding_pca_topdir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dominant principal direction of the embedding cloud
    (operators/similarity.py::pca_topdir): one fused Arrow pass reduces
    the corpus to a dimension-cardinality second-moment summary, the
    driver power-iterates the 64x64 covariance (3 iterations, all-ones
    seed — sign-deterministic), and the 20 extreme |projection| rows
    come back via TakeOrderedAndProject.  The oracle replays sums,
    covariance, every iteration, the Rayleigh quotient, and the
    projection in SQL from the embeddings table alone; only the
    data-scale sums are rounded (1e-6) — the iteration runs on
    identical doubles in both engines (see the operator docstring for
    why rounding intermediates would be WRONG here)."""
    return S.pca_topdir(_emb(spark, sf_dir), iters=3, k=20)


def _pca_sql(iters: int = 3, k: int = 20, dim: int = 64) -> str:
    parts = [
        f"""
WITH dims AS (SELECT CAST(d AS INTEGER) AS d FROM range(1, {dim + 1}) r(d)),
x AS (SELECT e.vec_id, d.d - 1 AS d, CAST(e.embedding[d.d] AS DOUBLE) AS v
      FROM embeddings e, dims d),
nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM embeddings),
s AS (SELECT d, round(sum(v), 6) AS s FROM x GROUP BY d),
gh AS (SELECT a.d AS i, b.d AS j, round(sum(a.v * b.v), 6) AS gij
       FROM x a JOIN x b ON a.vec_id = b.vec_id AND a.d <= b.d
       GROUP BY a.d, b.d),
g AS (SELECT i, j, gij FROM gh
      UNION ALL SELECT j AS i, i AS j, gij FROM gh WHERE i < j),
cov AS (SELECT g.i, g.j, (g.gij - si.s * sj.s / nn.n) / nn.n AS c
        FROM g JOIN s si ON si.d = g.i JOIN s sj ON sj.d = g.j, nn),
v0 AS (SELECT d, 1.0 AS v FROM s)"""
    ]
    for t in range(1, iters + 1):
        parts.append(
            f""",
w{t} AS (SELECT cov.j AS d, sum(cov.c * v{t - 1}.v) AS w
        FROM cov JOIN v{t - 1} ON v{t - 1}.d = cov.i GROUP BY cov.j),
m{t} AS (SELECT sqrt(sum(w * w)) AS nrm FROM w{t}),
v{t} AS (SELECT d, w / nrm AS v FROM w{t}, m{t})"""
        )
    vf = f"v{iters}"
    parts.append(
        f""",
wl AS (SELECT cov.j AS d, sum(cov.c * {vf}.v) AS w
       FROM cov JOIN {vf} ON {vf}.d = cov.i GROUP BY cov.j),
ray AS (SELECT sum({vf}.v * wl.w) AS lam_raw FROM {vf} JOIN wl USING (d)),
trc AS (SELECT sum(c) AS tr FROM cov WHERE i = j),
cst AS (SELECT round(lam_raw, 6) AS lambda1,
               round(lam_raw / tr, 6) AS explained_ratio
        FROM ray, trc),
mu AS (SELECT s.d, s.s / nn.n AS m FROM s, nn),
proj AS (SELECT x.vec_id, round(sum((x.v - mu.m) * {vf}.v), 6) AS pc_proj
         FROM x JOIN mu ON mu.d = x.d JOIN {vf} ON {vf}.d = x.d
         GROUP BY x.vec_id)
SELECT p.vec_id, p.pc_proj, c.lambda1, c.explained_ratio
FROM proj p, cst c
ORDER BY abs(p.pc_proj) DESC, p.vec_id
LIMIT {k}"""
    )
    return "".join(parts)


EMBEDDING_PCA_SQL = _pca_sql(iters=3, k=20)

ENTRIES["embedding_pca_topdir"] = (embedding_pca_topdir, EMBEDDING_PCA_SQL)


# ---------------------------------------------------------------------------
def doc_winnow_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing/MOSS near-dup pairs (operators/dedup.py::winnow_pairs):
    3-gram md5 hashes, window w=4, rightmost-minimum selection, stop
    fingerprints (doc-frequency > 50) dropped, pairs sharing >= 2
    distinct fingerprint hashes.  Any shared token run of length >= 6
    (w + k - 1) is guaranteed a shared fingerprint — position-robust
    substring matching the shingle/minhash families cannot promise.
    The oracle replays gram hashing, the per-window argmin (row_number
    ordered h asc, pos desc), the stop filter, and the pair count."""
    return D.winnow_pairs(
        _docs(spark, sf_dir, spread=True),
        k=3,
        w=4,
        min_shared=2,
        max_doc_freq=50,
    )


DOC_WINNOW_PAIRS_SQL = f"""
WITH nums AS (SELECT CAST(i AS INTEGER) AS i FROM range(1, 4001) r(i)),
toks AS (SELECT doc_id, (string_split(coalesce(text, ''), ' '))[1:4000] AS t
         FROM documents),
grams AS (
  SELECT doc_id, i AS p,
         {md5_int_expr("t[i] || ' ' || t[i + 1] || ' ' || t[i + 2]",
                       'duckdb')} AS h
  FROM toks JOIN nums ON i <= len(t) - 2
),
gm AS (SELECT doc_id, CAST(count(*) AS INTEGER) AS m FROM grams GROUP BY doc_id),
wins AS (
  SELECT gm.doc_id, n2.i AS j
  FROM gm JOIN nums n2 ON n2.i <= gm.m - 3
),
sel AS (
  SELECT DISTINCT doc_id, h FROM (
    SELECT w.doc_id, w.j, g.h,
           row_number() OVER (PARTITION BY w.doc_id, w.j
                              ORDER BY g.h, g.p DESC) AS rn
    FROM wins w
    JOIN grams g ON g.doc_id = w.doc_id AND g.p BETWEEN w.j AND w.j + 3
  ) WHERE rn = 1
),
dfreq AS (SELECT h, count(*) AS df FROM sel GROUP BY h),
kept AS (SELECT sel.doc_id, sel.h FROM sel JOIN dfreq USING (h)
         WHERE df <= 50)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(count(*) AS BIGINT) AS n_shared
FROM kept a JOIN kept b ON a.h = b.h AND a.doc_id < b.doc_id
GROUP BY a.doc_id, b.doc_id
HAVING count(*) >= 2
"""

ENTRIES["doc_winnow_pairs"] = (doc_winnow_pairs, DOC_WINNOW_PAIRS_SQL)


# ---------------------------------------------------------------------------
def ann_ivf_pruned_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The storage-layout half of IVF ANN (operators/similarity.py::
    ivf_layout_write + ivf_pruned_topk): the corpus is written
    PARTITIONED BY coarse list, the probe map becomes a partition
    filter (`PartitionFilters: [list_id IN ...]` — unprobed lists'
    files are never opened, the 100 TB point of an IVF index), and the
    pruned scan is scored in one Arrow pass.  Same parameters as
    ann_ivf_topk and BIT-IDENTICAL to it by construction, so the
    oracle is ANN_IVF_TOPK_SQL shared verbatim — the driver check
    proves the layout round-trip changes nothing.  The per-invocation
    temp layout follows the streaming-replay scaffolding precedent
    (write, drain, checkpoint the small result, remove)."""
    import shutil
    import tempfile

    emb = _emb(spark, sf_dir)
    qs = emb.filter(F.col("vec_id") < 10)
    cents = emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    d = tempfile.mkdtemp(prefix="ivf_layout_")
    try:
        S.ivf_layout_write(emb, d, centroids=cents)
        # centroids=None on the READ side: the query resolves the
        # layout's STORED quantizer (the float32 -> float64 round-trip
        # is exact), so the driver check also covers the
        # single-source-of-truth path an appender would use
        out = S.ivf_pruned_topk(
            spark, d, qs, nprobe=2, k=3
        ).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(d, ignore_errors=True)
    return out


ENTRIES["ann_ivf_pruned_topk"] = (ann_ivf_pruned_topk, ANN_IVF_TOPK_SQL)


# ---------------------------------------------------------------------------
def embedding_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive hard-negative mining (operators/similarity.py::
    hard_negatives): for each anchor (vec_id < 10), the 5 most-similar
    corpus vectors whose LABEL differs from the anchor's — the
    highest-loss negatives for a contrastive training batch (the
    ANCE/DPR mining recipe).  One fused Arrow pass over the partitioned
    corpus with the neighbor label carried IN-ROW (no corpus-cardinality
    join-back); the anchor label arrives via a 10-row broadcast; the
    only shuffle is the WindowGroupLimit top-k.  Ties break on rounded
    cosine desc, then neighbor id — same determinism rules as
    ``ann_cosine_topk``."""
    emb = _emb(spark, sf_dir)
    return S.hard_negatives(emb.filter(F.col("vec_id") < 10), emb, k=5)


EMBEDDING_HARD_NEGATIVES_SQL = f"""
WITH scored AS (
  SELECT q.vec_id AS query_id, q.label AS query_label,
         c.vec_id AS neighbor_id, c.label AS neighbor_label,
         round({_ORACLE_COS.format(a='q.embedding', b='c.embedding')}, 6)
           AS cosine
  FROM embeddings q JOIN embeddings c
    ON q.vec_id <> c.vec_id AND q.label <> c.label
  WHERE q.vec_id < 10
),
ranked AS (
  SELECT query_id, query_label, neighbor_id, neighbor_label, cosine,
         CAST(row_number() OVER (PARTITION BY query_id
                                 ORDER BY cosine DESC, neighbor_id)
              AS INTEGER) AS rank
  FROM scored
)
SELECT query_id, query_label, neighbor_id, neighbor_label, cosine, rank
FROM ranked WHERE rank <= 5
"""

ENTRIES["embedding_hard_negatives"] = (
    embedding_hard_negatives,
    EMBEDDING_HARD_NEGATIVES_SQL,
)


# ---------------------------------------------------------------------------
def ann_ivfq8_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF + int8 scalar quantization (operators/similarity.py::
    ivfq8_topk, the FAISS "IVF,SQ8" composition): probe the 2 nearest of
    16 inverted lists, rank in-list candidates by exact-integer q8
    cosine — 4x less candidate bandwidth than IVF-flat at near-flat
    recall, the middle rung between ``ann_ivf_topk`` (float in-list
    scores) and ``ann_ivfpq_topk`` (8-byte codes).  Same query set /
    tie-breaks as the siblings so the quantization matrix is directly
    comparable.  The oracle rebuilds the identical index declaratively:
    the IVF CTEs are ``ANN_IVF_TOPK_SQL``'s, the q8 encode/score CTEs
    are ``ANN_Q8_TOPK_SQL``'s, composed."""
    emb = _emb(spark, sf_dir)
    # queries (vec_id < 10) and centroids (vec_id < 16) are id-prefixes
    # of the corpus: one 16-row head collect, sliced locally — the
    # ann_ivf_recall device (saves a driver job per relation).
    head = (
        emb.filter(F.col("vec_id") < 16)
        .select("vec_id", "embedding")
        .toPandas()
    )
    return S.ivfq8_topk(
        head[head["vec_id"] < 10],
        emb,
        num_centroids=16,
        nprobe=2,
        k=5,
        centroids=head.rename(columns={"vec_id": "centroid_id"}),
    )


ANN_IVFQ8_TOPK_SQL = f"""
WITH cent AS (
  SELECT vec_id AS centroid_id, embedding AS cv FROM embeddings WHERE vec_id < 16
),
assign0 AS (
  SELECT e.vec_id, c.centroid_id,
         round({_ORACLE_COS.format(a='e.embedding', b='c.cv')}, 6) AS c_cos
  FROM embeddings e, cent c
),
lists AS (
  SELECT vec_id, centroid_id FROM (
    SELECT vec_id, centroid_id,
           row_number() OVER (PARTITION BY vec_id ORDER BY c_cos DESC, centroid_id) AS rn
    FROM assign0
  ) WHERE rn = 1
),
probes AS (
  SELECT query_id, centroid_id FROM (
    SELECT vec_id AS query_id, centroid_id,
           row_number() OVER (PARTITION BY vec_id ORDER BY c_cos DESC, centroid_id) AS rn
    FROM assign0 WHERE vec_id < 10
  ) WHERE rn <= 2
),
cand AS (
  SELECT DISTINCT p.query_id, l.vec_id AS neighbor_id
  FROM probes p JOIN lists l ON p.centroid_id = l.centroid_id
  WHERE p.query_id <> l.vec_id
),
sized AS (
  SELECT vec_id, q,
         CAST(list_sum(list_transform(q, x -> x * x)) AS BIGINT) AS sq
  FROM (SELECT vec_id, {_ORACLE_Q8.format(v='embedding')} AS q FROM embeddings)
),
scored AS (
  SELECT c.query_id, c.neighbor_id,
         round(
           CAST(list_sum(list_transform(list_zip(a.q, b.q), x -> x[1] * x[2])) AS DOUBLE)
           / (sqrt(CAST(a.sq AS DOUBLE)) * sqrt(CAST(b.sq AS DOUBLE))), 6) AS q8_cosine
  FROM cand c
  JOIN sized a ON a.vec_id = c.query_id
  JOIN sized b ON b.vec_id = c.neighbor_id
)
SELECT query_id, neighbor_id, q8_cosine, rank FROM (
  SELECT query_id, neighbor_id, q8_cosine,
         CAST(row_number() OVER (PARTITION BY query_id
                                 ORDER BY q8_cosine DESC, neighbor_id) AS INTEGER) AS rank
  FROM scored
) WHERE rank <= 5
"""

ENTRIES["ann_ivfq8_topk"] = (ann_ivfq8_topk, ANN_IVFQ8_TOPK_SQL)


# ---------------------------------------------------------------------------
# ann_pq_topk (untrained first-16 codebook PQ) was RETIRED in round 12:
# strictly subsumed by ann_pq_trained_topk, which certifies pq_train AND
# pq_topk through the same ADC/nano-unit contract every rotation round
# (r11 verdict task 3 — at 154 entries each redundant certification
# displaced a due re-certification).  The untrained codebook path keeps
# operator-level coverage in tests/test_extensions.py (recall/memory
# shape), the plan pin in tests/test_plans.py, and the differential
# fuzz family (trained entry).  History: driver-green r10 (0.88x sf1).


# ---------------------------------------------------------------------------
def ann_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ composition (operators/similarity.py::ivfpq_topk): coarse
    quantizer probes 2 of 16 lists, PQ ADC integer nano-distances rank
    the probed candidates — the composed FAISS architecture that makes
    billion-vector search tractable.  Same deterministic first-N
    centroid/codebook devices and query set as the component queries."""
    emb = _emb(spark, sf_dir)
    return S.ivfpq_topk(emb.filter(F.col("vec_id") < 10), emb, k=3)


ANN_IVFPQ_TOPK_SQL = f"""
WITH cent AS (
  SELECT vec_id AS centroid_id, embedding AS cv FROM embeddings WHERE vec_id < 16
),
assign0 AS (
  SELECT e.vec_id, c.centroid_id,
         round({_ORACLE_COS.format(a='e.embedding', b='c.cv')}, 6) AS c_cos
  FROM embeddings e, cent c
),
lists AS (
  SELECT vec_id, centroid_id FROM (
    SELECT vec_id, centroid_id,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY c_cos DESC, centroid_id) AS rn
    FROM assign0
  ) WHERE rn = 1
),
probes AS (
  SELECT query_id, centroid_id FROM (
    SELECT vec_id AS query_id, centroid_id,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY c_cos DESC, centroid_id) AS rn
    FROM assign0 WHERE vec_id < 10
  ) WHERE rn <= 2
),
cb AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS code_id,
         embedding AS cbv
  FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT 16)
),
subs AS (SELECT s FROM range(0, 8) r(s)),
offs AS (SELECT j FROM range(1, 9) r(j)),
cd AS (
  SELECT e.vec_id, c.code_id, s.s,
         CAST(round(sum(pow(CAST(e.embedding[s.s * 8 + o.j] AS DOUBLE)
                            - CAST(c.cbv[s.s * 8 + o.j] AS DOUBLE), 2))
                    * 1e9) AS BIGINT) AS d2
  FROM embeddings e, cb c, subs s, offs o
  GROUP BY e.vec_id, c.code_id, s.s
),
enc AS (
  SELECT vec_id, s, code_id FROM (
    SELECT vec_id, s, code_id,
           row_number() OVER (PARTITION BY vec_id, s
                              ORDER BY d2, code_id) AS rn
    FROM cd) WHERE rn = 1
),
lut AS (SELECT vec_id AS query_id, code_id, s, d2 FROM cd WHERE vec_id < 10),
-- every corpus vector lives in exactly ONE list (rn = 1), so a probed
-- (query, neighbor) pair is unique without DISTINCT
scored AS (
  SELECT p.query_id, l.vec_id AS neighbor_id,
         CAST(sum(u.d2) AS BIGINT) AS pq_dist_nano
  FROM probes p
  JOIN lists l ON p.centroid_id = l.centroid_id AND p.query_id <> l.vec_id
  JOIN enc e ON e.vec_id = l.vec_id
  JOIN lut u ON u.query_id = p.query_id AND u.s = e.s
            AND u.code_id = e.code_id
  GROUP BY p.query_id, l.vec_id
)
SELECT query_id, neighbor_id, pq_dist_nano, rank FROM (
  SELECT query_id, neighbor_id, pq_dist_nano,
         CAST(row_number() OVER (PARTITION BY query_id
                                 ORDER BY pq_dist_nano, neighbor_id)
              AS INTEGER) AS rank
  FROM scored
) WHERE rank <= 3
"""

ENTRIES["ann_ivfpq_topk"] = (ann_ivfpq_topk, ANN_IVFPQ_TOPK_SQL)


# ---------------------------------------------------------------------------
def ann_pq_trained_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ ANN over a TRAINED codebook — the production path
    (operators/similarity.py::pq_train -> pq_topk): two fixed-seed,
    first-16-seeded Lloyd iterations per subspace, then ADC ranking with
    the trained codewords.  ``exact_nano=True`` makes the training loop
    itself engine-portable (integer nano assignment distances + exact
    BIGINT coordinate sums + truncating division), so the oracle replays
    BOTH Lloyd iterations declaratively — the codebook is re-derived in
    SQL, not echoed.  Same query set (vec_id < 10) / k / tie-breaks as
    the other ANN queries, so recall deltas across the family are
    directly attributable to the index."""
    emb = _emb(spark, sf_dir)
    cb = S.pq_train(emb, iterations=2, exact_nano=True)
    return S.pq_topk(
        emb.filter(F.col("vec_id") < 10), emb, k=3, codebook=cb
    )


# Unrolled 2-iteration Lloyd replay: cb0 (seed) -> assign/update -> cb1
# -> assign/update -> cb2 -> pq_topk scoring.  Codebooks live as scalar
# (code_id, dim, val) rows; subspace s = (p-1) // 8.  The update is
# exact integer arithmetic end-to-end: sum of nano-quantized coords
# (BIGINT), truncating `//` by the member count, one double division by
# 1e9 — bit-identical to pq_train(exact_nano=True) on any engine.
ANN_PQ_TRAINED_TOPK_SQL = """
WITH offs AS (SELECT CAST(p AS INTEGER) AS p FROM range(1, 65) r(p)),
cb0 AS (
  SELECT c.code_id, o.p, CAST(c.cv[o.p] AS DOUBLE) AS val
  FROM (
    SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS code_id,
           embedding AS cv
    FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT 16)
  ) c, offs o
),
x AS (
  SELECT e.vec_id, o.p, CAST((o.p - 1) // 8 AS INTEGER) AS s,
         CAST(e.embedding[o.p] AS DOUBLE) AS val,
         CAST(round(CAST(e.embedding[o.p] AS DOUBLE) * 1e9) AS BIGINT)
           AS val_nano
  FROM embeddings e, offs o
),
d1 AS (
  SELECT x.vec_id, c.code_id, x.s,
         CAST(round(sum(pow(x.val - c.val, 2)) * 1e9) AS BIGINT) AS d2
  FROM x JOIN cb0 c ON c.p = x.p
  GROUP BY x.vec_id, c.code_id, x.s
),
a1 AS (
  SELECT vec_id, s, code_id FROM (
    SELECT vec_id, s, code_id,
           row_number() OVER (PARTITION BY vec_id, s
                              ORDER BY d2, code_id) AS rn
    FROM d1) WHERE rn = 1
),
u1 AS (
  SELECT a.code_id, x.p, sum(x.val_nano) AS sm, count(*) AS cnt
  FROM a1 a JOIN x ON x.vec_id = a.vec_id AND x.s = a.s
  GROUP BY a.code_id, x.p
),
cb1 AS (
  SELECT c.code_id, c.p,
         COALESCE(CAST(u.sm // u.cnt AS DOUBLE) / 1e9, c.val) AS val
  FROM cb0 c LEFT JOIN u1 u ON u.code_id = c.code_id AND u.p = c.p
),
d2it AS (
  SELECT x.vec_id, c.code_id, x.s,
         CAST(round(sum(pow(x.val - c.val, 2)) * 1e9) AS BIGINT) AS d2
  FROM x JOIN cb1 c ON c.p = x.p
  GROUP BY x.vec_id, c.code_id, x.s
),
a2 AS (
  SELECT vec_id, s, code_id FROM (
    SELECT vec_id, s, code_id,
           row_number() OVER (PARTITION BY vec_id, s
                              ORDER BY d2, code_id) AS rn
    FROM d2it) WHERE rn = 1
),
u2 AS (
  SELECT a.code_id, x.p, sum(x.val_nano) AS sm, count(*) AS cnt
  FROM a2 a JOIN x ON x.vec_id = a.vec_id AND x.s = a.s
  GROUP BY a.code_id, x.p
),
cb2 AS (
  SELECT c.code_id, c.p,
         COALESCE(CAST(u.sm // u.cnt AS DOUBLE) / 1e9, c.val) AS val
  FROM cb1 c LEFT JOIN u2 u ON u.code_id = c.code_id AND u.p = c.p
),
cd AS (
  SELECT x.vec_id, c.code_id, x.s,
         CAST(round(sum(pow(x.val - c.val, 2)) * 1e9) AS BIGINT) AS d2
  FROM x JOIN cb2 c ON c.p = x.p
  GROUP BY x.vec_id, c.code_id, x.s
),
enc AS (
  SELECT vec_id, s, code_id FROM (
    SELECT vec_id, s, code_id,
           row_number() OVER (PARTITION BY vec_id, s
                              ORDER BY d2, code_id) AS rn
    FROM cd) WHERE rn = 1
),
lut AS (SELECT vec_id AS query_id, code_id, s, d2 FROM cd WHERE vec_id < 10),
scored AS (
  SELECT l.query_id, e.vec_id AS neighbor_id,
         CAST(sum(l.d2) AS BIGINT) AS pq_dist_nano
  FROM enc e JOIN lut l ON l.s = e.s AND l.code_id = e.code_id
  WHERE l.query_id <> e.vec_id
  GROUP BY l.query_id, e.vec_id
)
SELECT query_id, neighbor_id, pq_dist_nano, rank FROM (
  SELECT query_id, neighbor_id, pq_dist_nano,
         CAST(row_number() OVER (PARTITION BY query_id
                                 ORDER BY pq_dist_nano, neighbor_id)
              AS INTEGER) AS rank
  FROM scored
) WHERE rank <= 3
"""

ENTRIES["ann_pq_trained_topk"] = (ann_pq_trained_topk, ANN_PQ_TRAINED_TOPK_SQL)


# ---------------------------------------------------------------------------
def embedding_finite_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector finiteness audit (operators/similarity.py::finite_gate)
    — the contract step before any ANN/near-dup operator: NaN/Inf
    ELEMENTS are upstream model corruption and the engines disagree
    structurally on them (probed round 10: NaN cosine sorts first in
    DuckDB, nulls in Spark; non-finite casts error).  Quarantine
    is_clean = false rows at ingest."""
    return S.finite_gate(_emb(spark, sf_dir)).orderBy("vec_id")


EMBEDDING_FINITE_GATE_SQL = """
SELECT vec_id,
       CAST(len(list_filter(embedding, x -> isnan(x) OR isinf(x)))
            AS INTEGER) AS n_nonfinite,
       len(list_filter(embedding, x -> isnan(x) OR isinf(x))) = 0
         AS is_clean
FROM embeddings
ORDER BY vec_id
"""

ENTRIES["embedding_finite_gate"] = (
    embedding_finite_gate,
    EMBEDDING_FINITE_GATE_SQL,
)


# ---------------------------------------------------------------------------
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-doc repetition signals — the quality gate that catches
    degenerate/boilerplate text (looped generations, copy-paste spans):
    longest consecutive same-token run + duplicate token/bigram fractions.

    Everything is computed IN-ROW (one aggregate fold for the run length,
    array_distinct for the fractions) — a pure projection over the scan,
    zero shuffles; integer ratios are bit-exact against the oracle, which
    computes the run via gaps-and-islands windows instead.
    """
    docs = _docs(spark, sf_dir, spread=True)
    # single-token guard on BOTH folds: sequence(2, 1) is DESCENDING in
    # Spark ([2, 1]), so an unguarded fold would element_at out of range
    # and crash the whole query on any no-space document (the oracle
    # returns a row for it — run 1, zero bigrams, NULL bigram frac)
    max_run = (
        "IF(size(t) < 2, CAST(1 AS BIGINT), "
        "aggregate(sequence(2, size(t)), "
        "named_struct('cur', CAST(1 AS BIGINT), 'best', CAST(1 AS BIGINT)), "
        "(acc, i) -> IF(element_at(t, i) = element_at(t, i - 1), "
        "named_struct('cur', acc.cur + CAST(1 AS BIGINT), "
        "'best', greatest(acc.best, acc.cur + CAST(1 AS BIGINT))), "
        "named_struct('cur', CAST(1 AS BIGINT), 'best', acc.best)), "
        "acc -> acc.best))"
    )
    bigrams = (
        "IF(size(t) < 2, array(), "
        "transform(sequence(1, size(t) - 1), "
        "i -> concat(element_at(t, i), ' ', element_at(t, i + 1))))"
    )
    return (
        docs.select("doc_id", F.split("text", " ").alias("t"))
        .select(
            "doc_id",
            F.size("t").cast("bigint").alias("n_tokens"),
            F.size(F.array_distinct("t")).cast("bigint").alias("n_distinct"),
            F.expr(max_run).alias("max_run"),
            F.size(F.array_distinct(F.expr(bigrams)))
            .cast("bigint")
            .alias("n_distinct_bigrams"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "n_distinct",
            "max_run",
            F.round(
                F.lit(1.0) - F.col("n_distinct") / F.col("n_tokens"), 6
            ).alias("dup_token_frac"),
            # try_divide: a 1-token doc has zero bigram slots — NULL frac
            # in BOTH engines (ANSI Spark would otherwise error the query
            # where DuckDB's x/0 yields NULL)
            F.round(
                F.lit(1.0)
                - F.try_divide(
                    F.col("n_distinct_bigrams"), F.col("n_tokens") - 1
                ),
                6,
            ).alias("dup_bigram_frac"),
        )
        .orderBy("doc_id")
    )


TEXT_REPETITION_SQL = """
WITH nums AS (SELECT i FROM range(1, 4001) r(i)),
toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
tok AS (SELECT doc_id, i AS p, t[i] AS token FROM toks JOIN nums ON i <= len(t)),
isl AS (
  SELECT doc_id, token,
         p - row_number() OVER (PARTITION BY doc_id, token ORDER BY p) AS island
  FROM tok
),
runs AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS run_len
  FROM isl GROUP BY doc_id, token, island
),
base AS (
  SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens,
         CAST(len(list_distinct(t)) AS BIGINT) AS n_distinct,
         CAST(len(list_distinct(list_transform(range(1, len(t)),
              i -> t[i] || ' ' || t[i+1]))) AS BIGINT) AS n_distinct_bigrams
  FROM toks
)
SELECT b.doc_id, n_tokens, n_distinct,
       (SELECT max(run_len) FROM runs r WHERE r.doc_id = b.doc_id) AS max_run,
       round(1.0 - CAST(n_distinct AS DOUBLE) / n_tokens, 6) AS dup_token_frac,
       round(1.0 - CAST(n_distinct_bigrams AS DOUBLE) / (n_tokens - 1), 6) AS dup_bigram_frac
FROM base b
ORDER BY doc_id
"""

ENTRIES["text_repetition"] = (text_repetition, TEXT_REPETITION_SQL)


# ---------------------------------------------------------------------------
def events_asof_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution via AS-OF join: each purchase picks up the
    most recent click at-or-before it for the same user — the classic
    time-series operator Spark's built-in join zoo lacks (implemented as
    the single-shuffle union+window merge in
    ``operators/joins.py::asof_join_backward``; DuckDB's native
    ``ASOF JOIN`` is the oracle).  Clicks are pre-aggregated to one row
    per (user, ts) (max event_id) so ties are deterministic."""
    from ..operators.joins import asof_join_backward
    from ..sources.files import read_table

    ev = read_table(spark, sf_dir, "events")
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_id"))
        .withColumn("click_us", epoch_us("ts"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", "ts"
    )
    joined = asof_join_backward(
        purchases, clicks, "user_id", "ts", ["click_id", "click_us"]
    )
    return (
        joined.select(
            "purchase_id",
            "user_id",
            "click_id",
            (epoch_us("ts") - F.col("click_us")).alias("gap_us"),
        )
        .orderBy("purchase_id")
    )


EVENTS_ASOF_SQL = """
WITH clicks AS (
  SELECT user_id, ts, max(event_id) AS click_id
  FROM events WHERE event_type = 'click' GROUP BY user_id, ts
),
purchases AS (
  SELECT event_id AS purchase_id, user_id, ts
  FROM events WHERE event_type = 'purchase'
)
SELECT p.purchase_id, p.user_id, c.click_id,
       epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
FROM purchases p ASOF LEFT JOIN clicks c
  ON p.user_id = c.user_id AND p.ts >= c.ts
ORDER BY p.purchase_id
"""

ENTRIES["events_asof_attribution"] = (events_asof_attribution, EVENTS_ASOF_SQL)


# ---------------------------------------------------------------------------
def sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack documents into ~2048-token training shards, per source: doc d
    goes to bin floor(exclusive-cumulative-tokens / 2048) in stable
    doc_id order.  The sharding step that turns a cleaned corpus into
    fixed-budget sequences for a trainer.

    Partitioned by source so the running sum never needs a global
    single-partition window — each source packs independently (exactly
    how sharded corpus builds run; a skewed source bounds one task, not
    the job).  Integer cumsums are engine-exact.
    """
    docs = _docs(spark, sf_dir)
    from pyspark.sql import Window

    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    toks = docs.select(
        "doc_id", "source", F.size(F.split("text", " ")).cast("bigint").alias("n_toks")
    )
    packed = toks.withColumn(
        "bin_id",
        F.floor((F.sum("n_toks").over(w) - F.col("n_toks")) / F.lit(2048)).cast(
            "bigint"
        ),
    )
    return (
        packed.groupBy("source", "bin_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_toks").alias("bin_tokens"),
            F.min("doc_id").alias("first_doc_id"),
        )
        .orderBy("source", "bin_id")
    )


SEQUENCE_PACKING_SQL = """
WITH toks AS (
  SELECT doc_id, source,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks
  FROM documents
),
packed AS (
  SELECT doc_id, source, n_toks,
         CAST(floor((sum(n_toks) OVER (PARTITION BY source ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_toks)
              / 2048) AS BIGINT) AS bin_id
  FROM toks
)
SELECT source, bin_id, count(*) AS n_docs,
       CAST(sum(n_toks) AS BIGINT) AS bin_tokens,
       min(doc_id) AS first_doc_id
FROM packed GROUP BY source, bin_id ORDER BY source, bin_id
"""

ENTRIES["sequence_packing"] = (sequence_packing, SEQUENCE_PACKING_SQL)


# ---------------------------------------------------------------------------
def source_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source mixture table: token shares and the up/down-sampling
    weight that flattens the mix to uniform — the knob a training
    pipeline turns to rebalance domains before sampling.

    One groupBy(source), then totals via an unpartitioned window over
    the RESULT (sources-cardinality, a few rows — not the corpus), so the
    parquet is scanned once; weights are ratios of integer token counts,
    so they hash exactly.
    """
    from pyspark.sql import Window

    docs = _docs(spark, sf_dir)
    per_source = (
        docs.select(
            "source", F.size(F.split("text", " ")).cast("bigint").alias("n_toks")
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_toks").alias("n_tokens"),
        )
    )
    w = Window.partitionBy()
    return (
        per_source.withColumn("tot_tokens", F.sum("n_tokens").over(w))
        .withColumn("n_sources", F.count(F.lit(1)).over(w))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            F.round(F.col("n_tokens") / F.col("tot_tokens"), 6).alias(
                "token_share"
            ),
            F.round(
                F.col("tot_tokens")
                / (F.col("n_sources") * F.col("n_tokens")),
                6,
            ).alias("uniform_weight"),
        )
        .orderBy("source")
    )


SOURCE_MIXTURE_SQL = """
WITH per_source AS (
  SELECT source, count(*) AS n_docs,
         CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source
),
totals AS (
  SELECT CAST(sum(n_tokens) AS BIGINT) AS tot_tokens,
         count(*) AS n_sources
  FROM per_source
)
SELECT source, n_docs, n_tokens,
       round(CAST(n_tokens AS DOUBLE) / tot_tokens, 6) AS token_share,
       round(CAST(tot_tokens AS DOUBLE) / (n_sources * n_tokens), 6) AS uniform_weight
FROM per_source, totals
ORDER BY source
"""

ENTRIES["source_mixture"] = (source_mixture, SOURCE_MIXTURE_SQL)

# ---------------------------------------------------------------------------
def boilerplate_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document boilerplate fraction: the share of a doc's 8-token
    chunks whose hash appears in >= 2 distinct documents (C4/RefinedWeb
    style header/footer/nav detection).  ``passage_dedup`` reports the
    repeated chunks themselves; this is the downstream per-doc filter
    signal a cleaning pipeline thresholds on.

    Chunk hashes are built IN-ROW (transform over sequence, md5 per
    chunk); the shuffles are the groupBy on the 16-byte hash, a
    hash-keyed join back, and the final doc_id groupBy — all linear in
    corpus size, nothing doc- or corpus-sized is broadcast.
    """
    docs = _docs(spark, sf_dir, spread=True)
    inst = docs.select(
        "doc_id", F.explode(F.expr(_CHUNK8_EXPR)).alias("chunk_hash")
    )
    ndocs = (
        inst.distinct()
        .groupBy("chunk_hash")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    return (
        inst.join(ndocs, "chunk_hash")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum(F.when(F.col("n_docs") >= 2, 1).otherwise(0))
            .cast("bigint")
            .alias("n_boilerplate"),
        )
        .withColumn(
            "boilerplate_ratio",
            F.round(F.col("n_boilerplate") / F.col("n_chunks"), 6),
        )
        .orderBy("doc_id")
    )


BOILERPLATE_RATIO_SQL = f"""
WITH {_ORACLE_CHUNK8.strip()},
ndocs AS (
  SELECT chunk_hash, count(*) AS n_docs
  FROM (SELECT DISTINCT doc_id, chunk_hash FROM chunk8) GROUP BY chunk_hash
)
SELECT i.doc_id, count(*) AS n_chunks,
       CAST(sum(CASE WHEN n.n_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_boilerplate,
       round(CAST(sum(CASE WHEN n.n_docs >= 2 THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6)
         AS boilerplate_ratio
FROM chunk8 i JOIN ndocs n USING (chunk_hash)
GROUP BY i.doc_id ORDER BY i.doc_id
"""


# ---------------------------------------------------------------------------
def doc_chunk_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-style chunking manifest: 64-token windows with stride 48
    (16-token overlap), one manifest row per document carrying the chunk
    count and an order-sensitive fingerprint (md5 of the concatenated
    per-chunk hashes).

    All chunking work is IN-ROW with transform/sequence/slice — pure
    whole-stage codegen, embarrassingly parallel at 100 TB (the only
    exchanges are the local-mode input spread and the final
    presentation sort; neither grows with chunk count).  The
    fingerprint makes the full chunk list verifiable without emitting
    n_chunks rows per doc.
    """
    docs = _docs(spark, sf_dir, spread=True)
    t = "split(text,' ')"
    nw = f"(CAST(floor((size({t}) - 1) / 48) AS INT) + 1)"
    chunk_hashes = (
        f"transform(sequence(0, {nw} - 1), "
        f"s -> md5(concat_ws(' ', slice({t}, s*48+1, 64))))"
    )
    return (
        docs.select(
            "doc_id",
            F.size(F.expr(t)).cast("bigint").alias("n_tokens"),
            F.expr(f"CAST({nw} AS BIGINT)").alias("n_chunks"),
            F.expr(
                f"CAST(size({t}) - ({nw} - 1) * 48 AS BIGINT)"
            ).alias("last_chunk_tokens"),
            # NULL-text guard: concat_ws treats a NULL array as '', so an
            # unguarded md5 would fingerprint a NULL doc as md5('') while
            # the oracle's md5(NULL) stays NULL — propagate the NULL
            F.expr(
                f"CASE WHEN {nw} IS NULL THEN NULL "
                f"ELSE md5(concat_ws('', {chunk_hashes})) END"
            ).alias("chunk_fingerprint"),
        )
        .orderBy("doc_id")
    )


DOC_CHUNK_MANIFEST_SQL = """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t,
         CAST(floor((len(string_split(text, ' ')) - 1) / 48) AS INT) + 1 AS nw
  FROM documents
)
SELECT doc_id,
       CAST(len(t) AS BIGINT) AS n_tokens,
       CAST(nw AS BIGINT) AS n_chunks,
       CAST(len(t) - (nw - 1) * 48 AS BIGINT) AS last_chunk_tokens,
       md5(array_to_string(
         list_transform(generate_series(0, nw - 1),
                        s -> md5(array_to_string(t[s*48+1 : s*48+64], ' '))),
         '')) AS chunk_fingerprint
FROM toks ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
def quality_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus-cleaning funnel: how many docs/tokens survive
    each successive stage — language gate (stopword ratio >= 0.05),
    quality gate (score >= 0.5), exact-dedup keeper (first doc_id per
    md5(text)).  The shape every training-data pipeline reports before
    committing a crawl snapshot.

    Per-doc stats are IN-ROW (array_distinct / filter on the token
    array — no explode+groupBy), the dedup keeper is one window over
    the 16-byte text hash, and the funnel itself is a single global
    aggregate unpivoted with stack().  One corpus scan total.
    """
    from pyspark.sql import Window

    docs = _docs(spark, sf_dir, spread=True)
    stops = "('the','a','of','to','in','and','is')"
    per = docs.select(
        "doc_id",
        F.md5("text").alias("th"),
        F.expr("CAST(size(split(text,' ')) AS BIGINT)").alias("n_tokens"),
        F.expr(
            "CAST(size(array_distinct(split(text,' '))) AS BIGINT)"
        ).alias("n_distinct"),
        F.expr(
            f"CAST(size(filter(split(text,' '), x -> x IN {stops})) AS BIGINT)"
        ).alias("stop_hits"),
    )
    flagged = per.select(
        "n_tokens",
        (
            F.round(F.col("stop_hits") / F.col("n_tokens"), 6) >= 0.05
        ).alias("is_en"),
        (
            F.round(
                F.least(F.lit(1.0), F.col("n_tokens") / 100.0) * 0.5
                + F.col("n_distinct") / F.col("n_tokens") * 0.5,
                6,
            )
            >= 0.5
        ).alias("is_quality"),
        (
            F.row_number().over(
                Window.partitionBy("th").orderBy("doc_id")
            )
            == 1
        ).alias("is_keeper"),
    )
    agg = flagged.agg(
        F.count(F.lit(1)).alias("d0"),
        F.sum("n_tokens").alias("t0"),
        F.sum(F.when(F.col("is_en"), 1).otherwise(0)).alias("d1"),
        F.sum(F.when(F.col("is_en"), F.col("n_tokens")).otherwise(0)).alias("t1"),
        F.sum(
            F.when(F.col("is_en") & F.col("is_quality"), 1).otherwise(0)
        ).alias("d2"),
        F.sum(
            F.when(
                F.col("is_en") & F.col("is_quality"), F.col("n_tokens")
            ).otherwise(0)
        ).alias("t2"),
        F.sum(
            F.when(
                F.col("is_en") & F.col("is_quality") & F.col("is_keeper"), 1
            ).otherwise(0)
        ).alias("d3"),
        F.sum(
            F.when(
                F.col("is_en") & F.col("is_quality") & F.col("is_keeper"),
                F.col("n_tokens"),
            ).otherwise(0)
        ).alias("t3"),
    )
    return (
        agg.selectExpr(
            "stack(4, "
            "'0_total', d0, t0, "
            "'1_lang_en', d1, t1, "
            "'2_quality', d2, t2, "
            "'3_dedup_keeper', d3, t3) AS (stage, n_docs, n_tokens)",
            "d0 AS total_docs",
        )
        .select(
            "stage",
            F.col("n_docs").cast("bigint").alias("n_docs"),
            F.col("n_tokens").cast("bigint").alias("n_tokens"),
            F.round(F.col("n_docs") / F.col("total_docs"), 6).alias("doc_pct"),
        )
        .orderBy("stage")
    )


QUALITY_FUNNEL_SQL = """
WITH per AS (
  SELECT doc_id, md5(text) AS th,
         CAST(len(string_split(text,' ')) AS BIGINT) AS n_tokens,
         CAST(len(list_distinct(string_split(text,' '))) AS BIGINT) AS n_distinct,
         CAST(len(list_filter(string_split(text,' '),
              x -> x IN ('the','a','of','to','in','and','is'))) AS BIGINT) AS stop_hits
  FROM documents
),
flagged AS (
  SELECT n_tokens,
         round(CAST(stop_hits AS DOUBLE)/n_tokens, 6) >= 0.05 AS is_en,
         round(least(1.0, n_tokens/100.0)*0.5
               + CAST(n_distinct AS DOUBLE)/n_tokens*0.5, 6) >= 0.5 AS is_quality,
         row_number() OVER (PARTITION BY th ORDER BY doc_id) = 1 AS is_keeper
  FROM per
),
agg AS (
  SELECT count(*) AS d0, CAST(sum(n_tokens) AS BIGINT) AS t0,
         CAST(sum(CASE WHEN is_en THEN 1 ELSE 0 END) AS BIGINT) AS d1,
         CAST(sum(CASE WHEN is_en THEN n_tokens ELSE 0 END) AS BIGINT) AS t1,
         CAST(sum(CASE WHEN is_en AND is_quality THEN 1 ELSE 0 END) AS BIGINT) AS d2,
         CAST(sum(CASE WHEN is_en AND is_quality THEN n_tokens ELSE 0 END) AS BIGINT) AS t2,
         CAST(sum(CASE WHEN is_en AND is_quality AND is_keeper THEN 1 ELSE 0 END) AS BIGINT) AS d3,
         CAST(sum(CASE WHEN is_en AND is_quality AND is_keeper THEN n_tokens ELSE 0 END) AS BIGINT) AS t3
  FROM flagged
)
SELECT stage, n_docs, n_tokens, round(CAST(n_docs AS DOUBLE) / d0, 6) AS doc_pct
FROM (
  SELECT '0_total' AS stage, d0 AS n_docs, t0 AS n_tokens, d0 FROM agg
  UNION ALL SELECT '1_lang_en', d1, t1, d0 FROM agg
  UNION ALL SELECT '2_quality', d2, t2, d0 FROM agg
  UNION ALL SELECT '3_dedup_keeper', d3, t3, d0 FROM agg
)
ORDER BY stage
"""

ENTRIES["boilerplate_ratio"] = (boilerplate_ratio, BOILERPLATE_RATIO_SQL)
ENTRIES["doc_chunk_manifest"] = (doc_chunk_manifest, DOC_CHUNK_MANIFEST_SQL)


# ---------------------------------------------------------------------------
# Content-defined chunking (CDC): the rsync/LBFS boundary trick — a chunk
# ends wherever a rolling hash of the last 8 characters hits 0 mod 64, so
# boundaries are a function of CONTENT, not position.  Insert a paragraph
# at the front of a document and every fixed-size chunk after it changes;
# CDC boundaries re-synchronize at the first untouched window, so all
# downstream chunks keep their hashes — the property that makes
# chunk-level dedup incremental at 100 TB (only genuinely new chunks are
# new).  Pure integer arithmetic → bit-exact on any partitioning.
_CDC_B, _CDC_M, _CDC_MASK = 257, 1_000_003, 64
_CDC_CAP = 4000  # same explicit both-engine cap as the 4000-token rule


def _cdc_hash_terms(cap: str, pos: str) -> str:
    """The 8-term window polynomial Σ ascii(cap[pos-7+t]) * B^(7-t) mod M,
    spelled identically for Spark SQL and DuckDB (both have ascii/substr
    with 1-based offsets; every term is BIGINT so the ~2e9 sum never
    touches 32-bit overflow)."""
    terms = " + ".join(
        f"CAST(ascii(substr({cap}, {pos}-{7 - t}, 1)) AS BIGINT) * "
        f"{pow(_CDC_B, 7 - t, _CDC_M)}"
        for t in range(8)
    )
    return f"(({terms}) % {_CDC_M})"


# Shared by doc_cdc_chunks and doc_cdc_dup_chunks — the two queries MUST
# agree on chunk identity (the dedup ledger reports savings for chunks
# the manifest query produces), so the boundary machinery exists ONCE:
# in-row Spark expressions here, the oracle CTE prefix in
# _cdc_oracle_ctes().
_CDC_PREV = "CASE WHEN j = 0 THEN 0 ELSE element_at(ends, j) END"


def _cdc_ends_expr() -> str:
    """In-row chunk-end positions: interior rolling-hash boundaries plus
    the final text length; NULL text -> NULL, empty -> array()."""
    pred = f"{_cdc_hash_terms('cap', 'i')} % {_CDC_MASK} = 0"
    return (
        "CASE WHEN cap IS NULL THEN NULL "
        "WHEN length(cap) = 0 THEN array() "
        "ELSE array_distinct(concat("
        "  CASE WHEN length(cap) >= 8 "
        f"       THEN filter(sequence(8, length(cap)), i -> {pred}) "
        "       ELSE array() END, "
        "  array(length(cap)))) END"
    )


def _cdc_oracle_ctes() -> str:
    """The oracle's shared boundary prefix: docs (capped), interior
    boundaries, union'd ends, and lag-derived chunk spans."""
    return f"""
WITH nums AS (SELECT CAST(i AS INTEGER) AS i FROM range(1, {_CDC_CAP + 1}) r(i)),
docs AS (SELECT doc_id, substr(text, 1, {_CDC_CAP}) AS cap FROM documents),
b AS (
  SELECT d.doc_id, CAST(n.i AS BIGINT) AS e
  FROM docs d JOIN nums n ON n.i BETWEEN 8 AND length(d.cap)
  WHERE {_cdc_hash_terms('d.cap', 'n.i')} % {_CDC_MASK} = 0
),
ends AS (
  SELECT doc_id, e FROM b
  UNION
  SELECT doc_id, length(cap) AS e FROM docs WHERE length(cap) >= 1
),
chunks AS (
  SELECT doc_id, e,
         coalesce(lag(e) OVER (PARTITION BY doc_id ORDER BY e), 0) AS prev
  FROM ends
)"""


def doc_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document CDC manifest: chunk count, longest chunk, and an
    order-sensitive fingerprint (md5 of the concatenated per-chunk md5s,
    the ``doc_chunk_manifest`` convention) under content-defined
    boundaries (rolling 8-char hash == 0 mod 64, final boundary at end
    of text).

    Everything is IN-ROW with filter/sequence/transform higher-order
    functions — whole-stage codegen, zero Python, zero shuffles beyond
    the input spread and presentation sort; the chunk list itself never
    leaves the row.  NULL text propagates NULL; empty text is 0 chunks.
    """
    docs = _docs(spark, sf_dir, spread=True)
    prev = _CDC_PREV
    return (
        docs.select(
            "doc_id", F.expr(f"substr(text, 1, {_CDC_CAP})").alias("cap")
        )
        .select("doc_id", "cap", F.expr(_cdc_ends_expr()).alias("ends"))
        .select(
            "doc_id",
            F.expr("CAST(length(cap) AS BIGINT)").alias("n_chars"),
            F.expr("CAST(size(ends) AS BIGINT)").alias("n_chunks"),
            F.expr(
                f"CAST(array_max(transform(ends, (e, j) -> e - ({prev})))"
                " AS BIGINT)"
            ).alias("max_chunk_len"),
            F.expr(
                "CASE WHEN ends IS NULL OR size(ends) = 0 THEN NULL "
                "ELSE md5(concat_ws('', transform(ends, (e, j) -> "
                f"md5(substr(cap, ({prev}) + 1, e - ({prev})))))) END"
            ).alias("chunk_fingerprint"),
        )
        .orderBy("doc_id")
    )


DOC_CDC_CHUNKS_SQL = f"""{_cdc_oracle_ctes()},
per AS (
  SELECT c.doc_id,
         CAST(count(*) AS BIGINT) AS n_chunks,
         CAST(max(e - prev) AS BIGINT) AS max_chunk_len,
         md5(string_agg(md5(substr(d.cap, CAST(prev + 1 AS INTEGER),
                                   CAST(e - prev AS INTEGER))),
                        '' ORDER BY e)) AS chunk_fingerprint
  FROM chunks c JOIN docs d USING (doc_id)
  GROUP BY c.doc_id
)
SELECT d.doc_id,
       CAST(length(d.cap) AS BIGINT) AS n_chars,
       coalesce(p.n_chunks,
                CASE WHEN d.cap IS NULL THEN NULL ELSE CAST(0 AS BIGINT) END)
         AS n_chunks,
       p.max_chunk_len,
       p.chunk_fingerprint
FROM docs d LEFT JOIN per p USING (doc_id)
ORDER BY doc_id
"""

ENTRIES["doc_cdc_chunks"] = (doc_cdc_chunks, DOC_CDC_CHUNKS_SQL)


# ---------------------------------------------------------------------------
def doc_cdc_dup_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The payoff half of content-defined chunking: the cross-document
    chunk-dedup ledger.  Same in-row boundary machinery as
    ``doc_cdc_chunks``, but the chunk (md5, len) list EXPLODES into a
    corpus-wide relation and groups by content hash — every chunk hash
    occurring more than once is storage/training duplication that
    chunk-level dedup would eliminate, quantified as
    ``saved_chars = (n_occurrences - 1) * chunk_len`` (chunk_len is a
    function of the hash: identical content, identical length).  At
    sf0.01 the synthetic corpus carries ~215 duplicated chunk hashes,
    one shared by 38 docs — the planted passage reuse, surfaced at
    chunk granularity.  All-integer arithmetic: no rounding anywhere.

    Plan shape: explode -> one hash aggregate keyed on the 16-byte
    chunk hash (partial count/max map-side; count(DISTINCT doc_id)
    expands to the standard two-level aggregate, still key-partitioned
    — no window, no join)."""
    docs = _docs(spark, sf_dir, spread=True)
    prev = _CDC_PREV
    chunk_structs = (
        "transform(ends, (e, j) -> named_struct("
        f"'h', md5(substr(cap, ({prev}) + 1, e - ({prev}))), "
        f"'l', CAST(e - ({prev}) AS BIGINT)))"
    )
    return (
        docs.select(
            "doc_id", F.expr(f"substr(text, 1, {_CDC_CAP})").alias("cap")
        )
        .select("doc_id", "cap", F.expr(_cdc_ends_expr()).alias("ends"))
        .select("doc_id", F.explode(F.expr(chunk_structs)).alias("c"))
        .groupBy(F.col("c.h").alias("chunk_md5"))
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
            F.max("c.l").alias("chunk_len"),
            ((F.count(F.lit(1)) - 1) * F.max("c.l")).alias("saved_chars"),
        )
        .filter(F.col("n_occurrences") >= 2)
    )


DOC_CDC_DUP_CHUNKS_SQL = f"""{_cdc_oracle_ctes()},
ch AS (
  SELECT c.doc_id,
         md5(substr(d.cap, CAST(prev + 1 AS INTEGER),
                    CAST(e - prev AS INTEGER))) AS h,
         CAST(e - prev AS BIGINT) AS l
  FROM chunks c JOIN docs d USING (doc_id)
)
SELECT h AS chunk_md5,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(count(*) AS BIGINT) AS n_occurrences,
       max(l) AS chunk_len,
       CAST((count(*) - 1) * max(l) AS BIGINT) AS saved_chars
FROM ch
GROUP BY h
HAVING count(*) >= 2
"""

ENTRIES["doc_cdc_dup_chunks"] = (doc_cdc_dup_chunks, DOC_CDC_DUP_CHUNKS_SQL)
ENTRIES["quality_funnel"] = (quality_funnel, QUALITY_FUNNEL_SQL)


# ---------------------------------------------------------------------------
def bpe_merge_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First BPE-trainer iteration: corpus-weighted counts of adjacent
    character pairs, ranked — the merge candidates a byte-pair-encoding
    tokenizer would fuse first.

    The scale trick is the classic one from tokenizer training: collapse
    the corpus to its word VOCABULARY first (one corpus-cardinality
    groupBy carrying only (word, freq)), then enumerate symbol pairs over
    vocab entries in-row and aggregate freq-weighted counts.  After the
    first agg every relation is vocab-cardinality — at 100 TB the corpus
    is touched once, and pair counting costs the same as at 1 GB.
    """
    docs = _docs(spark, sf_dir, spread=True)
    vocab = (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    # Guard 1-char words: Spark's sequence(1, 0) is DESCENDING, so an
    # unguarded transform would fabricate junk pairs.
    pairs = vocab.select(
        "freq",
        F.explode(
            F.expr(
                "CASE WHEN length(word) >= 2 THEN "
                "transform(sequence(1, length(word) - 1), "
                "i -> concat(substr(word, i, 1), ' ', substr(word, i + 1, 1))) "
                "ELSE array() END"
            )
        ).alias("pair"),
    )
    return (
        pairs.groupBy("pair")
        .agg(
            F.sum("freq").alias("pair_count"),
            F.count(F.lit(1)).alias("n_vocab_positions"),
        )
        .orderBy(F.desc("pair_count"), "pair")
        .limit(20)
    )


BPE_MERGE_CANDIDATES_SQL = f"""
WITH {_ORACLE_TOKS.strip()},
vocab AS (SELECT token AS word, count(*) AS freq FROM tok GROUP BY token),
pairs AS (
  SELECT substr(word, i, 1) || ' ' || substr(word, i+1, 1) AS pair, freq
  FROM vocab JOIN nums ON i <= length(word) - 1
)
SELECT pair, CAST(sum(freq) AS BIGINT) AS pair_count, count(*) AS n_vocab_positions
FROM pairs GROUP BY pair ORDER BY pair_count DESC, pair LIMIT 20
"""

ENTRIES["bpe_merge_candidates"] = (bpe_merge_candidates, BPE_MERGE_CANDIDATES_SQL)


# ---------------------------------------------------------------------------
def mixture_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the ``source_mixture`` uniform weights: deterministically
    down-sample over-represented sources by content-stable hash and
    report the resulting mix — the second half of domain rebalancing
    (``source_mixture`` computes the knob; this turns it).

    A doc survives iff md5_bucket(doc_id)/1e6 < tot/(n_sources·n_tok_s),
    evaluated as the integer cross-product ``bucket·ns·nt_s < tot·1e6``
    so both engines decide every boundary doc identically (no float
    division in the keep decision; at 100 TB token counts the product
    needs 128-bit math — DuckDB's HUGEINT does it natively, Spark would
    move to DECIMAL(38,0) — at any bench SF it fits BIGINT comfortably).

    Plan shape: one aggregate pass builds the per-source rate relation
    (sources-cardinality — a few rows), which broadcast-joins back into
    a second map-side pass over the corpus; docs never shuffle.  The
    final shares are a window over the per-source result.
    """
    from pyspark.sql import Window

    docs = _docs(spark, sf_dir)
    per_source = (
        docs.select(
            "source", F.size(F.split("text", " ")).cast("bigint").alias("n_toks")
        )
        .groupBy("source")
        .agg(F.sum("n_toks").alias("src_tokens"))
    )
    w = Window.partitionBy()
    rates = per_source.select(
        "source",
        "src_tokens",
        F.sum("src_tokens").over(w).alias("tot_tokens"),
        F.count(F.lit(1)).over(w).alias("n_sources"),
    )
    bucket = F.expr(f"{md5_int_expr('CAST(doc_id AS STRING)', 'spark')} % 1000000")
    tagged = (
        docs.select(
            "source",
            "doc_id",
            F.size(F.split("text", " ")).cast("bigint").alias("n_toks"),
        )
        .join(F.broadcast(rates), "source")
        .withColumn(
            "kept",
            bucket * F.col("n_sources") * F.col("src_tokens")
            < F.col("tot_tokens") * F.lit(1000000),
        )
    )
    kept_agg = tagged.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(F.col("kept"), 1).otherwise(0)).cast("bigint").alias("n_kept"),
        F.sum("n_toks").alias("n_tokens"),
        F.sum(F.when(F.col("kept"), F.col("n_toks")).otherwise(0))
        .cast("bigint")
        .alias("kept_tokens"),
    )
    return (
        kept_agg.withColumn(
            "resampled_share",
            F.round(
                F.col("kept_tokens") / F.sum("kept_tokens").over(w), 6
            ),
        )
        .orderBy("source")
    )


MIXTURE_RESAMPLE_SQL = f"""
WITH per_source AS (
  SELECT source, CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS src_tokens
  FROM documents GROUP BY source
),
rates AS (
  SELECT source, src_tokens,
         CAST(sum(src_tokens) OVER () AS BIGINT) AS tot_tokens,
         CAST(count(*) OVER () AS BIGINT) AS n_sources
  FROM per_source
),
tagged AS (
  SELECT d.source, d.doc_id,
         CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_toks,
         ({md5_int_expr("CAST(d.doc_id AS VARCHAR)", 'duckdb')} % 1000000)
           * r.n_sources * r.src_tokens < r.tot_tokens * 1000000 AS kept
  FROM documents d JOIN rates r USING (source)
),
kept_agg AS (
  SELECT source, count(*) AS n_docs,
         CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         CAST(sum(n_toks) AS BIGINT) AS n_tokens,
         CAST(sum(CASE WHEN kept THEN n_toks ELSE 0 END) AS BIGINT) AS kept_tokens
  FROM tagged GROUP BY source
)
SELECT source, n_docs, n_kept, n_tokens, kept_tokens,
       round(CAST(kept_tokens AS DOUBLE) / sum(kept_tokens) OVER (), 6) AS resampled_share
FROM kept_agg ORDER BY source
"""

ENTRIES["mixture_resample"] = (mixture_resample, MIXTURE_RESAMPLE_SQL)


# ---------------------------------------------------------------------------
def split_ngram_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval decontamination by n-gram overlap: train docs sharing at least
    one 8-token chunk with the TEST split, with the shared-chunk count —
    the GPT-3-style benchmark-leakage sweep that content-hash
    ``split_contamination`` (exact duplicates only) cannot catch.

    Both sides chunk IN-ROW over the hash-stable split tag, then meet in
    one equi-join on the 16-byte chunk hash (the test side is a distinct
    hash set, ~1/10 of corpus chunks).  No broadcast hints: at bench
    scale Catalyst broadcasts the small test side from its stats, at
    100 TB the same code becomes a shuffle join on the hash key — both
    correct, neither moves document text.
    """
    docs = _docs(spark, sf_dir, spread=True)
    bucket = F.expr(
        f"{md5_int_expr('CAST(doc_id AS STRING)', 'spark')} % 100"
    )
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    )
    chunks = docs.withColumn("split", split).select(
        "doc_id",
        "split",
        F.explode(F.expr(_CHUNK8_EXPR)).alias("chunk_hash"),
    )
    test_chunks = (
        chunks.filter(F.col("split") == "test").select("chunk_hash").distinct()
    )
    return (
        chunks.filter(F.col("split") == "train")
        .join(test_chunks, "chunk_hash")
        .groupBy("doc_id")
        .agg(F.countDistinct("chunk_hash").alias("n_shared_chunks"))
        .orderBy("doc_id")
    )


# NOTE: the chunks CTE below must build chunk hashes byte-identically to
# _ORACLE_CHUNK8 (it re-states the CTE only to carry the split column).
SPLIT_NGRAM_DECONTAMINATION_SQL = f"""
WITH nums AS (SELECT i FROM range(0, 500) r(i)),
tagged AS (
  SELECT doc_id, string_split(text,' ') AS t,
         CASE WHEN {md5_int_expr("CAST(doc_id AS VARCHAR)", 'duckdb')} % 100 < 80 THEN 'train'
              WHEN {md5_int_expr("CAST(doc_id AS VARCHAR)", 'duckdb')} % 100 < 90 THEN 'val'
              ELSE 'test' END AS split
  FROM documents
),
chunks AS (
  SELECT doc_id, split, md5(array_to_string(t[i*8+1 : i*8+8], ' ')) AS chunk_hash
  FROM tagged JOIN nums ON i*8+8 <= len(t)
),
test_chunks AS (SELECT DISTINCT chunk_hash FROM chunks WHERE split = 'test')
SELECT c.doc_id, count(DISTINCT c.chunk_hash) AS n_shared_chunks
FROM chunks c JOIN test_chunks tc USING (chunk_hash)
WHERE c.split = 'train'
GROUP BY c.doc_id ORDER BY c.doc_id
"""

ENTRIES["split_ngram_decontamination"] = (
    split_ngram_decontamination,
    SPLIT_NGRAM_DECONTAMINATION_SQL,
)


# ---------------------------------------------------------------------------
def leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/val/test split assigned by DUPLICATE-CLUSTER representative:
    every doc hashes on the min doc_id of its exact-duplicate cluster, so
    two copies of the same text can never land in different splits — the
    leakage hole a per-doc hash split (``dataset_split``) leaves open.

    The representative is a partial-agg min + join-back on the 16-byte
    text hash — a min WINDOW would pin a viral duplicate's whole
    cluster on one task, while the min aggregate collapses a hot hash
    map-side and the join back is AQE-skew-splittable.  The hashed
    stream (doc_id, n_toks, h) is lazily checkpointed so the corpus
    scan runs once across both branches; only hash-width rows shuffle.
    """
    docs = _docs(spark, sf_dir)
    # NULL-text docs hash to a SENTINEL, not NULL: an equi-join drops
    # NULL keys (unlike the window-partition semantics this replaced,
    # where all NULLs form one group — the SQL oracle's behavior), so
    # without the coalesce every NULL-text doc silently vanished from
    # the split.  The sentinel cannot collide with a real md5 (not a
    # 32-char hex string), so NULL docs form exactly one cluster —
    # identical to the oracle's NULL partition.
    hashed = docs.select(
        "doc_id",
        F.expr("CAST(size(split(text,' ')) AS BIGINT)").alias("n_toks"),
        F.coalesce(F.md5("text"), F.lit("__null_text_doc__")).alias("h"),
    ).localCheckpoint(eager=False)
    reps = hashed.groupBy("h").agg(F.min("doc_id").alias("rep"))
    rep = hashed.join(reps, "h").select("doc_id", "n_toks", "rep")
    bucket = F.expr(f"{md5_int_expr('CAST(rep AS STRING)', 'spark')} % 100")
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    )
    return (
        rep.withColumn("split", split)
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("rep").alias("n_clusters"),
            F.sum("n_toks").alias("n_tokens"),
        )
        .orderBy("split")
    )


LEAKAGE_SAFE_SPLIT_SQL = f"""
WITH rep AS (
  SELECT doc_id, min(doc_id) OVER (PARTITION BY md5(text)) AS rep,
         CAST(len(string_split(text,' ')) AS BIGINT) AS n_toks
  FROM documents
),
assigned AS (
  SELECT doc_id, rep, n_toks,
         CASE WHEN {md5_int_expr("CAST(rep AS VARCHAR)", 'duckdb')} % 100 < 80 THEN 'train'
              WHEN {md5_int_expr("CAST(rep AS VARCHAR)", 'duckdb')} % 100 < 90 THEN 'val'
              ELSE 'test' END AS split
  FROM rep
)
SELECT split, count(*) AS n_docs, count(DISTINCT rep) AS n_clusters,
       CAST(sum(n_toks) AS BIGINT) AS n_tokens
FROM assigned GROUP BY split ORDER BY split
"""

ENTRIES["leakage_safe_split"] = (leakage_safe_split, LEAKAGE_SAFE_SPLIT_SQL)


# ---------------------------------------------------------------------------
def training_order_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact global training order + shard manifest, computed WITHOUT a
    single-partition window.

    A training run wants a deterministic, reproducible global order (so
    every re-run reads the same shard boundaries), but a naive
    ``row_number() OVER (ORDER BY hash)`` serializes the whole corpus
    through one task.  The distributed equivalent: hex-prefix buckets are
    ranked independently (256-way parallel window), bucket offsets come
    from a 256-row cumulative sum, and ``global_pos = offset +
    local_rank`` — exact, and every corpus-sized stage is partitioned.
    The only unpartitioned window runs over the 256-row bucket-count
    relation, which is constant-size at any corpus scale.

    Shards are fixed 64-doc slices of the global order; the manifest row
    per shard (doc/token counts + hash range) is what a dataloader needs
    to plan an epoch without touching the data.
    """
    docs = _docs(spark, sf_dir)
    from pyspark.sql import Window

    d = docs.select(
        "doc_id",
        F.md5(F.col("doc_id").cast("string")).alias("h"),
        F.size(F.split("text", " ")).cast("bigint").alias("n_toks"),
    ).withColumn("bucket", F.substring("h", 1, 2))
    w = Window.partitionBy("bucket").orderBy("h", "doc_id")
    ranked = d.withColumn("local_rank", F.row_number().over(w))
    # 256 rows max: the one unpartitioned window in the plan, by design.
    offs = (
        d.groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn(
            "off",
            F.coalesce(
                F.sum("cnt").over(
                    Window.orderBy("bucket").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .select("bucket", "off")
    )
    pos = ranked.join(F.broadcast(offs), "bucket").withColumn(
        "pos", F.col("off") + F.col("local_rank")
    )
    return (
        pos.withColumn("shard_id", F.expr("CAST((pos - 1) div 64 AS INT)"))
        .groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_toks").alias("n_tokens"),
            F.min("h").alias("first_hash"),
            F.max("h").alias("last_hash"),
        )
        .orderBy("shard_id")
    )


TRAINING_ORDER_MANIFEST_SQL = """
WITH d AS (
  SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS h,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks
  FROM documents
),
r AS (
  SELECT doc_id, h, n_toks,
         row_number() OVER (ORDER BY h, doc_id) AS pos
  FROM d
)
SELECT CAST((pos - 1) // 64 AS INTEGER) AS shard_id,
       count(*) AS n_docs,
       CAST(sum(n_toks) AS BIGINT) AS n_tokens,
       min(h) AS first_hash, max(h) AS last_hash
FROM r GROUP BY shard_id ORDER BY shard_id
"""

ENTRIES["training_order_manifest"] = (
    training_order_manifest,
    TRAINING_ORDER_MANIFEST_SQL,
)


# ---------------------------------------------------------------------------
def vocab_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source out-of-vocabulary rate against a frequency-derived
    vocabulary — the coverage check run before committing to a tokenizer
    vocab.

    One token explode feeds BOTH aggregates: per-(source, token) counts
    (map-side combinable) and, re-aggregated from that same relation, the
    global top-16 vocabulary (total order: count desc, token asc — no
    nondeterministic boundary ties).  The vocabulary is broadcast (16
    rows; vocab size is a constant, never corpus-scale), so the OOV join
    adds no shuffle: the corpus is read once, shuffled once on (source,
    token).
    """
    docs = _docs(spark, sf_dir, spread=True)
    tok = docs.select("source", F.explode(F.split("text", " ")).alias("token"))
    st = tok.groupBy("source", "token").agg(F.count(F.lit(1)).alias("n"))
    vocab = (
        st.groupBy("token")
        .agg(F.sum("n").alias("c"))
        .orderBy(F.desc("c"), F.asc("token"))
        .limit(16)
        .select("token", F.lit(1).alias("in_vocab"))
    )
    return (
        st.join(F.broadcast(vocab), "token", "left")
        .groupBy("source")
        .agg(
            F.sum("n").alias("n_tokens"),
            F.sum(
                F.when(F.col("in_vocab").isNull(), F.col("n")).otherwise(F.lit(0))
            ).alias("oov_tokens"),
        )
        .select(
            "source",
            "n_tokens",
            "oov_tokens",
            F.round(
                F.col("oov_tokens").cast("double") / F.col("n_tokens"), 6
            ).alias("oov_rate"),
        )
        .orderBy("source")
    )


VOCAB_OOV_RATE_SQL = """
WITH tok AS (SELECT source, unnest(string_split(text, ' ')) AS token FROM documents),
st AS (SELECT source, token, count(*) AS n FROM tok GROUP BY source, token),
cnt AS (SELECT token, CAST(sum(n) AS BIGINT) AS c FROM st GROUP BY token),
vocab AS (SELECT token FROM cnt ORDER BY c DESC, token LIMIT 16)
SELECT st.source,
       CAST(sum(n) AS BIGINT) AS n_tokens,
       CAST(sum(CASE WHEN v.token IS NULL THEN n ELSE 0 END) AS BIGINT) AS oov_tokens,
       round(CAST(sum(CASE WHEN v.token IS NULL THEN n ELSE 0 END) AS DOUBLE)
             / sum(n), 6) AS oov_rate
FROM st LEFT JOIN vocab v ON st.token = v.token
GROUP BY st.source ORDER BY st.source
"""

ENTRIES["vocab_oov_rate"] = (vocab_oov_rate, VOCAB_OOV_RATE_SQL)


# ---------------------------------------------------------------------------
def cross_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-pair contamination matrix: how many distinct 8-token
    passages each pair of sources shares — the provenance check that
    catches one crawl re-hosting another's content before both end up in
    the training mix.

    Posting-list shape, not a self-join: group chunk hashes by value,
    ``collect_set(source)`` per hash, explode ordered source pairs
    in-row.  Pairs per chunk are bounded by n_sources², a constant
    independent of corpus size, so the explosion can never go quadratic
    in documents — the two shuffles (chunk groupBy, pair groupBy) both
    move hash/source-width rows, never text.
    """
    docs = _docs(spark, sf_dir, spread=True)
    ch = docs.select(
        "source", F.explode(F.expr(_CHUNK8_EXPR)).alias("chunk_hash")
    )
    lists = (
        ch.groupBy("chunk_hash")
        .agg(F.sort_array(F.collect_set("source")).alias("ss"))
        .filter(F.size("ss") > 1)
    )
    pair_expr = (
        "flatten(transform(ss, (x, i) -> "
        "transform(slice(ss, i + 2, size(ss)), "
        "y -> struct(x AS source_a, y AS source_b))))"
    )
    return (
        lists.select(F.explode(F.expr(pair_expr)).alias("p"))
        .select("p.source_a", "p.source_b")
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("n_shared_chunks"))
        .orderBy("source_a", "source_b")
    )


CROSS_SOURCE_OVERLAP_SQL = f"""
WITH {_ORACLE_CHUNK8.strip().replace("SELECT doc_id, md5", "SELECT doc_id, source, md5").replace("SELECT doc_id, string_split", "SELECT doc_id, source, string_split")},
s AS (SELECT DISTINCT chunk_hash, source FROM chunk8)
SELECT a.source AS source_a, b.source AS source_b,
       count(*) AS n_shared_chunks
FROM s a JOIN s b ON a.chunk_hash = b.chunk_hash AND a.source < b.source
GROUP BY 1, 2 ORDER BY source_a, source_b
"""

ENTRIES["cross_source_overlap"] = (cross_source_overlap, CROSS_SOURCE_OVERLAP_SQL)


# ---------------------------------------------------------------------------
def ensemble_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-modal near-dup agreement: every text near-dup pair (3-gram
    Jaccard) annotated with its embedding cosine and a per-pair verdict
    on whether the vector space CONFIRMS the lexical evidence.

    Destructive dedup at scale wants two independent witnesses before
    dropping a document; pairs where the modalities disagree are the
    review queue (template text with different payloads, or paraphrases
    the shingles miss).  Pair generation is the join-free Jaccard path;
    the embedding lookups join the OUTPUT-scale pair relation against
    the id-keyed vectors — Catalyst picks broadcast-vs-shuffle from pair
    stats, and nothing corpus-sized is ever broadcast by hint.
    """
    docs = _docs(spark, sf_dir, spread=True)
    emb = _emb(spark, sf_dir)
    pairs = D.ngram_jaccard_dedup(docs, threshold=0.35, hash_shingles=False)
    ea = emb.select(F.col("vec_id").alias("doc_a"), F.col("embedding").alias("xva"))
    eb = emb.select(F.col("vec_id").alias("doc_b"), F.col("embedding").alias("xvb"))
    scored = S.with_cosine(pairs.join(ea, "doc_a").join(eb, "doc_b"), "xva", "xvb")
    return (
        scored.select(
            "doc_a",
            "doc_b",
            "shared_shingles",
            "jaccard",
            "cosine",
            (F.col("cosine") >= 0.2).alias("both_agree"),
        )
        .orderBy("doc_a", "doc_b")
    )


ENSEMBLE_NEAR_DUP_SQL = f"""
WITH {_ORACLE_SHINGLES.strip()},
counts AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
rare AS (SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= 64),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  JOIN rare r ON r.shingle = a.shingle
  GROUP BY 1, 2
),
pairs AS (
  SELECT doc_a, doc_b, CAST(shared AS BIGINT) AS shared_shingles,
         round(CAST(shared AS DOUBLE) / (ca.n + cb.n - shared), 6) AS jaccard
  FROM inter
  JOIN counts ca ON ca.doc_id = doc_a
  JOIN counts cb ON cb.doc_id = doc_b
)
SELECT p.doc_a, p.doc_b, p.shared_shingles, p.jaccard,
       round({_ORACLE_COS.format(a='ea.embedding', b='eb.embedding')}, 6) AS cosine,
       round({_ORACLE_COS.format(a='ea.embedding', b='eb.embedding')}, 6) >= 0.2 AS both_agree
FROM pairs p
JOIN embeddings ea ON ea.vec_id = p.doc_a
JOIN embeddings eb ON eb.vec_id = p.doc_b
WHERE p.jaccard >= 0.35
ORDER BY doc_a, doc_b
"""

ENTRIES["ensemble_near_dup"] = (ensemble_near_dup, ENSEMBLE_NEAR_DUP_SQL)


# ---------------------------------------------------------------------------
def source_lang_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source language composition: share of docs per (source, lang)
    and the dominant language flag — the standard corpus-health check
    before fixing per-language mixture weights.

    The corpus collapses to (source × lang) cardinality in ONE partial
    aggregation; both windows then run over that tiny relation, so at
    100 TB the only corpus-scale work is the map-side count.  Dominance
    ties break on lang ASC (deterministic across engines)."""
    from pyspark.sql import Window

    docs = _docs(spark, sf_dir)
    counts = docs.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("n"))
    w_share = Window.partitionBy("source")
    w_rank = Window.partitionBy("source").orderBy(F.col("n").desc(), "lang")
    return counts.select(
        "source",
        "lang",
        F.col("n").cast("bigint").alias("n_docs"),
        F.round(F.col("n").cast("double") / F.sum("n").over(w_share), 6).alias(
            "share"
        ),
        F.when(F.row_number().over(w_rank) == 1, F.lit(1))
        .otherwise(F.lit(0))
        .cast("int")
        .alias("is_dominant"),
    )


SOURCE_LANG_MIX_SQL = """
WITH counts AS (
  SELECT source, lang, count(*) AS n FROM documents GROUP BY source, lang
)
SELECT source, lang, CAST(n AS BIGINT) AS n_docs,
       round(CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY source), 6) AS share,
       CAST(CASE WHEN row_number() OVER (
         PARTITION BY source ORDER BY n DESC, lang) = 1 THEN 1 ELSE 0 END
         AS INTEGER) AS is_dominant
FROM counts
"""

ENTRIES["source_lang_mix"] = (source_lang_mix, SOURCE_LANG_MIX_SQL)


# ---------------------------------------------------------------------------
def passage_savings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source passage-dedup savings report: how many 8-token chunks
    are duplicate occurrences (a lower-doc_id doc already carries the
    chunk) — the "what would passage dedup buy us" estimate that decides
    whether the full pipeline is worth running on a new source.

    Chunk hashing is in-row (the shared ``_CHUNK8_EXPR``); the keeper
    attaches as a partial-agg min + join-back on the 16-byte chunk hash
    — a min WINDOW would pin a boilerplate chunk's every occurrence on
    one task (no map-side combine, no AQE skew split), while the min
    aggregate collapses a hot hash to one row per map task and the
    join back is skew-splittable.  The chunk stream is lazily
    checkpointed so the explode runs once across both branches; the
    shuffle moves (hash, doc_id, source) triples — never text.  The
    final agg is source-cardinality."""
    docs = _docs(spark, sf_dir, spread=True)
    chunks = docs.select(
        "doc_id",
        "source",
        F.explode(F.expr(_CHUNK8_EXPR)).alias("chunk_hash"),
    ).localCheckpoint(eager=False)
    keepers = chunks.groupBy("chunk_hash").agg(
        F.min("doc_id").alias("keeper_doc")
    )
    keeper = chunks.join(keepers, "chunk_hash")
    dup = F.sum(
        F.when(F.col("doc_id") != F.col("keeper_doc"), 1).otherwise(0)
    )
    return keeper.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_chunks"),
        dup.cast("bigint").alias("dup_chunks"),
        F.round(
            dup.cast("double") / F.count(F.lit(1)), 6
        ).alias("dup_ratio"),
    )


PASSAGE_SAVINGS_SQL = f"""
WITH {_ORACLE_CHUNK8.strip()},
ranked AS (
  SELECT doc_id, chunk_hash,
         min(doc_id) OVER (PARTITION BY chunk_hash) AS keeper_doc
  FROM chunk8
)
SELECT d.source,
       CAST(count(*) AS BIGINT) AS n_chunks,
       CAST(sum(CASE WHEN r.doc_id <> r.keeper_doc THEN 1 ELSE 0 END) AS BIGINT)
         AS dup_chunks,
       round(CAST(sum(CASE WHEN r.doc_id <> r.keeper_doc THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*), 6) AS dup_ratio
FROM ranked r JOIN documents d ON d.doc_id = r.doc_id
GROUP BY d.source
"""

ENTRIES["passage_savings"] = (passage_savings, PASSAGE_SAVINGS_SQL)


# ---------------------------------------------------------------------------
def events_rolling_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 1-hour per-user activity features for each purchase event —
    the classic feature-generation operator for training data (rolling
    counts/sums keyed to the example's own timestamp).

    A RANGE window frame over exact epoch microseconds: one shuffle keyed
    by user, then a linear in-partition sweep — Spark's window RangeFrame
    is O(n) amortized per partition, so the plan survives any scale-up
    where single-user history fits an executor (true for clickstream
    data; a pathological single-user firehose would need day-bucketed
    salting first).  The frame includes same-timestamp peers identically
    in both engines (RANGE semantics), so results are deterministic.
    """
    ev = read_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value", epoch_us("ts").alias("us")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("us")
        .rangeBetween(-3_600_000_000, Window.currentRow)
    )
    return (
        ev.withColumn("n_1h", F.count(F.lit(1)).over(w))
        .withColumn("sum_1h", F.round(F.sum("value").over(w), 2))
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "n_1h", "sum_1h")
        .orderBy("event_id")
    )


EVENTS_ROLLING_SQL = """
WITH ev AS (
  SELECT event_id, user_id, event_type, value, epoch_us(ts) AS us FROM events
), feat AS (
  SELECT event_id, user_id, event_type,
         CAST(count(*) OVER w AS BIGINT) AS n_1h,
         round(sum(value) OVER w, 2) AS sum_1h
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY us
               RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
)
SELECT event_id, user_id, n_1h, sum_1h FROM feat
WHERE event_type = 'purchase' ORDER BY event_id
"""

ENTRIES["events_rolling_features"] = (events_rolling_features, EVENTS_ROLLING_SQL)


# ---------------------------------------------------------------------------
def distinct_kmv_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type distinct-user cardinality: exact count next to a KMV
    (k-minimum-values) sketch estimate, k=64 — the mergeable-sketch pattern
    that replaces exact COUNT(DISTINCT) at 100 TB.

    The sketch side never globally sorts: each of 32 hash shards keeps its
    k smallest md5-derived hash values (map-side combinable groupBy), and
    merging partial k-mins is EXACTLY the global k-min — the same property
    that lets a 1000-executor cluster maintain one 64-value sketch per key
    with no wide sort.  Estimate = (k-1) / U_k where U_k is the k-th
    smallest hash normalized to [0,1); with fewer than k distinct hashes
    the sketch is exact by construction.  All hashing is md5 (identical
    bytes in Spark and DuckDB — functions/hashing.py), so the estimate is
    bit-reproducible cross-engine.
    """
    K = 64
    # user_id IS NOT NULL: COUNT(DISTINCT) ignores NULLs, so the sketch
    # must too — and a NULL hash would rank differently on each engine
    # (Spark orders NULLS FIRST ascending, DuckDB NULLS LAST)
    ev = (
        read_table(spark, sf_dir, "events")
        .select("event_type", "user_id")
        .filter(F.col("user_id").isNotNull())
    )
    h = F.expr(md5_int_expr("CAST(user_id AS STRING)", "spark", 12))
    hashed = ev.select("event_type", h.alias("h")).distinct()
    ranked = SK.kmv_ranked(hashed, ["event_type"], k=K, shards=32)
    # cnt here is the merged candidate count (<= 32*K); when the true
    # distinct count is below K every hash survives into the merge, so
    # rn == least(K, cnt) selects the same row the oracle's global rank does.
    kth = ranked.filter(
        F.col("rn") == F.least(F.lit(K), F.col("cnt"))
    ).select("event_type", F.col("h").alias("hk"), "cnt")
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_exact")
    )
    est = F.when(F.col("cnt") < K, F.col("cnt").cast("double")).otherwise(
        (K - 1) * F.lit(float(16**12)) / F.col("hk")
    )
    return (
        exact.join(kth, "event_type", "left")
        .select("event_type", "n_exact", F.round(est, 4).alias("kmv_est"))
        .orderBy("event_type")
    )


_KMV_H_DUCK = md5_int_expr("CAST(user_id AS VARCHAR)", "duckdb", 12)
DISTINCT_KMV_SQL = f"""
WITH hashed AS (
  SELECT DISTINCT event_type, {_KMV_H_DUCK} AS h FROM events
  WHERE user_id IS NOT NULL
), ranked AS (
  SELECT event_type, h,
         row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn,
         count(*) OVER (PARTITION BY event_type) AS cnt
  FROM hashed
), kth AS (
  SELECT event_type, h AS hk, cnt FROM ranked WHERE rn = least(64, cnt)
), exact AS (
  SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact
  FROM events GROUP BY event_type
)
SELECT e.event_type AS event_type, e.n_exact,
       round(CASE WHEN k.cnt < 64 THEN CAST(k.cnt AS DOUBLE)
                  ELSE 63 * 281474976710656.0 / k.hk END, 4) AS kmv_est
FROM exact e LEFT JOIN kth k ON e.event_type = k.event_type
ORDER BY event_type
"""

ENTRIES["distinct_kmv_sketch"] = (distinct_kmv_sketch, DISTINCT_KMV_SQL)


# ---------------------------------------------------------------------------
def events_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every purchase joined to ALL same-user clicks in the preceding 30
    minutes (count + value sum) — the range join that complements the
    as-of join's most-recent-only semantics.

    Catalyst would execute the raw inequality join as a broadcast
    nested-loop; instead both sides bucket time into 30-minute epochs and
    each purchase probes its own and the previous bucket (a window spanning
    G microseconds overlaps at most 2 G-sized buckets), turning the plan
    into an equi-join on (user_id, bucket) with a bounded 2x probe fan-out
    — shuffle-partitionable at any scale, no nested loop.  Zero-click
    purchases are restored by a final left join against the purchase side.
    """
    G = 1_800_000_000  # 30 min in microseconds
    ev = read_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        epoch_us("ts").alias("pus"),
    )
    # Integer DIV, not float division-and-cast: epoch micros sit near 2^51,
    # where a 0.5-ulp FP quotient error can flip a boundary value into the
    # neighboring bucket and silently drop a matching click.
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        epoch_us("ts").alias("cus"),
        "value",
    ).withColumn("bkt", F.expr(f"cus DIV {G}"))
    probes = p.withColumn(
        "bkt",
        F.explode(F.array(F.expr(f"pus DIV {G} - 1"), F.expr(f"pus DIV {G}"))),
    )
    matched = (
        probes.join(c, (probes["user_id"] == c["c_user"]) & (probes["bkt"] == c["bkt"]))
        .filter((F.col("cus") >= F.col("pus") - G) & (F.col("cus") <= F.col("pus")))
        .groupBy("purchase_id")
        .agg(
            F.count(F.lit(1)).alias("n_clicks_30m"),
            F.sum("value").alias("v"),
        )
    )
    return (
        p.join(matched, "purchase_id", "left")
        .select(
            "purchase_id",
            "user_id",
            F.coalesce("n_clicks_30m", F.lit(0)).alias("n_clicks_30m"),
            F.round(F.coalesce("v", F.lit(0.0)), 2).alias("click_value_30m"),
        )
        .orderBy("purchase_id")
    )


EVENTS_RANGE_JOIN_SQL = """
WITH p AS (
  SELECT event_id AS purchase_id, user_id, epoch_us(ts) AS pus
  FROM events WHERE event_type = 'purchase'
), c AS (
  SELECT user_id, epoch_us(ts) AS cus, value FROM events WHERE event_type = 'click'
)
SELECT p.purchase_id, p.user_id,
       CAST(count(c.cus) AS BIGINT) AS n_clicks_30m,
       round(coalesce(sum(c.value), 0), 2) AS click_value_30m
FROM p LEFT JOIN c
  ON p.user_id = c.user_id AND c.cus BETWEEN p.pus - 1800000000 AND p.pus
GROUP BY p.purchase_id, p.user_id
ORDER BY p.purchase_id
"""

ENTRIES["events_range_join"] = (events_range_join, EVENTS_RANGE_JOIN_SQL)


# ---------------------------------------------------------------------------
def corpus_pmi_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 PMI (pointwise mutual information) token pairs over the
    40-token head vocabulary — the corpus-statistics operator behind
    collocation mining and tokenizer-merge diagnostics.

    Scale shape: the only corpus-cardinality work is one distinct
    (doc, token) explode feeding a map-side-combinable df count.  The
    head vocabulary (40 rows) broadcasts into the token stream; per-doc
    pair generation is in-row over the <=40 surviving tokens (bounded
    780 pairs/doc regardless of corpus size); the co-occurrence count is
    vocab^2-bounded, and both df lookups are broadcast joins.  Nothing
    quadratic in documents, nothing document-sized shuffles twice.
    """
    V, MIN_CO, TOPK = 40, 5, 20
    docs = read_table(spark, sf_dir, "documents")
    # footer-metadata cardinality (sub-ms, no Spark job) — the eager
    # .count() here re-scanned the corpus at every query CONSTRUCTION
    n = _footer_rows(os.path.join(sf_dir, "documents.parquet"))
    n_docs = float(docs.count() if n is None else n)
    dt = docs.select(
        "doc_id", F.explode(F.array_distinct(F.split("text", " "))).alias("token")
    )
    dfreq = dt.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    vocab = dfreq.orderBy(F.desc("df"), F.asc("token")).limit(V)
    per_doc = (
        dt.join(F.broadcast(vocab.select("token")), "token")
        .groupBy("doc_id")
        .agg(F.array_sort(F.collect_set("token")).alias("ts"))
    )
    pair_expr = (
        "flatten(transform(ts, (x, i) -> "
        "transform(slice(ts, i + 2, size(ts)), y -> struct(x AS a, y AS b))))"
    )
    co = (
        per_doc.select(F.explode(F.expr(pair_expr)).alias("p"))
        .select("p.a", "p.b")
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("c_ab"))
        .filter(F.col("c_ab") >= MIN_CO)
    )
    va = vocab.select(F.col("token").alias("a"), F.col("df").alias("c_a"))
    vb = vocab.select(F.col("token").alias("b"), F.col("df").alias("c_b"))
    return (
        co.join(F.broadcast(va), "a")
        .join(F.broadcast(vb), "b")
        .select(
            F.col("a").alias("tok_a"),
            F.col("b").alias("tok_b"),
            "c_ab",
            "c_a",
            "c_b",
            F.round(
                F.log(F.lit(n_docs) * F.col("c_ab") / (F.col("c_a") * F.col("c_b"))),
                6,
            ).alias("pmi"),
        )
        .orderBy(F.desc("pmi"), "tok_a", "tok_b")
        .limit(TOPK)
    )


CORPUS_PMI_SQL = """
WITH dt AS (
  SELECT DISTINCT doc_id, token FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
), dfreq AS (
  SELECT token, CAST(count(*) AS BIGINT) AS df FROM dt GROUP BY token
), vocab AS (
  SELECT token, df FROM dfreq ORDER BY df DESC, token LIMIT 40
), iv AS (
  SELECT dt.doc_id, dt.token FROM dt JOIN vocab USING (token)
), pairs AS (
  SELECT x.doc_id, x.token AS a, y.token AS b
  FROM iv x JOIN iv y ON x.doc_id = y.doc_id AND x.token < y.token
), co AS (
  SELECT a, b, CAST(count(*) AS BIGINT) AS c_ab FROM pairs GROUP BY a, b
  HAVING count(*) >= 5
)
SELECT co.a AS tok_a, co.b AS tok_b, co.c_ab,
       va.df AS c_a, vb.df AS c_b,
       round(ln((SELECT CAST(count(*) AS DOUBLE) FROM documents)
                * co.c_ab / (va.df * vb.df)), 6) AS pmi
FROM co JOIN vocab va ON va.token = co.a JOIN vocab vb ON vb.token = co.b
ORDER BY pmi DESC, tok_a, tok_b LIMIT 20
"""

ENTRIES["corpus_pmi_pairs"] = (corpus_pmi_pairs, CORPUS_PMI_SQL)


# ---------------------------------------------------------------------------
_EMB_D = 64  # embeddings.parquet vector width (TESTDATA.md)


def embedding_label_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding cluster quality: each label's centroid, the mean
    cosine of members to their own centroid, and how many members sit
    below a 0.1 cosine margin — the mislabeled-example sweep every
    embedding-supervised corpus needs.

    Scale shape: centroids come from ONE partial-aggregable groupBy of 64
    ``avg(element_at(...))`` expressions — vectors never explode and never
    shuffle; the exchange carries 10 labels × 64 partial sums per map
    task.  The 10-row centroid relation broadcasts back, and the cosine
    is an in-row ``aggregate(zip_with(...))`` fold with a fixed left-to-
    right summation order, matching the oracle's generated 64-term sum
    exactly (same association order ⇒ same double, before the 1e-6
    round absorbs cross-row avg() drift).
    """
    emb = read_table(spark, sf_dir, "embeddings")
    cent = (
        emb.groupBy("label")
        .agg(
            *[
                F.avg(F.element_at("embedding", i + 1).cast("double")).alias(f"c{i}")
                for i in range(_EMB_D)
            ]
        )
        .select(
            "label", F.array(*[F.col(f"c{i}") for i in range(_EMB_D)]).alias("centroid")
        )
    )
    j = emb.join(F.broadcast(cent), "label")
    dot = F.expr(
        "aggregate(zip_with(embedding, centroid, (x, y) -> CAST(x AS DOUBLE) * y), "
        "CAST(0 AS DOUBLE), (a, v) -> a + v)"
    )
    vn = F.expr(
        "sqrt(aggregate(embedding, CAST(0 AS DOUBLE), "
        "(a, x) -> a + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))"
    )
    cn = F.expr(
        "sqrt(aggregate(centroid, CAST(0 AS DOUBLE), (a, x) -> a + x * x))"
    )
    # try_divide: a zero-norm member (or degenerate centroid) has an
    # UNDEFINED cosine — NULL, exactly DuckDB's x/0 — not an ANSI error;
    # avg() then skips it and the margin test is NULL-false on both
    # engines.
    scored = j.select("label", F.try_divide(dot, vn * cn).alias("cos"))
    return (
        scored.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.round(F.avg("cos"), 6).alias("mean_cos"),
            F.sum(F.when(F.col("cos") < 0.1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_marginal"),
        )
        .orderBy("label")
    )


def _emb_quality_sql() -> str:
    cent_cols = ", ".join(
        f"avg(CAST(embedding[{i + 1}] AS DOUBLE)) AS c{i}" for i in range(_EMB_D)
    )
    dot = " + ".join(
        f"CAST(e.embedding[{i + 1}] AS DOUBLE) * c.c{i}" for i in range(_EMB_D)
    )
    vn = " + ".join(
        f"CAST(e.embedding[{i + 1}] AS DOUBLE) * CAST(e.embedding[{i + 1}] AS DOUBLE)"
        for i in range(_EMB_D)
    )
    cn = " + ".join(f"c.c{i} * c.c{i}" for i in range(_EMB_D))
    return f"""
WITH cent AS (
  SELECT label, {cent_cols} FROM embeddings GROUP BY label
), scored AS (
  SELECT e.label,
         ({dot}) / (sqrt({vn}) * sqrt({cn})) AS cos
  FROM embeddings e JOIN cent c USING (label)
)
SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
       round(avg(cos), 6) AS mean_cos,
       CAST(sum(CASE WHEN cos < 0.1 THEN 1 ELSE 0 END) AS BIGINT) AS n_marginal
FROM scored GROUP BY label ORDER BY label
"""


ENTRIES["embedding_label_quality"] = (embedding_label_quality, _emb_quality_sql())


# ---------------------------------------------------------------------------
def multimodal_video_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real video round-trip: synthesize genuine YUV4MPEG2 clips (content
    a deterministic function of doc_id/n_chars), DECODE the container,
    frame-sample every 2nd frame, and aggregate luma — the oracle
    reproduces the features from the generating formula, so a hash match
    proves the encode→decode→frame-sample path end to end."""
    return M.video_features(M.synth_video_table(_docs(spark, sf_dir))).orderBy(
        "doc_id"
    )


MULTIMODAL_VIDEO_SQL = """
WITH fs AS (SELECT i AS f FROM range(0, 13) r(i)),
xs AS (SELECT i AS x FROM range(0, 10) r(i)),
ys AS (SELECT i AS y FROM range(0, 8) r(i)),
px AS (
  SELECT d.doc_id,
         (d.n_chars % 8) + 2 AS w,
         (d.n_chars % 6) + 2 AS h,
         (d.n_chars % 13) + 1 AS nf,
         (d.doc_id * 11 + f * 17 + x * 3 + y * 5) % 256 AS yv
  FROM documents d
  JOIN fs ON f < (d.n_chars % 13) + 1 AND f % 2 = 0
  JOIN xs ON x < (d.n_chars % 8) + 2
  JOIN ys ON y < (d.n_chars % 6) + 2
)
SELECT doc_id, CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
       CAST(nf AS INTEGER) AS n_frames,
       CAST((nf + 1) // 2 AS INTEGER) AS n_sampled,
       round(CAST(sum(CAST(yv AS BIGINT)) AS DOUBLE)
             / (((nf + 1) // 2) * w * h), 6) AS mean_y
FROM px GROUP BY doc_id, w, h, nf ORDER BY doc_id
"""

ENTRIES["multimodal_video_features"] = (
    multimodal_video_features,
    MULTIMODAL_VIDEO_SQL,
)


# ---------------------------------------------------------------------------
def source_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled source mixture: p_s ∝ n_s^0.7 — the standard
    alpha-sampling rule that upweights small domains without flattening
    to uniform (``source_mixture`` is the alpha→0 extreme, raw sampling
    is alpha=1; 0.7 is the common multilingual/LLM recipe point).

    Scale shape matches source_mixture: one map-side-combinable
    groupBy(source) scan of the corpus, then both normalizations via
    unpartitioned windows over the RESULT (sources-cardinality, ~20
    rows).  Shares are double ratios of exact integer token counts;
    pow() last-ulp drift across libms sits ~1e-12, absorbed by the 1e-6
    round.
    """
    from pyspark.sql import Window

    docs = _docs(spark, sf_dir)
    s = (
        docs.select(
            "source", F.size(F.split("text", " ")).cast("bigint").alias("n_toks")
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_toks").alias("n_toks"),
        )
    )
    w = Window.partitionBy()
    raw = F.col("n_toks").cast("double") / F.sum("n_toks").over(w)
    powed = F.pow(F.col("n_toks").cast("double"), 0.7)
    temp = powed / F.sum(powed).over(w)
    return (
        s.select(
            "source",
            "n_docs",
            "n_toks",
            F.round(raw, 6).alias("raw_share"),
            F.round(temp, 6).alias("temp_share"),
            F.round(temp / raw, 6).alias("upsample"),
        )
        .orderBy("source")
    )


SOURCE_TEMPERATURE_SQL = """
WITH s AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_toks
  FROM documents GROUP BY source
), t AS (
  SELECT source, n_docs, n_toks,
         CAST(n_toks AS DOUBLE) / sum(n_toks) OVER () AS raw_share,
         pow(CAST(n_toks AS DOUBLE), 0.7)
           / sum(pow(CAST(n_toks AS DOUBLE), 0.7)) OVER () AS temp_share
  FROM s
)
SELECT source, n_docs, n_toks,
       round(raw_share, 6) AS raw_share,
       round(temp_share, 6) AS temp_share,
       round(temp_share / raw_share, 6) AS upsample
FROM t ORDER BY source
"""

ENTRIES["source_temperature_mixture"] = (
    source_temperature_mixture,
    SOURCE_TEMPERATURE_SQL,
)


# ---------------------------------------------------------------------------
def source_quality_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quality deciles via NTILE: the "keep the top X% of each
    domain" gate normalized within source, so a verbose domain can't
    crowd out a terse one under a single global threshold.

    One corpus scan carries source through the token aggregation (no
    join back), then the NTILE window shuffles once by source; the
    ordering (score, doc_id) is total, so decile assignment — including
    NTILE's first-buckets-get-extras distribution — is identical in both
    engines.  Output is sources × 10 rows regardless of corpus size.
    """
    from pyspark.sql import Window

    docs = _docs(spark, sf_dir)
    agg = (
        docs.select("doc_id", "source", F.explode(F.split("text", " ")).alias("token"))
        .groupBy("doc_id", "source")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.countDistinct("token").alias("n_distinct"),
        )
    )
    sc = agg.select(
        "doc_id",
        "source",
        F.round(
            F.least(F.lit(1.0), F.col("n_tokens") / F.lit(100.0)) * 0.5
            + (F.col("n_distinct").cast("double") / F.col("n_tokens")) * 0.5,
            6,
        ).alias("q"),
    )
    dec = sc.select(
        "source",
        "q",
        # avg() over doubles sums in engine-dependent order, and a decile
        # mean can land exactly on a 1e-6 rounding boundary — so the mean
        # is computed from exact integer micro-units (q is already
        # 6-dp-rounded, so round(q*1e6) is the same BIGINT in both
        # engines) with ONE final double division.
        F.round(F.col("q") * 1_000_000, 0).cast("bigint").alias("qq"),
        F.ntile(10)
        .over(Window.partitionBy("source").orderBy("q", "doc_id"))
        .alias("decile"),
    )
    return (
        dec.groupBy("source", "decile")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.min("q"), 6).alias("min_q"),
            F.round(F.max("q"), 6).alias("max_q"),
            # NOT re-rounded: a decile mean can sit exactly on a half-ulp
            # boundary where Spark (BigDecimal HALF_UP on the shortest
            # decimal) and DuckDB (binary-double) round apart.  The value
            # is already deterministic — exact integer sum, then two
            # single divisions — so both engines emit the identical double.
            (
                F.sum("qq").cast("double")
                / (F.count(F.lit(1)) * F.lit(1_000_000.0))
            ).alias("avg_q"),
        )
        .orderBy("source", "decile")
    )


SOURCE_QUALITY_DECILES_SQL = """
WITH tok AS (
  SELECT doc_id, source, unnest(string_split(text, ' ')) AS token FROM documents
), agg AS (
  SELECT doc_id, source, count(*) AS n_tokens, count(DISTINCT token) AS n_distinct
  FROM tok GROUP BY 1, 2
), sc AS (
  SELECT doc_id, source,
         round(least(1.0, n_tokens / 100.0) * 0.5
               + (CAST(n_distinct AS DOUBLE) / n_tokens) * 0.5, 6) AS q
  FROM agg
), dec AS (
  SELECT source, q,
         CAST(round(q * 1000000, 0) AS BIGINT) AS qq,
         ntile(10) OVER (PARTITION BY source ORDER BY q, doc_id) AS decile
  FROM sc
)
SELECT source, CAST(decile AS INTEGER) AS decile,
       CAST(count(*) AS BIGINT) AS n_docs,
       round(min(q), 6) AS min_q, round(max(q), 6) AS max_q,
       CAST(sum(qq) AS DOUBLE) / (count(*) * 1000000.0) AS avg_q
FROM dec GROUP BY source, decile ORDER BY source, decile
"""

ENTRIES["source_quality_deciles"] = (
    source_quality_deciles,
    SOURCE_QUALITY_DECILES_SQL,
)


# ---------------------------------------------------------------------------
def multimodal_image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode → nearest-neighbor resize (8×8) → thumbnail channel means,
    over real BMP blobs.  The oracle evaluates the pixel-generating
    formula at the resize's integer source mapping (sx = ox·w DIV 8), so
    a hash match proves decode AND the resize index arithmetic."""
    return M.resized_image_features(M.synth_image_table(_docs(spark, sf_dir))).orderBy(
        "doc_id"
    )


MULTIMODAL_RESIZE_SQL = """
WITH xs AS (SELECT i AS ox FROM range(0, 8) r(i)),
ys AS (SELECT i AS oy FROM range(0, 8) r(i)),
px AS (
  SELECT d.doc_id,
         (d.n_chars % 31) + 2 AS w,
         (d.n_chars % 17) + 2 AS h,
         (ox * ((d.n_chars % 31) + 2)) // 8 AS sx,
         (oy * ((d.n_chars % 17) + 2)) // 8 AS sy
  FROM documents d, xs, ys
)
SELECT doc_id, CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
       round(CAST(sum((doc_id + 3 * sx + 5 * sy) % 256) AS DOUBLE) / 64, 6) AS mean_r8,
       round(CAST(sum((doc_id * 7 + sx + 2 * sy) % 256) AS DOUBLE) / 64, 6) AS mean_g8,
       round(CAST(sum((doc_id + sx * sy) % 256) AS DOUBLE) / 64, 6) AS mean_b8
FROM px GROUP BY doc_id, w, h ORDER BY doc_id
"""

ENTRIES["multimodal_image_resize"] = (
    multimodal_image_resize,
    MULTIMODAL_RESIZE_SQL,
)


# ---------------------------------------------------------------------------
def image_near_dup_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-duplicate search by banded perceptual hash
    (operators/multimodal.py::image_dhash + near_dup_images_phash):
    decode real BMPs, dHash each (9×8 gray-sum grid, 64 adjacent-pixel
    ordering bits), bucket by 16-bit hash band, and rank band-colliding
    candidates by Hamming distance — the image-corpus member of the
    dedup family (LSH banding, never all-pairs).  Probe set doc_id < 10
    / k=3 / lowest-id tie-breaks, mirroring the ANN queries.  The
    oracle re-derives every hash bit from the pixel-generating formulas
    at the resample's integer source mapping — decode, resample, hash,
    banding AND the Hamming verify are all replayed, not echoed."""
    docs = _docs(spark, sf_dir)
    media = M.synth_image_table(docs)
    probes = M.synth_image_table(docs.filter(F.col("doc_id") < 10))
    return M.near_dup_images_phash(probes, media, k=3)


IMAGE_NEAR_DUP_PHASH_SQL = """
WITH txs AS (SELECT CAST(i AS BIGINT) AS tx FROM range(0, 9) r(i)),
tys AS (SELECT CAST(i AS BIGINT) AS ty FROM range(0, 8) r(i)),
-- 9x8 thumbnail of gray SUMS (r+g+b) from the synth-pixel formulas at
-- the nearest-neighbor source mapping sx = tx*w DIV 9, sy = ty*h DIV 8
g AS (
  SELECT d.doc_id, ty.ty, txs.tx,
         ((d.doc_id + 3 * ((txs.tx * ((d.n_chars % 31) + 2)) // 9)
                    + 5 * ((ty.ty * ((d.n_chars % 17) + 2)) // 8)) % 256)
       + ((d.doc_id * 7 + ((txs.tx * ((d.n_chars % 31) + 2)) // 9)
                    + 2 * ((ty.ty * ((d.n_chars % 17) + 2)) // 8)) % 256)
       + ((d.doc_id + ((txs.tx * ((d.n_chars % 31) + 2)) // 9)
                    * ((ty.ty * ((d.n_chars % 17) + 2)) // 8)) % 256)
           AS gsum
  FROM documents d, txs, tys ty
),
bits AS (
  SELECT a.doc_id, a.ty * 8 + a.tx AS i,
         CASE WHEN b.gsum > a.gsum THEN 1 ELSE 0 END AS bit
  FROM g a JOIN g b ON b.doc_id = a.doc_id AND b.ty = a.ty
                   AND b.tx = a.tx + 1
  WHERE a.tx < 8
),
bands AS (
  SELECT doc_id, CAST(i // 16 AS INTEGER) AS band,
         CAST(sum(bit * (1 << CAST(i % 16 AS INTEGER))) AS INTEGER) AS val
  FROM bits GROUP BY doc_id, i // 16
),
cand AS (
  SELECT DISTINCT p.doc_id AS probe_id, c.doc_id AS match_id
  FROM bands p JOIN bands c ON p.band = c.band AND p.val = c.val
  WHERE p.doc_id < 10 AND p.doc_id <> c.doc_id
),
ham AS (
  SELECT cd.probe_id, cd.match_id,
         CAST(sum(CASE WHEN pb.bit <> cb.bit THEN 1 ELSE 0 END)
              AS INTEGER) AS hamming
  FROM cand cd
  JOIN bits pb ON pb.doc_id = cd.probe_id
  JOIN bits cb ON cb.doc_id = cd.match_id AND cb.i = pb.i
  GROUP BY cd.probe_id, cd.match_id
)
SELECT probe_id, match_id, hamming, rank FROM (
  SELECT probe_id, match_id, hamming,
         CAST(row_number() OVER (PARTITION BY probe_id
                                 ORDER BY hamming, match_id)
              AS INTEGER) AS rank
  FROM ham
) WHERE rank <= 3
"""

ENTRIES["image_near_dup_phash"] = (
    image_near_dup_phash,
    IMAGE_NEAR_DUP_PHASH_SQL,
)


# ---------------------------------------------------------------------------
def audio_near_dup_fp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio near-duplicate retrieval by banded acoustic fingerprint —
    find the ORIGINAL of a re-encoded clip (operators/multimodal.py::
    audio_fingerprint + near_dup_audio_fp): the corpus is one real
    PCM-WAV chirp clip per document; the probes are the doc_id < 10
    clips re-encoded with a +3 level shift (int16-clamped — the
    gain-change near-dup class) in an offset id space.  Both sides are
    decoded and fingerprinted (33 duration-anchored 16-sample windows,
    exact int64 energies, 32 energy-delta sign bits, two 16-bit
    bands), candidates come from band collisions (LSH banding, never
    all-pairs; shared banded_hamming_topk spine with image phash) and
    rank by Hamming distance — each probe's top match is its own
    source clip at small hamming; unrelated clips either never collide
    on a band or rank behind.  The oracle re-computes every energy and
    bit from the chirp formula (including the clamped level shift) at
    the anchor positions — decode, windowing, fingerprint, banding AND
    the Hamming verify all replayed.  Clips need >= 16 samples
    (filtered identically in both engines)."""
    docs = _docs(spark, sf_dir).filter(F.col("n_chars") >= 16)
    corpus = M.synth_audio_chirp_table(docs)
    probes = M.synth_audio_chirp_table(
        docs.filter(F.col("doc_id") < 10), id_offset=1000000, level_shift=3
    )
    out = M.near_dup_audio_fp(probes, corpus, k=3)
    return out.withColumn(
        "probe_id", (F.col("probe_id") - F.lit(1000000)).cast("bigint")
    )


AUDIO_NEAR_DUP_FP_SQL = """
WITH ws AS (SELECT CAST(i AS BIGINT) AS w FROM range(0, 33) r(i)),
js AS (SELECT CAST(i AS BIGINT) AS j FROM range(0, 16) r(i)),
base AS (SELECT doc_id, n_chars FROM documents WHERE n_chars >= 16),
-- corpus clips (shift 0) plus probe re-encodes (doc_id < 10, +3 level
-- shift, offset id space)
src AS (
  SELECT doc_id AS fid, doc_id AS d, n_chars, 0 AS shift FROM base
  UNION ALL
  SELECT doc_id + 1000000, doc_id, n_chars, 3 FROM base WHERE doc_id < 10
),
-- exact integer energy of the 16-sample window anchored at
-- start(w) = w*(n-16) DIV 32; chirp s(i) = (31d + 7 i^2) % 65536 -
-- 32768 (+ int16-clamped shift)
e AS (
  SELECT s.fid, ws.w,
         sum(
           GREATEST(-32768, LEAST(32767,
             ((s.d * 31
               + 7 * (((ws.w * (s.n_chars - 16)) // 32) + js.j)
                   * (((ws.w * (s.n_chars - 16)) // 32) + js.j)) % 65536)
             - 32768 + s.shift))
           * GREATEST(-32768, LEAST(32767,
             ((s.d * 31
               + 7 * (((ws.w * (s.n_chars - 16)) // 32) + js.j)
                   * (((ws.w * (s.n_chars - 16)) // 32) + js.j)) % 65536)
             - 32768 + s.shift))
         ) AS energy
  FROM src s, ws, js
  GROUP BY s.fid, ws.w
),
bits AS (
  SELECT a.fid, a.w AS i,
         CASE WHEN b.energy > a.energy THEN 1 ELSE 0 END AS bit
  FROM e a JOIN e b ON b.fid = a.fid AND b.w = a.w + 1
  WHERE a.w < 32
),
bands AS (
  SELECT fid, CAST(i // 16 AS INTEGER) AS band,
         CAST(sum(bit * (1 << CAST(i % 16 AS INTEGER))) AS INTEGER) AS val
  FROM bits GROUP BY fid, i // 16
),
cand AS (
  SELECT DISTINCT p.fid AS pfid, c.fid AS match_id
  FROM bands p JOIN bands c ON p.band = c.band AND p.val = c.val
  WHERE p.fid >= 1000000 AND c.fid < 1000000
),
ham AS (
  SELECT cd.pfid, cd.match_id,
         CAST(sum(CASE WHEN pb.bit <> cb.bit THEN 1 ELSE 0 END)
              AS INTEGER) AS hamming
  FROM cand cd
  JOIN bits pb ON pb.fid = cd.pfid
  JOIN bits cb ON cb.fid = cd.match_id AND cb.i = pb.i
  GROUP BY cd.pfid, cd.match_id
)
SELECT CAST(pfid - 1000000 AS BIGINT) AS probe_id, match_id, hamming, rank
FROM (
  SELECT pfid, match_id, hamming,
         CAST(row_number() OVER (PARTITION BY pfid
                                 ORDER BY hamming, match_id)
              AS INTEGER) AS rank
  FROM ham
) WHERE rank <= 3
"""

ENTRIES["audio_near_dup_fp"] = (audio_near_dup_fp, AUDIO_NEAR_DUP_FP_SQL)


# ---------------------------------------------------------------------------
def video_near_dup_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video near-duplicate search by banded perceptual hash
    (operators/multimodal.py::video_dhash + near_dup_videos_phash):
    decode real .y4m clips, hash each (temporal luma SUM — the
    frame-drop-robust integer analogue of a temporal mean — 9×8
    resample, 64 ordering bits, four 16-bit bands), bucket by band and
    rank band-colliding candidates by Hamming distance — the video
    member of the multimodal dedup family, completing the
    image/audio/video triple on the shared banded_hamming_topk spine.
    Probe set doc_id < 10 / k=3 / lowest-id tie-breaks.  The oracle
    re-derives every bit from the frame-generating formula summed over
    frames at the resample's source mapping."""
    docs = _docs(spark, sf_dir)
    media = M.synth_video_table(docs)
    probes = M.synth_video_table(docs.filter(F.col("doc_id") < 10))
    return M.near_dup_videos_phash(probes, media, k=3)


VIDEO_NEAR_DUP_PHASH_SQL = """
WITH txs AS (SELECT CAST(i AS BIGINT) AS tx FROM range(0, 9) r(i)),
tys AS (SELECT CAST(i AS BIGINT) AS ty FROM range(0, 8) r(i)),
fs AS (SELECT CAST(i AS BIGINT) AS f FROM range(0, 13) r(i)),
-- temporal SUM of the luma plane at the 9x8 nearest-neighbor source
-- mapping; frame luma y(f,x,y) = (11 d + 17 f + 3 x + 5 y) % 256,
-- w = n%8+2, h = n%6+2, n_frames = n%13+1
g AS (
  SELECT d.doc_id, tys.ty, txs.tx,
         sum((d.doc_id * 11 + fs.f * 17
              + ((txs.tx * ((d.n_chars % 8) + 2)) // 9) * 3
              + ((tys.ty * ((d.n_chars % 6) + 2)) // 8) * 5) % 256)
           AS gsum
  FROM documents d, txs, tys, fs
  WHERE fs.f <= (d.n_chars % 13)
  GROUP BY d.doc_id, tys.ty, txs.tx
),
bits AS (
  SELECT a.doc_id, a.ty * 8 + a.tx AS i,
         CASE WHEN b.gsum > a.gsum THEN 1 ELSE 0 END AS bit
  FROM g a JOIN g b ON b.doc_id = a.doc_id AND b.ty = a.ty
                   AND b.tx = a.tx + 1
  WHERE a.tx < 8
),
bands AS (
  SELECT doc_id, CAST(i // 16 AS INTEGER) AS band,
         CAST(sum(bit * (1 << CAST(i % 16 AS INTEGER))) AS INTEGER) AS val
  FROM bits GROUP BY doc_id, i // 16
),
cand AS (
  SELECT DISTINCT p.doc_id AS probe_id, c.doc_id AS match_id
  FROM bands p JOIN bands c ON p.band = c.band AND p.val = c.val
  WHERE p.doc_id < 10 AND p.doc_id <> c.doc_id
),
ham AS (
  SELECT cd.probe_id, cd.match_id,
         CAST(sum(CASE WHEN pb.bit <> cb.bit THEN 1 ELSE 0 END)
              AS INTEGER) AS hamming
  FROM cand cd
  JOIN bits pb ON pb.doc_id = cd.probe_id
  JOIN bits cb ON cb.doc_id = cd.match_id AND cb.i = pb.i
  GROUP BY cd.probe_id, cd.match_id
)
SELECT probe_id, match_id, hamming, rank FROM (
  SELECT probe_id, match_id, hamming,
         CAST(row_number() OVER (PARTITION BY probe_id
                                 ORDER BY hamming, match_id)
              AS INTEGER) AS rank
  FROM ham
) WHERE rank <= 3
"""

ENTRIES["video_near_dup_phash"] = (video_near_dup_phash, VIDEO_NEAR_DUP_PHASH_SQL)


# ---------------------------------------------------------------------------
def corpus_zipf_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level distribution diagnostics: total/vocabulary token
    counts, unigram Shannon entropy (bits), and the Zipf slope — the OLS
    fit of ln(freq) on ln(rank) over the top-100 terms.  Entropy and the
    Zipf exponent are the first things to drift when a scrape goes bad
    (boilerplate flattens entropy; dedup failures steepen the head).

    Scale shape: ONE token groupBy is the only corpus-cardinality work.
    Entropy reuses the same vocab relation with the 1-row totals
    broadcast in; the regression runs over a bounded 100-row TakeOrdered
    head (its unpartitioned rank window is 100 rows by construction, not
    corpus-sized).  Per-term double terms are identical cross-engine;
    only summation order differs, absorbed by the 1e-6 round.
    """
    from pyspark.sql import Window

    docs = _docs(spark, sf_dir)
    freq = (
        docs.select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tot = freq.agg(F.sum("c").alias("n"), F.count(F.lit(1)).alias("v"))
    p = F.col("c").cast("double") / F.col("n")
    ent = (
        freq.crossJoin(F.broadcast(tot))
        .agg(F.round(-F.sum(p * F.log2(p)), 6).alias("entropy_bits"))
    )
    order = [F.desc("c"), F.asc("token")]
    top = (
        freq.orderBy(*order)
        .limit(100)
        .withColumn("rnk", F.row_number().over(Window.orderBy(*order)))
    )
    lx = F.log(F.col("rnk").cast("double"))
    ly = F.log(F.col("c").cast("double"))
    reg = top.agg(
        F.count(F.lit(1)).cast("double").alias("m"),
        F.sum(lx).alias("sx"),
        F.sum(ly).alias("sy"),
        F.sum(lx * ly).alias("sxy"),
        F.sum(lx * lx).alias("sxx"),
    )
    return (
        tot.crossJoin(ent)
        .crossJoin(reg)
        .select(
            F.col("n").alias("n_tokens"),
            F.col("v").alias("vocab_size"),
            "entropy_bits",
            F.round(
                (F.col("m") * F.col("sxy") - F.col("sx") * F.col("sy"))
                / (F.col("m") * F.col("sxx") - F.col("sx") * F.col("sx")),
                6,
            ).alias("zipf_slope"),
        )
    )


CORPUS_ZIPF_SQL = """
WITH tok AS (SELECT unnest(string_split(text, ' ')) AS token FROM documents),
freq AS (SELECT token, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY token),
tot AS (SELECT CAST(sum(c) AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS v FROM freq),
ent AS (
  SELECT round(-sum((CAST(c AS DOUBLE) / n) * log2(CAST(c AS DOUBLE) / n)), 6)
           AS entropy_bits
  FROM freq, tot
),
top AS (
  SELECT c, row_number() OVER (ORDER BY c DESC, token) AS rnk
  FROM freq ORDER BY c DESC, token LIMIT 100
),
reg AS (
  SELECT CAST(count(*) AS DOUBLE) AS m,
         sum(ln(CAST(rnk AS DOUBLE))) AS sx,
         sum(ln(CAST(c AS DOUBLE))) AS sy,
         sum(ln(CAST(rnk AS DOUBLE)) * ln(CAST(c AS DOUBLE))) AS sxy,
         sum(ln(CAST(rnk AS DOUBLE)) * ln(CAST(rnk AS DOUBLE))) AS sxx
  FROM top
)
SELECT t.n AS n_tokens, t.v AS vocab_size, e.entropy_bits,
       round((m * sxy - sx * sy) / (m * sxx - sx * sx), 6) AS zipf_slope
FROM tot t, ent e, reg
"""

ENTRIES["corpus_zipf_stats"] = (corpus_zipf_stats, CORPUS_ZIPF_SQL)


# ---------------------------------------------------------------------------
def streaming_hourly_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming entry in the correctness gate: the events
    table replays through a file-source stream into a tumbling 1-hour
    event-time window aggregate (``streaming/aggregates.py::
    replay_hourly_counts``), and the result must hash-match the plain
    GROUP BY the oracle runs — proving stream/batch answer equivalence,
    the core Structured Streaming guarantee."""
    from ..streaming.aggregates import replay_hourly_counts

    ev = read_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "ts"
    )
    return replay_hourly_counts(spark, ev)


STREAMING_HOURLY_SQL = """
SELECT make_timestamp((epoch_us(ts) // 3600000000) * 3600000000) AS window_start,
       event_type, CAST(count(*) AS BIGINT) AS n_events
FROM events GROUP BY 1, 2 ORDER BY 1, 2
"""

ENTRIES["streaming_hourly_counts"] = (
    streaming_hourly_counts,
    STREAMING_HOURLY_SQL,
)


# ---------------------------------------------------------------------------
def streaming_user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The STATEFUL streaming entry in the correctness gate: the events
    table replays through a file-source stream into a per-user
    ``session_window`` aggregation (``streaming/aggregates.py::
    replay_user_sessions`` — the session-merge state machine, not a
    stateless window), and the result must hash-match the oracle's
    batch gaps-and-islands sessionization.  Boundary pinned both sides:
    an event at exactly ``last_ts + gap`` merges (Spark merges while
    ``ts <= session_end``), so the oracle breaks sessions on
    ``ts - lag(ts) > gap`` strictly."""
    from ..streaming.aggregates import replay_user_sessions

    ev = read_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts"
    )
    return replay_user_sessions(spark, ev, gap="30 minutes")


STREAMING_SESSIONS_SQL = """
WITH marks AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
sess AS (
  SELECT user_id, ts,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM marks
)
SELECT min(ts)                       AS session_start,
       max(ts) + INTERVAL 30 MINUTE  AS session_end,
       user_id,
       CAST(count(*) AS BIGINT)      AS n_events
FROM sess
GROUP BY user_id, sid
ORDER BY user_id, session_start
"""

ENTRIES["streaming_user_sessions"] = (
    streaming_user_sessions,
    STREAMING_SESSIONS_SQL,
)


# ---------------------------------------------------------------------------
def streaming_dedup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DEDUP-state streaming entry in the correctness gate: the
    events table replays through a file-source stream into the native
    ``dropDuplicates`` state store keyed (user_id, event_type, day),
    and a batch aggregate over the deduped append output must
    hash-match the oracle's COUNT(DISTINCT user_id) — stream/batch
    equivalence for the third stateful operator class (dedup), after
    tumbling windows and session merge.  The result is a pure function
    of the surviving KEY SET, so it is deterministic even though
    dropDuplicates keeps an arbitrary first row per key; NULL key
    components are filtered explicitly on both sides (dropDuplicates
    keys NULLs, COUNT(DISTINCT) skips them — see
    replay_dedup_daily_users)."""
    from ..streaming.aggregates import replay_dedup_daily_users

    ev = read_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "ts"
    )
    out = replay_dedup_daily_users(spark, ev)
    # day as an ISO string, not DATE: this is the registry's first
    # DATE-typed output column and the external driver's hasher has no
    # proven DATE row yet — both engines' CAST(DATE AS STRING) is the
    # identical 'yyyy-MM-dd', which removes the type from the equation
    return out.select(
        "event_type", F.col("day").cast("string").alias("day"),
        "n_active_users",
    )


STREAMING_DEDUP_SQL = """
SELECT event_type, CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_active_users
FROM events
WHERE user_id IS NOT NULL AND event_type IS NOT NULL AND ts IS NOT NULL
GROUP BY event_type, CAST(ts AS DATE)
ORDER BY event_type, day
"""

ENTRIES["streaming_dedup_events"] = (
    streaming_dedup_events,
    STREAMING_DEDUP_SQL,
)


# ---------------------------------------------------------------------------
def semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup over the embeddings table: 8 deterministic centroids,
    within-cluster cosine >= 0.45 marks the higher id as a semantic dup
    (operators/similarity.py::semantic_dedup)."""
    return S.semantic_dedup(_emb(spark, sf_dir), num_clusters=8, threshold=0.45)


SEMANTIC_DEDUP_SQL = f"""
WITH cent AS (
  SELECT vec_id AS centroid_id, embedding AS cemb
  FROM embeddings ORDER BY vec_id LIMIT 8
),
scored AS (
  SELECT e.vec_id, e.embedding, c.centroid_id,
         round({_ORACLE_COS.format(a='e.embedding', b='c.cemb')}, 6) AS sim
  FROM embeddings e CROSS JOIN cent c
),
assign AS (
  SELECT vec_id, embedding, centroid_id FROM (
    SELECT *, row_number() OVER (
      PARTITION BY vec_id ORDER BY sim DESC, centroid_id) AS rn
    FROM scored) WHERE rn = 1
),
dups AS (
  SELECT DISTINCT b.vec_id, b.centroid_id
  FROM assign a JOIN assign b
    ON a.centroid_id = b.centroid_id AND a.vec_id < b.vec_id
  WHERE round({_ORACLE_COS.format(a='a.embedding', b='b.embedding')}, 6) >= 0.45
)
SELECT a.centroid_id AS cluster_id,
       CAST(count(*) AS BIGINT) AS n_members,
       CAST(coalesce(d.n, 0) AS BIGINT) AS n_dups
FROM assign a
LEFT JOIN (
  SELECT centroid_id, count(*) AS n FROM dups GROUP BY centroid_id
) d ON a.centroid_id = d.centroid_id
GROUP BY a.centroid_id, d.n
"""

ENTRIES["semantic_dedup"] = (semantic_dedup, SEMANTIC_DEDUP_SQL)


# ---------------------------------------------------------------------------
def lm_perplexity_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM cross-entropy quality scoring with decile buckets
    (operators/text.py::lm_perplexity) — the CCNet-style 'train a small
    LM on the corpus, drop the high-perplexity tail' pipeline stage."""
    return X.lm_perplexity(_docs(spark, sf_dir, spread=True))


LM_PERPLEXITY_SQL = """
WITH nums AS (SELECT i FROM range(1, 4001) r(i)),
toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
tok AS (SELECT doc_id, t[i] AS token FROM toks JOIN nums ON i <= len(t)),
big AS (SELECT doc_id, t[i] AS w1, t[i+1] AS w2
        FROM toks JOIN nums ON i <= len(t) - 1 AND i < 4000),
uni_c AS (SELECT token AS w1, CAST(count(*) AS BIGINT) AS c1
          FROM tok GROUP BY token),
big_c AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS cb
          FROM big GROUP BY w1, w2),
v AS (SELECT CAST(count(DISTINCT token) AS BIGINT) AS vocab FROM tok),
scored AS (
  SELECT b.doc_id, -log2((bc.cb + 1.0) / (uc.c1 + v.vocab)) AS bits
  FROM big b JOIN big_c bc ON b.w1 = bc.w1 AND b.w2 = bc.w2
             JOIN uni_c uc ON b.w1 = uc.w1
             CROSS JOIN v
),
doc_scores AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
         round(avg(bits), 6) AS bits_per_bigram
  FROM scored GROUP BY doc_id
)
SELECT doc_id, n_bigrams, bits_per_bigram,
       CAST(ntile(10) OVER (ORDER BY bits_per_bigram, doc_id) AS INTEGER)
         AS ppl_decile
FROM doc_scores
"""

ENTRIES["lm_perplexity_filter"] = (lm_perplexity_filter, LM_PERPLEXITY_SQL)


# ---------------------------------------------------------------------------
def dsir_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weighting toward the lang='en' target domain
    (operators/text.py::dsir_weights): hashed-bigram distribution ratio,
    selected = weight > 0."""
    return X.dsir_weights(
        _docs(spark, sf_dir, spread=True), target=F.col("lang") == "en"
    )


DSIR_SELECTION_SQL = f"""
WITH nums AS (SELECT i FROM range(1, 4001) r(i)),
toks AS (SELECT doc_id, string_split(text, ' ') AS t,
                (lang = 'en') AS is_tgt FROM documents),
feats AS (
  SELECT doc_id, is_tgt,
         ({md5_int_expr("t[i] || ' ' || t[i+1]", 'duckdb')}) % 1024 AS bucket
  FROM toks JOIN nums ON i <= len(t) - 1 AND i < 4000
),
raw_c AS (SELECT bucket, CAST(count(*) AS BIGINT) AS cr
          FROM feats GROUP BY bucket),
tgt_c AS (SELECT bucket, CAST(count(*) AS BIGINT) AS ct
          FROM feats WHERE is_tgt GROUP BY bucket),
tot AS (SELECT CAST(count(*) AS BIGINT) AS nr,
               CAST(count(*) FILTER (is_tgt) AS BIGINT) AS nt FROM feats),
dist AS (
  SELECT r.bucket,
         log2((coalesce(t.ct, 0) + 1.0) / (tot.nt + 1024.0))
           - log2((r.cr + 1.0) / (tot.nr + 1024.0)) AS lr
  FROM raw_c r LEFT JOIN tgt_c t USING (bucket) CROSS JOIN tot
)
SELECT f.doc_id, CAST(count(*) AS BIGINT) AS n_features,
       round(avg(d.lr), 6) AS logratio_per_feature,
       round(avg(d.lr), 6) > 0 AS selected
FROM feats f JOIN dist d USING (bucket)
GROUP BY f.doc_id
"""

ENTRIES["dsir_selection"] = (dsir_selection, DSIR_SELECTION_SQL)


# ---------------------------------------------------------------------------
def substring_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact substring dedup via overlapping 8-token window hashes +
    maximal-span interval merge (operators/dedup.py::substring_dedup)."""
    return D.substring_dedup(_docs(spark, sf_dir, spread=True))


SUBSTRING_DUP_SQL = """
WITH nums AS (SELECT i FROM range(1, 4001) r(i)),
toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
win AS (
  SELECT doc_id, i AS pos,
         md5(list_aggregate(t[i:i+7], 'string_agg', ' ')) AS h,
         len(t) AS n_tokens
  FROM toks JOIN nums ON i <= len(t) - 7
),
dup_h AS (SELECT h FROM win GROUP BY h HAVING count(*) > 1),
dupw AS (
  SELECT w.doc_id, w.pos, w.pos + 7 AS pend, w.n_tokens
  FROM win w JOIN dup_h USING (h)
),
islands AS (
  SELECT doc_id, pos, pend, n_tokens,
         CASE WHEN max(pend) OVER (PARTITION BY doc_id ORDER BY pos
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) >= pos
              THEN 0 ELSE 1 END AS new_island
  FROM dupw
),
spans AS (
  SELECT doc_id, n_tokens,
         sum(new_island) OVER (PARTITION BY doc_id ORDER BY pos) AS island_id,
         pos, pend
  FROM islands
),
merged AS (
  SELECT doc_id, n_tokens, island_id, min(pos) AS s, max(pend) AS e
  FROM spans GROUP BY doc_id, n_tokens, island_id
)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(count(*) AS BIGINT) AS n_dup_spans,
       CAST(sum(e - s + 1) AS BIGINT) AS n_dup_tokens,
       round(sum(e - s + 1) * 1.0 / n_tokens, 6) AS dup_token_frac
FROM merged GROUP BY doc_id, n_tokens
"""

ENTRIES["substring_dup_spans"] = (substring_dup_spans, SUBSTRING_DUP_SQL)


# ---------------------------------------------------------------------------
def substring_dup_spans_sa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True distributed generalized suffix array: suffixes bucketed by
    their exact 8-token prefix (buckets are complete SA intervals, no
    boundary merge), per-bucket sort + adjacent LCP for exact maximal
    repeat lengths (capped at the 16-token shipped context), interval
    merge to maximal spans (operators/dedup.py::substring_dedup_sa).
    The oracle replays the same semantics declaratively: exact window
    strings (no hashes), pairwise capped token-LCP via a probe-length
    join, identical island merge."""
    return D.substring_dedup_sa(_docs(spark, sf_dir, spread=True)).orderBy(
        "doc_id", "span_start"
    )


SUBSTRING_SA_SQL = """
WITH nums AS (SELECT i FROM range(1, 4001) r(i)),
ext AS (SELECT j FROM range(1, 17) r(j)),
toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
win AS (
  SELECT doc_id, i AS pos,
         list_aggregate(t[i:i+7], 'string_agg', ' ') AS wk,
         t[i:i+15] AS wl
  FROM toks JOIN nums ON i <= len(t) - 7
),
dup AS (
  SELECT doc_id, pos, wk, wl FROM (
    SELECT doc_id, pos, wk, wl, count(*) OVER (PARTITION BY wk) AS cnt
    FROM win)
  WHERE cnt > 1
),
starts AS (
  -- probe-length join computes each start's max capped token-LCP against
  -- any OTHER duplicated start sharing its 8-token prefix; j is bounded
  -- by the shorter context so truncated end-of-doc contexts cannot
  -- overshoot their true LCP via equal-short-slice comparisons
  SELECT a.doc_id, a.pos, max(e.j) AS match_len
  FROM dup a
  JOIN dup b ON a.wk = b.wk
            AND (a.doc_id != b.doc_id OR a.pos != b.pos)
  JOIN ext e ON e.j <= least(len(a.wl), len(b.wl))
            AND a.wl[1:e.j] = b.wl[1:e.j]
  GROUP BY a.doc_id, a.pos
),
islands AS (
  SELECT doc_id, pos, pos + 7 AS pend, match_len,
         CASE WHEN max(pos + 7) OVER (PARTITION BY doc_id ORDER BY pos
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) >= pos
              THEN 0 ELSE 1 END AS new_island
  FROM starts
),
spans AS (
  SELECT doc_id, match_len, pos, pend,
         sum(new_island) OVER (PARTITION BY doc_id ORDER BY pos) AS island_id
  FROM islands
)
SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_start,
       CAST(max(pend) AS BIGINT) AS span_end,
       CAST(count(*) AS BIGINT) AS n_dup_starts,
       CAST(max(match_len) AS BIGINT) AS max_match_len
FROM spans GROUP BY doc_id, island_id
ORDER BY doc_id, span_start
"""

ENTRIES["substring_dup_spans_sa"] = (substring_dup_spans_sa, SUBSTRING_SA_SQL)


# ---------------------------------------------------------------------------
def events_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ-style one-pass column profile of the events table
    (operators/profile.py::table_profile)."""
    from ..operators.profile import table_profile

    return table_profile(read_table(spark, sf_dir, "events"))


def _profile_col_sql(name: str, repr_fn) -> str:
    return f"""
SELECT '{name}' AS column_name,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(*) - count({name}) AS BIGINT) AS n_nulls,
       CAST(count(DISTINCT {name}) AS BIGINT) AS n_distinct,
       {repr_fn(f'min({name})')} AS min_repr,
       {repr_fn(f'max({name})')} AS max_repr
FROM events"""


EVENTS_PROFILE_SQL = " UNION ALL ".join(
    _profile_col_sql(n, r)
    for n, r in [
        ("event_id", lambda x: f"CAST({x} AS VARCHAR)"),
        ("ts", lambda x: f"strftime({x}, '%Y-%m-%d %H:%M:%S')"),
        ("user_id", lambda x: f"CAST({x} AS VARCHAR)"),
        ("event_type", lambda x: x),
        ("value", lambda x: f"printf('%.6f', {x})"),
        ("props", lambda x: x),
    ]
)

ENTRIES["events_profile"] = (events_profile, EVENTS_PROFILE_SQL)


# ---------------------------------------------------------------------------
def token_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokens with frequency > n/k (k=100) via per-partition Misra-Gries
    summaries + exact recount of candidates only
    (operators/sketches.py::heavy_hitters).

    The corpus is never shuffled on the token key: pass 1 is a map-only
    mapInPandas emitting <= partitions*k candidates, pass 2 recounts only
    rows semi-joined against the broadcast candidate list.  The candidate
    set varies with partitioning but the integer-exact ``cnt * k > n``
    filter makes the OUTPUT deterministic — which is what the oracle's
    plain GROUP BY .. HAVING verifies.  Contrast `corpus_top_bigrams`,
    which shuffles the full (token, count) vocabulary.
    """
    K = 100
    toks = _docs(spark, sf_dir, spread=True).select(
        F.explode(F.split("text", " ")).alias("token")
    )
    # include_total: the stream length rides along from the MG pass's
    # per-partition counts — a separate toks.count() here was a THIRD
    # full pass over the token explode (measured ~0.35 s of the query's
    # 1.0 s at sf0.1; at 100 TB a whole wasted corpus scan).
    hh = SK.heavy_hitters(toks, "token", K, include_total=True)
    return hh.select(
        "token",
        "cnt",
        F.round(F.col("cnt") / F.col("total"), 6).alias("share"),
    ).orderBy(F.desc("cnt"), "token")


TOKEN_HEAVY_HITTERS_SQL = f"""
WITH {_ORACLE_TOKS.strip()},
tot AS (SELECT count(*) AS n FROM tok)
SELECT token, CAST(count(*) AS BIGINT) AS cnt,
       round(count(*) * 1.0 / max(n), 6) AS share
FROM tok, tot
GROUP BY token
HAVING count(*) * 100 > max(n)
ORDER BY cnt DESC, token
"""

ENTRIES["token_heavy_hitters"] = (token_heavy_hitters, TOKEN_HEAVY_HITTERS_SQL)


# ---------------------------------------------------------------------------
def weighted_sample_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling without replacement via the
    replication trick: a doc with integer weight w competes with w
    independent md5 tickets and keeps its best (minimum) — exactly the
    classic weighted-reservoir race (Efraimidis-Spirakis with u^(1/w)
    replaced by an integer-exact min-of-w-uniforms), but reproducible
    bit-for-bit in both engines because tickets are md5 hex strings, not
    floats.  Take the k globally smallest priorities.

    Plan shape at 100 TB: the ticket min is built IN-ROW
    (transform(sequence(1, w)) + array_min — no explode, no shuffle), and
    the global top-k is TakeOrderedAndProject: per-partition partial
    top-k, driver merge of k-row heads.  The corpus never shuffles and
    nothing weight-expanded ever materializes.
    """
    K = 100
    docs = _docs(spark, sf_dir).select("doc_id", "source", "n_chars")
    # integer weight 1..8: n_chars // 100, capped
    w = (1 + F.least(F.floor(F.col("n_chars") / 100), F.lit(7))).cast("bigint")
    prio = F.expr(
        "array_min(transform(sequence(1, weight), "
        "i -> md5(CAST(doc_id AS STRING) || ':' || CAST(i AS STRING))))"
    )
    return (
        docs.withColumn("weight", w)
        .withColumn("prio", prio)
        .select("doc_id", "source", "weight", "prio")
        .orderBy("prio", "doc_id")
        .limit(K)
    )


WEIGHTED_SAMPLE_SQL = """
WITH w AS (
  SELECT doc_id, source,
         CAST(1 + least(n_chars // 100, 7) AS BIGINT) AS weight
  FROM documents
)
SELECT doc_id, source, weight,
       list_min(list_transform(range(1, CAST(weight + 1 AS INT)),
                i -> md5(CAST(doc_id AS VARCHAR) || ':' || CAST(i AS VARCHAR))))
         AS prio
FROM w
ORDER BY prio, doc_id
LIMIT 100
"""

ENTRIES["weighted_sample_topk"] = (weighted_sample_topk, WEIGHTED_SAMPLE_SQL)


# ---------------------------------------------------------------------------
def source_overlap_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source distinct-content overlap from MERGED KMV sketches —
    the set-algebra extension of `distinct_kmv_sketch`: union cardinality
    from the merged k-minimum-values sketch, intersection from the
    both-sketches fraction of the union sketch's k smallest (theta-sketch
    estimator), with the exact values computed beside them so the driver
    hash-checks estimator math, not floats-by-luck.

    Scale shape: the corpus is touched once to build per-source
    (source, h) distinct hashes; per-source sketches come from 32-shard
    partial k-mins (map-side combinable — no per-source global sort of
    the hash universe); everything pairwise happens on the
    sources x k sketch relation (6*128 rows here), which is the entire
    point of sketch algebra at 100 TB: pairwise overlap of N sources
    costs O(N^2 * k), not N^2 corpus joins.  The exact columns' self-join
    keys on the 16-byte content hash, never the text.
    """
    K = 64
    SRCS = [f"src{i}" for i in range(6)]
    docs = _docs(spark, sf_dir, spread=True).filter(F.col("source").isin(SRCS))
    from ..functions.hashing import hex_to_int_expr

    chunks = docs.select(
        "source", F.explode(F.expr(_CHUNK8_EXPR)).alias("chunk_hash")
    )
    hashes = chunks.select(
        "source", F.expr(hex_to_int_expr("chunk_hash", 12, "spark")).alias("h")
    ).distinct()

    sk = (
        SK.kmv_ranked(hashes, ["source"], k=K, shards=32)
        .filter(F.col("rn") <= K)
        .drop("rn", "cnt")
    )

    from ..plans.localrel import local_df

    pairs = local_df(
        spark,
        [(a, b) for a in SRCS for b in SRCS if a < b],
        "sa string, sb string",
    )
    ea = pairs.join(
        sk.withColumnRenamed("source", "sa"), "sa"
    ).select("sa", "sb", "h", F.lit(1).alias("ia"), F.lit(0).alias("ib"))
    eb = pairs.join(
        sk.withColumnRenamed("source", "sb"), "sb"
    ).select("sa", "sb", "h", F.lit(0).alias("ia"), F.lit(1).alias("ib"))
    u = (
        ea.unionByName(eb)
        .groupBy("sa", "sb", "h")
        .agg(F.max("ia").alias("ia"), F.max("ib").alias("ib"))
    )
    wp = Window.partitionBy("sa", "sb").orderBy("h")
    wc = Window.partitionBy("sa", "sb")
    ranked = (
        u.withColumn("rn", F.row_number().over(wp))
        .withColumn("cnt", F.count(F.lit(1)).over(wc))
        .filter(F.col("rn") <= K)
    )
    agg = ranked.groupBy("sa", "sb").agg(
        F.max("cnt").alias("cnt"),
        F.max(F.when(F.col("rn") == F.least(F.lit(K), F.col("cnt")), F.col("h"))).alias(
            "theta"
        ),
        F.sum(F.col("ia") * F.col("ib")).alias("both"),
        F.count(F.lit(1)).alias("ku"),
    )
    raw_u = F.when(F.col("cnt") < K, F.col("cnt").cast("double")).otherwise(
        (K - 1) * F.lit(float(16**12)) / F.col("theta")
    )

    counts = hashes.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    ha = hashes.select(F.col("source").alias("sa"), "h")
    hb = hashes.select(F.col("source").alias("sb"), "h")
    inter = (
        ha.join(hb, "h")
        .filter(F.col("sa") < F.col("sb"))
        .groupBy("sa", "sb")
        .agg(F.count(F.lit(1)).alias("exact_inter"))
    )
    return (
        agg.join(F.broadcast(counts.withColumnRenamed("source", "sa").withColumnRenamed("n", "n_a")), "sa")
        .join(F.broadcast(counts.withColumnRenamed("source", "sb").withColumnRenamed("n", "n_b")), "sb")
        .join(inter, ["sa", "sb"], "left")
        .na.fill({"exact_inter": 0})
        .select(
            "sa",
            "sb",
            "n_a",
            "n_b",
            (F.col("n_a") + F.col("n_b") - F.col("exact_inter")).alias(
                "exact_union"
            ),
            "exact_inter",
            F.round(raw_u, 4).alias("est_union"),
            F.round(F.col("both") / F.col("ku") * raw_u, 4).alias("est_inter"),
        )
        .orderBy("sa", "sb")
    )


from ..functions.hashing import hex_to_int_expr as _h2i
_KMV_OVERLAP_H = _h2i("chunk_hash", 12, "duckdb")
SOURCE_OVERLAP_KMV_SQL = f"""
WITH srcs AS (
  SELECT * FROM (VALUES ('src0'),('src1'),('src2'),('src3'),('src4'),('src5')) s(source)
), nums AS (SELECT i FROM range(0, 500) r(i)),
toks AS (
  SELECT d.source, string_split(d.text, ' ') AS t
  FROM documents d JOIN srcs s ON d.source = s.source
), chunk8 AS (
  SELECT source, md5(array_to_string(t[i*8+1 : i*8+8], ' ')) AS chunk_hash
  FROM toks JOIN nums ON i*8+8 <= len(t)
), hashes AS (
  SELECT DISTINCT source, {_KMV_OVERLAP_H} AS h FROM chunk8
), sk AS (
  SELECT source, h FROM (
    SELECT source, h, row_number() OVER (PARTITION BY source ORDER BY h) AS rn
    FROM hashes
  ) WHERE rn <= 64
), pairs AS (
  SELECT a.source AS sa, b.source AS sb FROM srcs a JOIN srcs b ON a.source < b.source
), u AS (
  SELECT sa, sb, h, max(ia) AS ia, max(ib) AS ib FROM (
    SELECT p.sa, p.sb, k.h, 1 AS ia, 0 AS ib FROM pairs p JOIN sk k ON k.source = p.sa
    UNION ALL
    SELECT p.sa, p.sb, k.h, 0 AS ia, 1 AS ib FROM pairs p JOIN sk k ON k.source = p.sb
  ) GROUP BY sa, sb, h
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY sa, sb ORDER BY h) AS rn,
         count(*) OVER (PARTITION BY sa, sb) AS cnt
  FROM u
), kept AS (SELECT * FROM ranked WHERE rn <= 64),
agg AS (
  SELECT sa, sb, max(cnt) AS cnt,
         max(CASE WHEN rn = least(64, cnt) THEN h END) AS theta,
         CAST(sum(ia * ib) AS BIGINT) AS both, count(*) AS ku
  FROM kept GROUP BY sa, sb
), counts AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n FROM hashes GROUP BY source
), inter AS (
  SELECT a.source AS sa, b.source AS sb, CAST(count(*) AS BIGINT) AS exact_inter
  FROM hashes a JOIN hashes b ON a.h = b.h AND a.source < b.source
  GROUP BY 1, 2
)
SELECT g.sa, g.sb, ca.n AS n_a, cb.n AS n_b,
       ca.n + cb.n - coalesce(i.exact_inter, 0) AS exact_union,
       coalesce(i.exact_inter, 0) AS exact_inter,
       round(CASE WHEN g.cnt < 64 THEN CAST(g.cnt AS DOUBLE)
                  ELSE 63 * 281474976710656.0 / g.theta END, 4) AS est_union,
       round(g.both * 1.0 / g.ku *
             CASE WHEN g.cnt < 64 THEN CAST(g.cnt AS DOUBLE)
                  ELSE 63 * 281474976710656.0 / g.theta END, 4) AS est_inter
FROM agg g
JOIN counts ca ON ca.source = g.sa
JOIN counts cb ON cb.source = g.sb
LEFT JOIN inter i ON i.sa = g.sa AND i.sb = g.sb
ORDER BY g.sa, g.sb
"""

ENTRIES["source_overlap_kmv"] = (source_overlap_kmv, SOURCE_OVERLAP_KMV_SQL)


# ---------------------------------------------------------------------------
def events_multitouch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position-based (40/20/40) multi-touch attribution: every click is
    assigned to the NEXT same-user purchase within 7 days, and each
    purchase's value is split across its clicks — first and last touch
    get 40% each, middles share the remaining 20% (n=1 takes 100%,
    n=2 split 50/50).

    Scale shape: click->next-purchase assignment is ONE user-keyed
    window (a running last-purchase over the time-descending scan — the
    same single-shuffle trick as the as-of join, no range self-join); the
    per-purchase position weights are one window over the assigned-click
    relation (clicks-with-a-purchase cardinality, not corpus); the final
    rollup is a 10-row channel aggregate.  Credits are integer
    micro-units (round(value * w * 1e6) per row — row-local IEEE math)
    so the cross-engine sums are exact.
    """
    ev = read_table(spark, sf_dir, "events")
    us = epoch_us("ts")
    base = ev.select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        us.alias("us"),
        # try_cast + NULL-on-malformed (see events_json_bucket): bad
        # props degrade to a NULL channel, never crash the query
        (
            F.expr("try_cast(get_json_object(props, '$.k') AS INT)") % 10
        ).alias("channel"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("kind"),
    ).filter(F.col("event_type").isin("click", "purchase"))
    wscan = (
        Window.partitionBy("user_id")
        .orderBy(F.desc("us"), F.asc("kind"), F.desc("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    assigned = (
        base.withColumn(
            "np_us",
            F.last(F.when(F.col("kind") == 1, F.col("us")), ignorenulls=True).over(
                wscan
            ),
        )
        .withColumn(
            "np_id",
            F.last(
                F.when(F.col("kind") == 1, F.col("event_id")), ignorenulls=True
            ).over(wscan),
        )
        .filter(
            (F.col("kind") == 0)
            & F.col("np_us").isNotNull()
            & (F.col("np_us") - F.col("us") <= F.lit(7 * 86400 * 1_000_000))
        )
        .select("event_id", "channel", "us", "np_id")
    )
    wp = Window.partitionBy("np_id").orderBy("us", "event_id")
    wn = Window.partitionBy("np_id")
    pos = (
        assigned.withColumn("pos", F.row_number().over(wp))
        .withColumn("n", F.count(F.lit(1)).over(wn))
    )
    wfrac = (
        F.when(F.col("n") == 1, F.lit(1.0))
        .when(F.col("n") == 2, F.lit(0.5))
        .when((F.col("pos") == 1) | (F.col("pos") == F.col("n")), F.lit(0.4))
        .otherwise(F.lit(0.2) / (F.col("n") - 2))
    )
    purchases = base.filter(F.col("kind") == 1).select(
        F.col("event_id").alias("np_id"), F.col("value").alias("p_value")
    )
    credited = pos.join(purchases, "np_id").withColumn(
        "credit_micro",
        F.round(F.col("p_value") * wfrac * 1_000_000).cast("bigint"),
    )
    return (
        credited.groupBy("channel")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_clicks"),
            F.sum("credit_micro").alias("credit_micro"),
        )
        .orderBy("channel")
    )


EVENTS_MULTITOUCH_SQL = """
WITH base AS (
  SELECT event_id, user_id, event_type, value,
         epoch_us(ts) AS us,
         TRY_CAST(CASE WHEN json_valid(props)
                       THEN json_extract_string(props, '$.k') END
                  AS INTEGER) % 10 AS channel,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS kind
  FROM events WHERE event_type IN ('click', 'purchase')
), scanned AS (
  SELECT *,
         last_value(CASE WHEN kind = 1 THEN us END IGNORE NULLS)
           OVER w AS np_us,
         last_value(CASE WHEN kind = 1 THEN event_id END IGNORE NULLS)
           OVER w AS np_id
  FROM base
  WINDOW w AS (PARTITION BY user_id
               ORDER BY us DESC, kind ASC, event_id DESC
               ROWS UNBOUNDED PRECEDING)
), assigned AS (
  SELECT event_id, channel, us, np_id
  FROM scanned
  WHERE kind = 0 AND np_us IS NOT NULL
    AND np_us - us <= CAST(7 AS BIGINT) * 86400 * 1000000
), pos AS (
  SELECT *,
         row_number() OVER (PARTITION BY np_id ORDER BY us, event_id) AS pos,
         count(*) OVER (PARTITION BY np_id) AS n
  FROM assigned
), credited AS (
  SELECT p.channel,
         CAST(round(pu.value *
           CASE WHEN p.n = 1 THEN 1.0
                WHEN p.n = 2 THEN 0.5
                WHEN p.pos = 1 OR p.pos = p.n THEN 0.4
                ELSE 0.2 / (p.n - 2) END * 1000000) AS BIGINT) AS credit_micro
  FROM pos p
  JOIN (SELECT event_id AS np_id, value FROM events
        WHERE event_type = 'purchase') pu ON p.np_id = pu.np_id
)
SELECT channel, CAST(count(*) AS BIGINT) AS n_clicks,
       CAST(sum(credit_micro) AS BIGINT) AS credit_micro
FROM credited GROUP BY channel ORDER BY channel
"""

ENTRIES["events_multitouch_attribution"] = (
    events_multitouch_attribution,
    EVENTS_MULTITOUCH_SQL,
)


# ---------------------------------------------------------------------------
def token_freq_cm_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min frequency estimates for the 20 most frequent tokens,
    next to their exact counts — the point-query complement of the
    Misra-Gries heavy-hitter set: CM answers "how often does THIS token
    occur" from depth x width = 3 x 1024 integer counters, mergeable
    across any partitioning by plain addition.

    The sketch build is ONE explode pass: each token occurrence hashes
    into 3 seeded buckets (in-row), then a (seed, bucket) hash aggregate
    — the corpus shuffles only 3072-cardinality keyed partial counts.
    Estimates read min over the 3 rows a token hashes to; CM guarantees
    est >= exact always (collisions only ADD), pinned in tests.  All
    hashing is md5, so estimates are bit-identical cross-engine.
    """
    D, W = 3, 1024
    toks = _docs(spark, sf_dir, spread=True).select(
        F.explode(F.split("text", " ")).alias("token")
    )
    seeds = F.sequence(F.lit(1), F.lit(D))
    hashed = toks.select(
        "token", F.explode(seeds).alias("seed")
    ).withColumn(
        "bucket",
        F.expr(md5_int_expr("CAST(seed AS STRING) || '|' || token", "spark", 12))
        % W,
    )
    cm = hashed.groupBy("seed", "bucket").agg(F.count(F.lit(1)).alias("cnt"))

    exact = (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("exact_cnt"))
        .orderBy(F.desc("exact_cnt"), "token")
        .limit(20)
    )
    probes = exact.select(
        "token", "exact_cnt", F.explode(F.sequence(F.lit(1), F.lit(D))).alias("seed")
    ).withColumn(
        "bucket",
        F.expr(md5_int_expr("CAST(seed AS STRING) || '|' || token", "spark", 12))
        % W,
    )
    return (
        probes.join(cm, ["seed", "bucket"])
        .groupBy("token", "exact_cnt")
        .agg(F.min("cnt").alias("cm_est"))
        .select(
            "token",
            "exact_cnt",
            "cm_est",
            (F.col("cm_est") - F.col("exact_cnt")).alias("overcount"),
        )
        .orderBy(F.desc("exact_cnt"), "token")
    )


_CM_BUCKET_DUCK = md5_int_expr("CAST(seed AS VARCHAR) || '|' || token", "duckdb", 12)
TOKEN_FREQ_CM_SQL = f"""
WITH {_ORACLE_TOKS.strip()},
seeds AS (SELECT i AS seed FROM range(1, 4) r(i)),
hashed AS (
  SELECT token, seed, ({_CM_BUCKET_DUCK}) % 1024 AS bucket
  FROM tok CROSS JOIN seeds
), cm AS (
  SELECT seed, bucket, count(*) AS cnt FROM hashed GROUP BY seed, bucket
), exact AS (
  SELECT token, CAST(count(*) AS BIGINT) AS exact_cnt
  FROM tok GROUP BY token
  ORDER BY exact_cnt DESC, token LIMIT 20
), probes AS (
  SELECT e.token, e.exact_cnt, s.seed,
         ({_CM_BUCKET_DUCK.replace('token', 'e.token').replace('CAST(seed', 'CAST(s.seed')}) % 1024 AS bucket
  FROM exact e CROSS JOIN seeds s
)
SELECT p.token, p.exact_cnt, CAST(min(c.cnt) AS BIGINT) AS cm_est,
       CAST(min(c.cnt) - p.exact_cnt AS BIGINT) AS overcount
FROM probes p JOIN cm c ON c.seed = p.seed AND c.bucket = p.bucket
GROUP BY p.token, p.exact_cnt
ORDER BY p.exact_cnt DESC, p.token
"""

ENTRIES["token_freq_cm_sketch"] = (token_freq_cm_sketch, TOKEN_FREQ_CM_SQL)


# ---------------------------------------------------------------------------
# embedding_dim_stats — per-dimension feature statistics of the embedding
# column (the normalization pass before training / whitening / PQ
# codebook fitting).  posexplode fans each vector into (dim, value) rows
# — embarrassingly parallel, 64x row growth but constant width — then one
# 64-key hash aggregate.  Mean/std use the explicit sum/sumsq
# formulation so BOTH engines execute the identical arithmetic (the
# engines' stddev_pop intrinsics use different numerics); round(6)
# absorbs partition-order float drift in the sums themselves.
def embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    ex = emb.select(
        F.posexplode("embedding").alias("dim", "v")
    ).select("dim", F.col("v").cast("double").alias("v"))
    return (
        ex.groupBy("dim")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("s"),
            F.sum(F.col("v") * F.col("v")).alias("ss"),
        )
        .select(
            "dim",
            "n",
            F.round(F.col("s") / F.col("n"), 6).alias("mean"),
            # GREATEST(var, 0): float cancellation on a zero-variance
            # dimension can yield -1e-18, which DuckDB's sqrt() hard-errors
            # on (Spark returns NaN) — clamp BOTH engines identically.
            F.round(
                F.sqrt(
                    F.greatest(
                        (F.col("ss") - F.col("s") * F.col("s") / F.col("n"))
                        / F.col("n"),
                        F.lit(0.0),
                    )
                ),
                6,
            ).alias("std"),
        )
        .orderBy("dim")
    )


EMBEDDING_DIM_STATS_SQL = """
WITH nums AS (SELECT i FROM range(1, 65) r(i)),
ex AS (
  SELECT i - 1 AS dim, CAST(embedding[i] AS DOUBLE) AS v
  FROM embeddings CROSS JOIN nums),
agg AS (
  SELECT dim, COUNT(*) AS n, SUM(v) AS s, SUM(v * v) AS ss
  FROM ex GROUP BY 1)
SELECT dim, n,
       ROUND(s / n, 6) AS mean,
       ROUND(sqrt(GREATEST((ss - s * s / n) / n, 0.0)), 6) AS std
FROM agg
ORDER BY dim
"""

ENTRIES["embedding_dim_stats"] = (embedding_dim_stats, EMBEDDING_DIM_STATS_SQL)


# ---------------------------------------------------------------------------
# doc_prefix_jaccard_join — exact set-similarity self-join via prefix
# filtering (operators/dedup.py::prefix_jaccard_join; PPJoin family).
# The oracle generates candidates naively (pairs sharing ANY token) and
# applies the same integer-exact threshold — the two results being equal
# IS the prefix filter's no-false-negative guarantee, checked
# differentially.  All threshold math is integer (t = 19/20); no float
# ever decides membership.
def doc_prefix_jaccard_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir, spread=True)
    return (
        D.prefix_jaccard_join(docs, threshold_num=19, threshold_den=20)
        .orderBy("doc_a", "doc_b")
    )


DOC_PREFIX_JACCARD_SQL = """
WITH nums AS (SELECT i FROM range(1, 4001) r(i)),
toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
tok AS (SELECT DISTINCT doc_id, t[i] AS token
        FROM toks JOIN nums ON i <= len(t) WHERE t[i] <> ''),
sz AS (SELECT doc_id, COUNT(*) AS n FROM tok GROUP BY 1),
inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
          FROM tok a JOIN tok b ON a.token = b.token AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
SELECT i.doc_a, i.doc_b,
       CAST(i.i AS INT) AS n_inter,
       CAST(sa.n + sb.n - i.i AS INT) AS n_union,
       ROUND(i.i / CAST(sa.n + sb.n - i.i AS DOUBLE), 6) AS jaccard
FROM inter i
JOIN sz sa ON i.doc_a = sa.doc_id
JOIN sz sb ON i.doc_b = sb.doc_id
WHERE 20 * i.i >= 19 * (sa.n + sb.n - i.i)
ORDER BY doc_a, doc_b
"""

ENTRIES["doc_prefix_jaccard_join"] = (
    doc_prefix_jaccard_join,
    DOC_PREFIX_JACCARD_SQL,
)


# ---------------------------------------------------------------------------
# doc_containment_pairs — asymmetric containment (doc-in-doc) join over
# 3-gram shingle sets (operators/dedup.py::prefix_containment_join): pairs
# where the SMALLER set is >= 4/5 covered by the intersection.  Jaccard
# misses a short doc quoted inside a long one; containment is the
# standard subset-dup detector.  The oracle generates candidates naively
# (pairs sharing ANY shingle) and applies the same integer-exact
# threshold — equality with the prefix-filtered Spark plan IS the
# containment prefix bound's no-false-negative guarantee, checked
# differentially.  Shingles are md5-hashed to 60-bit ints on BOTH sides
# (identical keys, exact identity; 8-byte shuffle keys at scale).
def doc_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir, spread=True)
    return (
        D.prefix_containment_join(docs, threshold_num=4, threshold_den=5)
        .orderBy("doc_a", "doc_b")
    )


DOC_CONTAINMENT_SQL = f"""
WITH {_ORACLE_SHINGLES.strip()},
shh AS (SELECT DISTINCT doc_id,
               {hex_to_int_expr("md5(shingle)", 15, "duckdb")} AS shingle
        FROM sh),
counts AS (SELECT doc_id, count(*) AS n FROM shh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
  FROM shh a JOIN shh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT i.doc_a, i.doc_b,
       CAST(i.i AS INT) AS n_inter,
       CAST(LEAST(ca.n, cb.n) AS INT) AS n_min,
       ROUND(i.i / CAST(LEAST(ca.n, cb.n) AS DOUBLE), 6) AS containment
FROM inter i
JOIN counts ca ON i.doc_a = ca.doc_id
JOIN counts cb ON i.doc_b = cb.doc_id
WHERE 5 * i.i >= 4 * LEAST(ca.n, cb.n)
ORDER BY doc_a, doc_b
"""

ENTRIES["doc_containment_pairs"] = (doc_containment_pairs, DOC_CONTAINMENT_SQL)


# ---------------------------------------------------------------------------
# ann_ivf_recall — ANN quality harness: per-query recall@5 of the IVF
# index against the brute-force cosine ground truth, composed from the
# same two operators the standalone queries use (same quantizer, nprobe,
# tie-breaks).  The eval join is id-width (10 queries x 5 ranks per arm);
# each arm keeps its own scale posture (broadcast queries + WindowGroupLimit
# top-k; centroid-cardinality assignment).  recall is n_hits/5 with both
# values emitted — n_hits integer-exact, recall rounded 1e-6.
def ann_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    # Queries (vec_id < 10) and the quantizer's centroids (vec_id < 16)
    # are both id-prefixes of the corpus: collect the 16-row head ONCE
    # (pushed-filter parquet scan) and slice it locally, instead of each
    # arm re-collecting its own copy (was: one toPandas job for queries
    # + one for centroids inside ivf_topk, plus a broadcast re-scan in
    # cosine_topk — three driver jobs re-deriving the same 16 rows).
    head = (
        emb.filter(F.col("vec_id") < 16)
        .select("vec_id", "embedding")
        .toPandas()
    )
    qs_pd = head[head["vec_id"] < 10]
    qs = spark.createDataFrame(qs_pd)  # local relation — no scan job
    cent_pd = head.rename(columns={"vec_id": "centroid_id"})
    exact = S.cosine_topk(qs, emb, k=5).select("query_id", "neighbor_id")
    approx = S.ivf_topk(
        qs_pd, emb, num_centroids=16, nprobe=2, k=5, centroids=cent_pd
    ).select("query_id", "neighbor_id")
    hits = (
        exact.join(approx, ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).cast("int").alias("n_hits"))
    )
    univ = exact.select("query_id").distinct()
    return (
        univ.join(hits, "query_id", "left")
        .select(
            "query_id",
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("int").alias("n_hits"),
            F.round(
                F.coalesce(F.col("n_hits"), F.lit(0)) / F.lit(5.0), 6
            ).alias("recall_at_5"),
        )
        .orderBy("query_id")
    )


ANN_IVF_RECALL_SQL = f"""
WITH exact_scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         round({_ORACLE_COS.format(a='q.embedding', b='c.embedding')}, 6) AS cosine
  FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
  WHERE q.vec_id < 10
),
exact_ranked AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY cosine DESC, neighbor_id) AS rn
    FROM exact_scored
  ) WHERE rn <= 5
),
cent AS (
  SELECT vec_id AS centroid_id, embedding AS cv FROM embeddings WHERE vec_id < 16
),
assign0 AS (
  SELECT e.vec_id, c.centroid_id,
         round({_ORACLE_COS.format(a='e.embedding', b='c.cv')}, 6) AS c_cos
  FROM embeddings e, cent c
),
lists AS (
  SELECT vec_id, centroid_id FROM (
    SELECT vec_id, centroid_id,
           row_number() OVER (PARTITION BY vec_id ORDER BY c_cos DESC, centroid_id) AS rn
    FROM assign0
  ) WHERE rn = 1
),
probes AS (
  SELECT query_id, centroid_id FROM (
    SELECT vec_id AS query_id, centroid_id,
           row_number() OVER (PARTITION BY vec_id ORDER BY c_cos DESC, centroid_id) AS rn
    FROM assign0 WHERE vec_id < 10
  ) WHERE rn <= 2
),
cand AS (
  SELECT DISTINCT p.query_id, l.vec_id AS neighbor_id
  FROM probes p JOIN lists l ON p.centroid_id = l.centroid_id
  WHERE p.query_id <> l.vec_id
),
ivf_scored AS (
  SELECT c.query_id, c.neighbor_id,
         round({_ORACLE_COS.format(a='q.embedding', b='n.embedding')}, 6) AS cosine
  FROM cand c
  JOIN embeddings q ON q.vec_id = c.query_id
  JOIN embeddings n ON n.vec_id = c.neighbor_id
),
ivf_ranked AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY cosine DESC, neighbor_id) AS rn
    FROM ivf_scored
  ) WHERE rn <= 5
),
hits AS (
  SELECT e.query_id, count(*) AS n_hits
  FROM exact_ranked e
  JOIN ivf_ranked v
    ON e.query_id = v.query_id AND e.neighbor_id = v.neighbor_id
  GROUP BY 1
),
qs AS (SELECT DISTINCT query_id FROM exact_ranked)
SELECT q.query_id,
       CAST(COALESCE(h.n_hits, 0) AS INT) AS n_hits,
       ROUND(COALESCE(h.n_hits, 0) / 5.0, 6) AS recall_at_5
FROM qs q LEFT JOIN hits h ON q.query_id = h.query_id
ORDER BY q.query_id
"""

ENTRIES["ann_ivf_recall"] = (ann_ivf_recall, ANN_IVF_RECALL_SQL)


# ---------------------------------------------------------------------------
def gopher_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher rule-set gating report (Rae et al. 2021 §A1.1) per source:
    document pass counts plus per-rule failure counts
    (operators/text.py::gopher_quality_rules).  Single corpus scan —
    the rules project in-row (source carried through, no join back) and
    collapse in one partial-agg groupBy of source cardinality.
    min_stop_words=1: the synthetic vocabulary carries only 'the' from
    the Gopher stop list (the paper's >=2-of-8 rule would zero out the
    corpus and gate nothing differentially); every threshold is
    integer-exact cross-multiplied arithmetic in both engines."""
    rules = X.gopher_quality_rules(
        _docs(spark, sf_dir), min_stop_words=1, carry=("source",)
    )
    agg = rules.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.when(F.col("passed"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_pass"),
        F.sum(F.when(~F.col("r_words"), 1).otherwise(0))
        .cast("bigint")
        .alias("fail_word_count"),
        F.sum(F.when(~F.col("r_wordlen"), 1).otherwise(0))
        .cast("bigint")
        .alias("fail_word_length"),
        F.sum(F.when(~F.col("r_symbol"), 1).otherwise(0))
        .cast("bigint")
        .alias("fail_symbol_ratio"),
        F.sum(F.when(~F.col("r_alpha"), 1).otherwise(0))
        .cast("bigint")
        .alias("fail_alpha_words"),
        F.sum(F.when(~F.col("r_stop"), 1).otherwise(0))
        .cast("bigint")
        .alias("fail_stop_words"),
    )
    return agg.orderBy("source")


GOPHER_GATE_SQL = """
WITH d AS (
  SELECT source, string_split(text, ' ') AS t, len(text) AS nchars,
         len(text) - len(replace(text, '#', ''))
           + len(text) - len(replace(text, '…', '')) AS n_sym
  FROM documents
),
m AS (
  SELECT source,
         len(t) AS n_words,
         nchars - (len(t) - 1) AS nonspace,
         n_sym,
         len(list_filter(t, x -> regexp_matches(x, '[a-zA-Z]'))) AS n_alpha,
         len(list_intersect(list_distinct(t),
             ['the','be','to','of','and','that','have','with'])) AS n_stop
  FROM d
),
r AS (
  SELECT source,
         (n_words BETWEEN 50 AND 100000) AS r_words,
         (3 * n_words <= nonspace AND nonspace <= 10 * n_words) AS r_wordlen,
         (10 * n_sym < n_words) AS r_symbol,
         (5 * n_alpha >= 4 * n_words) AS r_alpha,
         (n_stop >= 1) AS r_stop
  FROM m
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN r_words AND r_wordlen AND r_symbol AND r_alpha
                          AND r_stop THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
       CAST(sum(CASE WHEN NOT r_words THEN 1 ELSE 0 END) AS BIGINT)
         AS fail_word_count,
       CAST(sum(CASE WHEN NOT r_wordlen THEN 1 ELSE 0 END) AS BIGINT)
         AS fail_word_length,
       CAST(sum(CASE WHEN NOT r_symbol THEN 1 ELSE 0 END) AS BIGINT)
         AS fail_symbol_ratio,
       CAST(sum(CASE WHEN NOT r_alpha THEN 1 ELSE 0 END) AS BIGINT)
         AS fail_alpha_words,
       CAST(sum(CASE WHEN NOT r_stop THEN 1 ELSE 0 END) AS BIGINT)
         AS fail_stop_words
FROM r GROUP BY source ORDER BY source
"""

ENTRIES["gopher_quality_gate"] = (gopher_quality_gate, GOPHER_GATE_SQL)


# ---------------------------------------------------------------------------
def gopher_repetition_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher repetition signals per source (Rae et al. 2021 §A1.1):
    characters under the most frequent word 2-gram and characters covered
    by duplicated 5-grams (position-marked, each counted once), as exact
    integer sums with rounded fractions
    (operators/text.py::gopher_repetition_signals — one Arrow pass, the
    statistic is doc-local so the token stream never shuffles).  The
    oracle rebuilds both signals relationally: positional self-joins for
    the n-grams, HAVING count(*)>1 for duplication, and a DISTINCT
    position × offset expansion for the once-per-character coverage.
    Space-joined n-grams are injective for a fixed token count, so the
    string grouping equals the tuple grouping."""
    # dup_n=3 (paper range is 5-10): the synthetic corpus carries no
    # within-doc duplicated 5-grams at any SF, so the 3-gram variant is
    # the discriminative choice; column names keep the canonical labels
    rep = X.gopher_repetition_signals(
        _docs(spark, sf_dir, spread=True), carry=("source",), dup_n=3
    )
    return (
        rep.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("total_chars").cast("bigint").alias("total_chars"),
            F.sum("top2_chars").cast("bigint").alias("top2_chars"),
            F.sum("dup5_chars").cast("bigint").alias("dup5_chars"),
        )
        # try_divide: a source whose docs are all NULL/empty text has
        # total_chars NULL or 0 — DuckDB's double x/0 is NULL, ANSI
        # Spark's is an error; try_divide aligns them
        .withColumn(
            "top2_frac",
            F.round(
                F.try_divide(F.col("top2_chars"), F.col("total_chars")), 6
            ),
        )
        .withColumn(
            "dup5_frac",
            F.round(
                F.try_divide(F.col("dup5_chars"), F.col("total_chars")), 6
            ),
        )
        .orderBy("source")
    )


GOPHER_REPETITION_SQL = """
WITH nums AS (SELECT i FROM range(1, 4005) r(i)),
toks AS (SELECT doc_id, source, string_split(text, ' ') AS t,
                len(text) AS nchars
         FROM documents),
tk AS (SELECT doc_id, i AS p, t[i] AS w FROM toks JOIN nums ON i <= len(t)),
tot AS (SELECT doc_id, source, nchars - (len(t) - 1) AS total_chars
        FROM toks),
g2 AS (
  SELECT a.doc_id, a.w || ' ' || b.w AS gram, count(*) AS cnt
  FROM tk a JOIN tk b ON b.doc_id = a.doc_id AND b.p = a.p + 1
  WHERE a.p <= 4000
  GROUP BY 1, 2),
top2 AS (
  SELECT doc_id, cnt * (len(gram) - 1) AS top2_chars FROM (
    SELECT doc_id, gram, cnt,
           row_number() OVER (PARTITION BY doc_id
                              ORDER BY cnt DESC, gram) AS rn
    FROM g2) WHERE rn = 1),
g5 AS (
  SELECT a.doc_id, a.p,
         a.w || ' ' || b.w || ' ' || c.w AS gram
  FROM tk a
  JOIN tk b ON b.doc_id = a.doc_id AND b.p = a.p + 1
  JOIN tk c ON c.doc_id = a.doc_id AND c.p = a.p + 2
  WHERE a.p <= 4000),
dup AS (SELECT doc_id, gram FROM g5 GROUP BY doc_id, gram
        HAVING count(*) > 1),
off AS (SELECT j FROM range(0, 3) r(j)),
cov AS (SELECT DISTINCT s.doc_id, s.p + o.j AS cp
        FROM g5 s JOIN dup USING (doc_id, gram) CROSS JOIN off o),
dup5 AS (SELECT c.doc_id, sum(len(t.w)) AS dup5_chars
         FROM cov c JOIN tk t ON t.doc_id = c.doc_id AND t.p = c.cp
         GROUP BY 1)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(total_chars) AS BIGINT) AS total_chars,
       CAST(sum(coalesce(top2_chars, 0)) AS BIGINT) AS top2_chars,
       CAST(sum(coalesce(dup5_chars, 0)) AS BIGINT) AS dup5_chars,
       round(sum(coalesce(top2_chars, 0)) * 1.0 / sum(total_chars), 6)
         AS top2_frac,
       round(sum(coalesce(dup5_chars, 0)) * 1.0 / sum(total_chars), 6)
         AS dup5_frac
FROM tot LEFT JOIN top2 USING (doc_id) LEFT JOIN dup5 USING (doc_id)
GROUP BY source ORDER BY source
"""

ENTRIES["gopher_repetition_report"] = (
    gopher_repetition_report,
    GOPHER_REPETITION_SQL,
)


# ---------------------------------------------------------------------------
# terms present in BOTH the driver corpus and the fuzz-harness vocab,
# spanning idf regimes (high-df "the" exercises the non-negative idf floor)
_BM25_TERMS = ("data", "spark", "the")


def doc_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 retrieval over the corpus for a fixed query-term bag —
    the lexical half of a training-data search/retrieval stack.  Integer
    nano-unit scoring (order-independent sums); the corpus token stream
    is filtered to the query terms inside the explode's codegen stage,
    so only matched rows shuffle.  No spread: the operator repartitions
    by doc_id itself (tfidf pattern) — spreading here would double-shuffle.
    """
    return X.bm25_topk(_docs(spark, sf_dir), _BM25_TERMS, k=20)


DOC_BM25_TOPK_SQL = f"""
WITH
toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
lens AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS dl FROM toks),
stats AS (SELECT CAST(count(*) AS BIGINT) AS n, avg(dl) AS avgdl FROM lens),
nums AS (SELECT i FROM range(1, 4001) r(i)),
tok AS (SELECT doc_id, t[i] AS token FROM toks JOIN nums ON i <= len(t)),
tf AS (
  SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
  FROM tok WHERE token IN {_BM25_TERMS!r}
  GROUP BY doc_id, token
),
dfr AS (SELECT token, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY token),
term_scores AS (
  SELECT tf.doc_id,
         CAST(round(1e9 *
           ln((CAST(s.n AS DOUBLE) - dfr.df + 0.5) / (dfr.df + 0.5) + 1.0)
           * (tf.tf * (1.2 + 1.0))
           / (tf.tf + 1.2 * ((1.0 - 0.75) + 0.75 * l.dl / s.avgdl))
         ) AS BIGINT) AS score_nano
  FROM tf JOIN dfr ON tf.token = dfr.token
          JOIN lens l ON tf.doc_id = l.doc_id, stats s
),
scored AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_terms,
         CAST(sum(score_nano) AS BIGINT) AS score_nano
  FROM term_scores GROUP BY doc_id
),
topk AS (
  SELECT doc_id, n_terms, score_nano,
         CAST(row_number() OVER (ORDER BY score_nano DESC, doc_id) AS INTEGER) AS rank
  FROM scored
)
SELECT doc_id, n_terms, round(score_nano / 1e9, 6) AS score, rank
FROM topk WHERE rank <= 20
"""


def source_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source trigram novelty (share of a doc's distinct trigrams
    with corpus doc-frequency 1) — a diversity/memorization signal for
    source-level curation.  Pure integer counting; one distinct shuffle
    + one count window, no joins."""
    return X.ngram_novelty(_docs(spark, sf_dir, spread=True), n=3)


SOURCE_NGRAM_NOVELTY_SQL = """
WITH
toks AS (SELECT doc_id, source, string_split(text, ' ') AS t FROM documents),
nums AS (SELECT i FROM range(1, 4001) r(i)),
big AS (SELECT DISTINCT doc_id, source,
               t[i] || ' ' || t[i + 1] || ' ' || t[i + 2] AS ngram
        FROM toks JOIN nums ON i <= len(t) - 2),
perdoc AS (
  SELECT doc_id, source, CAST(count(*) AS BIGINT) AS n_ngrams,
         CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS novel
  FROM (SELECT doc_id, source, ngram,
               count(*) OVER (PARTITION BY ngram) AS df FROM big)
  GROUP BY doc_id, source
)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(novel) AS BIGINT) AS novel_ngrams,
       CAST(sum(n_ngrams) AS BIGINT) AS total_ngrams,
       round(sum(novel) / CAST(sum(n_ngrams) AS DOUBLE), 6) AS novelty
FROM perdoc GROUP BY source
"""

ENTRIES["doc_bm25_topk"] = (doc_bm25_topk, DOC_BM25_TOPK_SQL)
ENTRIES["source_ngram_novelty"] = (
    source_ngram_novelty,
    SOURCE_NGRAM_NOVELTY_SQL,
)


# ---------------------------------------------------------------------------
def hybrid_rank_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval via Reciprocal Rank Fusion (Cormack et al. 2009):
    fuse a dense ranking (embedding cosine) with a lexical ranking
    (token-set Jaccard against the query document's text) as
    rrf = 1/(60+r_dense) + 1/(60+r_lex) over the two top-50 lists, and
    keep the fused top-10 per query.

    Scale shape — ONE exchange end to end (round 11; the full-outer
    formulation cost four): the 5-query set is broadcast against the
    partitioned corpus on BOTH arms (cosine via ``S.with_cosine``, the
    lexical arm in-row array_intersect/size with zero-overlap pairs
    dropped pre-window, mirroring the oracle's token equi-join); the two
    scored streams UNION with an arm tag, and everything downstream —
    per-arm top-50 window on (query_id, arm), the pair merge as a
    groupBy (query_id, neighbor_id) pivot (semantically the full outer
    join of the two rank lists), and the fused top-10 window — is
    satisfied by the single hash(query_id) distribution, so Catalyst
    plans exactly one Exchange after the scans.  All ranks are
    integers, so the fused score is a fixed two-term double expression —
    deterministic across engines and partitionings.
    """
    emb = _emb(spark, sf_dir)
    cos_scored = S.cosine_scores(
        emb.filter(F.col("vec_id") < 5), emb
    ).select(
        "query_id",
        "neighbor_id",
        F.lit("c").alias("arm"),
        F.col("cosine").alias("score"),
    )
    toks = _docs(spark, sf_dir).select(
        "doc_id", F.array_distinct(F.split("text", " ")).alias("ts")
    )
    q = toks.filter(F.col("doc_id") < 5).select(
        F.col("doc_id").alias("query_id"), F.col("ts").alias("qt")
    )
    c = toks.select(
        F.col("doc_id").alias("neighbor_id"), F.col("ts").alias("ct")
    )
    inter = F.size(F.array_intersect("qt", "ct"))
    jac_scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            inter.cast("bigint").alias("inter"),
            (F.size("qt") + F.size("ct")).cast("bigint").alias("sz_sum"),
        )
        .filter(F.col("inter") >= 1)
        .select(
            "query_id",
            "neighbor_id",
            F.lit("j").alias("arm"),
            F.round(
                F.col("inter")
                / (F.col("sz_sum") - F.col("inter")).cast("double"),
                6,
            ).alias("score"),
        )
    )
    wa = Window.partitionBy("query_id", "arm").orderBy(
        F.desc("score"), F.asc("neighbor_id")
    )
    # Pin hash(query_id) explicitly: left to EnsureRequirements, each
    # downstream op would demand its own full-key exchange (q+arm, then
    # q+neighbor, then q — three shuffles of the same tiny stream); a
    # query_id subset partitioning satisfies all three at once.
    ranked = (
        cos_scored.unionByName(jac_scored)
        .repartition("query_id")
        .withColumn("r", F.row_number().over(wa).cast("int"))
        .filter(F.col("r") <= 50)
    )
    fused = ranked.groupBy("query_id", "neighbor_id").agg(
        F.max(F.when(F.col("arm") == "c", F.col("r"))).alias("cos_rank"),
        F.max(F.when(F.col("arm") == "j", F.col("r"))).alias("jac_rank"),
    ).select(
        "query_id",
        "neighbor_id",
        "cos_rank",
        "jac_rank",
        (
            F.coalesce(F.lit(1.0) / (F.lit(60) + F.col("cos_rank")), F.lit(0.0))
            + F.coalesce(
                F.lit(1.0) / (F.lit(60) + F.col("jac_rank")), F.lit(0.0)
            )
        ).alias("rrf_raw"),
    )
    wf = Window.partitionBy("query_id").orderBy(
        F.desc("rrf_raw"), F.asc("neighbor_id")
    )
    return (
        fused.withColumn("fused_rank", F.row_number().over(wf).cast("int"))
        .filter(F.col("fused_rank") <= 10)
        .select(
            "query_id",
            "neighbor_id",
            "cos_rank",
            "jac_rank",
            F.round(F.col("rrf_raw"), 6).alias("rrf"),
            "fused_rank",
        )
    )


HYBRID_RANK_FUSION_SQL = f"""
WITH
cos_scored AS (
  SELECT q.vec_id AS qid, c.vec_id AS nid,
         round({_ORACLE_COS.format(a='q.embedding', b='c.embedding')}, 6) AS cosine
  FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
  WHERE q.vec_id < 5
),
cos_top AS (
  SELECT qid, nid, cos_rank FROM (
    SELECT qid, nid,
           CAST(row_number() OVER (PARTITION BY qid
                                   ORDER BY cosine DESC, nid) AS INTEGER) AS cos_rank
    FROM cos_scored
  ) WHERE cos_rank <= 50
),
toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
nums AS (SELECT i FROM range(1, 4001) r(i)),
dtok AS (SELECT DISTINCT doc_id, t[i] AS token
         FROM toks JOIN nums ON i <= len(t)),
sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS sz FROM dtok GROUP BY doc_id),
inter AS (
  SELECT q.doc_id AS qid, c.doc_id AS nid, CAST(count(*) AS BIGINT) AS inter
  FROM dtok q JOIN dtok c ON q.token = c.token AND q.doc_id <> c.doc_id
  WHERE q.doc_id < 5
  GROUP BY 1, 2
),
jac_scored AS (
  SELECT i.qid, i.nid,
         round(i.inter / CAST(sq.sz + sc.sz - i.inter AS DOUBLE), 6) AS jac
  FROM inter i JOIN sizes sq ON i.qid = sq.doc_id
               JOIN sizes sc ON i.nid = sc.doc_id
),
jac_top AS (
  SELECT qid, nid, jac_rank FROM (
    SELECT qid, nid,
           CAST(row_number() OVER (PARTITION BY qid
                                   ORDER BY jac DESC, nid) AS INTEGER) AS jac_rank
    FROM jac_scored
  ) WHERE jac_rank <= 50
),
fused AS (
  SELECT COALESCE(c.qid, j.qid) AS query_id,
         COALESCE(c.nid, j.nid) AS neighbor_id,
         c.cos_rank, j.jac_rank,
         COALESCE(1e0 / (60 + c.cos_rank), 0e0)
           + COALESCE(1e0 / (60 + j.jac_rank), 0e0) AS rrf_raw
  FROM cos_top c FULL OUTER JOIN jac_top j
    ON c.qid = j.qid AND c.nid = j.nid
)
SELECT query_id, neighbor_id, cos_rank, jac_rank,
       round(rrf_raw, 6) AS rrf, fused_rank
FROM (
  SELECT query_id, neighbor_id, cos_rank, jac_rank, rrf_raw,
         CAST(row_number() OVER (PARTITION BY query_id
                                 ORDER BY rrf_raw DESC, neighbor_id) AS INTEGER) AS fused_rank
  FROM fused
) WHERE fused_rank <= 10
"""

ENTRIES["hybrid_rank_fusion"] = (hybrid_rank_fusion, HYBRID_RANK_FUSION_SQL)
