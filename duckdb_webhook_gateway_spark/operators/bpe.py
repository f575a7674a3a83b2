"""Distributed BPE tokenizer training (the full iterative loop).

``workloads/datapipe.py::bpe_merge_candidates`` is iteration 1 of this
algorithm as an oracle-checked query; this module runs the whole trainer.
The scale shape is the classic tokenizer-training one:

1. Collapse the corpus to its word VOCABULARY — the only
   corpus-cardinality pass.  (word, freq) carries everything BPE needs;
   a 100 TB corpus with a 10M-word vocabulary iterates over 10M rows.
2. Each merge iteration is two vocab-cardinality steps: an in-row
   adjacent-pair count (explode + freq-weighted sum) and an in-row
   left-to-right greedy merge fold.  Only the winning pair (one row)
   ever reaches the driver — same driver-decision pattern as
   ``similarity.kmeans_fit``.

Determinism: ties on pair_count break on the pair string ascending, so
the merge sequence is reproducible across partitionings and engines.
Lineage is truncated per iteration with ``localCheckpoint`` so the plan
does not grow with merge count (same rationale as
``dedup.connected_components``).

Iterative multi-statement training is not expressible as one SQL
statement, so this operator is test-verified against an exact Python
mirror instead of a DuckDB oracle (see ``tests/test_bpe.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _q(s: str) -> str:
    """Quote a symbol for embedding in a SQL string literal."""
    return s.replace("\\", "\\\\").replace("'", "\\'")


# Greedy left-to-right non-overlapping merge of adjacent (a, b) -> ab
# inside a symbol array, as a single fold: "aaa" under (a,a) becomes
# [aa, a], never [aa, aa].
_MERGE_FOLD = (
    "aggregate(syms, CAST(array() AS ARRAY<STRING>), (acc, s) -> "
    "CASE WHEN size(acc) > 0 AND element_at(acc, -1) = '{a}' AND s = '{b}' "
    "THEN concat(slice(acc, 1, size(acc) - 1), array('{ab}')) "
    "ELSE concat(acc, array(s)) END)"
)

_PAIR_ENUM = (
    "CASE WHEN size(syms) >= 2 THEN "
    "transform(sequence(1, size(syms) - 1), "
    "i -> concat(element_at(syms, i), ' ', element_at(syms, i + 1))) "
    "ELSE CAST(array() AS ARRAY<STRING>) END"
)


def word_vocab(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(syms, freq): whitespace word vocabulary with each word exploded
    into its initial character symbols.  The single corpus-scale pass."""
    return (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .select(F.expr("split(word, '')").alias("syms"), "freq")
    )


def top_pair(vocab: DataFrame) -> tuple[str, str, int] | None:
    """Most frequent adjacent symbol pair (freq-weighted), ties broken on
    the pair string — one driver-side row."""
    row = (
        vocab.select("freq", F.explode(F.expr(_PAIR_ENUM)).alias("pair"))
        .groupBy("pair")
        .agg(F.sum("freq").alias("pair_count"))
        .orderBy(F.desc("pair_count"), "pair")
        .limit(1)
        .collect()
    )
    if not row:
        return None
    a, b = row[0]["pair"].split(" ", 1)
    return a, b, row[0]["pair_count"]


def apply_merge(vocab: DataFrame, a: str, b: str) -> DataFrame:
    """Fuse every adjacent (a, b) into one symbol, greedily left to
    right, entirely in-row."""
    fold = _MERGE_FOLD.format(a=_q(a), b=_q(b), ab=_q(a + b))
    return vocab.select(F.expr(fold).alias("syms"), "freq")


def bpe_train(
    docs: DataFrame,
    num_merges: int = 10,
    text_col: str = "text",
) -> list[tuple[str, str, int]]:
    """Train ``num_merges`` BPE merge rules; returns them in application
    order as (left_symbol, right_symbol, freq_weighted_count)."""
    vocab = word_vocab(docs, text_col).localCheckpoint(eager=True)
    merges: list[tuple[str, str, int]] = []
    for _ in range(num_merges):
        best = top_pair(vocab)
        if best is None or best[2] <= 0:
            break
        a, b, n = best
        merges.append((a, b, n))
        vocab = apply_merge(vocab, a, b).localCheckpoint(eager=True)
    return merges


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str, int]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_words, n_bpe_tokens): tokenize each document with the
    trained merge table — every merge is one more in-row fold, so the
    whole encoder compiles to a single projection over the corpus scan
    (no shuffle at all)."""
    out = docs.select(
        F.col(id_col),
        F.explode(F.split(F.col(text_col), " ")).alias("word"),
    ).filter(F.length("word") > 0)
    out = out.select(id_col, F.expr("split(word, '')").alias("syms"))
    for a, b, _ in merges:
        fold = _MERGE_FOLD.format(a=_q(a), b=_q(b), ab=_q(a + b))
        out = out.select(id_col, F.expr(fold).alias("syms"))
    counted = out.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_words"),
        F.sum(F.size("syms")).cast("bigint").alias("n_bpe_tokens"),
    )
    # empty/whitespace-only documents have no surviving words: report
    # them as (id, 0, 0) instead of silently dropping the doc from the
    # output (an inner join downstream would lose it)
    ids = docs.select(F.col(id_col)).distinct()
    return ids.join(counted, id_col, "left").select(
        id_col,
        F.coalesce("n_words", F.lit(0)).cast("bigint").alias("n_words"),
        F.coalesce("n_bpe_tokens", F.lit(0))
        .cast("bigint")
        .alias("n_bpe_tokens"),
    )
