"""BPE trainer: exact equivalence against a pure-Python mirror.

The operator has no SQL oracle (iterative multi-statement training), so
the correctness bar is an exact merge-sequence and encoding match with a
reference implementation of the same algorithm."""

from __future__ import annotations

from collections import Counter

from duckdb_webhook_gateway_spark.operators.bpe import (
    apply_merge,
    bpe_encode,
    bpe_train,
    word_vocab,
)


# -- pure-Python mirror ------------------------------------------------------
def _py_vocab(texts):
    c = Counter()
    for t in texts:
        for w in t.split(" "):
            if w:
                c[w] += 1
    return {tuple(w): n for w, n in c.items()}


def _py_top_pair(vocab):
    counts = Counter()
    for syms, freq in vocab.items():
        for i in range(len(syms) - 1):
            counts[(syms[i], syms[i + 1])] += freq
    if not counts:
        return None
    # max by count, ties on the "a b" pair string ascending
    return min(counts.items(), key=lambda kv: (-kv[1], f"{kv[0][0]} {kv[0][1]}"))


def _py_merge(syms, a, b):
    out = []
    for s in syms:
        if out and out[-1] == a and s == b:
            out[-1] = a + b
        else:
            out.append(s)
    return tuple(out)


def py_train(texts, num_merges):
    vocab = _py_vocab(texts)
    merges = []
    for _ in range(num_merges):
        best = _py_top_pair(vocab)
        if best is None or best[1] <= 0:
            break
        (a, b), n = best
        merges.append((a, b, n))
        new = {}
        for syms, freq in vocab.items():
            m = _py_merge(syms, a, b)
            new[m] = new.get(m, 0) + freq
        vocab = new
    return merges


def py_encode(texts, merges):
    out = []
    for t in texts:
        n_words, n_tokens = 0, 0
        for w in t.split(" "):
            if not w:
                continue
            syms = tuple(w)
            for a, b, _ in merges:
                syms = _py_merge(syms, a, b)
            n_words += 1
            n_tokens += len(syms)
        out.append((n_words, n_tokens))
    return out


TEXTS = [
    "low lower lowest low low",
    "new newer newest new",
    "wide wider widest wide wide wide",
    "low newer wide lowest",
]


def test_bpe_train_matches_python_mirror(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], ["doc_id", "text"]
    )
    got = bpe_train(docs, num_merges=8)
    want = py_train(TEXTS, 8)
    assert got == want
    # sanity: the corpus's dominant bigrams get merged first
    assert got[0][0:2] == ("l", "o") or got[0][2] >= got[-1][2]


def test_bpe_encode_matches_python_mirror(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], ["doc_id", "text"]
    )
    merges = bpe_train(docs, num_merges=6)
    enc = {
        r.doc_id: (r.n_words, r.n_bpe_tokens)
        for r in bpe_encode(docs, merges).collect()
    }
    want = dict(enumerate(py_encode(TEXTS, merges)))
    assert enc == want
    # merging must strictly compress vs. character tokenization
    chars = {i: sum(len(w) for w in t.split()) for i, t in enumerate(TEXTS)}
    assert all(enc[i][1] < chars[i] for i in enc)


def test_merge_fold_is_greedy_non_overlapping(spark):
    """'aaa' under (a,a) -> [aa, a]; the fold must not re-merge the
    freshly fused symbol with the next element."""
    vocab = spark.createDataFrame([(["a", "a", "a"], 1)], ["syms", "freq"])
    out = apply_merge(vocab, "a", "a").collect()
    assert out[0]["syms"] == ["aa", "a"]


def test_vocab_collapses_corpus(spark):
    docs = spark.createDataFrame(
        [(0, "x y x"), (1, "y x")], ["doc_id", "text"]
    )
    v = {tuple(r.syms): r.freq for r in word_vocab(docs).collect()}
    assert v == {("x",): 3, ("y",): 2}
