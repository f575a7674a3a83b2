"""Graph operators: basket-pair mining, integer PageRank, and
degree-oriented triangle counting.

Contracts under test (operators/graphs.py):

- ``basket_pairs`` equals the naive Python pair count for any
  partitioning, emits each unordered pair once with a < b, and the
  ``max_basket_items`` guard bounds a degenerate basket's fan-out while
  keeping the smallest item ids deterministically.
- ``pagerank_micro`` is bit-identical across partitionings (integer
  micro-units: no float summation-order drift), conserves rank mass the
  way the truncating formula predicts, and matches a plain-Python
  reference implementation of the same integer recurrence.
- ``triangle_counts`` equals a brute-force itertools enumeration on
  random graphs and known closed forms (cliques, stars, cycles), for
  any partitioning — each triangle counted once at all three corners
  regardless of the degree orientation chosen inside.
"""

from __future__ import annotations

from collections import Counter, defaultdict
from itertools import combinations

import pytest
from pyspark.sql import functions as F

from duckdb_webhook_gateway_spark.operators import graphs as G


BASKETS = {
    1: [10, 20, 30],
    2: [10, 20],
    3: [20, 30, 40],
    4: [10, 20, 30, 40],
    5: [50],
    6: [10, 20],
}


def _items_df(spark, baskets, partitions=None):
    rows = [(bk, it) for bk, items in baskets.items() for it in items]
    df = spark.createDataFrame(rows, "basket bigint, item bigint")
    return df.repartition(partitions) if partitions else df


def _exact_pairs(baskets):
    c = Counter()
    for items in baskets.values():
        for a, b in combinations(sorted(set(items)), 2):
            c[(a, b)] += 1
    return dict(c)


@pytest.mark.parametrize("partitions", [None, 1, 7])
def test_basket_pairs_exact(spark, partitions):
    df = _items_df(spark, BASKETS, partitions)
    got = {
        (r["a"], r["b"]): r["n_baskets"]
        for r in G.basket_pairs(df).collect()
    }
    assert got == _exact_pairs(BASKETS)
    assert all(a < b for (a, b) in got)


def test_basket_pairs_dedups_repeated_items(spark):
    # the same item twice in one basket must not self-pair or double-count
    df = _items_df(spark, {1: [10, 10, 20]})
    got = {(r["a"], r["b"]): r["n_baskets"] for r in G.basket_pairs(df).collect()}
    assert got == {(10, 20): 1}


def test_basket_pairs_cap_keeps_smallest_items(spark):
    # degenerate basket of 10 items capped to 4 -> only pairs among the
    # 4 smallest ids survive; fan-out is C(4,2)=6, not C(10,2)=45
    df = _items_df(spark, {1: list(range(100, 110))})
    got = {
        (r["a"], r["b"]) for r in G.basket_pairs(df, max_basket_items=4).collect()
    }
    assert got == set(combinations([100, 101, 102, 103], 2))


def _py_pagerank(edges, iterations=3, init=1_000_000, damping=85):
    arcs = [(a, b) for a, b in edges] + [(b, a) for a, b in edges]
    deg = Counter(src for src, _ in arcs)
    base = ((100 - damping) * init) // 100
    r = {n: init for n in deg}
    for _ in range(iterations):
        contrib = defaultdict(int)
        for src, dst in arcs:
            contrib[dst] += r[src] // deg[src]
        r = {n: base + (damping * c) // 100 for n, c in contrib.items()}
    return r


EDGES = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 3), (6, 1)]


@pytest.mark.parametrize("partitions", [1, 5])
def test_pagerank_matches_python_reference(spark, partitions):
    edf = spark.createDataFrame(EDGES, "a bigint, b bigint").repartition(
        partitions
    )
    got = {
        r["node"]: r["r"]
        for r in G.pagerank_micro(G.undirect(edf), iterations=3).collect()
    }
    assert got == _py_pagerank(EDGES, iterations=3)


def test_pagerank_bit_identical_across_partitionings(spark):
    edf = spark.createDataFrame(EDGES, "a bigint, b bigint")
    a = sorted(
        (r["node"], r["r"])
        for r in G.pagerank_micro(G.undirect(edf.repartition(1))).collect()
    )
    b = sorted(
        (r["node"], r["r"])
        for r in G.pagerank_micro(G.undirect(edf.repartition(8))).collect()
    )
    assert a == b


def test_pagerank_uniform_on_symmetric_graph(spark):
    # a clean cycle is vertex-transitive: every node must get the same rank
    cyc = [(i, (i + 1) % 6) for i in range(6)]
    edf = spark.createDataFrame(cyc, "a bigint, b bigint")
    ranks = {r["r"] for r in G.pagerank_micro(G.undirect(edf)).collect()}
    assert len(ranks) == 1


def test_pagerank_interleaved_calls_bit_exact(spark):
    # Two pagerank results live at once: building the second call must not
    # release the first call's materialized relations (the old module-global
    # _prev_cached hazard un-cached a still-live prior result).  Both lazy
    # results are collected only AFTER both plans exist, then again in
    # reverse order — all four collections bit-match the Python reference.
    edges_b = [(10, 11), (11, 12), (12, 10), (12, 13)]
    edf_a = spark.createDataFrame(EDGES, "a bigint, b bigint")
    edf_b = spark.createDataFrame(edges_b, "a bigint, b bigint")
    ra = G.pagerank_micro(G.undirect(edf_a), iterations=3)
    rb = G.pagerank_micro(G.undirect(edf_b), iterations=3)
    want_a = _py_pagerank(EDGES, iterations=3)
    want_b = _py_pagerank(edges_b, iterations=3)
    assert {r["node"]: r["r"] for r in ra.collect()} == want_a
    assert {r["node"]: r["r"] for r in rb.collect()} == want_b
    # re-collect in the opposite order: results must be stable, not
    # silently recomputed-from-nothing after a later call
    assert {r["node"]: r["r"] for r in rb.collect()} == want_b
    assert {r["node"]: r["r"] for r in ra.collect()} == want_a


def _py_triangles(edges):
    adj = defaultdict(set)
    for a, b in edges:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    per_node = Counter()
    nodes = sorted(adj)
    for u, v, w in combinations(nodes, 3):
        if v in adj[u] and w in adj[u] and w in adj[v]:
            per_node[u] += 1
            per_node[v] += 1
            per_node[w] += 1
    return {n: (per_node[n], len(adj[n])) for n in per_node}


def _tri_result(spark, edges, partitions=None):
    edf = spark.createDataFrame(edges, "a bigint, b bigint")
    if partitions:
        edf = edf.repartition(partitions)
    return {
        r["node"]: (r["n_triangles"], r["deg"])
        for r in G.triangle_counts(edf).collect()
    }


@pytest.mark.parametrize("partitions", [None, 1, 7])
def test_triangles_match_bruteforce_random(spark, partitions):
    import random

    rng = random.Random(42)
    edges = sorted(
        {tuple(sorted(rng.sample(range(1, 25), 2))) for _ in range(90)}
    )
    assert _tri_result(spark, edges, partitions) == _py_triangles(edges)


def test_triangles_clique_and_star(spark):
    # K5: every node is in C(4,2)=6 triangles at degree 4.  A star hub
    # (the degree-orientation worst case for id-ordering) closes none.
    k5 = list(combinations(range(1, 6), 2))
    assert _tri_result(spark, k5) == {n: (6, 4) for n in range(1, 6)}
    star = [(100, i) for i in range(1, 30)]
    assert _tri_result(spark, star) == {}


def test_triangles_cycle_plus_chord(spark):
    # 4-cycle has no triangle; one chord creates exactly two
    edges = [(1, 2), (2, 3), (3, 4), (1, 4), (1, 3)]
    assert _tri_result(spark, edges) == _py_triangles(edges)


def test_pagerank_digraph_keeps_sourceless_in_nodes(spark):
    # 1 -> 2 -> 3 -> 2: node 1 has out-arcs but NO in-arcs.  It must keep
    # its base rank every iteration AND keep contributing to node 2 —
    # the inner-join formulation silently dropped both after iteration 1.
    arcs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 2)], "src bigint, dst bigint"
    )
    got = {r["node"]: r["r"] for r in G.pagerank_micro(arcs, iterations=3).collect()}

    base = 150_000
    r = {1: 1_000_000, 2: 1_000_000, 3: 1_000_000}
    deg = {1: 1, 2: 1, 3: 1}
    for _ in range(3):
        contrib = {1: 0, 2: r[1] // deg[1] + r[3] // deg[3], 3: r[2] // deg[2]}
        r = {n: base + (85 * c) // 100 for n, c in contrib.items()}
    assert got == r
    assert got[1] == base  # no in-arcs: exactly the teleport mass


def test_bitmap_bloom_filter_no_false_negatives(spark):
    """Every matching probe row survives the bloom at ANY sizing (false
    positives are allowed — the exact join removes them), so
    prefilter+join == plain join even at a saturating 64-bit table."""
    import random

    from pyspark.sql import functions as F

    from duckdb_webhook_gateway_spark.operators.joins import (
        bitmap_bloom_filter,
    )

    rng = random.Random(17)
    build_rows = [(rng.randrange(50), rng.randrange(50)) for _ in range(120)]
    probe_rows = [(rng.randrange(80), rng.randrange(80)) for _ in range(400)]
    build = spark.createDataFrame(build_rows, "v bigint, w bigint").distinct()
    probe = spark.createDataFrame(probe_rows, "id_v bigint, id_w bigint")
    plain = sorted(
        map(
            tuple,
            probe.join(
                build,
                (probe.id_v == build.v) & (probe.id_w == build.w),
                "left_semi",
            ).collect(),
        )
    )
    for bits in (64, 4096, 1 << 20):  # saturated -> roomy
        pref = bitmap_bloom_filter(
            probe, build, ["id_v", "id_w"], ["v", "w"], num_bits=bits
        )
        got = sorted(
            map(
                tuple,
                pref.join(
                    build,
                    (pref.id_v == build.v) & (pref.id_w == build.w),
                    "left_semi",
                ).collect(),
            )
        )
        assert got == plain, bits
        # and the prefilter itself never loses a matching row
        kept = {tuple(r) for r in pref.collect()}
        assert {tuple(r) for r in plain} <= kept or set(plain) <= kept


def test_bitmap_bloom_filter_widens_integral_keys_and_rejects_mismatch(spark):
    """xxhash64 is type-sensitive: an INT probe key against a BIGINT
    build key must still find every match (integral widening), and a
    genuinely incompatible type pair (int vs double) must be rejected
    loudly instead of silently dropping matches."""
    import pytest

    from duckdb_webhook_gateway_spark.operators.joins import (
        bitmap_bloom_filter,
    )

    build = spark.createDataFrame([(k,) for k in range(20)], "v bigint")
    probe = spark.createDataFrame([(k,) for k in range(40)], "id_v int")
    pref = bitmap_bloom_filter(probe, build, ["id_v"], ["v"], num_bits=4096)
    kept = {r.id_v for r in pref.collect()}
    assert set(range(20)) <= kept  # no false negatives across int widths

    probe_d = spark.createDataFrame([(float(k),) for k in range(5)], "id_v double")
    with pytest.raises(TypeError, match="type-sensitive"):
        bitmap_bloom_filter(probe_d, build, ["id_v"], ["v"])


# ---------------------------------------------------------------------------
# kcore — iterative peel to the k-core (operators/graphs.py::kcore)


def _python_kcore(edges, k):
    """Plain-Python reference: peel degree < k to fixpoint, return
    {node: in-core degree}."""
    es = set(edges)
    while True:
        deg = Counter()
        for a, b in es:
            deg[a] += 1
            deg[b] += 1
        keep = {n for n, d in deg.items() if d >= k}
        nxt = {(a, b) for a, b in es if a in keep and b in keep}
        if nxt == es:
            break
        es = nxt
    deg = Counter()
    for a, b in es:
        deg[a] += 1
        deg[b] += 1
    return dict(deg)


def _edges_df(spark, edges, partitions=None):
    df = spark.createDataFrame(sorted(edges), "a bigint, b bigint")
    return df.repartition(partitions) if partitions else df


def test_kcore_triangle_with_tail(spark):
    # triangle {1,2,3} + pendant 4: the 2-core is exactly the triangle
    e = _edges_df(spark, [(1, 2), (2, 3), (1, 3), (3, 4)])
    got = {r["node"]: r["core_degree"] for r in G.kcore(e, 2).collect()}
    assert got == {1: 2, 2: 2, 3: 2}


def test_kcore_cascade_to_empty(spark):
    # path graph: peeling the endpoints cascades until nothing survives
    e = _edges_df(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    df = G.kcore(e, 2)
    assert df.count() == 0
    assert df.columns == ["node", "core_degree"]


@pytest.mark.parametrize("partitions", [None, 1, 7])
def test_kcore_matches_python_reference_random(spark, partitions):
    # deterministic pseudo-random graph with planted density gradient
    edges = set()
    for i in range(60):
        for j in range(i + 1, 60):
            if (i * 37 + j * 101) % 13 < (3 if j < 30 else 1):
                edges.add((i, j))
    for k in (2, 3, 4):
        want = _python_kcore(edges, k)
        got = {
            r["node"]: r["core_degree"]
            for r in G.kcore(_edges_df(spark, edges, partitions), k).collect()
        }
        assert got == want, f"k={k}"


def test_kcore_exact_rounds_matches_fixpoint_when_converged(spark):
    # rounds past the fixpoint are no-ops: rounds=10 == fixpoint mode
    edges = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (2, 4)]
    e = _edges_df(spark, edges)
    fix = sorted(map(tuple, G.kcore(e, 2).collect()))
    exact = sorted(map(tuple, G.kcore(e, 2, rounds=10).collect()))
    assert fix == exact and fix  # non-empty core


def test_kcore_exact_rounds_truncates_like_oracle(spark):
    # a 4-chain peel: rounds=1 stops mid-peel (the oracle-parity
    # semantics — the unrolled SQL chain stops at the same depth)
    edges = [(1, 2), (2, 3), (3, 4), (4, 5)]
    e = _edges_df(spark, edges)
    # round 1 drops nodes 1 and 5; edges (2,3),(3,4) remain
    got = {
        r["node"]: r["core_degree"]
        for r in G.kcore(e, 2, rounds=1).collect()
    }
    assert got == {2: 1, 3: 2, 4: 1}


def test_kcore_raises_without_fixpoint_budget(spark):
    e = _edges_df(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    with pytest.raises(RuntimeError, match="no fixpoint"):
        G.kcore(e, 2, max_rounds=1)


def test_kcore_rejects_bad_k(spark):
    e = _edges_df(spark, [(1, 2)])
    with pytest.raises(ValueError, match="k must be >= 1"):
        G.kcore(e, 0)


# ---------------------------------------------------------------------------
# lpa_labels — synchronous label propagation (operators/graphs.py::lpa_labels)


def _python_lpa(edges, rounds):
    """Plain-Python reference: synchronous rounds, modal neighbor label,
    ties to the smallest label."""
    nbrs = {}
    for a, b in edges:
        nbrs.setdefault(a, []).append(b)
        nbrs.setdefault(b, []).append(a)
    lab = {n: n for n in nbrs}
    for _ in range(rounds):
        new = {}
        for n, ns in nbrs.items():
            cnt = Counter(lab[m] for m in ns)
            new[n] = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        lab = new
    return lab


def test_lpa_two_triangles_with_bridge(spark):
    # two triangles joined by one bridge edge: 4 synchronous rounds
    # settle each triangle on its own community label
    edges = [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)]
    got = {
        r["node"]: r["label"]
        for r in G.lpa_labels(_edges_df(spark, edges), rounds=4).collect()
    }
    assert got == _python_lpa(edges, 4)
    assert got == {1: 1, 2: 1, 3: 1, 4: 3, 5: 3, 6: 3}


def test_lpa_oscillation_is_fixed_round_deterministic(spark):
    # a single edge swaps labels every synchronous round — fixed-round
    # semantics make both depths deterministic and oracle-replayable
    edges = [(1, 2)]
    e3 = {
        r["node"]: r["label"]
        for r in G.lpa_labels(_edges_df(spark, edges), rounds=3).collect()
    }
    e4 = {
        r["node"]: r["label"]
        for r in G.lpa_labels(_edges_df(spark, edges), rounds=4).collect()
    }
    assert e3 == _python_lpa(edges, 3) == {1: 2, 2: 1}
    assert e4 == _python_lpa(edges, 4) == {1: 1, 2: 2}


@pytest.mark.parametrize("partitions", [None, 1, 7])
def test_lpa_matches_python_reference_random(spark, partitions):
    # same planted-density pseudo-random graph as the kcore battery;
    # every depth 1..4 must match the Python reference exactly for any
    # input partitioning (integer voting is partitioning-invariant)
    edges = set()
    for i in range(40):
        for j in range(i + 1, 40):
            if (i * 37 + j * 101) % 13 < (3 if j < 20 else 1):
                edges.add((i, j))
    for rounds in (1, 2, 4):
        want = _python_lpa(edges, rounds)
        got = {
            r["node"]: r["label"]
            for r in G.lpa_labels(
                _edges_df(spark, edges, partitions), rounds=rounds
            ).collect()
        }
        assert got == want, f"rounds={rounds}"


def test_lpa_empty_edges_and_bad_rounds(spark):
    empty = _edges_df(spark, [(1, 2)]).filter("a > 100")
    out = G.lpa_labels(empty, rounds=2)
    assert out.count() == 0
    assert out.columns == ["node", "label"]
    with pytest.raises(ValueError, match="rounds must be >= 1"):
        G.lpa_labels(_edges_df(spark, [(1, 2)]), rounds=0)
