"""Graph operators over co-occurrence relations: market-basket pair
mining, fixed-iteration integer PageRank, and degree-oriented triangle
counting.

Both operators are built for the billion-edge case:

- **Pair mining** groups items by basket and expands pairs IN-ROW from the
  sorted per-basket item array.  A basket of k items yields k(k-1)/2 pairs
  inside one task with no join — correct because real baskets are small
  and bounded (TPC-H orders hold <= 7 lineitems; retail baskets tens).
  The alternative self-join on the basket key shuffles the item relation
  twice and re-materializes every pair as a join row; the in-row form
  shuffles the item relation once (groupBy basket) and lets the pair
  count's partial aggregation run map-side.  A ``max_basket_items`` guard
  truncates degenerate baskets (one hot basket with 10^5 items would
  otherwise emit 5*10^9 pairs from a single task).
- **PageRank** runs a FIXED number of synchronous iterations (the
  Pregel/MapReduce formulation: join ranks to edges on src, sum
  contributions by dst).  Ranks are integer micro-units and per-edge
  contributions use integer division, so the iteration is bit-exact and
  engine-portable — float PageRank is not reproducible across engines
  because the contribution summation order differs.  Each iteration is
  one shuffle-join on ``src`` plus one aggregation on ``dst``; the edge
  and degree relations are computed once and cached.  Nothing
  node-cardinality is ever broadcast or collected.

Reference parity: the reference gateway has no graph surface at all
(verified repo-wide; its SQL endpoint is DuckDB passthrough,
/root/reference/src/app.py:175-239) — these are beyond-reference scale
operators for the training-data pipeline (co-occurrence statistics and
influence ranking over item graphs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# One hot basket must not explode a task: k items -> k(k-1)/2 in-row pairs,
# so 1024 items caps a single basket's contribution at ~524k pairs (a few
# MB) regardless of how degenerate the input is.  Sorted ascending before
# the slice, so truncation keeps the SMALLEST item ids deterministically.
# Workload oracles mirror the cap (row_number <= 1024 per basket) so the
# differential identity holds even on degenerate inputs.
MAX_BASKET_ITEMS = 1024

# Pair expansion over the sorted distinct item array: for each position i,
# pair items[i] with every later item.  items is ascending, so a < b holds
# by construction and each unordered pair appears exactly once.
# Suffix of the sorted item array for each anchor position — the second
# Generate explodes it, giving every a < b pair.  Two cascaded codegen
# Generates beat the earlier nested-transform/flatten HOF expression by
# ~40% measured (higher-order lambdas evaluate INTERPRETED, with a per-
# element function-call cost the codegen explode doesn't pay).
_PAIR_SUFFIX_EXPR = "slice(items, i + 2, size(items))"


def basket_pairs(
    items: DataFrame,
    basket_col: str = "basket",
    item_col: str = "item",
    max_basket_items: int = MAX_BASKET_ITEMS,
) -> DataFrame:
    """Count, for every unordered item pair, the baskets containing both.

    Returns ``(a, b, n_baskets)`` with ``a < b``.  One shuffle to group by
    basket, in-row pair expansion (two cascaded codegen Generates over the
    sorted item array — anchor posexplode, then suffix explode), then a
    map-side-combined count by pair.  No self-join: the item relation
    shuffles once, and the per-basket fan-out stays bounded by the cap.
    """
    per_basket = (
        items.select(
            F.col(basket_col).alias("basket"), F.col(item_col).alias("item")
        )
        .groupBy("basket")
        .agg(
            F.slice(
                F.sort_array(F.collect_set("item")), 1, max_basket_items
            ).alias("items")
        )
    )
    anchored = per_basket.select(
        "items", F.posexplode("items").alias("i", "a")
    )
    return (
        anchored.select(
            "a", F.explode(F.expr(_PAIR_SUFFIX_EXPR)).alias("b")
        )
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n_baskets"))
    )


def undirect(edges: DataFrame, a: str = "a", b: str = "b") -> DataFrame:
    """Materialize an undirected edge list as both directed arcs.

    The union's two branches each re-execute ``edges``' lineage (Catalyst
    does not share subplans across DataFrame references).  For DERIVED
    edge lists whose lineage is expensive (e.g. :func:`basket_pairs` over
    a fact table), ``localCheckpoint(eager=False)`` the edge relation
    first — it is edge-cardinality, cheap to hold, and halves the
    upstream work here and in every downstream iteration."""
    fwd = edges.select(F.col(a).alias("src"), F.col(b).alias("dst"))
    rev = edges.select(F.col(b).alias("src"), F.col(a).alias("dst"))
    return fwd.unionByName(rev)


def triangle_counts(
    edges: DataFrame, a: str = "a", b: str = "b"
) -> DataFrame:
    """Per-node triangle participation over an undirected graph.

    ``edges`` is a deduplicated canonical edge list with ``a < b``.
    Returns ``(node, n_triangles, deg)`` for every node that closes at
    least one triangle.

    Degree-oriented wedge counting (the Cohen MapReduce triangle
    schedule / Ortmann-Brandes orientation — public algorithms): every
    edge is oriented from its endpoint of smaller ``(degree, id)`` to the
    larger, wedges are generated at the smaller endpoint, and each wedge
    closes against the oriented edge set.  Each triangle is produced
    EXACTLY once (its unique lowest-order corner anchors it), so no
    post-hoc dedup shuffle, and the per-source wedge fan-out is bounded
    by the oriented out-degree, which is O(sqrt(m)) for any graph — the
    property that makes the wedge stage survive power-law hubs at scale:
    an id-oriented variant lets one hub generate O(deg^2) wedges from a
    single task, degree orientation cannot.

    Plan: degree via ``groupBy(node).count()`` over the arc endpoints
    (map-side partial combine — NOT a count window, which would pin a
    hub's arc set on one task), two id-keyed joins to attach endpoint
    degrees, one self-join on the wedge anchor, one (v, w)-keyed closure
    join, then an explode + partial-agg count of the three corners.
    Triangle identity is pure integer/id arithmetic — bit-exact on any
    engine and partitioning.
    """
    arcs = undirect(edges, a, b)
    deg = arcs.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).cast("bigint").alias("deg")
    )
    ed = (
        edges.select(F.col(a).alias("ea"), F.col(b).alias("eb"))
        .join(deg.select(F.col("node").alias("ea"), F.col("deg").alias("da")), "ea")
        .join(deg.select(F.col("node").alias("eb"), F.col("deg").alias("db")), "eb")
    )
    lo_first = F.struct(F.col("da"), F.col("ea")) < F.struct(
        F.col("db"), F.col("eb")
    )
    oriented = ed.select(
        F.when(lo_first, F.col("ea")).otherwise(F.col("eb")).alias("src"),
        F.when(lo_first, F.col("eb")).otherwise(F.col("ea")).alias("dst"),
        F.when(lo_first, F.col("db")).otherwise(F.col("da")).alias("dd"),
    )
    # The oriented-arc relation is consumed three times (both wedge
    # sides and the closing probe).  x/y share one src-keyed exchange
    # via ReuseExchange, but the closing side shuffles on (v, w) — a
    # different key — so without truncation its two degree-attach joins
    # re-execute.  The relation is edge-cardinality; a lazy
    # localCheckpoint materializes it exactly once on first action.
    oriented = oriented.localCheckpoint(eager=False)
    # Wedge at the anchor: two out-arcs of src, canonicalized by the SAME
    # (degree, id) total order so the closing arc — which is oriented by
    # that order too — is probed in exactly one direction.
    x, y = oriented.alias("x"), oriented.alias("y")
    wedges = (
        x.join(y, F.col("x.src") == F.col("y.src"))
        .filter(
            F.struct(F.col("x.dd"), F.col("x.dst"))
            < F.struct(F.col("y.dd"), F.col("y.dst"))
        )
        .select(
            F.col("x.src").alias("u"),
            F.col("x.dst").alias("v"),
            F.col("y.dst").alias("w"),
        )
    )
    closing = oriented.select(
        F.col("src").alias("v"), F.col("dst").alias("w")
    )
    # Bloom-prefilter the wedges before the closure shuffle: wedge
    # volume is Σ outdeg² (410M rows at sf1 — a ~10 GB exchange) while
    # triangles are a few percent of it; the bitmap bloom (built
    # distributed off the checkpointed oriented relation, broadcast
    # bounded by num_bits/64 words regardless of edge count) drops
    # non-closing wedges MAP-SIDE, so the join shuffles only the
    # surviving fraction.  False positives pass through to the exact
    # equi-join — the result is bit-identical at any sizing.
    from .joins import bitmap_bloom_filter

    wedges = bitmap_bloom_filter(wedges, closing, ["v", "w"], ["v", "w"])
    tri = wedges.join(closing, ["v", "w"])
    # ONE consumer of the closure join: explode the three corners
    # in-row (narrow), then partial-agg count.  The earlier 3-way union
    # of projections re-executed the wedge+closure join once per branch
    # (the join probe is not an exchange, so ReuseExchange cannot share
    # it) and shuffled 3x the triangle count as raw corner rows; the
    # explode keeps a single join execution and map-side combine
    # reduces the corner stream before its only shuffle.
    corners = tri.select(
        F.explode(F.array("u", "v", "w")).alias("node")
    )
    per_node = corners.groupBy("node").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_triangles")
    )
    return per_node.join(deg, "node").select("node", "n_triangles", "deg")


def pagerank_micro(
    arcs: DataFrame,
    iterations: int = 3,
    init_micro: int = 1_000_000,
    damping_pct: int = 85,
) -> DataFrame:
    """Fixed-iteration PageRank in integer micro-units.

    ``arcs`` is a directed arc list ``(src, dst)``.  The node universe is
    every arc endpoint: sources with no in-arcs keep their teleport-mass
    rank (and keep contributing), and sinks with no out-arcs accumulate
    rank normally (their mass leaks, the standard un-normalized
    treatment).  Undirected graphs via :func:`undirect` hit neither
    case.

    r_{k+1}(v) = base + (damping_pct * sum_{u->v} (r_k(u) DIV deg(u))) DIV 100

    with ``base = (100 - damping_pct)% of init_micro``.  All arithmetic is
    BIGINT: truncating division loses < 1 micro-unit per edge per
    iteration, and in exchange the result is bit-identical on any engine
    and any partitioning/summation order — the property the differential
    oracle needs, and the property that makes the operator's output stable
    under AQE re-planning at scale.

    Sharing strategy: NOTHING is cached or checkpointed INSIDE the
    iteration (callers with an expensive DERIVED arc lineage should
    materialize it once first — see :func:`undirect`).  The whole
    fixed-iteration recursion is ONE lazy plan in which ``arcs_d`` and
    ``nodes`` are the same DataFrame objects in every iteration, so
    their shuffle exchanges canonicalize identically and Spark's
    ReuseExchange (and AQE stage reuse) computes each exactly once per
    action — measured faster than eager ``localCheckpoint`` barriers,
    which serialize three blocking job rounds and pay materialization
    I/O for relations the exchange files already hold.  It is also
    hazard-free: no blocks outlive the action, nothing module-global is
    shared (an earlier design's persist released a previous call's
    blocks from the next call; see tests/test_graphs.py).

    Plan shape per iteration: shuffle-join ranks to arcs on ``src``
    (ranks and arcs are both hash-partitioned by src after the first
    iteration — Catalyst reuses the partitioning), then hash-aggregate by
    ``dst``.  ``O(iterations)`` shuffles total, the textbook synchronous
    Pregel schedule; arc and node exchanges are computed once and reused.
    """
    base = ((100 - damping_pct) * init_micro) // 100
    # Out-degree via partial-aggregate + join onto the NODE relation,
    # NOT a count window over the arc stream: a count window gets no
    # map-side combine and AQE cannot skew-split it, so a power-law hub
    # with 10^8 out-arcs would pin its whole arc set on ONE task.  The
    # aggregate collapses a hot src to one row per map task before the
    # wire, and — because a node's out-degree is a property of the
    # CONTRIBUTING node — deg rides the node-cardinality ranks relation
    # through the contribution join the iteration already performs:
    # zero extra arc-cardinality joins, same per-iteration plan shape
    # as before.  Sinks (no out-arcs) get NULL deg; they never match as
    # src in the contribution join, so the NULL is never consumed.
    deg = arcs.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("deg")
    )
    # The node universe is every endpoint: a node with out-arcs but no
    # in-arcs receives no contributions, but it must KEEP its base rank
    # and keep contributing — an inner groupBy(dst) alone would silently
    # drop it (and its outgoing mass) after iteration 1 on general
    # digraphs, even though undirected graphs never hit the case.
    nodes = (
        arcs.select(F.col("src").alias("node"))
        .unionByName(arcs.select(F.col("dst").alias("node")))
        .distinct()
        .join(deg, "node", "left")
    )
    ranks = nodes.select(
        "node", "deg", F.lit(init_micro).cast("long").alias("r")
    )
    for _ in range(iterations):
        contrib = (
            arcs.join(ranks, arcs["src"] == ranks["node"])
            .groupBy(F.col("dst").alias("node"))
            .agg(F.expr("sum(r DIV deg)").alias("c"))
        )
        ranks = nodes.join(contrib, "node", "left").select(
            "node",
            "deg",
            F.expr(
                f"{base} + ({damping_pct} * coalesce(c, 0)) DIV 100"
            ).alias("r"),
        )
    return ranks.select("node", "r")


def kcore(
    edges: DataFrame,
    k: int,
    rounds: int | None = None,
    max_rounds: int = 64,
    a: str = "a",
    b: str = "b",
) -> DataFrame:
    """k-core decomposition membership: iteratively peel nodes of degree
    < ``k`` until a fixpoint (Seidman 1983; the distributed peel loop is
    the standard synchronous schedule, e.g. Montresor et al. 2013).

    ``edges`` is a deduplicated canonical undirected edge list with
    ``a < b``.  Returns ``(node, core_degree)`` for every node of the
    k-core, where ``core_degree`` counts the node's neighbors INSIDE the
    core (>= k at a fixpoint by definition).

    Two modes sharing one loop:

    - ``rounds=None`` (production): peel to the fixpoint, checking
      convergence by edge count each round and raising if ``max_rounds``
      is exceeded — loud, never a silently-truncated core.
    - ``rounds=R`` (differential-oracle mode): peel EXACTLY R rounds as
      the semantics.  The DuckDB oracle unrolls the same R rounds as a
      CTE chain, so the identity holds for ANY input, converged or not;
      peel rounds past convergence are no-ops (every surviving degree is
      already >= k, the keep set keeps everything), so when the data
      converges within R the result IS the true k-core.  Convergence is
      still detected (same count) purely to stop early — the skipped
      rounds cannot change the result.

    Plan shape per round: degrees via union-all endpoints + groupBy
    (map-side partial combine — a count window would pin a hub's edge
    set on one task, the repo-wide banned shape), then two semi-joins
    keep edges whose BOTH endpoints survive.  ``O(rounds)`` linear
    passes, the textbook schedule; each round's edge relation is
    eagerly localCheckpoint-ed — the convergence count has to
    materialize it anyway, and truncation keeps the next round's plan
    flat (a lazy chain would double the e_i subtree per round: keep_i
    references e_i, so e_{i+1} embeds e_i twice).  Nothing
    node-cardinality is collected or broadcast; the keep-set join
    strategy is left to the planner/AQE (node relations do not fit a
    forced broadcast at scale).

    Reference parity: the reference gateway has no graph surface
    (/root/reference/src/app.py:175-239 is DuckDB SQL passthrough) —
    this is a beyond-reference scale operator (dense-cohort extraction
    over co-occurrence graphs: spam/template cluster cores in training
    corpora, influence cohorts in item graphs).
    """
    if k < 1:
        raise ValueError(f"kcore: k must be >= 1, got {k}")
    e = edges.select(F.col(a).alias("ea"), F.col(b).alias("eb"))
    e = e.localCheckpoint(eager=True)
    n_edges = e.count()
    total = rounds if rounds is not None else max_rounds
    for r in range(total):
        if n_edges == 0:
            break
        keep = (
            e.select(F.col("ea").alias("node"))
            .unionByName(e.select(F.col("eb").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("deg"))
            .filter(F.col("deg") >= k)
            .select("node")
        )
        nxt = (
            e.join(keep.withColumnRenamed("node", "ea"), "ea", "leftsemi")
            .join(keep.withColumnRenamed("node", "eb"), "eb", "leftsemi")
            .localCheckpoint(eager=True)
        )
        n_nxt = nxt.count()
        e = nxt
        if n_nxt == n_edges:  # fixpoint: every degree >= k
            n_edges = n_nxt
            break
        n_edges = n_nxt
    else:
        if rounds is None:
            raise RuntimeError(
                f"kcore: no fixpoint within max_rounds={max_rounds} "
                f"(still {n_edges} edges changing); raise max_rounds"
            )
    return (
        e.select(F.col("ea").alias("node"))
        .unionByName(e.select(F.col("eb").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("core_degree"))
    )


def lpa_labels(
    edges: DataFrame,
    rounds: int,
    a: str = "a",
    b: str = "b",
) -> DataFrame:
    """Synchronous label propagation (Raghavan et al. 2007): every node
    starts labeled with its own id; each round every node adopts the
    label MOST FREQUENT among its neighbors' current labels, ties
    broken by the smallest label.  Returns ``(node, label)`` after
    EXACTLY ``rounds`` rounds — fixed-round semantics because
    synchronous LPA can oscillate (a 2-cycle swaps labels forever), so
    "run to convergence" is not well-defined; a fixed unrolled schedule
    is also what makes the operator differentially testable (the DuckDB
    oracle replays the same R rounds as a MATERIALIZED CTE chain, so
    the identity holds for ANY input, oscillating or not).

    Plan shape per round: one shuffle-join of the arc relation against
    the current labels (keyed on the neighbor endpoint), a
    (node, label)-keyed partial-agg vote count (map-side combine
    absorbs hub neighborhoods — a per-node window over raw votes would
    pin a hub's whole arc set on one task, the repo-wide banned shape),
    and an argmin-style ``min(struct(-cnt, label))`` aggregate per node
    — pure integer arithmetic, bit-exact on any engine/partitioning.
    Labels are eagerly localCheckpoint-ed each round (the kcore rule:
    a lazy chain would re-embed every prior round's subtree), and the
    arc relation derives from an eagerly checkpointed edge list so its
    lineage is flat across rounds.  Nothing node-cardinality is ever
    collected or broadcast.

    Reference parity: beyond-reference scale operator (no graph
    surface in the gateway, /root/reference/src/app.py:175-239) —
    community structure over co-occurrence graphs (template/boilerplate
    families in training corpora, product communities in item graphs).
    """
    if rounds < 1:
        raise ValueError(f"lpa_labels: rounds must be >= 1, got {rounds}")
    e = (
        edges.select(F.col(a).alias("ea"), F.col(b).alias("eb"))
        .localCheckpoint(eager=True)
    )
    arcs = e.select(
        F.col("ea").alias("node"), F.col("eb").alias("nbr")
    ).unionByName(e.select(F.col("eb").alias("node"), F.col("ea").alias("nbr")))
    labels = (
        arcs.select("node")
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(rounds):
        labels = _lpa_round(arcs, labels).localCheckpoint(eager=True)
    return labels


def _lpa_round(arcs: DataFrame, labels: DataFrame) -> DataFrame:
    """One synchronous LPA vote round (plan-pinned in tests/test_plans.py):
    arc⋈label join keyed on the neighbor endpoint, (node, label) partial-agg
    vote count, argmin-style ``min(struct(-cnt, label))`` per node."""
    votes = (
        arcs.join(labels.withColumnRenamed("node", "nbr"), "nbr")
        .groupBy("node", "label")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        votes.groupBy("node")
        .agg(
            F.min(
                F.struct(
                    (-F.col("cnt")).alias("neg_cnt"),
                    F.col("label").alias("lb"),
                )
            ).alias("best")
        )
        .select("node", F.col("best.lb").alias("label"))
    )
