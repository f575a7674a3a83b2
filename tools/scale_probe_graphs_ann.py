"""Round-14 constant-density scale probe: graph family + ANN family.

Extends the r13 dedup/near-dup probe (tools/gen_scale_probe.py,
BASELINE.md) to the two families the r13 verdict listed as uncovered.
Spark-only (the oracle need not run at probe scale), one session per
scale point, min-of-2 per query, shuffle partitions sized to data (the
measured r13 rule: 32 at 1x, 128 at 10x).

Graph axes — the replication rule matters (r13 verdict):

- DISJOINT 10x (sf0.1 -> .localdata/sf1): gen_sf1 offsets BOTH
  l_orderkey and l_partkey, so each replica is an FK-consistent
  disjoint subgraph.  Output grows exactly 10x and the graph work is
  embarrassingly parallel across components — this axis measures the
  ENGINE's data-volume scaling (shuffles, aggregates, joins at 10x
  rows), not algorithmic densification.  Trivially-linear is the
  EXPECTED verdict here; say so, don't celebrate it.
- DENSIFIED Rx (orders replicated, parts SHARED): item degree grows
  ~Rx, so wedges grow ~R^2 and triangles up to ~R^3 — the adversarial
  axis for a triangle count.  Runtime should track the OUTPUT/wedge
  volume (output-bound, like doc_prefix_jaccard_join in the r13
  probe), not blow past it.  R=3 keeps the wedge volume within local
  memory budgets.

ANN axis — probe1 (20k vectors) vs probe10 (200k, rotation-isometry
replicas, cross-replica cosines low): ann_ivfq8_topk with the
registered parameters (16 lists, nprobe 2) scans ~nprobe/nlist of the
corpus per query, so candidate volume and runtime should grow ~LINEAR
with the corpus; the FAISS nlist ~ sqrt(N) sizing rule is measured by
a second point with nlist scaled to 64 (the LSH planes_per_table
analogue, similarity.py::auto_planes_per_table).

Usage:
    python tools/scale_probe_graphs_ann.py --build   # densified inputs
    SPARK_GRAFT_CPUS=32 python tools/scale_probe_graphs_ann.py --run graphs1x
    ... one --run per session: graphs1x graphs10x graphs3d ann1x ann10x
Each --run prints one JSON line; record results in BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LOCAL = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".localdata"
)
DENSE_REPLICAS = 3


def build() -> None:
    """Densified lineitem: replicate ORDERS (offset l_orderkey) and
    SHIFT the shared part space per replica (a cyclic permutation by a
    prime stride), so replica r contributes the r-shifted copy of the
    co-occurrence edge set over the SAME nodes — item degree ~xR,
    genuinely new edges.  (A first build kept l_partkey untouched;
    replicated baskets then produce DUPLICATE pairs that collapse in
    the operators' distinct, leaving the edge set bit-identical to 1x
    — measured: triangle runtime 8.1 vs 8.9 s at '3x'.  A density
    probe must grow the distinct edge set, not the duplicate stream.)
    """
    import duckdb

    dst = os.path.join(LOCAL, f"gdense{DENSE_REPLICAS}")
    os.makedirs(dst, exist_ok=True)
    src = "/root/testdata/sf0.1/lineitem.parquet"
    con = duckdb.connect()
    con.execute(
        f"""
        COPY (
          WITH p AS (SELECT max(l_partkey) AS pmax,
                            max(l_orderkey) + 1 AS ostride FROM '{src}')
          SELECT l_orderkey + i.r * p.ostride AS l_orderkey,
                 ((l_partkey - 1 + i.r * 7919) % p.pmax) + 1 AS l_partkey,
                 l_suppkey, l_linenumber, l_quantity,
                 l_extendedprice, l_discount, l_tax, l_returnflag,
                 l_linestatus, l_shipdate
          FROM '{src}', p, range({DENSE_REPLICAS}) i(r)
        ) TO '{dst}/lineitem.parquet' (FORMAT parquet)
        """
    )
    print("built", dst)


def _timed(fn, *args) -> float:
    best = float("inf")
    for _ in range(2):
        t = time.perf_counter()
        fn(*args).count()
        best = min(best, time.perf_counter() - t)
    return round(best, 3)


RUNS = {
    # name -> (sf_dir, shuffle, queries)
    "graphs1x": ("/root/testdata/sf0.1", "32", ["part_triangle_count", "part_kcore"]),
    "graphs10x": (os.path.join(LOCAL, "sf1"), "128", ["part_triangle_count", "part_kcore"]),
    "graphs3d": (os.path.join(LOCAL, f"gdense{DENSE_REPLICAS}"), "32", ["part_triangle_count", "part_kcore"]),
    "ann1x": (os.path.join(LOCAL, "probe1"), "32", ["ann_ivfq8_topk"]),
    "ann10x": (os.path.join(LOCAL, "probe10"), "128", ["ann_ivfq8_topk"]),
}


def run(name: str) -> None:
    sf_dir, shuffle, queries = RUNS[name]
    from duckdb_webhook_gateway_spark import get_spark
    from duckdb_webhook_gateway_spark.workloads import all_entries

    spark = get_spark(f"scale-probe-{name}")
    spark.conf.set("spark.sql.shuffle.partitions", shuffle)
    entries = all_entries()
    out = {"probe": name, "sf_dir": sf_dir, "shuffle": int(shuffle)}
    for q in queries:
        fn = entries[q][0]
        fn(spark, sf_dir).count()  # full-scale warm
        out[q] = _timed(fn, spark, sf_dir)
    # the nlist ~ sqrt(N) sizing point for the ANN runs
    if name.startswith("ann"):
        from pyspark.sql import functions as F

        from duckdb_webhook_gateway_spark.operators.similarity import (
            ivfq8_topk,
        )

        emb = spark.read.parquet(sf_dir + "/embeddings.parquet")
        n = emb.count()
        nlist = 64 if n > 50_000 else 16

        def scaled():
            return ivfq8_topk(
                emb.filter(F.col("vec_id") < 10),
                emb,
                k=5,
                centroids=emb.filter(F.col("vec_id") < nlist).select(
                    F.col("vec_id").alias("centroid_id"), "embedding"
                ),
                nprobe=2,
            )

        scaled().count()
        out[f"ivfq8_nlist{nlist}"] = _timed(scaled)
    print(json.dumps(out), flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--build", action="store_true")
    ap.add_argument("--run", choices=sorted(RUNS))
    a = ap.parse_args()
    if a.build:
        build()
    if a.run:
        run(a.run)


if __name__ == "__main__":
    main()
