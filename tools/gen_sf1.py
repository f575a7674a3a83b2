"""Generate a local sf1 dataset (~6M lineitem) for scale-up timing.

The driver ships sf{0.001,0.01,0.1} only; the floor-amortization claim
("the local Spark-vs-DuckDB ratio is dominated by per-job scheduler
cost that shrinks as per-query work grows") needs one data point with
10x the work.  This replicates sf0.1 ten times with FK-consistent key
offsets:

- every key column (custkey, orderkey, partkey, suppkey, event/user/
  vec/doc ids) is offset by ``replica * (max_key + 1)``, so each
  replica is an internally-consistent shard of the same star schema —
  joins scale 10x in both engines without changing selectivities;
- nation/region (dimension constants) are NOT offset or replicated;
- document text gets a replica-distinct first token (``r<i>``), so the
  dedup/similarity families don't see 10 exact copies of every doc
  (which would explode pair outputs instead of scaling them);
- embeddings replicate as-is (top-k/near-dup volumes scale linearly).

Output: /root/repo/.localdata/sf1/*.parquet (gitignored).  Timestamps,
strings and value distributions are bit-identical to sf0.1 — both
engines read the same files, so paired timings stay apples-to-apples.

Usage: python tools/gen_sf1.py
       # round 13: documents/embeddings-only sf10 for the dedup-family
       # scaling probe (Spark-only; the oracle need not run at sf10)
       python tools/gen_sf1.py --src /root/repo/.localdata/sf1 \
           --dst /root/repo/.localdata/sf10 --replicas 10 \
           --tables documents,embeddings
"""

from __future__ import annotations

import os

import duckdb

SRC = "/root/testdata/sf0.1"
DST = "/root/repo/.localdata/sf1"
REPLICAS = 10

# table -> list of (column, stride-source table alias) key offsets.
# The stride for a key family is max(key)+1 of its OWNING table, so
# references stay aligned across tables within one replica.
KEYS = {
    "customer": [("c_custkey", "cust")],
    "orders": [("o_orderkey", "ord"), ("o_custkey", "cust")],
    "lineitem": [
        ("l_orderkey", "ord"),
        ("l_partkey", "part"),
        ("l_suppkey", "supp"),
    ],
    "part": [("p_partkey", "part")],
    "supplier": [("s_suppkey", "supp")],
    "events": [("event_id", "evt"), ("user_id", "usr")],
    "embeddings": [("vec_id", "vec")],
    "documents": [("doc_id", "doc")],
}

STRIDE_SQL = {
    "cust": "SELECT max(c_custkey) + 1 FROM '{s}/customer.parquet'",
    "ord": "SELECT max(o_orderkey) + 1 FROM '{s}/orders.parquet'",
    "part": "SELECT max(p_partkey) + 1 FROM '{s}/part.parquet'",
    "supp": "SELECT max(s_suppkey) + 1 FROM '{s}/supplier.parquet'",
    "evt": "SELECT max(event_id) + 1 FROM '{s}/events.parquet'",
    "usr": "SELECT max(user_id) + 1 FROM '{s}/events.parquet'",
    "vec": "SELECT max(vec_id) + 1 FROM '{s}/embeddings.parquet'",
    "doc": "SELECT max(doc_id) + 1 FROM '{s}/documents.parquet'",
}


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default=SRC)
    ap.add_argument("--dst", default=DST)
    ap.add_argument("--replicas", type=int, default=REPLICAS)
    ap.add_argument(
        "--tables",
        default=None,
        help="comma-separated subset of the keyed tables (default: all "
        "+ the region/nation dimension copies)",
    )
    args = ap.parse_args()
    src, dst, replicas = args.src, args.dst, args.replicas
    subset = set(args.tables.split(",")) if args.tables else None

    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    needed = {
        fam
        for t, keys in KEYS.items()
        if subset is None or t in subset
        for _, fam in keys
    }
    strides = {
        k: con.execute(q.format(s=src)).fetchone()[0]
        for k, q in STRIDE_SQL.items()
        if k in needed
    }
    print("strides:", strides)
    if subset is None:
        for t in ("region", "nation"):
            con.execute(
                f"COPY (SELECT * FROM '{src}/{t}.parquet') TO "
                f"'{dst}/{t}.parquet' (FORMAT parquet)"
            )
            print(t, "copied")
    for t, keys in KEYS.items():
        if subset is not None and t not in subset:
            continue
        cols = [
            c[0]
            for c in con.execute(
                f"DESCRIBE SELECT * FROM '{src}/{t}.parquet'"
            ).fetchall()
        ]
        exprs = []
        for c in cols:
            off = next((fam for k, fam in keys if k == c), None)
            if off is not None:
                exprs.append(f"{c} + r.i * {strides[off]} AS {c}")
            elif t == "documents" and c == "text":
                # replica-distinct first token; n_chars tracks the text
                exprs.append("concat('r', r.i, ' ', text) AS text")
            elif t == "documents" and c == "n_chars":
                exprs.append(
                    "n_chars + 2 + length(CAST(r.i AS VARCHAR)) AS n_chars"
                )
            else:
                exprs.append(c)
        sel = ", ".join(exprs)
        con.execute(
            f"COPY (SELECT {sel} FROM '{src}/{t}.parquet', "
            f"range({replicas}) r(i) ORDER BY r.i) TO "
            f"'{dst}/{t}.parquet' (FORMAT parquet, ROW_GROUP_SIZE 262144)"
        )
        n = con.execute(
            f"SELECT count(*) FROM '{dst}/{t}.parquet'"
        ).fetchone()[0]
        print(t, n)


if __name__ == "__main__":
    main()
