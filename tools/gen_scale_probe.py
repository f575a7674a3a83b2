"""Dedup-family scaling-probe corpora: constant pair DENSITY at 10x.

``gen_sf1.py``'s replica construction is the wrong input for a scaling
EXPONENT probe of the dedup/near-dup family: its replicas differ by one
leading token (documents) or not at all (embeddings), so every document
is a genuine ~0.99-Jaccard near-dup of its 9 replicas and every vector
an exact dup of its copies — measured round 13, ``dedup_minhash_lsh``
grew x16.3 from sf1 to a 10x replica corpus while its OUTPUT grew x105
(248k -> 26.1M pairs).  That measures the corpus's quadratic pair
density, not the engine.

This generator replicates sf0.1 with transforms that keep WITHIN-replica
duplicate structure bit-comparable while making CROSS-replica pairs
non-duplicates, so output density stays constant and t(10x)/t(1x)
isolates the engine's scaling exponent:

- documents: every token gets a replica SUFFIX
  (``a b c`` -> ``a_r3 b_r3 c_r3``) — a per-replica VOCABULARY
  BIJECTION, so each replica is an isomorphic copy of sf0.1 with a
  disjoint vocabulary: every n-gram/shingle statistic (document
  frequencies, rarity order, posting-list sizes) is preserved exactly
  within a replica while cross-replica Jaccard is 0 at every shingle
  size.  (The first attempt INTERLEAVED a salt token into every gap;
  that halves effective shingle length — a salted k-shingle carries
  the document frequency of a (k/2)-gram — which degrades
  prefix-filter rarity pruning and measures the salt, not the engine.)
- embeddings: each replica's vectors are multiplied by a replica-
  specific RADEMACHER diagonal (seeded +-1 sign per dimension) — an
  exact isometry (cos(D_i a, D_i b) == cos(a, b) bit-for-bit up to
  sign-commuting float multiplies), while a cross-replica cosine
  becomes a +-1-weighted sum concentrating around 0 (~1/sqrt(64) std),
  far below any near-dup threshold.  (The first attempt ROTATED each
  replica's dimensions; the synthetic embeddings are shift-correlated,
  so small rotations kept cross-replica cosines high and the near-dup
  output grew x101 instead of x10 — measured, with a pair-origin
  histogram decaying in rotation distance.)

Usage:
    python tools/gen_scale_probe.py --dst .localdata/probe1  --replicas 10
    python tools/gen_scale_probe.py --dst .localdata/probe10 --replicas 100
"""

from __future__ import annotations

import argparse
import os

import duckdb

SRC = "/root/testdata/sf0.1"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default=SRC)
    ap.add_argument("--dst", required=True)
    ap.add_argument("--replicas", type=int, required=True)
    args = ap.parse_args()
    os.makedirs(args.dst, exist_ok=True)
    con = duckdb.connect()

    doc_stride = con.execute(
        f"SELECT max(doc_id) + 1 FROM '{args.src}/documents.parquet'"
    ).fetchone()[0]
    con.execute(
        f"""
        COPY (
          SELECT doc_id + r.i * {doc_stride} AS doc_id,
                 concat(replace(text, ' ', concat('_r', r.i, ' ')),
                        '_r', r.i) AS text,
                 lang, source, n_chars
          FROM '{args.src}/documents.parquet', range({args.replicas}) r(i)
          ORDER BY r.i
        ) TO '{args.dst}/documents.parquet'
          (FORMAT parquet, ROW_GROUP_SIZE 262144)
        """
    )
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    base = pq.read_table(f"{args.src}/embeddings.parquet")
    vec_ids = base.column("vec_id").to_numpy()
    labels = base.column("label").to_numpy()
    mat = np.stack(
        [np.asarray(v, dtype="float32") for v in base.column("embedding").to_pylist()]
    )
    n, d = mat.shape
    vec_stride = int(vec_ids.max()) + 1
    out_ids, out_labels, out_mats = [], [], []
    for i in range(args.replicas):
        signs = (
            np.random.default_rng(1013 + i).integers(0, 2, size=d) * 2 - 1
        ).astype("float32")
        out_ids.append(vec_ids + i * vec_stride)
        out_labels.append(labels)
        out_mats.append(mat * signs[None, :])
    allmat = np.concatenate(out_mats)
    tbl = pa.table(
        {
            "vec_id": np.concatenate(out_ids),
            "embedding": pa.array(list(allmat), type=pa.list_(pa.float32())),
            "label": np.concatenate(out_labels).astype("int32"),
        }
    )
    pq.write_table(tbl, f"{args.dst}/embeddings.parquet", row_group_size=262144)
    for t in ("documents", "embeddings"):
        n = con.execute(
            f"SELECT count(*) FROM '{args.dst}/{t}.parquet'"
        ).fetchone()[0]
        print(t, n)


if __name__ == "__main__":
    main()
