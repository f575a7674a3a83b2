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

- documents: a replica salt token is interleaved into EVERY token gap
  (``replace(text, ' ', ' r<i>x ')``), so every shingle/window of
  length >= 2 contains the salt — cross-replica Jaccard ~ 0 at any
  shingle size — while two docs inside one replica relate exactly as
  their sf0.1 originals did (both salted identically).
- embeddings: each replica's vectors are ROTATED by ``i % 64``
  positions (an isometry: within-replica cosines are bit-preserved)
  and NEGATED for ``i >= 64`` (cos(a, -b) = -cos(a, b), never a
  near-dup at positive thresholds) — cross-replica cosines of generic
  vectors land near 0, so no new near-dup pairs appear.

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
    if args.replicas > 128:
        raise SystemExit("rotation+negation covers at most 128 replicas")
    os.makedirs(args.dst, exist_ok=True)
    con = duckdb.connect()

    doc_stride = con.execute(
        f"SELECT max(doc_id) + 1 FROM '{args.src}/documents.parquet'"
    ).fetchone()[0]
    con.execute(
        f"""
        COPY (
          SELECT doc_id + r.i * {doc_stride} AS doc_id,
                 concat('r', r.i, 'x ',
                        replace(text, ' ', concat(' r', r.i, 'x '))) AS text,
                 lang, source, n_chars
          FROM '{args.src}/documents.parquet', range({args.replicas}) r(i)
          ORDER BY r.i
        ) TO '{args.dst}/documents.parquet'
          (FORMAT parquet, ROW_GROUP_SIZE 262144)
        """
    )
    vec_stride = con.execute(
        f"SELECT max(vec_id) + 1 FROM '{args.src}/embeddings.parquet'"
    ).fetchone()[0]
    con.execute(
        f"""
        COPY (
          WITH rot AS (
            SELECT vec_id + r.i * {vec_stride} AS vec_id,
                   label,
                   CASE WHEN r.i % 64 = 0 THEN embedding
                        ELSE list_concat(embedding[(r.i % 64) + 1:],
                                         embedding[1:(r.i % 64)])
                   END AS v,
                   r.i AS i
            FROM '{args.src}/embeddings.parquet', range({args.replicas}) r(i)
          )
          SELECT vec_id, label,
                 CAST(CASE WHEN i >= 64
                           THEN list_transform(v, x -> -x)
                           ELSE v END AS FLOAT[]) AS embedding
          FROM rot ORDER BY i
        ) TO '{args.dst}/embeddings.parquet'
          (FORMAT parquet, ROW_GROUP_SIZE 262144)
        """
    )
    for t in ("documents", "embeddings"):
        n = con.execute(
            f"SELECT count(*) FROM '{args.dst}/{t}.parquet'"
        ).fetchone()[0]
        print(t, n)


if __name__ == "__main__":
    main()
