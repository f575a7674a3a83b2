"""planes_per_table="auto" — the LSH hash width follows the corpus.

The r13 constant-density scale probe (tools/gen_scale_probe.py;
BASELINE.md "Knob demonstration") measured the rule: the default 4
planes/table is tuned for a ~20k-vector corpus, and at 10x corpus the
hand-tuned width was 7 (46.3 s -> 9.2 s).  Round 14 makes that rule the
default instead of a hand-set knob; these tests pin (a) auto == the
hand-tuned values at the probe cardinalities, (b) the one-bit-per-
doubling shape, (c) metadata-based resolution without a Spark job, and
(d) bit-identical output vs the explicit int at certification scale.
"""

from __future__ import annotations

import pytest

from conftest import sf_dir

from duckdb_webhook_gateway_spark.operators.similarity import (
    AUTO_PLANES_BASE,
    AUTO_PLANES_REF_VECTORS,
    _resolve_planes,
    auto_planes_per_table,
    near_dup_pairs_lsh,
)
from duckdb_webhook_gateway_spark.plans.spread import scan_rows


def test_auto_matches_probe_hand_tuned_values():
    # probe1 (10 replicas of sf0.1 = 20,000 vectors): tuned default 4
    assert auto_planes_per_table(20_000) == 4
    # probe10 (100 replicas = 200,000 vectors): the measured hand-tuned 7
    assert auto_planes_per_table(200_000) == 7


def test_auto_one_bit_per_doubling():
    ref = AUTO_PLANES_REF_VECTORS
    base = AUTO_PLANES_BASE
    # at or below the reference corpus: the tuned base, never fewer
    for n in (1, 100, ref // 2, ref):
        assert auto_planes_per_table(n) == base
    # each full doubling past the reference adds exactly one bit
    for k in range(1, 8):
        assert auto_planes_per_table(ref * 2**k) == base + k
        # just under the doubling boundary stays at the previous width
        assert auto_planes_per_table(ref * 2**k - 1) == base + k - 1
    # monotone non-decreasing across a sweep
    widths = [auto_planes_per_table(n) for n in range(1, 10**6, 9973)]
    assert widths == sorted(widths)


def test_scan_rows_reads_parquet_footers(spark):
    emb = spark.read.parquet(sf_dir("sf0.001") + "/embeddings.parquet")
    assert scan_rows(emb) == 500
    # a frame derived from a scan still reports the scan's footer rows —
    # the documented pre-filter/pre-agg UPPER BOUND (safe direction for
    # hash-width sizing)
    assert scan_rows(emb.groupBy("vec_id").count()) == 500
    # an in-memory frame has no input files -> None (callers fall back
    # to a count job)
    assert scan_rows(spark.range(3)) is None


def test_resolve_planes_uses_filtered_count_not_footer(spark, tmp_path):
    # review fix r14: inputFiles() survives filters, so footer rows
    # over-estimate a filtered corpus — and an over-estimated N
    # over-widens the hash, silently costing recall.  Anything but a
    # bare scan+project must pay the count() instead.
    from duckdb_webhook_gateway_spark.plans.spread import (
        plan_preserves_scan_rows,
    )

    src = str(tmp_path / "big.parquet")
    spark.range(41_000).selectExpr("id as vec_id").write.parquet(src)
    df = spark.read.parquet(src)
    assert plan_preserves_scan_rows(df)
    assert plan_preserves_scan_rows(df.select("vec_id"))
    assert not plan_preserves_scan_rows(df.filter("vec_id < 100"))
    assert not plan_preserves_scan_rows(df.limit(10))
    # bare scan: footer path, 41k > 2*ref -> one extra bit
    assert _resolve_planes(df, "auto") == auto_planes_per_table(41_000) == 5
    # filtered: the count decides -> base width, not the footer's 5
    assert _resolve_planes(df.filter("vec_id < 100"), "auto") == 4


def test_resolve_planes_explicit_auto_and_invalid(spark):
    emb = spark.read.parquet(sf_dir("sf0.001") + "/embeddings.parquet")
    assert _resolve_planes(emb, 9) == 9
    assert _resolve_planes(emb, "auto") == AUTO_PLANES_BASE  # 500 <= ref
    # derived frame: falls back to count(), same answer
    assert _resolve_planes(emb.filter("vec_id >= 0"), "auto") == (
        AUTO_PLANES_BASE
    )
    with pytest.raises(ValueError):
        _resolve_planes(emb, "automatic")


def test_auto_bit_identical_to_explicit_at_cert_scale(spark):
    emb = spark.read.parquet(sf_dir("sf0.001") + "/embeddings.parquet")
    explicit = {
        (r.vec_a, r.vec_b, r.cosine)
        for r in near_dup_pairs_lsh(
            emb, threshold=0.45, planes_per_table=4
        ).collect()
    }
    auto = {
        (r.vec_a, r.vec_b, r.cosine)
        for r in near_dup_pairs_lsh(
            emb, threshold=0.45, planes_per_table="auto"
        ).collect()
    }
    assert explicit == auto
    assert explicit, "no near-dup pairs at sf0.001?"
