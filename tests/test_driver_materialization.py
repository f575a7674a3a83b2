"""Global driver-materialization audit.

THE scale invariant of this repo: nothing corpus-cardinality is ever
collected or toPandas'd to the driver.  The per-operator docstrings and
plan pins argue it query-by-query; this test PROVES it mechanically —
every registered workload query executes under a spy on
``DataFrame.collect`` / ``DataFrame.toPandas``, and every driver
materialization observed must be bounded width (id-width candidate
lists, n_buckets/vocab-width statistics, k-row centroid sets, 1-row
bounds), never data-scale.

The bound (4096 rows) is far above every legitimate fixed-width fetch
(the largest is the 1024-row DSIR bucket distribution) and far below
any corpus relation at the test SF (documents = 5000 at sf0.1).
Queries whose EXACT path deliberately materializes the embedding corpus
behind a hard row-count gate (``EXACT_NEAR_DUP_CEILING`` — the gate
itself is tested in test_approx_quality.py) are exempted and listed.
"""

from __future__ import annotations

from conftest import sf_dir

# Exact-path queries that intentionally materialize the (gated)
# embedding corpus on the driver: auto-route to LSH past 1M rows.
GATED_EXACT_PATH = {
    "embedding_near_dup",
    "ensemble_near_dup",
    "semantic_dedup",
}

BOUND = 4096


def test_no_corpus_cardinality_driver_materialization(spark, monkeypatch):
    from duckdb_webhook_gateway_spark.workloads import all_entries

    try:
        from pyspark.sql.classic.dataframe import DataFrame as DF
    except ImportError:  # pragma: no cover - older layouts
        from pyspark.sql import DataFrame as DF

    orig_collect, orig_topandas = DF.collect, DF.toPandas
    seen: list[tuple[str, int, tuple]] = []

    def spy_collect(self):
        rows = orig_collect(self)
        seen.append(("collect", len(rows), tuple(self.columns)))
        return rows

    def spy_topandas(self):
        pdf = orig_topandas(self)
        seen.append(("toPandas", len(pdf), tuple(self.columns)))
        return pdf

    monkeypatch.setattr(DF, "collect", spy_collect)
    monkeypatch.setattr(DF, "toPandas", spy_topandas)

    offenders: dict[str, list] = {}
    try:
        for name, (fn, _oracle) in all_entries().items():
            if name in GATED_EXACT_PATH:
                continue
            seen.clear()
            # count() executes the full plan without the test harness
            # itself collecting result rows
            fn(spark, sf_dir()).count()
            big = [
                (kind, n, cols) for kind, n, cols in seen if n > BOUND
            ]
            if big:
                offenders[name] = big
    finally:
        monkeypatch.setattr(DF, "collect", orig_collect)
        monkeypatch.setattr(DF, "toPandas", orig_topandas)

    assert offenders == {}, offenders
