"""ADVICE r13: the r13 ranks.py scale-path rewrite carried NO
_PLAN_CHANGED_ROUND entries for its three riding registered queries
(orders_value_quartiles, orders_price_exact_quantiles,
corpus_token_coverage) on the argument that driver certification runs
at a scale where the ``input_bytes`` routing takes the UNCHANGED small
route.  That exemption silently depends on
``scan_bytes(source) <= SMALL_INPUT_CEILING`` at the certification
scale — this test machine-checks it, so a future driver scale bump
voids the exemption LOUDLY instead of leaving stale certifications.

If this test ever fails: the rewrite's large route now runs at
certification scale — record the three entries in
workloads/__init__._PLAN_CHANGED_ROUND for the current round and
re-emit the window (CLAUDE.md convention).
"""

from __future__ import annotations

import pytest

from conftest import sf_dir

from duckdb_webhook_gateway_spark.operators.ranks import SMALL_INPUT_CEILING
from duckdb_webhook_gateway_spark.plans.spread import scan_bytes

# (entry, source table feeding the input_bytes routing decision)
_RANKS_RIDING = [
    ("orders_value_quartiles", "orders"),
    ("orders_price_exact_quantiles", "orders"),
    ("corpus_token_coverage", "documents"),
]

# sf0.01 is the driver certification scale; sf0.1 is the every-round
# parity-suite and bench scale — the exemption must hold at both.
_CERT_SCALES = ["sf0.01", "sf0.1"]


@pytest.mark.parametrize("sf", _CERT_SCALES)
@pytest.mark.parametrize("entry,table", _RANKS_RIDING)
def test_ranks_riders_route_small_at_cert_scale(spark, sf, entry, table):
    src = spark.read.parquet(sf_dir(sf) + f"/{table}.parquet")
    nbytes = scan_bytes(src)
    assert nbytes is not None, f"{table}@{sf} not statable?"
    assert nbytes <= SMALL_INPUT_CEILING, (
        f"{entry}@{sf}: source {table} is {nbytes} bytes > "
        f"SMALL_INPUT_CEILING {SMALL_INPUT_CEILING} — the r13 ranks "
        f"rewrite's large route now runs at certification scale, so "
        f"the no-_PLAN_CHANGED_ROUND exemption is void: record the "
        f"three ranks-riding entries for this round and re-emit the "
        f"window (see module docstring)"
    )
