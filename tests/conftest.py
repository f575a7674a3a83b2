from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from duckdb_webhook_gateway_spark.session import get_spark  # noqa: E402

TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")


@pytest.fixture(scope="session")
def spark():
    import tempfile

    warehouse = tempfile.mkdtemp(prefix="spark_warehouse_")
    spark = get_spark(
        "engine-tests", **{"spark.sql.warehouse.dir": warehouse}
    )
    yield spark


@pytest.fixture()
def gateway(spark, tmp_path):
    from duckdb_webhook_gateway_spark.engine import Gateway

    return Gateway(spark, workdir=str(tmp_path / "store"))


# Canonical payloads from the reference test suite (FIXTURES.md §1-§5;
# reference: tests/conftest.py:85-98).
@pytest.fixture()
def sample_payload():
    return {
        "field1": "value1",
        "field2": "value2",
        "nested": {"key1": "value1", "key2": 123},
        "items": [{"id": 1, "name": "Item 1"}, {"id": 2, "name": "Item 2"}],
    }


@pytest.fixture()
def reference_table_rows():
    # FIXTURES.md §6 (reference: tests/conftest.py:108-115)
    return [
        {"id": 1, "name": "Item 1", "category": "A", "active": True},
        {"id": 2, "name": "Item 2", "category": "B", "active": True},
        {"id": 3, "name": "Item 3", "category": "A", "active": False},
    ]


def sf_dir(sf: str = "sf0.001") -> str:
    return os.path.join(TESTDATA, sf)
