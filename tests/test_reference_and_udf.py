"""Reference tables + runtime UDFs, mirroring the reference's
tests/test_reference_and_udf.py:17-444 and tests/test_integration.py:291-469."""

from __future__ import annotations

import pytest

from duckdb_webhook_gateway_spark.engine import WebhookConfig, execute_transform
from duckdb_webhook_gateway_spark.engine.reference_tables import (
    ref_table_name,
    sanitize_table_name,
)
from duckdb_webhook_gateway_spark.engine.udfs import map_return_type, udf_full_name
from pyspark.sql import types as T


def test_sanitize_table_name():
    # reference: src/app.py:606-607
    assert sanitize_table_name("my-table!x") == "my_table_x"
    assert sanitize_table_name("ok_name2") == "ok_name2"


def test_upload_and_join_in_transform(gateway, spark, reference_table_rows, sample_payload):
    # reference: tests/test_reference_and_udf.py:185-212 — join payload's
    # nested.key2 against the reference table id... with key2=123 no match,
    # so use the canonical id join on item ids.
    rec = gateway.register_webhook(
        WebhookConfig(
            source_path="/reftest",
            destination_url="http://example.com/x",
            transform_query="SELECT * FROM {{payload}}",
        )
    )
    wid = rec["id"]
    df = spark.createDataFrame(reference_table_rows)
    gateway.ref_tables.upload(wid, "items", df, description="test items")
    full = ref_table_name(wid, "items")

    result = execute_transform(
        spark,
        f"SELECT p.nested.key1 AS k1, r.name AS item_name, r.category AS category "
        f"FROM {{{{payload}}}} p JOIN {full} r ON r.id = 1",
        sample_payload,
    )
    assert result == {"k1": "value1", "item_name": "Item 1", "category": "A"}


def test_left_join_enrichment(gateway, spark):
    # FIXTURES.md §7 (reference: tests/test_integration.py:291-337)
    rec = gateway.register_webhook(
        WebhookConfig(
            source_path="/users",
            destination_url="http://example.com/x",
            transform_query="SELECT * FROM {{payload}}",
        )
    )
    wid = rec["id"]
    users = spark.createDataFrame(
        [
            (1, "john_doe", "engineering", "developer"),
            (2, "jane_smith", "product", "manager"),
            (3, "bob_jones", "engineering", "devops"),
        ],
        ["user_id", "username", "department", "role"],
    )
    gateway.ref_tables.upload(wid, "users", users)
    full = ref_table_name(wid, "users")
    result = execute_transform(
        spark,
        f"SELECT e.event_id, e.username, u.department, u.role "
        f"FROM {{{{payload}}}} e LEFT JOIN {full} u ON e.username = u.username",
        {"event_id": "event123", "username": "jane_smith", "action": "login"},
    )
    assert result == {
        "event_id": "event123",
        "username": "jane_smith",
        "department": "product",
        "role": "manager",
    }


def test_reupload_replaces(gateway, spark, reference_table_rows):
    # reference: tests/test_reference_and_udf.py:82-153
    rec = gateway.register_webhook(
        WebhookConfig(
            source_path="/rt2",
            destination_url="http://example.com/x",
            transform_query="SELECT * FROM {{payload}}",
        )
    )
    wid = rec["id"]
    gateway.ref_tables.upload(wid, "t", spark.createDataFrame(reference_table_rows))
    assert gateway.ref_tables.table(wid, "t").count() == 3
    gateway.ref_tables.upload(
        wid, "t", spark.createDataFrame([{"id": 9, "name": "only"}])
    )
    rows = gateway.ref_tables.table(wid, "t").collect()
    assert len(rows) == 1 and rows[0].id == 9
    # metadata upserted in place — one row for (webhook, table)
    assert len(gateway.ref_tables.list(wid)) == 1


def test_csv_reader(gateway, tmp_path):
    csv = tmp_path / "users.csv"
    csv.write_text(
        "user_id,username,department,role\n"
        "1,john_doe,engineering,developer\n"
        "2,jane_smith,product,manager\n"
    )
    df = gateway.ref_tables.read_upload(str(csv))
    assert df.schema["user_id"].dataType == T.IntegerType()
    assert df.count() == 2


def test_unsupported_format_rejected(gateway, tmp_path):
    # reference: src/app.py:1023-1024 (400 for non-CSV/JSON)
    xlsx = tmp_path / "nope.xlsx"
    xlsx.write_text("junk")
    with pytest.raises(ValueError):
        gateway.ref_tables.read_upload(str(xlsx))


# -- UDFs ------------------------------------------------------------------
def test_type_mapping():
    # reference: src/app.py:726-734
    def f_str(x: str) -> str: ...
    def f_int(x: str) -> int: ...
    def f_float(x: str) -> float: ...
    def f_bool(x: str) -> bool: ...
    def f_none(x: str): ...

    assert map_return_type(f_str) == T.StringType()
    assert map_return_type(f_int) == T.IntegerType()
    assert map_return_type(f_float) == T.DoubleType()
    assert map_return_type(f_bool) == T.BooleanType()
    assert map_return_type(f_none) == T.StringType()  # default VARCHAR


def test_udf_register_and_use(gateway, spark):
    # reference: tests/test_reference_and_udf.py:332-429
    rec = gateway.register_webhook(
        WebhookConfig(
            source_path="/udf1",
            destination_url="http://example.com/x",
            transform_query="SELECT * FROM {{payload}}",
        )
    )
    wid = rec["id"]
    gateway.udfs.register(
        wid,
        "extract_domain",
        "def extract_domain(email: str) -> str:\n"
        "    return email.split('@')[1] if '@' in email else ''\n",
    )
    name = udf_full_name(wid, "extract_domain")
    result = execute_transform(
        spark,
        f"SELECT user_id, {name}(email) AS domain FROM {{{{payload}}}}",
        {"user_id": 123, "email": "user@example.com", "name": "Test User"},
    )
    assert result == {"user_id": 123, "domain": "example.com"}


def test_udf_reregistration_replaces(gateway, spark):
    # reference: tests/test_reference_and_udf.py:270-330
    rec = gateway.register_webhook(
        WebhookConfig(
            source_path="/udf2",
            destination_url="http://example.com/x",
            transform_query="SELECT * FROM {{payload}}",
        )
    )
    wid = rec["id"]
    gateway.udfs.register(wid, "fn", "def fn(x: str) -> str:\n    return x.upper()\n")
    gateway.udfs.register(wid, "fn", "def fn(x: str) -> str:\n    return x.lower()\n")
    name = udf_full_name(wid, "fn")
    result = execute_transform(
        spark, f"SELECT {name}(v) AS out FROM {{{{payload}}}}", {"v": "MiXeD"}
    )
    assert result == {"out": "mixed"}
    assert len(gateway.udfs.list(wid)) == 1  # upserted, not duplicated


def test_invalid_udf_code_rejected(gateway):
    # reference: tests/test_reference_and_udf.py:431-444
    with pytest.raises(Exception):
        gateway.udfs.register("whatever", "fn", "this is not python")
    with pytest.raises(ValueError):
        gateway.udfs.register("whatever", "fn", "def other():\n    pass\n")


def test_udfs_loaded_before_processing(gateway, spark):
    # reference: src/app.py:1148 (load_webhook_udfs on every run)
    rec = gateway.register_webhook(
        WebhookConfig(
            source_path="/udf3",
            destination_url="http://example.com/x",
            transform_query="SELECT 1 AS one FROM {{payload}}",
        )
    )
    wid = rec["id"]
    gateway.udfs.register(
        wid, "shout", "def shout(x: str) -> str:\n    return x.upper() + '!'\n"
    )
    name = udf_full_name(wid, "shout")
    gateway.catalog.update(
        rec["id"],
        WebhookConfig(
            source_path="/udf3",
            destination_url="http://example.com/x",
            transform_query=f"SELECT {name}(word) AS loud FROM {{{{payload}}}}",
        ),
    )
    outcome = gateway.ingest("/udf3", {"word": "hey"})
    assert outcome.transformed == {"loud": "HEY!"}


def test_vectorized_udf_registration(gateway, spark):
    """vectorized=True registers the same scalar contract as an
    Arrow-batched pandas UDF — identical results on a large relation,
    and row-UDF reload semantics stay the reference default."""
    from duckdb_webhook_gateway_spark.engine.udfs import udf_full_name

    wid = "11111111-2222-3333-4444-555555555555"
    gateway.udfs.register(
        wid,
        "triple",
        "def triple(x: int) -> int:\n    return x * 3\n",
        vectorized=True,
    )
    name = udf_full_name(wid, "triple")
    spark.range(1000).createOrReplaceTempView("vec_udf_in")
    out = spark.sql(
        f"SELECT sum({name}(CAST(id AS INT))) AS s FROM vec_udf_in"
    ).first()
    assert out.s == 3 * sum(range(1000))
    # reload path re-registers from stored code (row-at-a-time default)
    # and must still compute the same values
    gateway.udfs.load_webhook_udfs(wid)
    out2 = spark.sql(f"SELECT {name}(14) AS v").first()
    assert out2.v == 42
