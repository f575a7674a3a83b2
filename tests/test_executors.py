"""Transform/filter executor semantics, mirroring the reference's
tests/test_event_processing.py:19-171."""

from __future__ import annotations

import pytest

from duckdb_webhook_gateway_spark.engine import apply_filter, execute_transform


# -- transforms (reference: tests/test_event_processing.py:19-108) ---------
def test_simple_projection(spark, sample_payload):
    result = execute_transform(
        spark, "SELECT field1, field2 FROM {{payload}}", sample_payload
    )
    assert result == {"field1": "value1", "field2": "value2"}


def test_computed_column(spark):
    result = execute_transform(
        spark, "SELECT a, b, a + b AS sum FROM {{payload}}", {"a": 10, "b": 20}
    )
    assert result == {"a": 10, "b": 20, "sum": 30}


def test_string_concat(spark):
    # FIXTURES.md §5 (reference: tests/test_integration.py:97-160)
    result = execute_transform(
        spark,
        "SELECT field1, field2, field1 || ' - ' || field2 AS combined FROM {{payload}}",
        {"field1": "value1", "field2": "value2", "field3": "value3"},
    )
    assert result == {"field1": "value1", "field2": "value2", "combined": "value1 - value2"}
    assert "field3" not in result


def test_nested_access(spark, sample_payload):
    # reference: tests/test_event_processing.py:56-70
    result = execute_transform(
        spark,
        "SELECT nested.key1 AS k1, nested.key2 AS k2 FROM {{payload}}",
        sample_payload,
    )
    assert result == {"k1": "value1", "k2": 123}


def test_array_element_access(spark, sample_payload):
    # Stronger than the reference (which documented this broken,
    # tests/test_event_processing.py:71): Spark array-of-struct access works.
    result = execute_transform(
        spark,
        "SELECT items[0].name AS first_item FROM {{payload}}",
        sample_payload,
    )
    assert result == {"first_item": "Item 1"}


def test_multi_row_results_shape(spark):
    # reference: tests/test_event_processing.py:74-96; FIXTURES.md §3
    payload = [
        {"id": 1, "name": "Item 1"},
        {"id": 2, "name": "Item 2"},
        {"id": 3, "name": "Item 3"},
    ]
    result = execute_transform(
        spark, "SELECT id, name FROM {{payload}} ORDER BY id", payload
    )
    assert result == {
        "results": [
            {"id": 1, "name": "Item 1"},
            {"id": 2, "name": "Item 2"},
            {"id": 3, "name": "Item 3"},
        ]
    }


def test_empty_result(spark, sample_payload):
    # reference: tests/test_event_processing.py:98-108
    result = execute_transform(
        spark,
        "SELECT * FROM {{payload}} WHERE field1 = 'nope'",
        sample_payload,
    )
    assert result == {}


def test_temp_view_cleaned_up(spark, sample_payload):
    before = {t.name for t in spark.catalog.listTables()}
    execute_transform(spark, "SELECT field1 FROM {{payload}}", sample_payload)
    after = {t.name for t in spark.catalog.listTables()}
    assert not {t for t in after - before if t.startswith("temp_payload")}


def test_temp_view_cleaned_up_on_error(spark, sample_payload):
    before = {t.name for t in spark.catalog.listTables()}
    with pytest.raises(Exception):
        execute_transform(spark, "SELECT bogus_col FROM {{payload}}", sample_payload)
    after = {t.name for t in spark.catalog.listTables()}
    assert not {t for t in after - before if t.startswith("temp_payload")}


# -- filters (reference: tests/test_event_processing.py:111-171) -----------
def test_filter_pass(spark, sample_payload):
    assert apply_filter(spark, "field1 = 'value1'", sample_payload) is True


def test_filter_fail(spark, sample_payload):
    assert apply_filter(spark, "field1 = 'other'", sample_payload) is False


def test_filter_complex(spark, sample_payload):
    assert (
        apply_filter(spark, "field1 = 'value1' AND field2 = 'value2'", sample_payload)
        is True
    )


def test_filter_nested(spark, sample_payload):
    # reference: tests/test_event_processing.py:151-160
    assert apply_filter(spark, "nested.key2 > 100", sample_payload) is True
    assert apply_filter(spark, "nested.key2 > 1000", sample_payload) is False


def test_filter_null_passes(spark, sample_payload):
    # reference: src/app.py:537-538
    assert apply_filter(spark, None, sample_payload) is True
    assert apply_filter(spark, "   ", sample_payload) is True


def test_filter_in_list(spark):
    # reference: README.md:193
    payload = {"type": "PushEvent", "repo": "x"}
    assert apply_filter(spark, "type IN ('PushEvent', 'PullRequestEvent')", payload)
    assert not apply_filter(spark, "type IN ('IssueEvent')", payload)
