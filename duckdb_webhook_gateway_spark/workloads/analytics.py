"""Analytics workload: the SQL operator surface the reference exposes
(SURVEY.md §2B), exercised over the driver's TPC-H-ish tables.

Each Spark implementation is written with the DataFrame API so the logical
plan is declared and Catalyst picks the physical strategy: dimension joins
(region/nation/customer) collapse to broadcast hash joins under the session
broadcast threshold, filters and column pruning push into the parquet scan,
and aggregations run partial (map-side) before the key shuffle.  The paired
DuckDB oracle SQL computes the identical result with identical column names.

Cross-engine determinism rules used throughout:
- every float aggregate is ``round(x, k)`` in BOTH engines (summation order
  differs across engines/partitions; rounding absorbs the last-bit drift);
- every ``sum`` of an integer is cast to BIGINT in the oracle (DuckDB widens
  to HUGEINT, Spark to LongType);
- every top-k sort carries a unique tie-break key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import epoch_us
from ..sources.files import read_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# q1_pricing_summary — scan + filter + groupBy + multi-agg (TPC-H Q1 shape).
# Exercises: aggregation (SUM/AVG/COUNT), arithmetic exprs, sort.
# Reference surface: GROUP BY + aggregates (src/app.py:1266-1273).
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.to_timestamp(F.lit("2001-09-01")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(charge), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2)                                        AS sum_qty,
       round(sum(l_extendedprice), 2)                                   AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
       round(avg(l_quantity), 4)                                        AS avg_qty,
       round(avg(l_extendedprice), 4)                                   AS avg_price,
       round(avg(l_discount), 6)                                        AS avg_disc,
       count(*)                                                         AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2001-09-01'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------------------
# q3_shipping_priority — 3-way join + filter + groupBy + top-k (TPC-H Q3).
# Exercises: inner equi-joins, predicate pushdown, ORDER BY ... LIMIT.
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.to_timestamp(F.lit("1998-03-15"))
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.to_timestamp(F.lit("1998-03-15"))
    )
    # The customer⋈orders reduction joins lineitem as a SHUFFLED HASH
    # join (hint): its build side keys on the UNIQUE o_orderkey, so the
    # per-partition hash table is |co|/shuffle_partitions — bounded by
    # shuffle sizing with no hub-key risk — while the default sort-merge
    # pays a full sort of the fact side (measured 3x slower at sf1:
    # 2.16 s SMJ vs 0.73 s SHJ; DuckDB's in-memory hash join is the
    # same strategy).  A broadcast of co would be faster still locally
    # but is NOT scale-safe: co grows with the fact tables.
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .hint("shuffle_hash")
        .join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


Q3_SQL = """
SELECT l_orderkey, o_orderdate, o_orderpriority,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15'
  AND l_shipdate  > TIMESTAMP '1998-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


# ---------------------------------------------------------------------------
# q5_region_revenue — 6-way join incl. two dimension chains (TPC-H Q5).
# Authored in SELECTIVE order (region -> nation -> customer -> orders,
# then the lineitem fact, then supplier): Catalyst pushes filters but
# does not reorder joins without CBO stats, so the literal order decides
# how many fact rows each join touches — the region filter must reduce
# orders BEFORE the fact join, not after (at 100 TB the difference is a
# 5x probe-side reduction; measured 1.57 s -> 1.29 s even at sf1).
# nation⋈region broadcasts (constant-cardinality dims); the reduced
# orders side joins lineitem as a SHUFFLED HASH join — unique o_orderkey
# build keys, per-partition build bounded by shuffle sizing (see q3).
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = _t(spark, sf_dir, "nation")
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nat = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    )
    c = cust.join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
    o = orders.join(c, orders.o_custkey == c.c_custkey).hint("shuffle_hash")
    j = li.join(o, li.l_orderkey == o.o_orderkey)
    return (
        j.join(
            supp,
            (j.l_suppkey == supp.s_suppkey)
            & (j.c_nationkey == supp.s_nationkey),
        )
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


Q5_SQL = """
SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


# ---------------------------------------------------------------------------
# top_orders_by_value — ORDER BY DESC LIMIT (recency/top-k shape,
# reference: src/app.py:1480-1486).
def top_orders_by_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


TOP_ORDERS_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
"""


# ---------------------------------------------------------------------------
# part_projection — computed columns + || concatenation
# (reference: tests/test_event_processing.py:42-50, tests/test_integration.py:100).
def part_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "part").select(
        "p_partkey",
        "p_name",
        F.round(F.col("p_retailprice") * 1.1, 2).alias("taxed_price"),
        F.concat(F.col("p_brand"), F.lit("/"), F.col("p_type")).alias("brand_type"),
        (F.col("p_size") + 100).alias("size_plus"),
    )


PART_PROJECTION_SQL = """
SELECT p_partkey, p_name,
       round(p_retailprice * 1.1, 2)  AS taxed_price,
       p_brand || '/' || p_type       AS brand_type,
       p_size + 100                   AS size_plus
FROM part
"""


# ---------------------------------------------------------------------------
# part_filter_like_in — LIKE + IN-list predicates
# (reference: src/app.py:598-599, README.md:193).
def part_filter_like_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "part")
        .filter(
            F.col("p_brand").isin("Brand#1", "Brand#2", "Brand#3")
            & F.col("p_type").like("S%")
            & (F.col("p_size") >= 10)
        )
        .select("p_partkey", "p_name", "p_brand", "p_type", "p_size")
    )


PART_FILTER_SQL = """
SELECT p_partkey, p_name, p_brand, p_type, p_size
FROM part
WHERE p_brand IN ('Brand#1', 'Brand#2', 'Brand#3')
  AND p_type LIKE 'S%'
  AND p_size >= 10
"""


# ---------------------------------------------------------------------------
# customer_order_counts — LEFT JOIN + COUNT(col) keeps zero-order customers
# (reference LEFT JOIN surface: src/app.py:1480-1483, README.md:257).
def customer_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("order_count"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias(
                "total_spent"
            ),
        )
    )


CUSTOMER_ORDER_COUNTS_SQL = """
SELECT c_custkey, c_name,
       count(o_orderkey)                          AS order_count,
       round(coalesce(sum(o_totalprice), 0.0), 2) AS total_spent
FROM customer
LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey, c_name
"""


# ---------------------------------------------------------------------------
# order_priority_rate — SUM(CASE WHEN)+CAST ratio, the reference's /stats
# success-rate shape (src/app.py:1266-1273).
def order_priority_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    finished = F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0))
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            finished.alias("n_finished"),
            F.round(finished.cast("double") / F.count(F.lit(1)), 6).alias(
                "finished_rate"
            ),
        )
        .orderBy("o_orderpriority")
    )


ORDER_PRIORITY_RATE_SQL = """
SELECT o_orderpriority,
       count(*) AS n_orders,
       CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_finished,
       round(CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*), 6) AS finished_rate
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# events_json_bucket — JSON extraction + group-by-extracted-field, the
# reference UI's saved query shape (frontend/src/pages/SqlQuery.tsx:38).
def events_json_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..plans.spread import scan_bytes, scan_splits

    ev = _t(spark, sf_dir, "events").select("props", "value")
    # JSON parsing is CPU-bound and runs in the scan stage; a compact
    # single-file events table scans as 1-2 splits, pinning millions of
    # get_json_object calls on a couple of tasks.  Split-estimate-gated
    # repartition (the tfidf/triangle pattern), with two refinements
    # measured at sf1: HASH partitioning on props, not round-robin
    # (plain repartition(n) local-sorts every column for retry
    # determinism — the sort of the raw JSON strings cost more than the
    # parse it parallelized), and a bytes floor so a tiny file never
    # buys a shuffle the parse can't repay.
    target = int(spark.conf.get("spark.sql.shuffle.partitions"))
    nbytes = scan_bytes(ev)
    if scan_splits(spark, ev) < target and (
        nbytes is None or nbytes >= 8 * 1024 * 1024
    ):
        ev = ev.repartition(target, "props")
    # try_cast, not cast: a non-numeric "$.k" (valid JSON, wrong type)
    # must bucket as NULL, not crash the query under ANSI casting —
    # get_json_object already yields NULL on MALFORMED JSON, so with
    # try_cast every bad-props shape degrades to the NULL bucket.  The
    # oracle mirrors both behaviors (json_valid guard + TRY_CAST).
    k = F.expr("try_cast(get_json_object(props, '$.k') AS INT)")
    return (
        ev.select(k.alias("k"), "value")
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


EVENTS_JSON_BUCKET_SQL = """
SELECT TRY_CAST(CASE WHEN json_valid(props)
                     THEN json_extract_string(props, '$.k') END AS INTEGER) AS k,
       count(*)             AS n,
       round(sum(value), 2) AS total_value
FROM events
GROUP BY k
"""


# ---------------------------------------------------------------------------
# events_recent_topk — ORDER BY ts DESC LIMIT (the /events feed,
# reference: src/app.py:1480-1486).
def events_recent_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "events")
        .select("event_id", "ts", "user_id", "event_type", "value")
        .orderBy(F.desc("ts"), F.asc("event_id"))
        .limit(50)
    )


EVENTS_RECENT_SQL = """
SELECT event_id, ts, user_id, event_type, value
FROM events
ORDER BY ts DESC, event_id
LIMIT 50
"""


# ---------------------------------------------------------------------------
# events_type_rate — conditional aggregation over the stream table.
def events_type_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    high = F.sum(F.when(F.col("value") > 0.5, 1).otherwise(0))
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("total"),
            high.alias("high_value"),
            F.round(high.cast("double") / F.count(F.lit(1)), 6).alias("high_rate"),
        )
        .orderBy("event_type")
    )


EVENTS_TYPE_RATE_SQL = """
SELECT event_type,
       count(*) AS total,
       CAST(sum(CASE WHEN value > 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS high_value,
       round(CAST(sum(CASE WHEN value > 0.5 THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*), 6) AS high_rate
FROM events
GROUP BY event_type
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# window_top_orders_per_customer — window function (beyond-reference surface,
# SURVEY §2B notes OVER clauses absent in the reference; exposed here).
def window_top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


WINDOW_TOP_ORDERS_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS INTEGER) AS rn
FROM (
    SELECT o_custkey, o_orderkey, o_totalprice,
           row_number() OVER (PARTITION BY o_custkey
                              ORDER BY o_totalprice DESC, o_orderkey) AS rn
    FROM orders
)
WHERE rn <= 3
"""


# ---------------------------------------------------------------------------
# region_keys_union — set operation (UNION dedups).
def region_keys_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = _t(spark, sf_dir, "nation").select(
        F.col("n_regionkey").alias("key_val")
    )
    region = _t(spark, sf_dir, "region").select(
        F.col("r_regionkey").alias("key_val")
    )
    return nation.union(region).distinct()


REGION_KEYS_UNION_SQL = """
SELECT n_regionkey AS key_val FROM nation
UNION
SELECT r_regionkey FROM region
"""


# ---------------------------------------------------------------------------
# lineitem_distinct_counts — COUNT(DISTINCT).
def lineitem_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.agg(
        F.countDistinct("l_partkey").alias("distinct_parts"),
        F.countDistinct("l_suppkey").alias("distinct_supps"),
        F.count(F.lit(1)).alias("total_rows"),
    )


LINEITEM_DISTINCT_SQL = """
SELECT count(DISTINCT l_partkey) AS distinct_parts,
       count(DISTINCT l_suppkey) AS distinct_supps,
       count(*)                  AS total_rows
FROM lineitem
"""


# ---------------------------------------------------------------------------
# supplier_revenue_having — GROUP BY + HAVING.
def supplier_revenue_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_suppkey")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
        )
        .filter(F.col("n_items") > 100)
        .orderBy("l_suppkey")
    )


SUPPLIER_REVENUE_SQL = """
SELECT l_suppkey,
       count(*) AS n_items,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
GROUP BY l_suppkey
HAVING count(*) > 100
ORDER BY l_suppkey
"""


# ---------------------------------------------------------------------------
# orders_per_month — date-part extraction + groupBy.
def orders_per_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.year("o_orderdate").alias("y"), F.month("o_orderdate").alias("m")
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("month_total"),
        )
        .orderBy("y", "m")
    )


ORDERS_PER_MONTH_SQL = """
SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER)  AS y,
       CAST(EXTRACT(month FROM o_orderdate) AS INTEGER) AS m,
       count(*)                 AS n_orders,
       round(sum(o_totalprice), 2) AS month_total
FROM orders
GROUP BY y, m
ORDER BY y, m
"""


# ---------------------------------------------------------------------------
# part_avg_qty_subquery — correlated scalar subquery (TPC-H Q17 shape).
def part_avg_qty_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    avg_qty = (
        li.groupBy("l_partkey").agg((F.avg("l_quantity") * 0.5).alias("half_avg"))
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(avg_qty, li.l_partkey == avg_qty.l_partkey)
        .filter(F.col("l_quantity") < F.col("half_avg"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_small_lots"),
        )
    )


PART_AVG_QTY_SQL = """
SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly,
       count(*)                             AS n_small_lots
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#3'
  AND l_quantity < (
        SELECT 0.5 * avg(l_quantity)
        FROM lineitem l2
        WHERE l2.l_partkey = lineitem.l_partkey
  )
"""


ENTRIES: dict = {
    "q1_pricing_summary": (q1_pricing_summary, Q1_SQL),
    "q3_shipping_priority": (q3_shipping_priority, Q3_SQL),
    "q5_region_revenue": (q5_region_revenue, Q5_SQL),
    "top_orders_by_value": (top_orders_by_value, TOP_ORDERS_SQL),
    "part_projection": (part_projection, PART_PROJECTION_SQL),
    "part_filter_like_in": (part_filter_like_in, PART_FILTER_SQL),
    "customer_order_counts": (customer_order_counts, CUSTOMER_ORDER_COUNTS_SQL),
    "order_priority_rate": (order_priority_rate, ORDER_PRIORITY_RATE_SQL),
    "events_json_bucket": (events_json_bucket, EVENTS_JSON_BUCKET_SQL),
    "events_recent_topk": (events_recent_topk, EVENTS_RECENT_SQL),
    "events_type_rate": (events_type_rate, EVENTS_TYPE_RATE_SQL),
    "window_top_orders_per_customer": (
        window_top_orders_per_customer,
        WINDOW_TOP_ORDERS_SQL,
    ),
    "region_keys_union": (region_keys_union, REGION_KEYS_UNION_SQL),
    "lineitem_distinct_counts": (lineitem_distinct_counts, LINEITEM_DISTINCT_SQL),
    "supplier_revenue_having": (supplier_revenue_having, SUPPLIER_REVENUE_SQL),
    "orders_per_month": (orders_per_month, ORDERS_PER_MONTH_SQL),
    "part_avg_qty_subquery": (part_avg_qty_subquery, PART_AVG_QTY_SQL),
}


# ---------------------------------------------------------------------------
# rollup_region_nation — hierarchical aggregates (GROUP BY ROLLUP); surface
# the reference never exposed but Spark/DuckDB share.
def rollup_region_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    cust = _t(spark, sf_dir, "customer")
    return (
        cust.join(nation, cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_balance"),
        )
    )


ROLLUP_REGION_NATION_SQL = """
SELECT r_name, n_name,
       count(*) AS n_customers,
       round(sum(c_acctbal), 2) AS total_balance
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
"""


# ---------------------------------------------------------------------------
# customers_without_orders — EXCEPT set operation.
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey")
    )
    orders = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey")
    )
    # subtract IS distinct-EXCEPT (the exceptAll+distinct composition
    # only matched SQL EXCEPT because custkeys happen to be unique)
    return cust.subtract(orders)


CUSTOMERS_WITHOUT_ORDERS_SQL = """
SELECT c_custkey AS custkey FROM customer
EXCEPT
SELECT o_custkey FROM orders
"""


# ---------------------------------------------------------------------------
# supplier_string_funcs — upper/substring/length/regexp_extract (scalar
# string surface; reference exercised || and LIKE, this goes further).
def supplier_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = _t(spark, sf_dir, "supplier")
    return supp.select(
        "s_suppkey",
        F.upper("s_name").alias("upper_name"),
        F.substring("s_name", 1, 8).alias("prefix8"),
        F.length("s_name").alias("name_len"),
        F.regexp_extract("s_name", r"Supplier#(\d+)", 1)
        .cast("bigint")
        .alias("extracted_num"),
    )


SUPPLIER_STRING_FUNCS_SQL = r"""
SELECT s_suppkey,
       upper(s_name)                 AS upper_name,
       substr(s_name, 1, 8)          AS prefix8,
       CAST(length(s_name) AS INTEGER) AS name_len,
       CAST(regexp_extract(s_name, 'Supplier#(\d+)', 1) AS BIGINT) AS extracted_num
FROM supplier
"""


# ---------------------------------------------------------------------------
# part_size_class — multi-branch CASE bucketing + groupBy.
def part_size_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    size_class = (
        F.when(F.col("p_size") < 10, "small")
        .when(F.col("p_size") < 25, "medium")
        .when(F.col("p_size") < 40, "large")
        .otherwise("huge")
    )
    return (
        part.withColumn("size_class", size_class)
        .groupBy("size_class")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.round(F.avg("p_retailprice"), 4).alias("avg_price"),
        )
        .orderBy("size_class")
    )


PART_SIZE_CLASS_SQL = """
SELECT CASE WHEN p_size < 10 THEN 'small'
            WHEN p_size < 25 THEN 'medium'
            WHEN p_size < 40 THEN 'large'
            ELSE 'huge' END AS size_class,
       count(*) AS n_parts,
       round(avg(p_retailprice), 4) AS avg_price
FROM part
GROUP BY 1
ORDER BY size_class
"""


# ---------------------------------------------------------------------------
# events_hourly — date_trunc tumbling aggregation (the batch analogue of a
# streaming tumbling window; reference did ad-hoc SQL over timestamps).
def events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_trunc("hour", "ts").alias("hour_start"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
            F.countDistinct("user_id").alias("active_users"),
        )
        .orderBy("hour_start")
    )


EVENTS_HOURLY_SQL = """
SELECT date_trunc('hour', ts) AS hour_start,
       count(*) AS n_events,
       round(sum(value), 2) AS total_value,
       count(DISTINCT user_id) AS active_users
FROM events
GROUP BY 1
ORDER BY hour_start
"""


# ---------------------------------------------------------------------------
# orders_value_quartiles — ntile window ranking.
def orders_value_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.ranks import global_ntile
    from ..plans.spread import scan_bytes, scan_rows

    base = _t(spark, sf_dir, "orders")
    orders = base.select("o_orderkey", "o_totalprice")
    # EXACT global ntile without the single-task window the naive
    # F.ntile(4).over(Window.orderBy(...)) compiles to — that plan
    # funnels every order through one task (measured 1.9 s at sf1 and
    # unbounded at scale); global_ntile range-partitions instead,
    # auto-routing back to the plain window when the source's statable
    # bytes say one task is not a hazard.
    return (
        global_ntile(
            orders,
            4,
            tile_col="quartile",
            input_bytes=scan_bytes(base),
            # r14: order as a spec unlocks the scan-only bracket large
            # route (boundary tuples via verified sketch brackets, tile
            # from literal comparisons — zero data shuffles before the
            # quartile aggregate); r15: the footer row count sizes the
            # sketch accuracy to the window ceiling (exact here — the
            # table is unfiltered — and an over-count would only narrow
            # brackets)
            order_spec=[("o_totalprice", True), ("o_orderkey", False)],
            n_rows=scan_rows(base),
        )
        .groupBy("quartile")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("quartile_total"),
            F.round(F.min("o_totalprice"), 2).alias("min_price"),
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
        )
        .orderBy("quartile")
    )


ORDERS_VALUE_QUARTILES_SQL = """
SELECT CAST(quartile AS INTEGER) AS quartile,
       count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS quartile_total,
       round(min(o_totalprice), 2) AS min_price,
       round(max(o_totalprice), 2) AS max_price
FROM (
    SELECT o_totalprice,
           ntile(4) OVER (ORDER BY o_totalprice DESC, o_orderkey) AS quartile
    FROM orders
)
GROUP BY quartile
ORDER BY quartile
"""



# ---------------------------------------------------------------------------
# orders_price_exact_quantiles — EXACT type-1 quantile rows selected by
# integer-exact global rank (operators/ranks.py::global_quantiles).
# Complements lineitem_price_quantiles (interpolated percentile
# AGGREGATE — a one-reducer value buffer at scale): this shape
# range-partitions the total order, locates target ranks from
# partition-cardinality counts, and rank-numbers ONLY the partitions
# holding a target — scale-safe exact order statistics.  The rank
# ceil(num*N/den) is computed in integer arithmetic on BOTH engines
# (float ceil(0.9*N) picks the wrong rank on ulp boundaries).
def orders_price_exact_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.ranks import global_quantiles
    from ..plans.spread import scan_bytes

    base = _t(spark, sf_dir, "orders")
    orders = base.select("o_orderkey", "o_totalprice")
    # unfiltered table: N comes free from the parquet footer, making the
    # small-route target ranks driver-side literals (no in-plan N
    # subtree); scan_rows reads the same footers the frame scans
    # (consolidated r14 — no hand-built path join)
    from ..plans.spread import scan_rows

    n_rows = scan_rows(base)
    return (
        global_quantiles(
            orders,
            fracs=[(1, 4), (1, 2), (3, 4), (9, 10), (99, 100)],
            input_bytes=scan_bytes(base),
            n_rows=n_rows,
            # r14: spec form -> scan-only bracket large route
            order_spec=[("o_totalprice", False), ("o_orderkey", False)],
        )
        .select(
            "quantile",
            "value_rank",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("o_totalprice"),
        )
        .orderBy("quantile")
    )


ORDERS_PRICE_EXACT_QUANTILES_SQL = """
WITH ranked AS (
  SELECT o_orderkey, o_totalprice,
         row_number() OVER (ORDER BY o_totalprice, o_orderkey) AS rnk,
         count(*) OVER () AS n
  FROM orders)
SELECT CAST(q.num AS DOUBLE) / q.den AS quantile,
       CAST(r.rnk AS BIGINT) AS value_rank,
       r.o_orderkey,
       round(r.o_totalprice, 2) AS o_totalprice
FROM (VALUES (1, 4), (1, 2), (3, 4), (9, 10), (99, 100)) q(num, den)
JOIN ranked r ON r.rnk = (r.n * q.num + q.den - 1) // q.den
ORDER BY quantile
"""

ENTRIES["orders_price_exact_quantiles"] = (
    orders_price_exact_quantiles,
    ORDERS_PRICE_EXACT_QUANTILES_SQL,
)


ENTRIES.update(
    {
        "rollup_region_nation": (rollup_region_nation, ROLLUP_REGION_NATION_SQL),
        "customers_without_orders": (
            customers_without_orders,
            CUSTOMERS_WITHOUT_ORDERS_SQL,
        ),
        "supplier_string_funcs": (supplier_string_funcs, SUPPLIER_STRING_FUNCS_SQL),
        "part_size_class": (part_size_class, PART_SIZE_CLASS_SQL),
        "events_hourly": (events_hourly, EVENTS_HOURLY_SQL),
        "orders_value_quartiles": (
            orders_value_quartiles,
            ORDERS_VALUE_QUARTILES_SQL,
        ),
    }
)


# ---------------------------------------------------------------------------
# lineitem_price_quantiles — exact interpolated percentiles (Spark
# `percentile` == DuckDB `quantile_cont`, both linear interpolation).
def lineitem_price_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.expr("percentile(l_extendedprice, 0.5)"), 4).alias(
                "median_price"
            ),
            F.round(F.expr("percentile(l_extendedprice, 0.9)"), 4).alias(
                "p90_price"
            ),
            F.round(F.expr("percentile(l_quantity, 0.25)"), 4).alias("q1_qty"),
        )
        .orderBy("l_returnflag")
    )


LINEITEM_QUANTILES_SQL = """
SELECT l_returnflag,
       round(quantile_cont(l_extendedprice, 0.5), 4) AS median_price,
       round(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price,
       round(quantile_cont(l_quantity, 0.25), 4)     AS q1_qty
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


# ---------------------------------------------------------------------------
# parts_never_ordered — LEFT ANTI join (oracle: NOT EXISTS).
def parts_never_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem")
    return (
        part.join(li, part.p_partkey == li.l_partkey, "left_anti")
        .select("p_partkey", "p_name")
    )


PARTS_NEVER_ORDERED_SQL = """
SELECT p_partkey, p_name
FROM part
WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
"""


# ---------------------------------------------------------------------------
# customers_with_building_orders — LEFT SEMI join (oracle: EXISTS).
def customers_with_urgent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
        .select("c_custkey", "c_name", "c_mktsegment")
    )


CUSTOMERS_WITH_URGENT_SQL = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
"""


# ---------------------------------------------------------------------------
# nation_key_intersect — INTERSECT set operation.
def nation_key_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = _t(spark, sf_dir, "nation").select(
        (F.col("n_nationkey") % 7).alias("key_val")
    )
    region = _t(spark, sf_dir, "region").select(
        F.col("r_regionkey").alias("key_val")
    )
    return nation.intersect(region)


NATION_KEY_INTERSECT_SQL = """
SELECT n_nationkey % 7 AS key_val FROM nation
INTERSECT
SELECT r_regionkey FROM region
"""


ENTRIES.update(
    {
        "lineitem_price_quantiles": (
            lineitem_price_quantiles,
            LINEITEM_QUANTILES_SQL,
        ),
        "parts_never_ordered": (parts_never_ordered, PARTS_NEVER_ORDERED_SQL),
        "customers_with_urgent_orders": (
            customers_with_urgent_orders,
            CUSTOMERS_WITH_URGENT_SQL,
        ),
        "nation_key_intersect": (nation_key_intersect, NATION_KEY_INTERSECT_SQL),
    }
)


# ---------------------------------------------------------------------------
# cube_order_status — GROUP BY CUBE (all grouping-set combinations).
def cube_order_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return orders.cube("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total_price"),
    )


CUBE_ORDER_STATUS_SQL = """
SELECT o_orderpriority, o_orderstatus,
       count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS total_price
FROM orders
GROUP BY CUBE (o_orderpriority, o_orderstatus)
"""


# ---------------------------------------------------------------------------
# events_runtime_udf — the reference's core extensibility story: a Python
# scalar UDF registered at runtime and used inside SQL (src/app.py:673-785).
# The oracle reproduces the UDF's logic in plain SQL, proving the UDF path
# computes what it claims.
def events_runtime_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    def type_tag(event_type: str) -> str:
        return event_type.upper() + ":" + str(len(event_type))

    spark.udf.register("udf_workload_type_tag", type_tag, "string")
    _t(spark, sf_dir, "events").createOrReplaceTempView("events_for_udf")
    return spark.sql(
        """
        SELECT udf_workload_type_tag(event_type) AS type_tag,
               count(*) AS n,
               round(sum(value), 2) AS total_value
        FROM events_for_udf
        GROUP BY type_tag
        ORDER BY type_tag
        """
    )


EVENTS_RUNTIME_UDF_SQL = """
SELECT upper(event_type) || ':' || CAST(length(event_type) AS VARCHAR) AS type_tag,
       count(*) AS n,
       round(sum(value), 2) AS total_value
FROM events
GROUP BY 1
ORDER BY type_tag
"""


ENTRIES.update(
    {
        "cube_order_status": (cube_order_status, CUBE_ORDER_STATUS_SQL),
        "events_runtime_udf": (events_runtime_udf, EVENTS_RUNTIME_UDF_SQL),
    }
)


# ---------------------------------------------------------------------------
# events_funnel — staged conversion funnel (view -> click -> purchase with
# strict temporal ordering per user); the flagship product-analytics shape.
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    # ONE distributed plan (tagged union + aggregate): the v subtree
    # appears in every branch and its exchange is reused, so events scans
    # once per stage filter instead of the old three driver .count()
    # actions re-executing upstream stages (~6 scans).  Rates divide
    # in-plan: BOTH engines yield NULL on a zero denominator (the old
    # driver-side `else 0.0` guard diverged from the oracle's NULL on
    # degenerate corpora).
    tagged = (
        v.select(F.lit("v").alias("stage"))
        .unionAll(c.select(F.lit("c").alias("stage")))
        .unionAll(p.select(F.lit("p").alias("stage")))
    )
    return (
        tagged.agg(
            F.count_if(F.col("stage") == "v").cast("bigint").alias("n_view"),
            F.count_if(F.col("stage") == "c").cast("bigint").alias("n_click"),
            F.count_if(F.col("stage") == "p")
            .cast("bigint")
            .alias("n_purchase"),
        )
        .select(
            "n_view",
            "n_click",
            "n_purchase",
            # try_divide: NULL on a zero denominator in BOTH engines
            # (ANSI Spark errors on plain /; DuckDB yields NULL)
            F.round(
                F.try_divide(F.col("n_click"), F.col("n_view")), 6
            ).alias("view_to_click"),
            F.round(
                F.try_divide(F.col("n_purchase"), F.col("n_click")), 6
            ).alias("click_to_purchase"),
        )
    )


EVENTS_FUNNEL_SQL = """
WITH v AS (
  SELECT user_id, min(ts) AS t_view FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
c AS (
  SELECT e.user_id, min(e.ts) AS t_click
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND e.ts > v.t_view
  GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, min(e.ts) AS t_purchase
  FROM events e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c.t_click
  GROUP BY e.user_id
)
SELECT (SELECT count(*) FROM v) AS n_view,
       (SELECT count(*) FROM c) AS n_click,
       (SELECT count(*) FROM p) AS n_purchase,
       round(CAST((SELECT count(*) FROM c) AS DOUBLE)
             / (SELECT count(*) FROM v), 6) AS view_to_click,
       round(CAST((SELECT count(*) FROM p) AS DOUBLE)
             / (SELECT count(*) FROM c), 6) AS click_to_purchase
"""

ENTRIES["events_funnel"] = (events_funnel, EVENTS_FUNNEL_SQL)


# ---------------------------------------------------------------------------
def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users grouped by first-activity week,
    counted in each subsequent week they return, with retention as a
    share of the cohort's week-0 size — the standard activation/churn
    matrix over the audit-style event stream.

    Week ids are integer epoch-week divisions (identical arithmetic both
    engines, no timezone/locale week functions).  One shuffle keyed by
    user for the first-week window, one for the (cohort, offset) agg;
    the retention denominator comes from a window over the tiny cohort
    matrix, not a rescan.
    """
    ev = read_table(spark, sf_dir, "events").select(
        "user_id",
        F.expr(
            "CAST(timestampdiff(MICROSECOND,"
            " CAST('1970-01-01 00:00:00' AS TIMESTAMP_NTZ),"
            " CAST(ts AS TIMESTAMP_NTZ)) DIV 604800000000 AS BIGINT)"
        ).alias("wk"),
    )
    first = ev.withColumn(
        "cohort_week", F.min("wk").over(Window.partitionBy("user_id"))
    )
    matrix = (
        first.select(
            "user_id",
            "cohort_week",
            (F.col("wk") - F.col("cohort_week")).alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_active_users"))
    )
    base = Window.partitionBy("cohort_week")
    return (
        matrix.withColumn(
            "retention_pct",
            F.round(
                F.col("n_active_users")
                / F.max(
                    F.when(F.col("week_offset") == 0, F.col("n_active_users"))
                ).over(base),
                6,
            ),
        )
        .orderBy("cohort_week", "week_offset")
    )


EVENTS_COHORT_RETENTION_SQL = """
WITH ev AS (
  SELECT user_id, epoch_us(ts) // 604800000000 AS wk FROM events
),
first AS (
  SELECT user_id, wk, min(wk) OVER (PARTITION BY user_id) AS cohort_week FROM ev
),
matrix AS (
  SELECT cohort_week, wk - cohort_week AS week_offset,
         count(DISTINCT user_id) AS n_active_users
  FROM first GROUP BY 1, 2
)
SELECT cohort_week, week_offset, n_active_users,
       round(CAST(n_active_users AS DOUBLE)
             / max(CASE WHEN week_offset = 0 THEN n_active_users END)
                 OVER (PARTITION BY cohort_week), 6) AS retention_pct
FROM matrix ORDER BY cohort_week, week_offset
"""


# ---------------------------------------------------------------------------
def join_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew pre-flight: the 10 heaviest customer keys in orders
    with their share of all rows — the diagnostic a pipeline runs before
    deciding between a plain shuffle join and ``salted_join``
    (operators/joins.py).  One partial-agg groupBy; the total is a
    1-row broadcast count branch, and top-k compiles to
    TakeOrderedAndProject, never a global sort.
    """
    orders = read_table(spark, sf_dir, "orders")
    per_key = orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    # Total via a 1-row broadcast stats branch, NOT an unpartitioned
    # window over per_key: that global window funnels the whole
    # customer-cardinality count relation through ONE task.  The total
    # equals count(orders) — a column-pruned count-only scan branch.
    total = orders.agg(F.count(F.lit(1)).alias("_tot"))
    return (
        per_key.crossJoin(F.broadcast(total))
        .withColumn(
            "share", F.round(F.col("n_orders") / F.col("_tot"), 6)
        )
        .drop("_tot")
        .orderBy(F.desc("n_orders"), "o_custkey")
        .limit(10)
    )


JOIN_KEY_SKEW_SQL = """
WITH per_key AS (
  SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY o_custkey
)
SELECT o_custkey, n_orders,
       round(CAST(n_orders AS DOUBLE) / sum(n_orders) OVER (), 6) AS share
FROM per_key ORDER BY n_orders DESC, o_custkey LIMIT 10
"""

ENTRIES["events_cohort_retention"] = (
    events_cohort_retention,
    EVENTS_COHORT_RETENTION_SQL,
)
ENTRIES["join_key_skew"] = (join_key_skew, JOIN_KEY_SKEW_SQL)


# ---------------------------------------------------------------------------
# events_anomaly_zscore — per-type hourly volume anomalies.  The monitoring
# query a gateway operator runs over the audit store (reference keeps raw
# webhook events queryable ad hoc; src/app.py:1266-1273 is the ad-hoc SQL
# surface this formalizes).
def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly event-count z-scores per event type; |z| >= 2 rows only.

    Two map-side-combinable aggregations (hourly counts, then per-type
    moment sums) + a broadcast join of the type-cardinality stats back
    onto the hourly relation — no window over the corpus, no shuffle
    wider than (type, hour).  All moments are BIGINT-exact; the z
    expression is written with the IDENTICAL association order in both
    engines so the rounded value hashes bit-for-bit.
    """
    ev = _t(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour_start")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    stats = hourly.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_events").alias("s"),
        F.sum(F.col("n_events") * F.col("n_events")).alias("ss"),
    )
    # variance gate in DOUBLE with the same association order as the z
    # denominator: the BIGINT form (n*ss - s*s) overflows near s ~ 3e9 —
    # Spark would wrap silently while DuckDB errors, a silent cross-
    # engine divergence at exactly the scale the docstring targets
    z = (
        hourly.join(F.broadcast(stats), "event_type")
        .filter(
            (F.col("n") > 1)
            & (
                F.col("ss").cast("double")
                - F.col("s").cast("double") * F.col("s") / F.col("n")
                > 0
            )
        )
        .withColumn(
            "zscore",
            F.round(
                (
                    F.col("n_events").cast("double")
                    - F.col("s").cast("double") / F.col("n")
                )
                / F.sqrt(
                    (
                        F.col("ss").cast("double")
                        - F.col("s").cast("double") * F.col("s") / F.col("n")
                    )
                    / (F.col("n") - 1)
                ),
                6,
            ),
        )
    )
    return (
        z.filter(F.abs(F.col("zscore")) >= 2.0)
        .select("event_type", "hour_start", "n_events", "zscore")
        .orderBy("event_type", "hour_start")
    )


EVENTS_ANOMALY_ZSCORE_SQL = """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hour_start,
         count(*) AS n_events
  FROM events GROUP BY 1, 2
),
stats AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(n_events) AS BIGINT) AS s,
         CAST(sum(n_events * n_events) AS BIGINT) AS ss
  FROM hourly GROUP BY event_type
),
z AS (
  SELECT h.event_type, h.hour_start, h.n_events,
         round((CAST(h.n_events AS DOUBLE) - CAST(s AS DOUBLE) / n)
               / sqrt((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / n)
                      / (n - 1)), 6) AS zscore
  FROM hourly h JOIN stats t ON h.event_type = t.event_type
  WHERE n > 1 AND CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / n > 0
)
SELECT event_type, hour_start, n_events, zscore
FROM z WHERE abs(zscore) >= 2.0
ORDER BY event_type, hour_start
"""

ENTRIES["events_anomaly_zscore"] = (
    events_anomaly_zscore,
    EVENTS_ANOMALY_ZSCORE_SQL,
)


# ---------------------------------------------------------------------------
# bloom_prefilter_join — Bloom pre-filter before an exact join
# (operators/joins.py::bloom_semi_filter).  At 100 TB the fact side is
# pre-filtered map-side (h broadcast slot-set semi-joins) so only rows
# that can possibly match reach the join shuffle; false positives are
# md5-deterministic, so both engines see the identical pre-filtered
# relation and the identical final aggregate.  Revenue sums in integer
# cents — no float-association drift.
def bloom_prefilter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.joins import bloom_semi_filter

    M, H = 1024, 2
    cust = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = _t(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    pre = bloom_semi_filter(orders, cust, "o_custkey", "c_custkey", m=M, h=H)
    # ONE plan: the probe/prefiltered counts are 1-row aggregate subtrees
    # cross-joined onto the match aggregate — the old driver .count()
    # actions rebuilt the Bloom pre-filter and rescanned orders per count
    probe_cnt = orders.agg(F.count(F.lit(1)).cast("bigint").alias("n_probe"))
    pass_cnt = pre.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_prefiltered")
    )
    match = pre.join(cust, pre.o_custkey == cust.c_custkey).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_matching"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias(
            "revenue_cents"
        ),
    )
    return (
        probe_cnt.crossJoin(pass_cnt)
        .crossJoin(match)
        .select(
            "n_probe",
            "n_prefiltered",
            "n_matching",
            (F.col("n_prefiltered") - F.col("n_matching"))
            .cast("bigint")
            .alias("false_pos"),
            "revenue_cents",
        )
    )


def _bloom_slot(prefix: str, key: str) -> str:
    from ..functions.hashing import md5_int_expr

    col_sql = f"'{prefix}:' || CAST({key} AS VARCHAR)"
    return f"(({md5_int_expr(col_sql, 'duckdb', 12)}) % 1024)"


BLOOM_PREFILTER_SQL = f"""
WITH build AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
b1 AS (SELECT DISTINCT {_bloom_slot('1', 'c_custkey')} AS h FROM build),
b2 AS (SELECT DISTINCT {_bloom_slot('2', 'c_custkey')} AS h FROM build),
pre AS (
  SELECT o_custkey, o_totalprice FROM orders
  WHERE {_bloom_slot('1', 'o_custkey')} IN (SELECT h FROM b1)
    AND {_bloom_slot('2', 'o_custkey')} IN (SELECT h FROM b2)
),
m AS (
  SELECT p.o_totalprice FROM pre p JOIN build b ON p.o_custkey = b.c_custkey
)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM orders) AS n_probe,
       (SELECT CAST(count(*) AS BIGINT) FROM pre) AS n_prefiltered,
       CAST(count(*) AS BIGINT) AS n_matching,
       (SELECT CAST(count(*) AS BIGINT) FROM pre)
         - CAST(count(*) AS BIGINT) AS false_pos,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS revenue_cents
FROM m
"""

ENTRIES["bloom_prefilter_join"] = (bloom_prefilter_join, BLOOM_PREFILTER_SQL)


# ---------------------------------------------------------------------------
# customer_scd2_snapshot — SCD Type 2 dimension maintenance
# (operators/scd.py).  The Spark side builds the dimension INCREMENTALLY
# (full rebuild of pre-1999 history, then scd2_merge of the 1999+ delta —
# only delta keys are rebuilt, untouched keys pass through a broadcast
# anti-join); the oracle rebuilds from the full history in one pass.  A
# hash match therefore proves merge == rebuild, the invariant that makes
# nightly incremental maintenance safe at 100 TB.
def customer_scd2_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.scd import scd2_from_events, scd2_merge

    CUTOFF = "1999-01-01"
    ev = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") % 37 == 0)
        .select(
            F.col("o_custkey").alias("custkey"),
            F.col("o_orderpriority").alias("priority"),
            F.col("o_orderdate").alias("ts"),
            F.col("o_orderkey").alias("id"),
        )
    )
    cutoff = F.to_timestamp(F.lit(CUTOFF))
    base = scd2_from_events(
        ev.filter(F.col("ts") < cutoff), "custkey", "priority", "ts", "id"
    )
    merged = scd2_merge(
        base,
        ev.filter(F.col("ts") >= cutoff),
        "custkey",
        "priority",
        "ts",
        "id",
    )
    return merged.select(
        "custkey", "priority", "valid_from", "valid_to", "is_current", "version"
    ).orderBy("custkey", "valid_from", "version")


CUSTOMER_SCD2_SQL = """
WITH ev AS (
  SELECT o_custkey AS custkey, o_orderpriority AS priority,
         o_orderdate AS ts, o_orderkey AS id
  FROM orders WHERE o_custkey % 37 = 0
), runs AS (
  SELECT * FROM (
    SELECT custkey, priority, ts, id,
           lag(priority) OVER (PARTITION BY custkey ORDER BY ts, id) AS prev
    FROM ev
  ) WHERE prev IS DISTINCT FROM priority
)
SELECT custkey, priority, ts AS valid_from,
       lead(ts) OVER (PARTITION BY custkey ORDER BY ts, id) AS valid_to,
       (lead(ts) OVER (PARTITION BY custkey ORDER BY ts, id) IS NULL)
         AS is_current,
       CAST(row_number() OVER (PARTITION BY custkey ORDER BY ts, id) AS INT)
         AS version
FROM runs
ORDER BY custkey, valid_from, version
"""

ENTRIES["customer_scd2_snapshot"] = (customer_scd2_snapshot, CUSTOMER_SCD2_SQL)


# ---------------------------------------------------------------------------
# value_quantile_sketch — two-pass mergeable histogram quantiles next to
# the exact order statistic.  The sketch path is the 100 TB shape: pass 1
# is a per-type min/max/count (partial-agg, 5-row result, broadcast
# back); pass 2 bins every value IN-ROW and hash-aggregates (type, bin)
# — B=256 counters per key, mergeable across any partitioning, no sort.
# Quantile estimates interpolate inside the target bin from integer
# cumulative counts; every float step is row-local IEEE arithmetic, so
# both engines compute identical bits (no aggregation-order drift).
# The exact kth-order-statistic check column is located THROUGH the same
# histogram (rewritten round 13): the k-th smallest value lies in the
# bin where cum >= k > cum_prev — the row pass 2 already selected — so
# the sort window runs over ONE bin's rows per pick (~n/B) with in-bin
# rank k - cum_prev, instead of ranking every event under a per-type
# sort window (5 types = 5 tasks each sorting its full value stream;
# measured 6.2x vs the oracle at sf1, and the real hazard at scale).
# Ties on value are bin-local and adjacent, so the picked value is
# deterministic.  The DuckDB oracle keeps the direct full-sort replay —
# same value by definition of the order statistic.
def value_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    B = 256
    # Materialized ONCE (lazy localCheckpoint): the stats broadcast, the
    # binning pass and the exact-rank check all read the same (type,
    # value) blocks instead of re-scanning events three times — the
    # heavy_hitters r7 in-pass-stats trick.
    ev = (
        _t(spark, sf_dir, "events")
        .select("event_type", "value")
        .filter(F.col("value").isNotNull())
        .localCheckpoint(eager=False)
    )
    stats = ev.groupBy("event_type").agg(
        F.min("value").alias("mn"),
        F.max("value").alias("mx"),
        F.count(F.lit(1)).alias("n"),
    )
    w = (F.col("mx") - F.col("mn")) / B
    bin_col = (
        F.when(F.col("mx") == F.col("mn"), F.lit(0))
        .otherwise(
            F.least(
                F.floor((F.col("value") - F.col("mn")) / w), F.lit(B - 1)
            )
        )
        .cast("bigint")
    )
    evb = ev.join(F.broadcast(stats), "event_type").withColumn(
        "bin", bin_col
    )
    binned = evb.groupBy("event_type", "bin").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = binned.withColumn("cum", F.sum("cnt").over(wcum)).withColumn(
        "cum_prev", F.col("cum") - F.col("cnt")
    )
    from ..plans.localrel import local_df

    qdf = local_df(
        spark,
        [("p50", 0.5), ("p90", 0.9), ("p99", 0.99)],
        "qname string, q double",
    )
    # ONE consumer chain: the selected bin rows carry target/est THROUGH
    # the exact-pick probe, so the probe's result IS the output row —
    # no sel ⋈ exact join back, no second read of the histogram subtree,
    # no checkpoint (sel is consumed exactly once, inside the broadcast
    # build)
    picks = (
        cum.join(F.broadcast(stats), "event_type")
        .crossJoin(F.broadcast(qdf))
        .withColumn("target", F.ceil(F.col("q") * F.col("n")))
        .filter(
            (F.col("cum") >= F.col("target")) & (F.col("cum_prev") < F.col("target"))
        )
        .withColumn(
            "est",
            F.round(
                F.col("mn")
                + F.col("bin") * ((F.col("mx") - F.col("mn")) / B)
                + (F.col("target") - F.col("cum_prev"))
                / F.col("cnt")
                * ((F.col("mx") - F.col("mn")) / B),
                6,
            ),
        )
        .select(
            "event_type",
            "qname",
            "bin",
            "target",
            "est",
            (F.col("target") - F.col("cum_prev")).alias("rib"),
        )
    )
    wrn = Window.partitionBy("event_type", "qname").orderBy("value")
    return (
        evb.join(F.broadcast(picks), ["event_type", "bin"])
        .withColumn("rn", F.row_number().over(wrn))
        .filter(F.col("rn") == F.col("rib"))
        .select(
            "event_type",
            "qname",
            "target",
            "est",
            F.round(F.col("value"), 6).alias("exact"),
        )
        .orderBy("event_type", "qname")
    )


VALUE_QUANTILE_SKETCH_SQL = """
WITH ev AS (
  SELECT event_type, value FROM events WHERE value IS NOT NULL
), stats AS (
  SELECT event_type, min(value) AS mn, max(value) AS mx,
         count(*) AS n
  FROM ev GROUP BY event_type
), binned AS (
  SELECT e.event_type,
         CAST(CASE WHEN s.mx = s.mn THEN 0
              ELSE least(floor((e.value - s.mn) / ((s.mx - s.mn) / 256)), 255)
         END AS BIGINT) AS bin,
         count(*) AS cnt
  FROM ev e JOIN stats s ON e.event_type = s.event_type
  GROUP BY 1, 2
), cum AS (
  SELECT *,
         sum(cnt) OVER (PARTITION BY event_type ORDER BY bin
                        ROWS UNBOUNDED PRECEDING) AS cum,
         sum(cnt) OVER (PARTITION BY event_type ORDER BY bin
                        ROWS UNBOUNDED PRECEDING) - cnt AS cum_prev
  FROM binned
), qs AS (
  SELECT * FROM (VALUES ('p50', 0.5), ('p90', 0.9), ('p99', 0.99)) q(qname, q)
), sel AS (
  SELECT c.event_type, q.qname,
         CAST(ceil(q.q * s.n) AS BIGINT) AS target,
         round(s.mn + c.bin * ((s.mx - s.mn) / 256)
               + (ceil(q.q * s.n) - c.cum_prev) / c.cnt
                 * ((s.mx - s.mn) / 256), 6) AS est
  FROM cum c JOIN stats s ON c.event_type = s.event_type
  CROSS JOIN qs q
  WHERE c.cum >= ceil(q.q * s.n) AND c.cum_prev < ceil(q.q * s.n)
), ranked AS (
  SELECT event_type, value,
         row_number() OVER (PARTITION BY event_type ORDER BY value) AS rn
  FROM ev
), exact AS (
  SELECT r.event_type, q.qname, round(r.value, 6) AS exact
  FROM ranked r JOIN stats s ON r.event_type = s.event_type
  CROSS JOIN qs q
  WHERE r.rn = ceil(q.q * s.n)
)
SELECT s.event_type, s.qname, s.target, s.est, e.exact
FROM sel s JOIN exact e ON s.event_type = e.event_type AND s.qname = e.qname
ORDER BY s.event_type, s.qname
"""

ENTRIES["value_quantile_sketch"] = (value_quantile_sketch, VALUE_QUANTILE_SKETCH_SQL)


# ---------------------------------------------------------------------------
# brand_top_parts — exact per-group top-k via the map-side candidate pass
# (operators/sketches.py::grouped_topk): the corpus never fully sorts;
# only <= partitions*k candidates per brand reach the rank window.  The
# oracle is the naive window plan — a hash match proves the pruned plan
# computes the identical relation.
def brand_top_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketches import grouped_topk

    part = _t(spark, sf_dir, "part").select(
        "p_brand", "p_partkey", "p_retailprice"
    )
    return grouped_topk(
        part, ["p_brand"], "p_retailprice", 5, tiebreak="p_partkey"
    ).orderBy("p_brand", "rank")


BRAND_TOP_PARTS_SQL = """
SELECT p_brand, p_partkey, p_retailprice, CAST(rank AS INT) AS rank FROM (
  SELECT p_brand, p_partkey, p_retailprice,
         row_number() OVER (PARTITION BY p_brand
                            ORDER BY p_retailprice DESC, p_partkey) AS rank
  FROM part
) WHERE rank <= 5
ORDER BY p_brand, rank
"""

ENTRIES["brand_top_parts"] = (brand_top_parts, BRAND_TOP_PARTS_SQL)


# ---------------------------------------------------------------------------
# part_basket_pairs — market-basket co-occurrence mining.  Items are
# grouped per order and pairs expand IN-ROW from the sorted item array
# (operators/graphs.py::basket_pairs): one shuffle by order key, bounded
# per-basket fan-out, map-side partial counts — no self-join that would
# shuffle the item relation twice.  The oracle self-joins, which is the
# same relation algebraically (both sides deduplicate (order, part)).
# Reference surface: beyond-reference scale operator; the gateway's SQL
# endpoint (/root/reference/src/app.py:175-239) has no graph/basket tools.
def part_basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graphs import basket_pairs

    # NOT spread: unlike part_pagerank (whose reused exchanges amortize
    # the extra shuffle), a measured A/B shows the single-pass pair count
    # is faster scanning in place (0.95 s vs 1.08 s at sf0.1)
    op = _t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("basket"), F.col("l_partkey").alias("item")
    )
    return (
        basket_pairs(op)
        .select(
            F.col("a").alias("part_a"),
            F.col("b").alias("part_b"),
            F.col("n_baskets").alias("n_orders"),
        )
        .orderBy(F.desc("n_orders"), "part_a", "part_b")
        .limit(20)
    )


# The operator truncates degenerate baskets to their 1024 smallest items
# (graphs.MAX_BASKET_ITEMS); the oracle mirrors the cap with a per-basket
# row_number so the differential identity holds for ANY input, not only
# corpora whose baskets happen to stay under the guard.
PART_BASKET_PAIRS_SQL = """
WITH op AS (
  SELECT ok, pk FROM (
    SELECT l_orderkey AS ok, l_partkey AS pk,
           row_number() OVER (PARTITION BY l_orderkey ORDER BY l_partkey)
             AS rn
    FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem))
  WHERE rn <= 1024)
SELECT a.pk AS part_a, b.pk AS part_b, COUNT(*) AS n_orders
FROM op a JOIN op b ON a.ok = b.ok AND a.pk < b.pk
GROUP BY 1, 2
ORDER BY n_orders DESC, part_a, part_b
LIMIT 20
"""

ENTRIES["part_basket_pairs"] = (part_basket_pairs, PART_BASKET_PAIRS_SQL)


# ---------------------------------------------------------------------------
# part_pagerank — fixed-iteration integer PageRank over the co-purchase
# graph (edges = part pairs sharing >= 2 orders, undirected).  Micro-unit
# BIGINT ranks + integer division make the synchronous Pregel iteration
# bit-exact on any engine and any partitioning (float PageRank is not
# cross-engine reproducible).  3 iterations = 3 shuffle-join + aggregate
# rounds — the textbook distributed schedule; the oracle unrolls the same
# three iterations as CTEs.
def part_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graphs import basket_pairs, pagerank_micro, undirect

    li = _t(spark, sf_dir, "lineitem")
    op = li.select(
        F.col("l_orderkey").alias("basket"), F.col("l_partkey").alias("item")
    )
    # Pre-partition by BASKET (not round-robin): the basket groupBy's
    # ClusteredDistribution is then already satisfied, so the heavy
    # collect_set + in-row pair expansion runs single-stage on all cores
    # with NO second exchange — one shuffle of the raw fact rows either
    # way, but the aggregate no longer serializes on the scan's few
    # splits.  (Interleaved A/B at sf0.1: round-robin spread 2.20 s,
    # no spread 1.45 s, basket-keyed 1.19 s.)  Gated on scan splits so a
    # well-split cluster input keeps its scan partitioning and the
    # aggregate's own map-side partial combine.
    from ..plans.spread import scan_splits

    target = int(spark.conf.get("spark.sql.shuffle.partitions"))
    if scan_splits(spark, li) < target:
        op = op.repartition(target, "basket")
    # Materialize the edge relation ONCE before undirect() when AQE is
    # on: under AQE the union's two branches each re-execute the
    # pair-mining lineage (AQE stage planning does not share the
    # exchange across the branches — measured 3.2 s -> 1.4 s at sf0.1
    # with the lazy localCheckpoint).  With AQE off, ReuseExchange
    # already computes the lineage once and the checkpoint's blocking
    # materialization is pure overhead (interleaved A/B: ~6% slower), so
    # it is skipped.  The checkpoint is edge-cardinality — the standard
    # input materialization for iterative graph algorithms.
    edges = basket_pairs(op).filter(F.col("n_baskets") >= 2)
    if spark.conf.get("spark.sql.adaptive.enabled", "true") == "true":
        edges = edges.localCheckpoint(eager=False)
    ranks = pagerank_micro(undirect(edges), iterations=3)
    return (
        ranks.select(
            F.col("node").alias("part_key"), F.col("r").alias("rank_micro")
        )
        .orderBy(F.desc("rank_micro"), "part_key")
        .limit(20)
    )


PART_PAGERANK_SQL = """
WITH op AS (
  SELECT ok, pk FROM (
    SELECT l_orderkey AS ok, l_partkey AS pk,
           row_number() OVER (PARTITION BY l_orderkey ORDER BY l_partkey)
             AS rn
    FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem))
  WHERE rn <= 1024),
pairs AS (
  SELECT a.pk AS a, b.pk AS b, COUNT(*) AS n
  FROM op a JOIN op b ON a.ok = b.ok AND a.pk < b.pk
  GROUP BY 1, 2),
ed AS (SELECT a, b FROM pairs WHERE n >= 2),
edges AS (SELECT a AS src, b AS dst FROM ed UNION ALL SELECT b, a FROM ed),
deg AS (SELECT src, COUNT(*) AS d FROM edges GROUP BY 1),
i1 AS (SELECT e.dst AS pk,
              CAST(150000 + (85 * SUM(1000000 // d.d)) // 100 AS BIGINT) AS r
       FROM edges e JOIN deg d ON e.src = d.src GROUP BY 1),
i2 AS (SELECT e.dst AS pk,
              CAST(150000 + (85 * SUM(r.r // d.d)) // 100 AS BIGINT) AS r
       FROM edges e JOIN i1 r ON e.src = r.pk JOIN deg d ON e.src = d.src
       GROUP BY 1),
i3 AS (SELECT e.dst AS pk,
              CAST(150000 + (85 * SUM(r.r // d.d)) // 100 AS BIGINT) AS r
       FROM edges e JOIN i2 r ON e.src = r.pk JOIN deg d ON e.src = d.src
       GROUP BY 1)
SELECT pk AS part_key, r AS rank_micro FROM i3
ORDER BY rank_micro DESC, part_key
LIMIT 20
"""

ENTRIES["part_pagerank"] = (part_pagerank, PART_PAGERANK_SQL)


# ---------------------------------------------------------------------------
# part_triangle_count — per-part triangle participation in the co-purchase
# graph (edges = part pairs sharing >= 1 order), plus the local clustering
# coefficient in integer micro-units.  Spark counts wedges under the
# DEGREE orientation (operators/graphs.py::triangle_counts — oriented
# out-degree is O(sqrt(m)), so hub nodes cannot explode a task); the
# oracle enumerates triangles naively as id-ordered a<b<c edge triples.
# The triangle SET is orientation-independent, so the two agreeing IS the
# orientation argument checked differentially.  All arithmetic is
# integer (micro-unit coefficient), bit-exact on both engines.
def part_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graphs import basket_pairs, triangle_counts
    from ..plans.spread import scan_splits

    li = _t(spark, sf_dir, "lineitem")
    op = li.select(
        F.col("l_orderkey").alias("basket"), F.col("l_partkey").alias("item")
    )
    # Same pre-partition + AQE-gated edge materialization as
    # part_pagerank (and for the same measured reasons): the basket
    # groupBy's distribution is satisfied by a hash(basket) repartition,
    # and under AQE the edge lineage would re-execute once per consumer
    # branch (degree, orientation joins, wedge self-join, closure).
    target = int(spark.conf.get("spark.sql.shuffle.partitions"))
    if scan_splits(spark, li) < target:
        op = op.repartition(target, "basket")
    edges = basket_pairs(op).select("a", "b")
    if spark.conf.get("spark.sql.adaptive.enabled", "true") == "true":
        edges = edges.localCheckpoint(eager=False)
    t = triangle_counts(edges)
    return (
        t.select(
            F.col("node").alias("part_key"),
            "n_triangles",
            F.col("deg").alias("degree"),
            # local clustering coefficient = 2T / (d(d-1)), micro-units;
            # every node here closes a triangle, so degree >= 2
            F.expr(
                "(2000000 * n_triangles) DIV (deg * (deg - 1))"
            ).alias("clus_micro"),
        )
        .orderBy(F.desc("n_triangles"), "part_key")
        .limit(20)
    )


PART_TRIANGLE_COUNT_SQL = """
WITH op AS (
  SELECT ok, pk FROM (
    SELECT l_orderkey AS ok, l_partkey AS pk,
           row_number() OVER (PARTITION BY l_orderkey ORDER BY l_partkey)
             AS rn
    FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem))
  WHERE rn <= 1024),
e AS (
  SELECT a.pk AS a, b.pk AS b
  FROM op a JOIN op b ON a.ok = b.ok AND a.pk < b.pk
  GROUP BY 1, 2),
tri AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM e e1
  JOIN e e2 ON e2.a = e1.b
  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
corners AS (
  SELECT x AS pk FROM tri
  UNION ALL SELECT y FROM tri
  UNION ALL SELECT z FROM tri),
t AS (SELECT pk, COUNT(*) AS n_triangles FROM corners GROUP BY 1),
deg AS (
  SELECT pk, COUNT(*) AS d
  FROM (SELECT a AS pk FROM e UNION ALL SELECT b FROM e)
  GROUP BY 1)
SELECT t.pk AS part_key,
       t.n_triangles,
       deg.d AS degree,
       CAST((2000000 * t.n_triangles) // (deg.d * (deg.d - 1)) AS BIGINT)
         AS clus_micro
FROM t JOIN deg ON t.pk = deg.pk
ORDER BY n_triangles DESC, part_key
LIMIT 20
"""

ENTRIES["part_triangle_count"] = (part_triangle_count, PART_TRIANGLE_COUNT_SQL)


# ---------------------------------------------------------------------------
# part_kcore — k-core decomposition of the co-purchase graph
# (operators/graphs.py::kcore): iteratively peel nodes of degree < k
# until the dense cohesive core remains; the query reports the top-20
# core members by in-core degree.  k = 80 sits in the graph's
# non-trivial band (the co-purchase graph is near-random with mean
# degree ~116-120 at sf0.01-0.1: below ~70 peeling is a no-op, at ~85
# the core avalanches to empty — 80 prunes a real fringe, ~7% of nodes
# at sf0.01, and converges in 5 peel rounds at both driver scales).
# Differential identity: the operator runs EXACTLY 10 peel rounds
# (rounds past the fixpoint are no-ops) and the oracle unrolls the same
# 10 rounds as a MATERIALIZED CTE chain (inlined CTEs would re-expand
# e_i three times per round — exponential), so Spark and DuckDB agree
# for ANY input, converged or not; tests pin that 10 rounds reaches the
# true fixpoint at both driver scales.  All arithmetic is integer
# degree counting — bit-exact on any engine and partitioning.
# Reference surface: beyond-reference scale operator; the gateway's SQL
# endpoint (/root/reference/src/app.py:175-239) has no graph tools.
def part_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graphs import basket_pairs, kcore
    from ..plans.spread import scan_splits

    li = _t(spark, sf_dir, "lineitem")
    op = li.select(
        F.col("l_orderkey").alias("basket"), F.col("l_partkey").alias("item")
    )
    # Same basket-keyed pre-partition as part_pagerank/part_triangle_count
    # (and for the same measured reasons): the basket groupBy's
    # distribution is satisfied up front, so the heavy collect_set +
    # in-row pair expansion runs on all cores with no second exchange.
    # No AQE edge-materialization gate needed here: kcore eagerly
    # checkpoints the edge relation itself (the peel loop needs the
    # initial edge count anyway).
    target = int(spark.conf.get("spark.sql.shuffle.partitions"))
    if scan_splits(spark, li) < target:
        op = op.repartition(target, "basket")
    edges = basket_pairs(op).select("a", "b")
    core = kcore(edges, k=80, rounds=10)
    return (
        core.select(F.col("node").alias("part_key"), "core_degree")
        .orderBy(F.desc("core_degree"), "part_key")
        .limit(20)
    )


def _kcore_cte_chain(rounds: int, k: int) -> str:
    """Unrolled peel rounds for the oracle — one (keep-set, edge-filter)
    MATERIALIZED CTE pair per round, mirroring kcore(rounds=rounds)."""
    parts = []
    for i in range(rounds):
        parts.append(
            f"""k{i + 1} AS MATERIALIZED (
  SELECT x FROM (SELECT a AS x FROM e{i} UNION ALL SELECT b FROM e{i})
  GROUP BY x HAVING count(*) >= {k})"""
        )
        parts.append(
            f"""e{i + 1} AS MATERIALIZED (
  SELECT a, b FROM e{i}
  WHERE a IN (SELECT x FROM k{i + 1}) AND b IN (SELECT x FROM k{i + 1}))"""
        )
    return ",\n".join(parts)


PART_KCORE_SQL = f"""
WITH op AS MATERIALIZED (
  SELECT ok, pk FROM (
    SELECT l_orderkey AS ok, l_partkey AS pk,
           row_number() OVER (PARTITION BY l_orderkey ORDER BY l_partkey)
             AS rn
    FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem))
  WHERE rn <= 1024),
e0 AS MATERIALIZED (
  SELECT a.pk AS a, b.pk AS b
  FROM op a JOIN op b ON a.ok = b.ok AND a.pk < b.pk
  GROUP BY 1, 2),
{_kcore_cte_chain(10, 80)}
SELECT x AS part_key, CAST(count(*) AS BIGINT) AS core_degree
FROM (SELECT a AS x FROM e10 UNION ALL SELECT b FROM e10)
GROUP BY x
ORDER BY core_degree DESC, part_key
LIMIT 20
"""

ENTRIES["part_kcore"] = (part_kcore, PART_KCORE_SQL)


# ---------------------------------------------------------------------------
# part_communities_lpa — synchronous label-propagation communities
# (operators/graphs.py::lpa_labels) over the STRONG co-purchase graph:
# item pairs co-purchased in >= 2 baskets (the >= 2 threshold keeps the
# graph at its non-random core — raw pairs are near-complete at this
# mean degree, one giant trivial community; the thresholded graph keeps
# ~2.3-3.6k edges across driver scales with real component structure).
# EXACTLY 4 synchronous rounds (init label = node id; each round a node
# adopts its neighbors' modal label, ties to the smallest), reported as
# the top-20 communities by member count.  Differential identity: the
# oracle unrolls the same 4 rounds as a MATERIALIZED CTE chain —
# synchronous LPA oscillates on some inputs, so fixed rounds IS the
# semantics and Spark/DuckDB agree for ANY input.  All arithmetic is
# integer label voting (min(struct(-cnt, label))) — bit-exact on any
# engine and partitioning.
# Reference surface: beyond-reference scale operator; the gateway's SQL
# endpoint (/root/reference/src/app.py:175-239) has no graph tools.
def part_communities_lpa(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graphs import basket_pairs, lpa_labels
    from ..plans.spread import scan_splits

    li = _t(spark, sf_dir, "lineitem")
    op = li.select(
        F.col("l_orderkey").alias("basket"), F.col("l_partkey").alias("item")
    )
    # Same basket-keyed pre-partition as part_kcore (same measured
    # reason: satisfy the basket groupBy's distribution up front).
    target = int(spark.conf.get("spark.sql.shuffle.partitions"))
    if scan_splits(spark, li) < target:
        op = op.repartition(target, "basket")
    edges = (
        basket_pairs(op).filter(F.col("n_baskets") >= 2).select("a", "b")
    )
    lab = lpa_labels(edges, rounds=4)
    return (
        lab.groupBy("label")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_members"))
        .select(F.col("label").alias("community"), "n_members")
        .orderBy(F.desc("n_members"), "community")
        .limit(20)
    )


def _lpa_cte_chain(rounds: int) -> str:
    """Unrolled vote rounds for the oracle — one (vote-count, argmin)
    MATERIALIZED CTE pair per round, mirroring lpa_labels(rounds=rounds):
    modal neighbor label, ties to the smallest label."""
    parts = []
    for i in range(1, rounds + 1):
        parts.append(
            f"""c{i} AS MATERIALIZED (
  SELECT ar.node, l.label AS lbl, count(*) AS cnt
  FROM arcs ar JOIN l{i - 1} l ON ar.nbr = l.node
  GROUP BY 1, 2)"""
        )
        parts.append(
            f"""l{i} AS MATERIALIZED (
  SELECT node, min(lbl) AS label FROM (
    SELECT node, lbl, cnt, max(cnt) OVER (PARTITION BY node) AS mx
    FROM c{i})
  WHERE cnt = mx GROUP BY node)"""
        )
    return ",\n".join(parts)


PART_COMMUNITIES_LPA_SQL = f"""
WITH op AS MATERIALIZED (
  SELECT ok, pk FROM (
    SELECT l_orderkey AS ok, l_partkey AS pk,
           row_number() OVER (PARTITION BY l_orderkey ORDER BY l_partkey)
             AS rn
    FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem))
  WHERE rn <= 1024),
e0 AS MATERIALIZED (
  SELECT a.pk AS a, b.pk AS b
  FROM op a JOIN op b ON a.ok = b.ok AND a.pk < b.pk
  GROUP BY 1, 2
  HAVING count(*) >= 2),
arcs AS MATERIALIZED (
  SELECT a AS node, b AS nbr FROM e0
  UNION ALL
  SELECT b AS node, a AS nbr FROM e0),
l0 AS MATERIALIZED (
  SELECT DISTINCT node, node AS label FROM arcs),
{_lpa_cte_chain(4)}
SELECT label AS community, CAST(count(*) AS BIGINT) AS n_members
FROM l4
GROUP BY label
ORDER BY n_members DESC, community
LIMIT 20
"""

ENTRIES["part_communities_lpa"] = (part_communities_lpa, PART_COMMUNITIES_LPA_SQL)


# ---------------------------------------------------------------------------
# part_name_fuzzy_pairs — blocked fuzzy entity resolution.  Collapse the
# corpus to DISTINCT names first (corpus-cardinality -> vocab-cardinality
# before anything quadratic), block on the first token, and run
# levenshtein only within blocks — the standard record-linkage shape that
# turns O(n^2) edit-distance into sum-of-block-squares.  levenshtein is
# the same classic DP metric in both engines.
def part_name_fuzzy_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    names = part.groupBy("p_name").agg(F.count(F.lit(1)).alias("n_parts"))
    names = names.select(
        F.col("p_name").alias("name"),
        F.split(F.col("p_name"), " ").getItem(0).alias("blk"),
        "n_parts",
    )
    a = names.select(
        F.col("name").alias("name_a"),
        F.col("blk"),
        F.col("n_parts").alias("n_parts_a"),
    )
    b = names.select(
        F.col("name").alias("name_b"),
        F.col("blk"),
        F.col("n_parts").alias("n_parts_b"),
    )
    return (
        a.join(b, "blk")
        .filter(F.col("name_a") < F.col("name_b"))
        .withColumn("edit_dist", F.levenshtein("name_a", "name_b"))
        .filter(F.col("edit_dist").between(1, 3))
        .select("name_a", "name_b", "edit_dist", "n_parts_a", "n_parts_b")
        .orderBy("edit_dist", "name_a", "name_b")
    )


PART_NAME_FUZZY_SQL = """
WITH names AS (
  SELECT p_name AS name, string_split(p_name, ' ')[1] AS blk,
         COUNT(*) AS n_parts
  FROM part GROUP BY 1, 2)
SELECT a.name AS name_a, b.name AS name_b,
       CAST(levenshtein(a.name, b.name) AS INT) AS edit_dist,
       a.n_parts AS n_parts_a, b.n_parts AS n_parts_b
FROM names a JOIN names b ON a.blk = b.blk AND a.name < b.name
WHERE levenshtein(a.name, b.name) BETWEEN 1 AND 3
ORDER BY edit_dist, name_a, name_b
"""

ENTRIES["part_name_fuzzy_pairs"] = (part_name_fuzzy_pairs, PART_NAME_FUZZY_SQL)


# ---------------------------------------------------------------------------
# orderkey_hll_distinct — grouped HyperLogLog (m=256) over order keys per
# return flag, with the exact COUNT(DISTINCT) alongside for calibration.
# register_sum is an order-independent BIGINT (every addend an exact power
# of two), so the sketch itself is hash-compared across engines, not just
# the rounded estimate.  See operators/sketches.py::grouped_hll_distinct.
def orderkey_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketches import grouped_hll_distinct

    li = _t(spark, sf_dir, "lineitem").select("l_returnflag", "l_orderkey")
    sk = grouped_hll_distinct(li, "l_returnflag", "l_orderkey")
    exact = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_orderkey").alias("exact_distinct")
    )
    return sk.join(exact, "l_returnflag").orderBy("l_returnflag")


def _hll_oracle_sql() -> str:
    from ..functions.hashing import hex_to_int_expr

    h = hex_to_int_expr("md5(CAST(l_orderkey AS VARCHAR))", n=13, dialect="duckdb")
    return f"""
WITH h AS (
  SELECT l_returnflag, {h} AS h FROM lineitem),
regs AS (
  SELECT l_returnflag, h % 256 AS reg,
         MAX(CASE WHEN h // 256 > 0
                  THEN LEAST(45 - length(bin(h // 256)), 44)
                  ELSE 44 END) AS m
  FROM h GROUP BY 1, 2),
grid AS (SELECT DISTINCT l_returnflag, i AS reg
         FROM lineitem CROSS JOIN range(0, 256) r(i)),
filled AS (
  SELECT g.l_returnflag, g.reg, COALESCE(regs.m, 0) AS m
  FROM grid g LEFT JOIN regs
    ON g.l_returnflag = regs.l_returnflag AND g.reg = regs.reg),
s AS (SELECT l_returnflag,
             SUM(CAST(1 AS BIGINT) << (44 - m)) AS register_sum
      FROM filled GROUP BY 1),
ex AS (SELECT l_returnflag, COUNT(DISTINCT l_orderkey) AS exact_distinct
       FROM lineitem GROUP BY 1)
SELECT s.l_returnflag, CAST(register_sum AS BIGINT) AS register_sum,
       ROUND(8.281119189271282e+17 / register_sum, 4) AS hll_estimate,
       ex.exact_distinct
FROM s JOIN ex ON s.l_returnflag = ex.l_returnflag
ORDER BY s.l_returnflag
"""


ENTRIES["orderkey_hll_distinct"] = (orderkey_hll_distinct, _hll_oracle_sql())


# ---------------------------------------------------------------------------
# q10_returned_revenue — TPC-H Q10 shape: revenue lost to returned items
# per customer.  Fact-fact shuffle join (lineitem x orders) with the
# filter pushed into the lineitem scan, customer joined on the shuffled
# key, nation broadcast, partial aggs map-side, TakeOrderedAndProject for
# the top-k.  Reference surface: multi-way JOIN + GROUP BY + ORDER BY
# (/root/reference/src/app.py:1266-1273 passthrough SQL).
def q10_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, F.col("o_custkey") == cust["c_custkey"])
        .join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.round(F.sum(rev), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
    )


Q10_SQL = """
SELECT c_custkey, c_name,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       c_acctbal, n_name
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""

ENTRIES["q10_returned_revenue"] = (q10_returned_revenue, Q10_SQL)


# ---------------------------------------------------------------------------
# region_status_grouping_sets — explicit GROUPING SETS with GROUPING()
# flags (finer than the rollup/cube rows already covered): detail,
# per-region, and grand-total aggregates in ONE pass over the join —
# Catalyst expands the sets into a single Expand + hash aggregate, so the
# fact relation is scanned and shuffled once, not three times.  NULL
# group keys are COALESCEd to 'ALL' so cross-engine NULL-ordering
# differences can't touch the rowset.
def region_status_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    region = _t(spark, sf_dir, "region")
    j = (
        orders.join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
        .join(F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"])
    )
    return (
        j.groupingSets(
            [["r_name", "o_orderstatus"], ["r_name"], []],
            "r_name",
            "o_orderstatus",
        )
        .agg(
            F.grouping("r_name").cast("int").alias("grp_region"),
            F.grouping("o_orderstatus").cast("int").alias("grp_status"),
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
        .select(
            "grp_region",
            "grp_status",
            F.coalesce("r_name", F.lit("ALL")).alias("region"),
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            "n_orders",
            "revenue",
        )
        .orderBy("grp_region", "grp_status", "region", "status")
    )


GROUPING_SETS_SQL = """
SELECT CAST(GROUPING(r_name) AS INT) AS grp_region,
       CAST(GROUPING(o_orderstatus) AS INT) AS grp_status,
       COALESCE(r_name, 'ALL') AS region,
       COALESCE(o_orderstatus, 'ALL') AS status,
       COUNT(*) AS n_orders,
       ROUND(SUM(o_totalprice), 2) AS revenue
FROM orders o
JOIN customer c ON o_custkey = c_custkey
JOIN nation n ON c_nationkey = n_nationkey
JOIN region r ON n_regionkey = r_regionkey
GROUP BY GROUPING SETS ((r_name, o_orderstatus), (r_name), ())
ORDER BY grp_region, grp_status, region, status
"""

ENTRIES["region_status_grouping_sets"] = (
    region_status_grouping_sets,
    GROUPING_SETS_SQL,
)


# ---------------------------------------------------------------------------
# monthly_revenue_incremental — materialized-view delta maintenance.
# The monthly revenue aggregate is maintained as mergeable partial state:
# the "stored" aggregate covers orders before the cutoff, the delta batch
# aggregates only orders at/after it, and the merge is a re-aggregation
# of the two partial relations (month-cardinality, trivial shuffle).  The
# oracle recomputes the full aggregate from scratch — equality IS the
# correctness statement for incremental view maintenance.  At 100 TB the
# historic partial is read from storage and only the delta day is
# scanned; sum/count partials merge associatively by construction.
def monthly_revenue_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    cutoff = "2000-06-15"
    orders = _t(spark, sf_dir, "orders")
    month = F.date_format("o_orderdate", "yyyy-MM").alias("month")

    def _partial(df: DataFrame) -> DataFrame:
        return df.groupBy(month).agg(
            F.count(F.lit(1)).alias("n"), F.sum("o_totalprice").alias("s")
        )

    hist = _partial(orders.filter(F.col("o_orderdate") < F.to_timestamp(F.lit(cutoff))))
    delta = _partial(orders.filter(F.col("o_orderdate") >= F.to_timestamp(F.lit(cutoff))))
    return (
        hist.unionByName(delta)
        .groupBy("month")
        .agg(
            F.sum("n").alias("n_orders"),
            F.round(F.sum("s"), 2).alias("revenue"),
        )
        .orderBy("month")
    )


MONTHLY_REVENUE_INCREMENTAL_SQL = """
SELECT strftime(o_orderdate, '%Y-%m') AS month,
       COUNT(*) AS n_orders,
       ROUND(SUM(o_totalprice), 2) AS revenue
FROM orders
GROUP BY 1
ORDER BY month
"""

ENTRIES["monthly_revenue_incremental"] = (
    monthly_revenue_incremental,
    MONTHLY_REVENUE_INCREMENTAL_SQL,
)


# ---------------------------------------------------------------------------
# events_markov_transitions — first-order Markov transition matrix over
# each user's time-ordered event stream.  One window pass (lag over the
# per-user partition — single hash shuffle on user_id), then a
# vocabulary-cardinality aggregate; transition probability is ONE exact
# integer division per row, so the float is deterministic before the
# rounding even applies.
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    # a transition needs a defined state, user and order: NULL
    # event_type would become a NULL state, and the engines ORDER NULL
    # timestamps differently (Spark NULLS FIRST ascending, DuckDB NULLS
    # LAST) — excluded identically on both sides
    ev = _t(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull()
        & F.col("user_id").isNotNull()
        & F.col("event_type").isNotNull()
    )
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    pairs = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )
    wp = Window.partitionBy("prev_type")
    return (
        pairs.withColumn(
            "p_transition",
            F.round(
                F.col("n_transitions").cast("double")
                / F.sum("n_transitions").over(wp),
                6,
            ),
        )
        .orderBy("prev_type", "next_type")
    )


EVENTS_MARKOV_SQL = """
WITH seq AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type
  FROM events
  WHERE ts IS NOT NULL AND user_id IS NOT NULL
    AND event_type IS NOT NULL),
pairs AS (
  SELECT prev_type, event_type AS next_type, COUNT(*) AS n_transitions
  FROM seq WHERE prev_type IS NOT NULL
  GROUP BY 1, 2)
SELECT prev_type, next_type, n_transitions,
       ROUND(CAST(n_transitions AS DOUBLE)
             / SUM(n_transitions) OVER (PARTITION BY prev_type), 6)
         AS p_transition
FROM pairs
ORDER BY prev_type, next_type
"""

ENTRIES["events_markov_transitions"] = (
    events_markov_transitions,
    EVENTS_MARKOV_SQL,
)


# ---------------------------------------------------------------------------
# nation_trade_matrix — TPC-H Q7 shape: bilateral revenue between the
# supplier's nation and the customer's nation.  The fact spine
# (lineitem x orders) shuffles once on the order key; BOTH nation
# lookups ride broadcast joins on different keys (supplier-side and
# customer-side), so the matrix costs one fact shuffle + one
# 625-key aggregate regardless of scale.
def nation_trade_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    # supplier/customer scale with the fact tables (10k/150k x SF) — no
    # forced broadcast; under the session threshold Catalyst broadcasts
    # them locally, at cluster scale they shuffle on their keys.  Only the
    # 25-row nation dim is pinned broadcast (twice, different keys).
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(supp, li["l_suppkey"] == supp["s_suppkey"])
        .join(cust, F.col("o_custkey") == cust["c_custkey"])
        .join(
            F.broadcast(nation).alias("ns"),
            F.col("s_nationkey") == F.col("ns.n_nationkey"),
        )
        .join(
            F.broadcast(nation).alias("nc"),
            F.col("c_nationkey") == F.col("nc.n_nationkey"),
        )
        .groupBy(
            F.col("ns.n_name").alias("supp_nation"),
            F.col("nc.n_name").alias("cust_nation"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_lineitems"),
            F.round(F.sum(rev), 2).alias("revenue"),
        )
        .orderBy(F.desc("revenue"), "supp_nation", "cust_nation")
        .limit(25)
    )


NATION_TRADE_MATRIX_SQL = """
SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
       COUNT(*) AS n_lineitems,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ns ON s_nationkey = ns.n_nationkey
JOIN nation nc ON c_nationkey = nc.n_nationkey
GROUP BY 1, 2
ORDER BY revenue DESC, supp_nation, cust_nation
LIMIT 25
"""

ENTRIES["nation_trade_matrix"] = (nation_trade_matrix, NATION_TRADE_MATRIX_SQL)


# ---------------------------------------------------------------------------
# events_hopping_windows — OVERLAPPING (sliding/hopping) event-time
# windows: 1-hour windows every 30 minutes, so each event lands in
# exactly 2 windows.  Spark side is the idiomatic ``F.window(ts, '1
# hour', '30 minutes')`` (the batch twin of the streaming slide window);
# the oracle reproduces Spark's epoch-aligned window assignment with
# integer microsecond arithmetic and a 2-row fan-out per event — the
# window() contract stated as arithmetic.
def events_hopping_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "n_events",
            "total_value",
        )
        .orderBy("window_start")
    )


EVENTS_HOPPING_SQL = """
WITH hops AS (SELECT i FROM range(0, 2) r(i)),
ex AS (
  -- ts IS NOT NULL: Spark's window() assigns a NULL timestamp to NO
  -- window; without the filter the oracle emitted a NULL-window row
  SELECT make_timestamp(((epoch_us(ts) // 1800000000) - i) * 1800000000)
           AS window_start,
         value
  FROM events CROSS JOIN hops
  WHERE ts IS NOT NULL)
SELECT window_start, COUNT(*) AS n_events,
       ROUND(SUM(value), 2) AS total_value
FROM ex
GROUP BY 1
ORDER BY window_start
"""

ENTRIES["events_hopping_windows"] = (events_hopping_windows, EVENTS_HOPPING_SQL)


# ---------------------------------------------------------------------------
# customer_functional_deps — one-pass FD discovery over the customer ⋈
# nation relation (operators/profile.py::functional_dependencies): all 12
# ordered-pair dependency verdicts from ONE scan + ONE multi-distinct
# aggregate, unpivoted in-plan.  Expected discoveries: nationkey -> 
# region/name hold (hierarchy + bijection), the reverses fail, mktsegment
# determines nothing.  The inputs are null-free, so Spark's
# countDistinct(x, y) and the oracle's COUNT(DISTINCT (x, y)) agree (the
# two differ on rows where exactly one side is NULL).
_FD_COLS = ("c_nationkey", "n_regionkey", "c_mktsegment", "n_name")


def customer_functional_deps(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.profile import functional_dependencies

    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey", "c_mktsegment")
    nation = _t(spark, sf_dir, "nation")
    j = cust.join(
        F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"]
    ).select(*_FD_COLS)
    return functional_dependencies(j, list(_FD_COLS)).orderBy("lhs", "rhs")


def _fd_oracle_sql() -> str:
    cols = _FD_COLS
    aggs = [f"COUNT(DISTINCT {c}) AS d_{c}" for c in cols]
    rows = []
    for x in cols:
        for y in cols:
            if x != y:
                aggs.append(f"COUNT(DISTINCT ({x}, {y})) AS p_{x}__{y}")
                rows.append(
                    f"SELECT '{x}' AS lhs, '{y}' AS rhs, d_{x} AS n_lhs_distinct,"
                    f" p_{x}__{y} AS n_pair_distinct,"
                    f" d_{x} = p_{x}__{y} AS holds FROM a"
                )
    unioned = "\nUNION ALL ".join(rows)
    return f"""
WITH j AS (
  SELECT c_nationkey, n_regionkey, c_mktsegment, n_name
  FROM customer JOIN nation ON c_nationkey = n_nationkey),
a AS (SELECT {', '.join(aggs)} FROM j)
SELECT * FROM ({unioned})
ORDER BY lhs, rhs
"""


ENTRIES["customer_functional_deps"] = (
    customer_functional_deps,
    _fd_oracle_sql(),
)


# ---------------------------------------------------------------------------
# events_hourly_gapfill — calendar-spine densification + LOCF imputation.
# Warehouses call this gap filling: generate the complete (event_type x
# hour) grid between the corpus bounds, left-join the actual hourly
# aggregate, zero-fill the counts, and carry the last observed value
# forward (last_value IGNORE NULLS) into empty hours.  The spine is
# generated (1-row bounds agg + sequence explode — never a scan), the
# grid is types x hours (output-cardinality), and the LOCF window runs
# inside the per-type hash partition: one shuffle end to end.
def events_hourly_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    hour_us = 3_600_000_000

    # Truncating integer division, == DuckDB's BIGINT `//` (both truncate
    # toward zero: -7//2 = -3).  Float `/` + cast truncates too but loses
    # integer exactness past 2^53; (c - c % d) is exactly divisible so the
    # final division is exact for any epoch value, negative epochs included.
    def _hour(c):
        c = c.cast("long")
        return ((c - c % hour_us) / hour_us).cast("long")

    bounds = ev.agg(
        _hour(epoch_us(F.min("ts"))).alias("h0"),
        _hour(epoch_us(F.max("ts"))).alias("h1"),
    )
    # spine capped at 1e6 hours (~114 years) SYMMETRICALLY with the
    # oracle's range(0, 1000000) — one corrupt far-future timestamp must
    # truncate identically on both engines, not silently diverge
    spine = bounds.select(
        F.explode(
            F.sequence(
                F.col("h0"), F.least(F.col("h1"), F.col("h0") + 999_999)
            )
        ).alias("h")
    ).select(F.timestamp_micros(F.col("h") * hour_us).alias("hour_start"))
    types = ev.select("event_type").distinct()
    actual = ev.groupBy(
        F.timestamp_micros(_hour(epoch_us("ts")) * hour_us).alias(
            "hour_start"
        ),
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("v")
    )
    grid = types.crossJoin(spine)
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour_start")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(actual, ["event_type", "hour_start"], "left")
        .select(
            "event_type",
            "hour_start",
            F.coalesce("n", F.lit(0)).alias("n_events"),
            F.coalesce("v", F.lit(0.0)).alias("total_value"),
            F.coalesce(
                F.last("v", ignorenulls=True).over(w), F.lit(0.0)
            ).alias("locf_value"),
        )
        .orderBy("event_type", "hour_start")
    )


EVENTS_GAPFILL_SQL = """
WITH bounds AS (
  SELECT (epoch_us(min(ts)) // 3600000000) AS h0,
         (epoch_us(max(ts)) // 3600000000) AS h1 FROM events),
spine AS (
  SELECT make_timestamp((h0 + i) * 3600000000) AS hour_start
  FROM bounds CROSS JOIN range(0, 1000000) r(i) WHERE h0 + i <= h1),
types AS (SELECT DISTINCT event_type FROM events),
actual AS (
  SELECT make_timestamp((epoch_us(ts) // 3600000000) * 3600000000)
           AS hour_start,
         event_type, COUNT(*) AS n, ROUND(SUM(value), 2) AS v
  FROM events GROUP BY 1, 2),
grid AS (SELECT t.event_type, s.hour_start FROM types t CROSS JOIN spine s)
SELECT g.event_type, g.hour_start,
       COALESCE(n, 0) AS n_events,
       COALESCE(v, 0.0) AS total_value,
       COALESCE(last_value(v IGNORE NULLS) OVER (
         PARTITION BY g.event_type ORDER BY g.hour_start
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0.0)
         AS locf_value
FROM grid g LEFT JOIN actual a
  ON g.event_type = a.event_type AND g.hour_start = a.hour_start
ORDER BY g.event_type, g.hour_start
"""

ENTRIES["events_hourly_gapfill"] = (events_hourly_gapfill, EVENTS_GAPFILL_SQL)
