"""Relational core: scans, filters, joins, aggregations, set ops, top-k.

Q01–Q08, Q13–Q16 from SURVEY.md §2.1. Each query certifies inventory
rows from the reference (cited per-query); the Spark side is pure
DataFrame API so Catalyst owns pushdown, join selection, and partial
aggregation — the properties the reference implements by hand.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from wikid_spark.catalog import table
from wikid_spark.registry import query


@query(
    "q01_scan_filter_project",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM lineitem
    WHERE l_returnflag = 'R' AND l_shipdate >= TIMESTAMP '1995-01-01'
    ORDER BY l_orderkey, l_linenumber
    LIMIT 100
    """,
    tags=("scan", "filter", "project"),
)
def q01(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan-filter-project [S*, F1]. Both predicates reach the parquet
    scan (PushedFilters) and only 5 columns are read (ReadSchema).
    Reference analog: type filter wikidata.py:115-117."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter((F.col("l_returnflag") == "R") & (F.col("l_shipdate") >= F.lit("1995-01-01")))
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber")
        .limit(100)
    )


@query(
    "q02_pricing_summary",
    oracle="""
    SELECT
      l_returnflag,
      l_linestatus,
      COUNT(*) AS count_order,
      ROUND(SUM(l_quantity), 2) AS sum_qty,
      ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
      ROUND(AVG(l_discount), 4) AS avg_disc
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    tags=("agg",),
)
def q02(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing-summary hash aggregation [A1, A8] — TPC-H Q1 shape.
    Partial (map-side) aggregation before the shuffle is automatic;
    the reference's nested-dict counter (wikipedia.py:28,197-201) is
    driver-memory-bound, this spills and scales with executors."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("count_order"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "sum_disc_price"
            ),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "q03_multiway_join",
    oracle="""
    SELECT r_name, n_name, COUNT(*) AS n_customers,
           ROUND(SUM(c_acctbal), 2) AS total_acctbal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    ORDER BY r_name, n_name
    """,
    tags=("join", "agg"),
)
def q03(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-way inner equi-join [J1, J2-inner]. nation/region are tiny
    dims → AQE auto-broadcasts both; no shuffle of customer.
    Reference analog: ROWID join wikipedia.py:69-81 (explicit keys here)."""
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    return (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_acctbal"),
        )
        .orderBy("r_name", "n_name")
    )


@query(
    "q04_profile_join_agg",
    oracle="""
    SELECT
      c.c_custkey,
      c.c_name,
      n.n_name,
      COUNT(o.o_orderkey) AS order_count,
      ROUND(SUM(o.o_totalprice), 2) AS total_spent,
      string_agg(DISTINCT o.o_orderpriority, ',' ORDER BY o.o_orderpriority) AS priorities
    FROM customer c
    LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    LEFT JOIN nation n ON n.n_nationkey = c.c_nationkey
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY c.c_custkey
    LIMIT 1000
    """,
    tags=("join", "agg", "flagship"),
)
def q04(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship profile join+agg [J2, A3, A6] — mirrors the reference's
    entity-profile query (__init__.py:150-179): multi-way left join +
    group-by with GROUP_CONCAT/SUM. GROUP_CONCAT order is arbitrary in
    SQLite; we impose sorted-distinct semantics (array_sort∘collect_set)
    so results are deterministic. Empty set → NULL (matches string_agg)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    n = table(spark, sf_dir, "nation")
    joined = c.join(o, o.o_custkey == c.c_custkey, "left").join(
        n, n.n_nationkey == c.c_nationkey, "left"
    )
    prio = F.array_sort(F.collect_set("o_orderpriority"))
    return (
        joined.groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.count("o_orderkey").alias("order_count"),
            F.round(F.sum("o_totalprice"), 2).alias("total_spent"),
            F.when(F.size(prio) > 0, F.array_join(prio, ",")).alias("priorities"),
        )
        .orderBy("c_custkey")
        .limit(1000)
    )


@query(
    "q05_semi_join",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F'
    )
    ORDER BY c_custkey
    """,
    tags=("join",),
)
def q05(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join [J4]. Reference analog: demo-extraction title∈set
    membership (wikipedia.py:471)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@query(
    "q06_anti_join",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey
        AND o.o_orderdate >= TIMESTAMP '1995-01-01'
        AND o.o_orderdate <  TIMESTAMP '1996-01-01'
    )
    ORDER BY c_custkey
    """,
    tags=("join",),
)
def q06(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join [J5]. Reference analog: incremental-restart dedup
    against the pre-scanned id set (wikidata.py:90-92,112-114) — here an
    executor-distributed anti-join instead of a driver RAM set."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01")) & (F.col("o_orderdate") < F.lit("1996-01-01"))
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@query(
    "q07_broadcast_dim_join",
    oracle="""
    SELECT p_type, COUNT(*) AS n_items, ROUND(SUM(l_extendedprice), 2) AS total_price
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE p_brand = 'Brand#1'
    GROUP BY p_type
    ORDER BY p_type
    """,
    tags=("join", "broadcast"),
)
def q07(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast-dim join [J3, J6]. Explicit broadcast hint — physical
    only, result must equal the unhinted plan. Reference analog: the
    title→id dict probed per link (wikipedia.py:62-81,360-381); at
    100 TB the dim (~10^7 rows) still broadcasts at ~GB scale."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_type")
        .agg(
            F.count("*").alias("n_items"),
            F.round(F.sum("l_extendedprice"), 2).alias("total_price"),
        )
        .orderBy("p_type")
    )


@query(
    "q08_upsert_as_aggregation",
    oracle="""
    SELECT user_id, event_type, COUNT(*) AS cnt
    FROM events
    GROUP BY user_id, event_type
    ORDER BY user_id, event_type
    """,
    tags=("agg", "upsert"),
)
def q08(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upsert-as-aggregation [S6, A2]. The reference's additive upsert
    (INSERT..ON CONFLICT DO UPDATE count=count+excluded.count,
    wikidata.py:262-269) re-expressed batch-complete: split the input
    into two 'batches', pre-aggregate each, union, re-aggregate. The
    invariant (≡ direct group-count of the whole table) IS the oracle."""
    ev = table(spark, sf_dir, "events")
    batch_a = (
        ev.filter(F.col("event_id") % 2 == 0).groupBy("user_id", "event_type").count()
    )
    batch_b = (
        ev.filter(F.col("event_id") % 2 == 1).groupBy("user_id", "event_type").count()
    )
    return (
        batch_a.unionByName(batch_b)
        .groupBy("user_id", "event_type")
        .agg(F.sum("count").alias("cnt"))
        .orderBy("user_id", "event_type")
    )


@query(
    "q13_global_topk",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
    tags=("sort", "limit"),
)
def q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k [L1]. Spark plans TakeOrderedAndProject — per-
    partition top-10 then a driver merge of k·partitions rows; no full
    sort, no full shuffle. Scales to any row count."""
    o = table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
    )


@query(
    "q14_union",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey AS nationkey FROM supplier
    ORDER BY nationkey
    """,
    tags=("setop",),
)
def q14a(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set op: UNION (distinct) — unionByName + dropDuplicates."""
    c = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.unionByName(s).dropDuplicates().orderBy("nationkey")


@query(
    "q14_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    ORDER BY nationkey
    """,
    tags=("setop",),
)
def q14b(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set op: INTERSECT."""
    c = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s).orderBy("nationkey")


@query(
    "q14_except",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey AS nationkey FROM supplier
    ORDER BY nationkey
    """,
    tags=("setop",),
)
def q14c(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set op: EXCEPT (distinct semantics) — DataFrame.subtract."""
    c = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.subtract(s).orderBy("nationkey")


@query(
    "q15_distinct_agg",
    oracle="""
    SELECT o_orderpriority, COUNT(DISTINCT o_custkey) AS n_customers
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("agg", "distinct"),
)
def q15a(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregation [A7]. Catalyst expands to a two-stage
    aggregate (Expand → partial → final) — no driver-side set."""
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(F.countDistinct("o_custkey").alias("n_customers"))
        .orderBy("o_orderpriority")
    )


@query(
    "q15_duplicate_detector",
    oracle="""
    SELECT user_id, COUNT(*) AS n_events
    FROM events
    GROUP BY user_id
    HAVING COUNT(*) > 10
    ORDER BY user_id
    """,
    tags=("agg", "dedup"),
)
def q15b(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate detector [A7]: keys appearing more than N times.
    Reference analog: read_ids duplicate warning wikipedia.py:413-416."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(F.count("*").alias("n_events"))
        .filter(F.col("n_events") > 10)
        .orderBy("user_id")
    )


@query(
    "q16_rollup",
    oracle="""
    SELECT
      o_orderpriority,
      o_orderstatus,
      GROUPING(o_orderpriority) AS g_priority,
      GROUPING(o_orderstatus) AS g_status,
      ROUND(SUM(o_totalprice), 2) AS total
    FROM orders
    GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
    ORDER BY o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST
    """,
    tags=("agg", "rollup"),
)
def q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP with GROUPING() flags. Spark implements via Expand (one
    input row → one row per grouping set) before the hash aggregate."""
    o = table(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderpriority", "o_orderstatus")
        .agg(
            F.grouping("o_orderpriority").cast("int").alias("g_priority"),
            F.grouping("o_orderstatus").cast("int").alias("g_status"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .select("o_orderpriority", "o_orderstatus", "g_priority", "g_status", "total")
        .orderBy(
            F.col("o_orderpriority").asc_nulls_first(),
            F.col("o_orderstatus").asc_nulls_first(),
        )
    )


@query(
    "q32_cube",
    oracle="""
    SELECT
      o_orderpriority,
      o_orderstatus,
      GROUPING(o_orderpriority) AS g_priority,
      GROUPING(o_orderstatus) AS g_status,
      COUNT(*) AS n,
      ROUND(SUM(o_totalprice), 2) AS total
    FROM orders
    GROUP BY CUBE (o_orderpriority, o_orderstatus)
    ORDER BY o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST
    """,
    tags=("agg", "cube"),
)
def q32(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE (all 2^k grouping sets, completing ROLLUP's prefix sets in
    q16). Same Expand-based physical plan: one input pass fans each row
    into its grouping sets before a single hash aggregate — no
    re-reads, so a k-dimension cube costs 2^k× the agg input, never
    2^k scans."""
    o = table(spark, sf_dir, "orders")
    return (
        o.cube("o_orderpriority", "o_orderstatus")
        .agg(
            F.grouping("o_orderpriority").cast("int").alias("g_priority"),
            F.grouping("o_orderstatus").cast("int").alias("g_status"),
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .select(
            "o_orderpriority", "o_orderstatus", "g_priority", "g_status", "n", "total"
        )
        .orderBy(
            F.col("o_orderpriority").asc_nulls_first(),
            F.col("o_orderstatus").asc_nulls_first(),
        )
    )


@query(
    "q33_pivot",
    oracle="""
    SELECT user_id,
           CAST(COUNT(*) FILTER (event_type = 'click') AS BIGINT) AS click,
           CAST(COUNT(*) FILTER (event_type = 'purchase') AS BIGINT) AS purchase,
           CAST(COUNT(*) FILTER (event_type = 'view') AS BIGINT) AS view,
           ROUND(SUM(value) FILTER (event_type = 'purchase'), 4) AS purchase_value
    FROM events
    WHERE user_id < 25
    GROUP BY user_id
    ORDER BY user_id
    """,
    tags=("agg", "pivot"),
)
def q33_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long→wide): per-user event counts by type plus purchase
    value. Spark's pivot with an EXPLICIT value list compiles to
    conditional aggregation in one pass — always pass the list at
    scale, or Spark first runs a distinct-values job AND caps
    cardinality at spark.sql.pivotMaxValues. The oracle is the same
    conditional aggregation spelled out with FILTER."""
    ev = table(spark, sf_dir, "events").filter(F.col("user_id") < 25)
    counts = (
        ev.groupBy("user_id")
        .pivot("event_type", ["click", "purchase", "view"])
        .agg(F.count(F.lit(1)))
        .na.fill(0, ["click", "purchase", "view"])
    )
    pval = ev.filter(F.col("event_type") == "purchase").groupBy("user_id").agg(
        F.round(F.sum("value"), 4).alias("purchase_value")
    )
    return counts.join(pval, "user_id", "left").orderBy("user_id")


@query(
    "q34_grouping_sets",
    oracle="""
    SELECT
      o_orderpriority,
      o_orderstatus,
      GROUPING(o_orderpriority) AS g_priority,
      GROUPING(o_orderstatus) AS g_status,
      COUNT(*) AS n,
      ROUND(SUM(o_totalprice), 2) AS total
    FROM orders
    GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus), (o_orderstatus), ())
    ORDER BY o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST
    """,
    tags=("agg", "grouping-sets"),
)
def q34_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary GROUPING SETS — the level set ((priority, status),
    (status), ()) skips the (priority) stratum, which neither ROLLUP
    nor CUBE can express. The DataFrame API has no grouping-sets
    entry point, so this goes through Spark SQL over a temp view —
    same Expand-based single-pass physical plan as rollup/cube, and
    GROUPING() flags disambiguate subtotal NULLs from data NULLs."""
    table(spark, sf_dir, "orders").createOrReplaceTempView("__q34_orders")
    return spark.sql(
        """
        SELECT
          o_orderpriority,
          o_orderstatus,
          CAST(GROUPING(o_orderpriority) AS INT) AS g_priority,
          CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
          COUNT(*) AS n,
          ROUND(SUM(o_totalprice), 2) AS total
        FROM __q34_orders
        GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
                                (o_orderstatus), ())
        ORDER BY o_orderpriority ASC NULLS FIRST,
                 o_orderstatus ASC NULLS FIRST
        """
    )
