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
    so results are deterministic. Empty set → NULL (matches string_agg).

    Shape (round 5): orders PRE-AGGREGATE per custkey BEFORE the join —
    map-side partial aggregation compacts the shuffle to per-customer
    buffers instead of moving every joined (order × customer × nation)
    row into a post-join groupBy, and the join then reuses the
    aggregation's hash partitioning (no extra exchange). This is also
    the only shape that survives 100 TB: the old join-then-aggregate
    relied on broadcasting the customer table, which only holds at toy
    scale. Nation (25 rows) stays an explicit broadcast. Measured 0.78 s
    → 0.59 s at sf0.1, identical results."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    n = table(spark, sf_dir, "nation")
    pre = o.groupBy("o_custkey").agg(
        F.count("o_orderkey").alias("order_count"),
        F.round(F.sum("o_totalprice"), 2).alias("total_spent"),
        F.array_sort(F.collect_set("o_orderpriority")).alias("prio"),
    )
    return (
        c.join(pre, pre.o_custkey == c.c_custkey, "left")
        .join(F.broadcast(n), n.n_nationkey == c.c_nationkey, "left")
        .select(
            "c_custkey",
            "c_name",
            "n_name",
            F.coalesce("order_count", F.lit(0)).alias("order_count"),
            "total_spent",
            F.when(F.size("prio") > 0, F.array_join("prio", ",")).alias(
                "priorities"
            ),
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


@query(
    "q35_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
           o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01'
      AND l_shipdate > TIMESTAMP '1998-01-01'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    tags=("join", "agg", "topk"),
)
def q35(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping-priority (TPC-H Q3 shape): selective filters on all
    three inputs reach the scans before the joins, then a two-level
    hash agg and a global top-10 on revenue. Ranking happens on the
    ROUNDED revenue with l_orderkey as tiebreak so cross-engine float
    noise can't reorder the limit boundary. At scale: customer is the
    small post-filter side (AQE broadcast), lineitem never shuffles
    more than the surviving rows."""
    c = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < F.lit("1998-01-01"))
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > F.lit("1998-01-01"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


@query(
    "q36_local_supplier_volume",
    oracle="""
    SELECT n_name, ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
    tags=("join", "agg"),
)
def q36(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-supplier volume (TPC-H Q5 shape): a 6-way join where the
    customer↔supplier co-nationality predicate rides on the supplier
    join (no extra shuffle). supplier/nation/region are broadcast-sized
    dims; the only big shuffle is orders⋈lineitem on orderkey."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), "n_name")
    )


@query(
    "q37_top_suppliers",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey AS supplier_no,
             ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1997-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN rev ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
    ORDER BY s_suppkey
    """,
    tags=("join", "agg", "subquery"),
)
def q37(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top supplier(s) by quarterly revenue (TPC-H Q15 shape): the
    scalar-subquery MAX becomes a broadcast single-row cross join —
    no second scan of lineitem and no window over the whole rev table.
    Equality is on the ROUNDED revenue, same cross-engine guard as
    q35."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-04-01"))
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "total_revenue"
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("_mx"))
    s = table(spark, sf_dir, "supplier")
    return (
        s.join(rev, s.s_suppkey == rev.supplier_no)
        .crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("_mx"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@query(
    "q38_corr_stats",
    oracle="""
    SELECT l_returnflag,
           ROUND(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
           ROUND(covar_samp(l_quantity, l_extendedprice), 2) AS covar_qty_price,
           ROUND(stddev_samp(l_discount), 4) AS std_disc,
           ROUND(var_samp(l_tax), 6) AS var_tax
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tags=("agg", "stats"),
)
def q38(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-moment statistical aggregates (corr / covar / stddev /
    variance) per group — single-pass partial-aggregable moments, so
    the map side combines before the 3-group shuffle. Rounding bounds
    cross-engine accumulation-order noise (both engines are
    numerically-stable single-pass)."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias(
                "corr_qty_price"
            ),
            F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias(
                "covar_qty_price"
            ),
            F.round(F.stddev_samp("l_discount"), 4).alias("std_disc"),
            F.round(F.var_samp("l_tax"), 6).alias("var_tax"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "q39_histogram",
    oracle="""
    SELECT LEAST(CAST(FLOOR(o_totalprice / 25000) AS INT) + 1, 21) AS bucket,
           COUNT(*) AS n,
           ROUND(MIN(o_totalprice), 2) AS lo,
           ROUND(MAX(o_totalprice), 2) AS hi
    FROM orders
    GROUP BY bucket
    ORDER BY bucket
    """,
    tags=("agg", "histogram"),
)
def q39(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram (20 buckets of 25k over [0, 500000)) — one
    map-side-combinable aggregation, the profiling primitive for
    choosing partition bounds / spotting value skew before a big sort
    or range join. Bucket arithmetic is explicit floor((x-lo)/w)+1 in
    BOTH engines (DuckDB has no width_bucket); bucket 21 is the
    clamped overflow bin (o_totalprice tops out ~499978 < 500000, so
    it stays empty here but the contract is pinned)."""
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.least(
                (F.floor(F.col("o_totalprice") / 25000) + 1).cast("int"),
                F.lit(21),
            ).alias("bucket")
        )
        .agg(
            F.count("*").alias("n"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
        )
        .orderBy("bucket")
    )


@query(
    "q41_order_count_distribution",
    oracle="""
    WITH per_cust AS (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer
      LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderstatus <> 'F'
      GROUP BY c_custkey
    )
    SELECT c_count, COUNT(*) AS custdist
    FROM per_cust
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    tags=("join", "agg", "distribution"),
)
def q41(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer order-count distribution (TPC-H Q13 shape): the
    LEFT-join-then-COUNT(col) idiom where zero-order customers MUST
    survive with c_count = 0 — the query an EXISTS/semi-join can't
    express. The join predicate carries a non-key filter
    (o_orderstatus <> 'F'), which must ride ON the join, not WHERE
    (a WHERE would silently drop the zero-order rows). Two aggregations:
    per-customer count, then the count-of-counts histogram — both
    map-side combinable; the only real shuffle is the join on custkey."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") != "F")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


_UNPIVOT_MEASURES = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


@query(
    "q43_unpivot",
    oracle="""
    WITH src AS (
      SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
             l_discount, l_tax
      FROM lineitem WHERE l_orderkey < 400
    )
    SELECT l_orderkey, l_linenumber, measure, ROUND(val, 2) AS val
    FROM (
      SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure, l_quantity AS val FROM src
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice FROM src
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM src
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM src
    )
    ORDER BY l_orderkey, l_linenumber, measure
    """,
    tags=("reshape", "unpivot"),
)
def q43(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long UNPIVOT (melt) — the inverse of q33's pivot. Spark's
    native unpivot compiles to a single Expand node (one pass, rows ×
    n_measures output, no join and no shuffle); the oracle spells the
    same relation as the portable UNION ALL. The id/measure/value
    naming survives both engines; values rounded at the boundary."""
    li = (
        table(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") < 400)
        .select("l_orderkey", "l_linenumber", *_UNPIVOT_MEASURES)
    )
    return (
        li.unpivot(
            ids=["l_orderkey", "l_linenumber"],
            values=list(_UNPIVOT_MEASURES),
            variableColumnName="measure",
            valueColumnName="val",
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            "measure",
            F.round("val", 2).alias("val"),
        )
        .orderBy("l_orderkey", "l_linenumber", "measure")
    )


@query(
    "q44_full_outer_reconciliation",
    oracle="""
    WITH y95 AS (
      SELECT o_custkey, COUNT(*) AS n_1995,
             ROUND(SUM(o_totalprice), 2) AS spend_1995
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1995-01-01'
        AND o_orderdate <  TIMESTAMP '1996-01-01'
      GROUP BY o_custkey
    ), y96 AS (
      SELECT o_custkey, COUNT(*) AS n_1996,
             ROUND(SUM(o_totalprice), 2) AS spend_1996
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate <  TIMESTAMP '1997-01-01'
      GROUP BY o_custkey
    )
    SELECT COALESCE(a.o_custkey, b.o_custkey) AS custkey,
           a.n_1995, a.spend_1995, b.n_1996, b.spend_1996
    FROM y95 a FULL OUTER JOIN y96 b ON a.o_custkey = b.o_custkey
    ORDER BY custkey
    """,
    tags=("join", "full_outer"),
)
def q44(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join — year-over-year reconciliation where customers
    active in EITHER year must appear, with NULLs marking the missing
    side (churned vs newly-active). The one outer-join variant the
    rest of the J-family doesn't cover. Full outer can't broadcast
    (both sides must see unmatched rows) → shuffle hash/sort-merge on
    custkey, which is the right plan at any scale; both inputs are
    pre-aggregated to one row per key before the join, so the shuffle
    carries aggregates, not raw orders."""
    o = table(spark, sf_dir, "orders")

    def year_agg(lo: str, hi: str, n_name: str, s_name: str) -> DataFrame:
        return (
            o.filter(
                (F.col("o_orderdate") >= F.lit(lo)) & (F.col("o_orderdate") < F.lit(hi))
            )
            .groupBy("o_custkey")
            .agg(
                F.count(F.lit(1)).alias(n_name),
                F.round(F.sum("o_totalprice"), 2).alias(s_name),
            )
        )

    a = year_agg("1995-01-01", "1996-01-01", "n_1995", "spend_1995")
    b = year_agg("1996-01-01", "1997-01-01", "n_1996", "spend_1996").withColumnRenamed(
        "o_custkey", "b_custkey"
    )
    return (
        a.join(b, a.o_custkey == F.col("b_custkey"), "full_outer")
        .select(
            F.coalesce("o_custkey", "b_custkey").alias("custkey"),
            "n_1995",
            "spend_1995",
            "n_1996",
            "spend_1996",
        )
        .orderBy("custkey")
    )


@query(
    "q48_correlated_subquery",
    oracle="""
    SELECT o_orderkey,
           ROUND(o_totalprice /
             (SELECT AVG(o2.o_totalprice) FROM orders o2
              WHERE o2.o_custkey = o.o_custkey), 4) AS price_vs_cust_avg
    FROM orders o
    ORDER BY o_orderkey
    LIMIT 1000
    """,
    tags=("subquery", "decorrelation"),
)
def q48(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery — each order's price relative to its
    customer's average. Catalyst DECORRELATES this into one aggregate
    per custkey + an equi-join (RewriteCorrelatedScalarSubquery), so
    the per-row subquery the SQL spells never executes per row: the
    plan is the same two-scan join you'd hand-write, which is the
    whole point of certifying the surface. Division noise bounded by
    the 4-decimal round (both engines aggregate doubles)."""
    table(spark, sf_dir, "orders").createOrReplaceTempView("__q48_orders")
    return spark.sql(
        """
        SELECT o_orderkey,
               ROUND(o_totalprice /
                 (SELECT AVG(o2.o_totalprice) FROM __q48_orders o2
                  WHERE o2.o_custkey = o.o_custkey), 4) AS price_vs_cust_avg
        FROM __q48_orders o
        ORDER BY o_orderkey
        LIMIT 1000
        """
    )
