"""North-star extensions: dedup, as-of join, similarity, text stats.

Q25–Q28 from SURVEY.md §2.1 — the training-data-pipeline operators the
100 TB target needs beyond the reference's own surface.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from wikid_spark.catalog import table
from wikid_spark.functions.vectors import cosine_similarity
from wikid_spark.operators.asof import asof_join_backward
from wikid_spark.registry import query


@query(
    "q25_exact_dedup",
    oracle="""
    SELECT md5(text) AS dup_hash, COUNT(*) AS n_docs
    FROM documents
    GROUP BY md5(text)
    HAVING COUNT(*) > 1
    ORDER BY dup_hash
    """,
    tags=("dedup",),
)
def q25a(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup via content hash [J5, A7]: duplicate groups on
    MD5(text). Hash first, group on the 32-byte digest — at 100 TB the
    shuffle moves hashes, not document bodies."""
    d = table(spark, sf_dir, "documents")
    return (
        d.select(F.md5(F.col("text").cast("binary")).alias("dup_hash"))
        .groupBy("dup_hash")
        .agg(F.count("*").alias("n_docs"))
        .filter(F.col("n_docs") > 1)
        .orderBy("dup_hash")
    )


@query(
    "q25_distinct_texts",
    oracle="""
    SELECT COUNT(*) AS n_docs, COUNT(DISTINCT text) AS n_distinct,
           COUNT(*) - COUNT(DISTINCT text) AS n_dupes
    FROM documents
    """,
    tags=("dedup",),
)
def q25b(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-count companion to exact dedup."""
    d = table(spark, sf_dir, "documents")
    return d.agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("text").alias("n_distinct"),
        (F.count("*") - F.countDistinct("text")).alias("n_dupes"),
    )


@query(
    "q25_exact_dedup_events",
    oracle="""
    SELECT props AS payload, COUNT(*) AS n_rows
    FROM events
    GROUP BY props
    HAVING COUNT(*) > 1
    ORDER BY payload
    """,
    tags=("dedup",),
)
def q25c(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup with real collisions (events.props repeats) — the
    non-vacuous twin of q25_exact_dedup's mechanism."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.col("props").alias("payload"))
        .agg(F.count("*").alias("n_rows"))
        .filter(F.col("n_rows") > 1)
        .orderBy("payload")
    )


@query(
    "q26_asof_join",
    oracle="""
    SELECT e.event_id,
           strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS last_purchase_ts
    FROM (SELECT * FROM events WHERE event_id % 10 = 0) e
    ASOF LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type = 'purchase') p
      ON e.user_id = p.user_id AND e.ts >= p.ts
    ORDER BY e.event_id
    """,
    tags=("asof", "join"),
)
def q26(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of backward join [Q26 north-star]: for each sampled event,
    the latest preceding (or simultaneous) purchase timestamp of the
    same user. Implemented as union+window (one shuffle on user_id) —
    see operators/asof.py; the oracle uses DuckDB's native ASOF JOIN."""
    ev = table(spark, sf_dir, "events")
    probes = ev.filter(F.col("event_id") % 10 == 0).select("event_id", "user_id", "ts")
    purchases = ev.filter(F.col("event_type") == "purchase").select("user_id", "ts")
    joined = asof_join_backward(
        probes,
        purchases,
        by=["user_id"],
        left_time="ts",
        right_time="ts",
        value_col="ts",
        out_col="last_purchase_ts",
    )
    return joined.select(
        "event_id",
        # formatted string output (micros preserved): raw timestamps
        # shift through a non-UTC caller's collection timezone.
        F.date_format("last_purchase_ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
            "last_purchase_ts"
        ),
    ).orderBy("event_id")


@query(
    "q27_cosine_topk",
    oracle="""
    SELECT e.vec_id, ROUND(list_cosine_similarity(e.embedding::DOUBLE[], q.embedding::DOUBLE[]), 4) AS sim
    FROM embeddings e,
         (SELECT embedding FROM embeddings WHERE vec_id = 0) q
    WHERE e.vec_id <> 0
    ORDER BY sim DESC, e.vec_id
    LIMIT 10
    """,
    tags=("similarity", "vector"),
)
def q27(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k [Q27 north-star, U3-adjacent]: the
    1-row query side broadcasts; similarity is zip_with/aggregate
    (JVM-side, no Python); top-k plans as TakeOrderedAndProject. The
    LSH-bucketed scale path lives in queries/similarity.py."""
    emb = table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q_emb"))
    return (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            F.round(cosine_similarity(F.col("embedding"), F.col("q_emb")), 4).alias("sim"),
        )
        .orderBy(F.col("sim").desc(), "vec_id")
        .limit(10)
    )


@query(
    "q28_text_stats",
    oracle="""
    WITH per_doc AS (
      SELECT
        lang, source,
        LENGTH(text) AS n_chars_actual,
        len(string_split(text, ' ')) AS n_words,
        LENGTH(REPLACE(text, ' ', '')) AS n_nonspace,
        CASE WHEN LENGTH(text) > 10 AND LENGTH(text) < 30000 THEN 1 ELSE 0 END AS is_valid,
        CASE WHEN LENGTH(text) = n_chars THEN 1 ELSE 0 END AS n_chars_ok
      FROM documents
    )
    SELECT
      lang, source,
      COUNT(*) AS n_docs,
      -- CAST: DuckDB SUM(<integer>) is HUGEINT → hash-mismatch vs Spark's
      -- BIGINT through the driver's Arrow canonicalization.
      CAST(SUM(is_valid) AS BIGINT) AS n_valid,
      CAST(SUM(n_chars_ok) AS BIGINT) AS n_chars_consistent,
      ROUND(AVG(n_chars_actual), 4) AS avg_chars,
      ROUND(AVG(n_words), 4) AS avg_words,
      ROUND(AVG(CAST(n_nonspace AS DOUBLE) / n_words), 4) AS avg_word_len
    FROM per_doc
    GROUP BY lang, source
    ORDER BY lang, source
    """,
    tags=("textstats",),
)
def q28(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text-stats profile [Q28 north-star, F10]: per-document length /
    word-count / validity (the reference's 10<len<30000 gate,
    wikipedia.py:665-687) aggregated per (lang, source)."""
    d = table(spark, sf_dir, "documents")
    n_words = F.size(F.split(F.col("text"), " "))
    n_chars_actual = F.length("text")
    n_nonspace = F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
    per_doc = d.select(
        "lang",
        "source",
        n_chars_actual.alias("n_chars_actual"),
        n_words.alias("n_words"),
        n_nonspace.alias("n_nonspace"),
        F.when((n_chars_actual > 10) & (n_chars_actual < 30000), 1)
        .otherwise(0)
        .alias("is_valid"),
        F.when(n_chars_actual == F.col("n_chars"), 1).otherwise(0).alias("n_chars_ok"),
    )
    return (
        per_doc.groupBy("lang", "source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("is_valid").alias("n_valid"),
            F.sum("n_chars_ok").alias("n_chars_consistent"),
            F.round(F.avg("n_chars_actual"), 4).alias("avg_chars"),
            F.round(F.avg("n_words"), 4).alias("avg_words"),
            F.round(F.avg(F.col("n_nonspace").cast("double") / F.col("n_words")), 4).alias(
                "avg_word_len"
            ),
        )
        .orderBy("lang", "source")
    )


@query(
    "graph_khop_traversal",
    oracle="""
    WITH hop1 AS (
      SELECT DISTINCT 'N' || c_nationkey AS id, 1 AS hop
      FROM customer WHERE c_custkey <= 100
    ), hop2 AS (
      SELECT DISTINCT 'R' || n.n_regionkey AS id, 2 AS hop
      FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
      WHERE c.c_custkey <= 100
    )
    SELECT id, MIN(hop) AS hop
    FROM (SELECT * FROM hop1 UNION ALL SELECT * FROM hop2)
    GROUP BY id
    ORDER BY id
    """,
    tags=("graph",),
)
def graph_khop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-depth graph traversal (operators/graph.k_hop_neighbors)
    certified on an edge table derived from TPC-H foreign keys:
    customer -in_nation-> nation -in_region-> region. Start = customers
    with key <= 100; result = min-hop per reached node. Mirrors the
    reference's properties_in_entities edge-table shape (ddl.sql:55-67)
    on the driver's tables so the operator is oracle-checkable."""
    from wikid_spark.operators.graph import k_hop_neighbors

    cust = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    edges = (
        cust.select(
            F.lit("in_nation").alias("property_id"),
            F.concat(F.lit("C"), F.col("c_custkey")).alias("src"),
            F.concat(F.lit("N"), F.col("c_nationkey")).alias("dst"),
        )
        .unionByName(
            nation.select(
                F.lit("in_region").alias("property_id"),
                F.concat(F.lit("N"), F.col("n_nationkey")).alias("src"),
                F.concat(F.lit("R"), F.col("n_regionkey")).alias("dst"),
            )
        )
    )
    start = cust.filter(F.col("c_custkey") <= 100).select(
        F.concat(F.lit("C"), F.col("c_custkey")).alias("id")
    )
    return k_hop_neighbors(edges, start, k=2).orderBy("id")


@query(
    "q29_range_join",
    oracle="""
    WITH purchases AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    ), hits AS (
      SELECT p.event_id, COUNT(e.event_id) AS n_events_1h
      FROM purchases p
      JOIN events e
        ON e.user_id = p.user_id
       AND e.ts >= p.ts
       AND e.ts < p.ts + INTERVAL 1 HOUR
       AND e.event_id <> p.event_id
      GROUP BY p.event_id
    )
    SELECT p.event_id, COALESCE(h.n_events_1h, 0) AS n_events_1h
    FROM purchases p LEFT JOIN hits h ON p.event_id = h.event_id
    ORDER BY p.event_id
    """,
    tags=("join", "range"),
)
def q29_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval) join [north-star extension]: per purchase, how
    many OTHER same-user events land in the hour after it — the classic
    attribution window. Spark has no range-join operator and the naive
    theta join plans as a nested loop; the scale-safe re-expression is
    interval bucketing: a 1-hour window overlaps at most two hour
    buckets, so each purchase is exploded to its ≤2 buckets and the
    join becomes an EQUI-join on (user_id, hour_bucket) with the exact
    range check as a post-filter — shuffle-partitionable, AQE-skew-
    splittable, no nested loop. The oracle runs the plain inequality
    join, which DuckDB can afford at test scale."""
    ev = table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    # epoch-hour buckets (unix_micros // 1h), NOT date_trunc: integer
    # epoch arithmetic is timezone- and DST-proof, so the ≤2-bucket
    # overlap guarantee holds under any driver session timezone.
    hour_us = 3_600_000_000
    p_bucket = F.floor(F.unix_micros("p_ts") / hour_us)
    exploded = purchases.select(
        "p_id",
        "p_user",
        "p_ts",
        F.explode(
            F.array_distinct(F.array(p_bucket, p_bucket + 1))
        ).alias("bucket"),
    )
    tagged = ev.select(
        "event_id",
        "user_id",
        "ts",
        F.floor(F.unix_micros("ts") / hour_us).alias("bucket"),
    )
    hits = (
        exploded.join(
            tagged,
            (F.col("user_id") == F.col("p_user"))
            & (tagged["bucket"] == exploded["bucket"]),
        )
        .filter(
            (F.col("ts") >= F.col("p_ts"))
            & (F.col("ts") < F.col("p_ts") + F.expr("INTERVAL 1 HOUR"))
            & (F.col("event_id") != F.col("p_id"))
        )
        # an event in the overlap of both buckets still matches once:
        # the bucket-pair explode is on the PURCHASE side only, and an
        # event row carries exactly one bucket value.
        .groupBy("p_id")
        .agg(F.count(F.lit(1)).alias("n_events_1h"))
    )
    return (
        purchases.join(hits, "p_id", "left")
        .select(
            F.col("p_id").alias("event_id"),
            F.coalesce("n_events_1h", F.lit(0)).alias("n_events_1h"),
        )
        .orderBy("event_id")
    )


@query(
    "q30_percentiles",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           ROUND(quantile_cont(value, 0.5), 4) AS p50,
           ROUND(quantile_cont(value, 0.9), 4) AS p90,
           ROUND(quantile_cont(value, 0.99), 4) AS p99
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("aggregation", "percentile"),
)
def q30_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per event_type (Spark
    ``percentile`` ≡ DuckDB ``quantile_cont``: both linear-interpolate
    at (n-1)·q). Exact percentile is a full-sort-per-group aggregate —
    fine for bounded groups like event types; for high-cardinality
    keys at 100 TB switch to ``percentile_approx`` (t-digest sketch,
    mergeable map-side) and accept the documented error bound."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.percentile("value", F.lit(0.5)), 4).alias("p50"),
            F.round(F.percentile("value", F.lit(0.9)), 4).alias("p90"),
            F.round(F.percentile("value", F.lit(0.99)), 4).alias("p99"),
        )
        .orderBy("event_type")
    )


@query(
    "q31_weighted_median",
    oracle="""
    WITH pre AS (
      SELECT l_returnflag AS flag, l_extendedprice AS v, SUM(l_quantity) AS w
      FROM lineitem GROUP BY 1, 2
    ), c AS (
      SELECT flag, v,
             SUM(w) OVER (PARTITION BY flag ORDER BY v
                          ROWS UNBOUNDED PRECEDING) AS cum,
             SUM(w) OVER (PARTITION BY flag) AS tot
      FROM pre
    )
    SELECT flag,
           ROUND(MIN(CASE WHEN cum >= tot / 2.0 THEN v END), 4)
             AS weighted_median
    FROM c GROUP BY flag
    ORDER BY flag
    """,
    tags=("aggregation", "udaf"),
)
def q31_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom UDAF [U4 capstone]: quantity-weighted median of extended
    price per return flag, via an Arrow grouped-agg pandas UDF over a
    NATIVE (key, value)→sum(weight) pre-aggregation — the UDF sees
    distinct prices per flag, not raw rows, so the no-partial-agg cost
    of grouped-agg UDFs is bounded. Oracle computes the identical
    lower-weighted-median rule with window cumulative sums."""
    from wikid_spark.functions.udaf import grouped_weighted_median

    li = table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.col("l_extendedprice").alias("v"),
        "l_quantity",
    )
    out = grouped_weighted_median(li, "flag", "v", "l_quantity")
    return out.select(
        "flag", F.round("weighted_median", 4).alias("weighted_median")
    ).orderBy("flag")


@query(
    "graph_pagerank",
    oracle="""
    WITH e0 AS (
      SELECT DISTINCT 'P' || l_partkey AS src, 'S' || l_suppkey AS dst
      FROM lineitem
    ),
    edges AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
    nodes AS (SELECT DISTINCT src AS id FROM edges),
    params AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
    deg AS (SELECT src, CAST(COUNT(*) AS DOUBLE) AS outdeg FROM edges GROUP BY src),
    r0 AS (SELECT id, 1.0 / p.n AS rank FROM nodes CROSS JOIN params p),
    r1 AS (
      SELECT nd.id, 0.15 / p.n + 0.85 * COALESCE(c.contrib, 0) AS rank
      FROM nodes nd CROSS JOIN params p
      LEFT JOIN (
        SELECT e.dst AS id, SUM(r.rank / d.outdeg) AS contrib
        FROM edges e JOIN deg d ON e.src = d.src JOIN r0 r ON r.id = e.src
        GROUP BY e.dst
      ) c ON c.id = nd.id
    ),
    r2 AS (
      SELECT nd.id, 0.15 / p.n + 0.85 * COALESCE(c.contrib, 0) AS rank
      FROM nodes nd CROSS JOIN params p
      LEFT JOIN (
        SELECT e.dst AS id, SUM(r.rank / d.outdeg) AS contrib
        FROM edges e JOIN deg d ON e.src = d.src JOIN r1 r ON r.id = e.src
        GROUP BY e.dst
      ) c ON c.id = nd.id
    ),
    r3 AS (
      SELECT nd.id, 0.15 / p.n + 0.85 * COALESCE(c.contrib, 0) AS rank
      FROM nodes nd CROSS JOIN params p
      LEFT JOIN (
        SELECT e.dst AS id, SUM(r.rank / d.outdeg) AS contrib
        FROM edges e JOIN deg d ON e.src = d.src JOIN r2 r ON r.id = e.src
        GROUP BY e.dst
      ) c ON c.id = nd.id
    )
    SELECT r3.id, ROUND(r3.rank * p.n, 6) AS rank_scaled
    FROM r3 CROSS JOIN params p
    ORDER BY rank_scaled DESC, id
    LIMIT 20
    """,
    tags=("graph", "iterative"),
)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-iteration PageRank (d=0.85) over the symmetric part↔supplier
    graph from lineitem — the iterative-algorithm pattern certified
    against a fully unrolled SQL oracle. Ranks reported scaled by N
    (≈1.0 for an average node) and rounded so cross-engine float-sum
    ordering noise (~1e-13 after 3 iterations) can't flip the output;
    ties break on node id."""
    from wikid_spark.operators.graph import pagerank_with_nodes

    # Long node ids INSIDE the iteration (part → 2k, supplier → 2k+1:
    # disjoint namespaces, so the symmetric union needs no re-distinct),
    # string ids only at the output boundary. Every per-iteration join/
    # agg then shuffles and compares 8-byte longs instead of strings —
    # measured ~35% whole-query win at sf0.1 — and the initial distinct
    # dedups (long, long) pairs, not concatenated text.
    li = table(spark, sf_dir, "lineitem")
    e0 = li.select(
        (F.col("l_partkey") * 2).alias("src"),
        (F.col("l_suppkey") * 2 + 1).alias("dst"),
    ).distinct()
    edges = e0.unionByName(
        e0.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    # nodes comes back MATERIALIZED from the iteration (the same
    # localCheckpoint the rounds use), so |V| for output scaling is a
    # count over the checkpoint — not a second lineitem scan + distinct.
    ranks, nodes = pagerank_with_nodes(edges, iters=3, damping=0.85)
    n_df = nodes.agg(F.count(F.lit(1)).cast("double").alias("n"))
    id_str = F.when(
        F.col("id") % 2 == 0, F.concat(F.lit("P"), F.shiftright("id", 1))
    ).otherwise(F.concat(F.lit("S"), F.shiftright("id", 1)))
    return (
        ranks.crossJoin(F.broadcast(n_df))
        .select(
            id_str.alias("id"),
            F.round(F.col("rank") * F.col("n"), 6).alias("rank_scaled"),
        )
        .orderBy(F.desc("rank_scaled"), "id")
        .limit(20)
    )


@query(
    "mm_decode_features",
    oracle="""
    WITH m AS (
      SELECT CAST(doc_id AS VARCHAR) AS doc_id,
             sha256(sha256(CAST(doc_id AS VARCHAR))) AS digest
      FROM documents WHERE doc_id < 50
    ), f AS (
      SELECT doc_id,
             ('0x' || substr(digest, 1, 2))::INT / 256.0 AS f0,
             ('0x' || substr(digest, 31, 2))::INT / 256.0 AS f15,
             (SELECT SUM(('0x' || substr(digest, 2 * i + 1, 2))::INT / 256.0)
              FROM range(16) t(i)) AS f_sum
      FROM m
    )
    SELECT doc_id, ROUND(f0, 6) AS f0, ROUND(f15, 6) AS f15,
           ROUND(f_sum, 6) AS f_sum
    FROM f ORDER BY doc_id
    """,
    tags=("multimodal",),
)
def mm_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal decode plumbing certified end-to-end: binary payload
    column → Arrow-batched mapInPandas decode → feature vector. The
    deterministic fake decoder is pure sha256 arithmetic, so DuckDB
    recomputes the identical features from first principles — the
    oracle checks the whole path (payload construction, batch
    iteration, vector layout), not just row counts. Features are
    exact dyadic rationals (byte/256), so float32 storage loses
    nothing."""
    from wikid_spark.operators.multimodal import attach_fake_media, decode_media

    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    decoded = decode_media(attach_fake_media(docs, "doc_id"), fake=True)
    fts = F.transform("features", lambda x: x.cast("double"))
    return decoded.select(
        "doc_id",
        F.round(F.element_at(fts, 1), 6).alias("f0"),
        F.round(F.element_at(fts, 16), 6).alias("f15"),
        F.round(
            F.aggregate(fts, F.lit(0.0), lambda acc, x: acc + x), 6
        ).alias("f_sum"),
    ).orderBy("doc_id")


@query(
    "mm_frame_sample",
    oracle="""
    SELECT CAST(doc_id AS VARCHAR) AS doc_id,
           CAST(doc_id % 40 + 1 AS BIGINT) AS n_frames,
           CAST(u.f AS BIGINT) AS frame_idx
    FROM documents, unnest(range(0, CAST(doc_id % 40 + 1 AS BIGINT), 10)) AS u(f)
    WHERE doc_id < 100
    ORDER BY doc_id, frame_idx
    """,
    tags=("multimodal",),
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling plumbing: fake video payloads with a
    per-doc frame count, sampled every 10th frame. The sampling is a
    JVM-side sequence+explode on metadata ONLY — the binary payload
    column rides along by reference and is never touched until a real
    decoder consumes the (payload, frame_idx) pairs, which is exactly
    how a 100 TB video corpus avoids decoding frames it will drop."""
    from wikid_spark.operators.multimodal import attach_fake_media, sample_frames

    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    media = attach_fake_media(
        docs, "doc_id", media_type="video",
        n_frames=F.col("doc_id") % 40 + 1,
    )
    return (
        sample_frames(media, every_n=10)
        .select(
            "doc_id",
            F.col("meta.n_frames").cast("long").alias("n_frames"),
            F.col("frame_idx").cast("long").alias("frame_idx"),
        )
        .orderBy("doc_id", "frame_idx")
    )


@query(
    "mm_resize",
    oracle="""
    SELECT CAST(doc_id AS VARCHAR) AS doc_id,
           224 AS width, 224 AS height,
           CAST(64 AS BIGINT) AS payload_len,
           substr(sha256(CAST(doc_id AS VARCHAR)), 1, 2) AS head
    FROM documents WHERE doc_id < 100
    ORDER BY doc_id
    """,
    tags=("multimodal",),
)
def mm_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize plumbing certified end-to-end: payload → Arrow-batched
    mapInPandas resize kernel (deterministic pass-through stub; a
    PIL/ffmpeg resize plugs into the same seam) → meta dimensions
    updated JVM-side. The oracle recomputes the payload from first
    principles, so the check proves the payload SURVIVES the kernel
    byte-for-byte (length + head bytes) and the new dimensions land in
    the metadata struct — the schema contract a real decoder slots
    into."""
    from wikid_spark.operators.multimodal import attach_fake_media, resize_media

    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    resized = resize_media(
        attach_fake_media(docs, "doc_id"), width=224, height=224, fake=True
    )
    return resized.select(
        "doc_id",
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        F.length("payload").cast("long").alias("payload_len"),
        F.substring(F.col("payload").cast("string"), 1, 2).alias("head"),
    ).orderBy("doc_id")


@query(
    "graph_components",
    oracle="""
    WITH sizes AS (
      SELECT c_nationkey AS label, COUNT(*) + 1 AS n_nodes
      FROM customer GROUP BY c_nationkey
    )
    SELECT CAST(label AS BIGINT) AS label, CAST(n_nodes AS BIGINT) AS n_nodes
    FROM sizes
    ORDER BY label
    """,
    tags=("graph", "iterative"),
)
def graph_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components via unrolled min-label propagation on the
    symmetric customer↔nation star graph (customer ids offset by 10^6
    so each component's minimum id is its nation key). The graph's
    radius from the hub is 1, so 3 rounds provably converge — which is
    what lets the oracle state the closed-form truth (component = the
    nation, size = its customers + the hub) without iterating."""
    from wikid_spark.operators.graph import connected_components

    cust = table(spark, sf_dir, "customer")
    e0 = cust.select(
        (F.col("c_custkey") + F.lit(1_000_000)).cast("long").alias("src"),
        F.col("c_nationkey").cast("long").alias("dst"),
    )
    edges = e0.unionByName(
        e0.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    labels = connected_components(edges, iters=3)
    return (
        labels.groupBy("label")
        .agg(F.count(F.lit(1)).alias("n_nodes"))
        .orderBy("label")
    )


HLL_RSD = 0.05  # approx_count_distinct relative standard deviation
# Audit band = 3σ: a legitimate HLL estimate lands inside ±3·rsd with
# ~99.7% probability, so the flag is stable across scale factors and
# datasets (a 2σ band — the old hard-coded 10% — can legitimately flip).
HLL_AUDIT_BAND = 3 * HLL_RSD


@query(
    "q45_approx_distinct_audit",
    oracle="""
    SELECT event_type,
           COUNT(DISTINCT user_id) AS exact_distinct,
           CAST(1 AS INT) AS hll_within_band
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("agg", "sketch", "audit"),
)
def q45_approx_distinct_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The HLL sketch surface (approx_count_distinct, rsd 0.05) made
    oracle-checkable by AUDITING instead of comparing estimates: Spark
    computes exact and approximate distinct counts side by side and
    emits a within-band flag; the oracle states the exact counts and
    asserts the flag. DuckDB can't reproduce Spark's HLL register
    values — but it doesn't need to: HLL is deterministic for a given
    input set, so the flag is stable, and drift past 3× the configured
    rsd (HLL_AUDIT_BAND — a 3σ bound, explicit in the contract rather
    than a hard-coded 10%) fails the hash. Same audit pattern as
    sim_recall_report: the approximation's CONTRACT is the certified
    thing.

    At 100 TB the sketch is the point: one pass, fixed 2^p registers
    per group regardless of key cardinality, map-side mergeable —
    COUNT(DISTINCT) re-shuffles the raw keys."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count_distinct("user_id").alias("exact_distinct"),
            F.approx_count_distinct("user_id", rsd=HLL_RSD).alias("_hll"),
        )
        .select(
            "event_type",
            "exact_distinct",
            (
                F.abs(F.col("_hll") - F.col("exact_distinct"))
                <= F.lit(HLL_AUDIT_BAND) * F.col("exact_distinct")
            )
            .cast("int")
            .alias("hll_within_band"),
        )
        .orderBy("event_type")
    )


SALT_BUCKETS = 8


@query(
    "q46_salted_agg",
    oracle="""
    SELECT user_id, COUNT(*) AS n_events, ROUND(SUM(value), 4) AS total_value
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    """,
    tags=("agg", "skew", "salting"),
)
def q46_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted two-stage aggregation, oracle-certified equivalent to the
    direct group-by: stage 1 aggregates (user_id, salt) — splitting any
    hot user across SALT_BUCKETS reducers — stage 2 merges the partial
    aggregates per user. This is the manual mitigation for Zipf-hot
    keys when AQE's skew handling can't apply (skewed AGGREGATION keys,
    not join keys — AQE only splits skewed join partitions). COUNT and
    SUM re-merge losslessly (the same additive-merge algebra as q08's
    upsert); the 4-decimal round absorbs double summation-order noise
    between the two-stage and single-stage float sums.

    The salt is xxhash64(event_id) — derived from data, uniform, and
    NOT the grouping key, so stage 1's cardinality is exactly
    |users| × SALT_BUCKETS."""
    ev = table(spark, sf_dir, "events")
    salted = ev.withColumn(
        "_salt", F.pmod(F.xxhash64("event_id"), F.lit(SALT_BUCKETS))
    )
    stage1 = salted.groupBy("user_id", "_salt").agg(
        F.count(F.lit(1)).alias("_n"), F.sum("value").alias("_v")
    )
    return (
        stage1.groupBy("user_id")
        .agg(
            F.sum("_n").alias("n_events"),
            F.round(F.sum("_v"), 4).alias("total_value"),
        )
        .orderBy("user_id")
    )


def _crc32_sql_ctes() -> str:
    """DuckDB CTEs computing zlib-compatible CRC32 from first
    principles: the 256-entry reflected-polynomial table via 8
    unrolled shift steps over range(256), exposed as a list (crc_l.tl)
    for list_reduce byte folds. Independent implementation — the
    Spark-side kernel calls zlib; the oracle re-derives the polynomial
    arithmetic, so a hash match certifies the ACTUAL bytes flowing
    through the Arrow encode path (the mm_decode_features discipline,
    VERDICT r14 #4)."""
    sel = "SELECT i, CAST(i AS BIGINT) AS t0 FROM range(256) r(i)"
    for s in range(1, 9):
        sel = (
            f"SELECT i, CASE WHEN t{s - 1} & 1 = 1 "
            f"THEN xor(t{s - 1} >> 1, 3988292384) ELSE t{s - 1} >> 1 END AS t{s} "
            f"FROM ({sel})"
        )
    return (
        f"crc_t AS (SELECT i, t8 AS v FROM ({sel})), "
        f"crc_l AS (SELECT list(v ORDER BY i) AS tl FROM crc_t)"
    )


@query(
    "u3_hashed_bow_embed",
    oracle=f"""
    WITH {_crc32_sql_ctes()},
    cert AS (
      SELECT doc_id, text FROM documents
      WHERE doc_id < 100 AND NOT regexp_matches(text, '[^\\x00-\\x7F]')
    ),
    toks AS (
      SELECT doc_id, t.tok
      FROM cert,
           unnest(regexp_extract_all(lower(text), '[0-9a-z_]+')) AS t(tok)
    ),
    hashed AS (
      SELECT doc_id,
             xor(list_reduce(
                   list_concat([CAST(4294967295 AS BIGINT)],
                     list_transform(string_split(tok, ''),
                                    c -> CAST(unicode(c) AS BIGINT))),
                   (acc, b) -> xor(acc >> 8, tl[(xor(acc, b) & 255) + 1])),
                 4294967295) AS h
      FROM toks, crc_l
    ),
    counts AS (
      SELECT doc_id, CAST(h % 64 AS INT) AS idx,
             SUM(CASE WHEN (h >> 31) & 1 = 0 THEN 1 ELSE -1 END) AS c
      FROM hashed GROUP BY doc_id, idx
    ),
    norms AS (
      SELECT doc_id, SUM(c * c) AS norm2 FROM counts GROUP BY doc_id
    ),
    dims AS (
      SELECT d.doc_id, CAST(r.i AS INT) AS idx
      FROM (SELECT DISTINCT doc_id FROM cert) d,
           range(64) r(i)
    )
    SELECT dims.doc_id, dims.idx,
           CAST(CASE WHEN COALESCE(n.norm2, 0) = 0
                     THEN CAST(0.0 AS DOUBLE)
                     ELSE CAST(COALESCE(c.c, 0) AS DOUBLE)
                          / pow(CAST(n.norm2 AS DOUBLE), 0.5)
                END AS FLOAT) AS val
    FROM dims
    LEFT JOIN counts c ON c.doc_id = dims.doc_id AND c.idx = dims.idx
    LEFT JOIN norms n ON n.doc_id = dims.doc_id
    ORDER BY dims.doc_id, dims.idx
    """,
    tags=("multimodal", "embedding", "udf", "u3"),
)
def u3_hashed_bow_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U3 value certification (VERDICT r14 #4): the deployed hashed-BOW
    encoder (`plans.kb.hashed_bow_encoder`, the real-encoder seam of
    reference create_kb.py:46-56) run through the REAL Arrow
    mapInPandas plumbing (`embed_descriptions`) over documents text,
    the 64-dim float32 embedding exploded to (doc_id, idx, val) rows
    and hash-compared BIT-EXACTLY against a DuckDB oracle that
    re-derives CRC32 from polynomial first principles.

    Why no rounding is needed: bucket counts and the squared norm are
    exact integers on both engines (float64 partial sums < 2^53);
    x**0.5 in the kernel and pow(x, 0.5) in DuckDB call the same libm
    (glibc pow is NOT correctly rounded — sqrt() would diverge by
    1 ulp on e.g. norm2=2921, measured — so the oracle mirrors pow);
    the division is one correctly-rounded double op and the
    float32 narrowing is IEEE nearest on both sides. Restricted to
    doc_id < 100 to bound the exploded output (100 x 64 rows).

    Scale: the encode is the certified one-pass Arrow shape — at 100 TB
    the explode would be replaced by writing the array column straight
    to the embeddings sink; this query's explode exists to give the
    certification row-shaped values."""
    from wikid_spark.plans.kb import embed_descriptions, hashed_bow_encoder

    docs = (
        table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 100)
        # Certified slice is ASCII-only (both sides filter): the
        # oracle's per-CHARACTER byte fold equals the kernel's UTF-8
        # crc32 only for ASCII, and RE2's [0-9a-z_] equals Python \w
        # only there — a future accented fixture must not silently
        # break a correct kernel (round-15 review). The kernel's
        # Unicode behavior is covered by its own unit tests.
        .filter(~F.col("text").rlike("[^\\x00-\\x7F]"))
        .select("doc_id", F.col("text").alias("description"))
    )
    emb = embed_descriptions(docs, encoder=hashed_bow_encoder())
    return (
        emb.select(
            "doc_id", F.posexplode("embedding").alias("idx", "val")
        )
        .select("doc_id", F.col("idx").cast("int").alias("idx"), "val")
        .orderBy("doc_id", "idx")
    )


# Mixed-script fixture of the Unicode certification slice (VERDICT r15
# #5). Both forms are AUTHORED literals: the query feeds the upper/
# mixed-case forms through the kernel (whose Python str.lower() runs on
# real non-ASCII), and the oracle's token CTE fixes the expected
# lowercase forms — precomputed once by the Unicode default-case rule,
# so no engine re-derives another engine's case fold at query time.
# Scripts cover 2-byte (Latin accents, Cyrillic, Greek, Arabic, Hebrew),
# 3-byte (CJK), and 4-byte (Gothic) UTF-8, all single-\w+-token shaped.
_U3U_UPPER = (
    "CAFÉ", "NAÏVE", "ÜBER", "ПРИВЕТ", "Москва", "東京",
    "中文字", "مرحبا", "עברית", "ελληνικά", "𐌰𐌱𐌲", "ĄŻÓŁW",
)
_U3U_LOWER = (
    "café", "naïve", "über", "привет", "москва", "東京",
    "中文字", "مرحبا", "עברית", "ελληνικά", "𐌰𐌱𐌲", "ążółw",
)

_U3U_TOKEN_SPLIT = r"[^\p{L}\p{N}_]+"  # engine-neutral: Java == RE2


@query(
    "u3_hashed_bow_embed_unicode",
    oracle=f"""
    WITH {_crc32_sql_ctes()},
    w(i, tok) AS (VALUES {", ".join(
        f"({i}, '{t}')" for i, t in enumerate(_U3U_LOWER)
    )}),
    cert AS (SELECT doc_id, text FROM documents WHERE doc_id < 40),
    ftok AS (
      SELECT doc_id,
             COALESCE(list_filter(
               string_split_regex(lower(COALESCE(text, '')),
                                  '{_U3U_TOKEN_SPLIT}'),
               x -> x <> '')[1], 'doc') AS tok
      FROM cert
    ),
    toks AS (
      SELECT c.doc_id, w.tok FROM cert c JOIN w ON w.i = c.doc_id % 12
      UNION ALL
      SELECT c.doc_id, w.tok FROM cert c JOIN w ON w.i = (c.doc_id + 5) % 12
      UNION ALL
      SELECT doc_id, tok FROM ftok
    ),
    tokbytes AS (
      -- UTF-8 bytes from code points, first principles: the kernel
      -- hashes tok.encode(); per-character unicode(c) only equals the
      -- byte for ASCII, so the oracle expands the encoding itself.
      -- Tokens hold no combining marks (the token class excludes
      -- category M), so string_split(tok, '') yields one code point
      -- per element.
      SELECT doc_id,
        flatten(list_transform(string_split(tok, ''), c -> CASE
          WHEN unicode(c) < 128 THEN [CAST(unicode(c) AS BIGINT)]
          WHEN unicode(c) < 2048 THEN [
            CAST(192 + unicode(c) // 64 AS BIGINT),
            CAST(128 + unicode(c) % 64 AS BIGINT)]
          WHEN unicode(c) < 65536 THEN [
            CAST(224 + unicode(c) // 4096 AS BIGINT),
            CAST(128 + (unicode(c) // 64) % 64 AS BIGINT),
            CAST(128 + unicode(c) % 64 AS BIGINT)]
          ELSE [
            CAST(240 + unicode(c) // 262144 AS BIGINT),
            CAST(128 + (unicode(c) // 4096) % 64 AS BIGINT),
            CAST(128 + (unicode(c) // 64) % 64 AS BIGINT),
            CAST(128 + unicode(c) % 64 AS BIGINT)]
        END)) AS bs
      FROM toks
    ),
    hashed AS (
      SELECT doc_id,
             xor(list_reduce(
                   list_concat([CAST(4294967295 AS BIGINT)], bs),
                   (acc, b) -> xor(acc >> 8, tl[(xor(acc, b) & 255) + 1])),
                 4294967295) AS h
      FROM tokbytes, crc_l
    ),
    counts AS (
      SELECT doc_id, CAST(h % 64 AS INT) AS idx,
             SUM(CASE WHEN (h >> 31) & 1 = 0 THEN 1 ELSE -1 END) AS c
      FROM hashed GROUP BY doc_id, idx
    ),
    norms AS (
      SELECT doc_id, SUM(c * c) AS norm2 FROM counts GROUP BY doc_id
    ),
    dims AS (
      SELECT d.doc_id, CAST(r.i AS INT) AS idx
      FROM (SELECT DISTINCT doc_id FROM cert) d, range(64) r(i)
    )
    SELECT dims.doc_id, dims.idx,
           ROUND(CAST(CAST(CASE WHEN COALESCE(n.norm2, 0) = 0
                           THEN CAST(0.0 AS DOUBLE)
                           ELSE CAST(COALESCE(c.c, 0) AS DOUBLE)
                                / pow(CAST(n.norm2 AS DOUBLE), 0.5)
                      END AS FLOAT) AS DOUBLE), 6) AS val
    FROM dims
    LEFT JOIN counts c ON c.doc_id = dims.doc_id AND c.idx = dims.idx
    LEFT JOIN norms n ON n.doc_id = dims.doc_id
    ORDER BY dims.doc_id, dims.idx
    """,
    tags=("multimodal", "embedding", "udf", "u3", "unicode"),
)
def u3_hashed_bow_embed_unicode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Unicode slice of the U3 value certification (VERDICT r15
    #5): the driver's documents tables are ASCII-only at every SF, so
    `u3_hashed_bow_embed`'s ASCII restriction left the kernel's
    non-ASCII path certified only by unit tests. This query SYNTHESIZES
    a deterministic mixed-script description per doc — two fixture
    words picked by doc_id from `_U3U_UPPER` plus the doc's own first
    token under the engine-neutral class split — and runs it through
    the REAL Arrow mapInPandas encode (`embed_descriptions` +
    `hashed_bow_encoder`): Python str.lower() over accented Latin /
    Cyrillic / Greek, \\w+ tokenization over RTL and 4-byte scripts,
    and zlib.crc32 over multi-byte UTF-8.

    The oracle sidesteps both cross-engine divergences by
    construction: the token set is FIXED in a CTE (the authored
    lowercase forms — the Unicode default-case rule applied once at
    authoring time, not DuckDB's lower() at query time), and the
    CRC32 input bytes are derived from code points by expanding the
    UTF-8 encoding in SQL (prototyped bit-exact against zlib across
    all 12 fixture words before registration). Values are quantized
    to 6dp on both sides — unlike the ASCII twin the fused kernel
    arithmetic is not being re-certified here, the BYTES are.

    Scale: 40 docs x 64 dims of certification rows; the encode itself
    is the same one-pass Arrow shape as the deployed U3 path."""
    from wikid_spark.plans.kb import embed_descriptions, hashed_bow_encoder

    words = F.array(*[F.lit(w) for w in _U3U_UPPER])
    first_tok = F.coalesce(
        F.element_at(
            F.filter(
                F.split(
                    F.lower(F.coalesce(F.col("text"), F.lit(""))),
                    _U3U_TOKEN_SPLIT,
                ),
                lambda t: t != "",
            ),
            1,
        ),
        F.lit("doc"),
    )
    docs = (
        table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 40)
        .select(
            "doc_id",
            F.concat_ws(
                " ",
                F.element_at(words, (F.col("doc_id") % 12 + 1).cast("int")),
                first_tok,
                F.element_at(
                    words, ((F.col("doc_id") + 5) % 12 + 1).cast("int")
                ),
            ).alias("description"),
        )
    )
    emb = embed_descriptions(docs, encoder=hashed_bow_encoder())
    return (
        emb.select("doc_id", F.posexplode("embedding").alias("idx", "val"))
        .select(
            "doc_id",
            F.col("idx").cast("int").alias("idx"),
            F.round(F.col("val").cast("double"), 6).alias("val"),
        )
        .orderBy("doc_id", "idx")
    )
