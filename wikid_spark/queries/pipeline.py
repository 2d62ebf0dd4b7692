"""Training-data pipeline operators over the documents corpus.

The large-scale-LLM-pipeline family beyond whole-document dedup
(queries/dedup.py): span-level dedup, PII scrubbing, repetition
signals, deterministic splits, context-window chunking, and sequence
packing. All are published public techniques (C4/Gopher-style corpus
filtering, GPT-style sequence packing); none exist in the reference —
they extend SURVEY.md §2's inventory the way the brief's
"training-data pipeline" section demands.

Every op is pure DataFrame algebra (no UDFs): tokenization is the same
Unicode-aware split the FTS layer uses (``operators.fts.TOKEN_SPLIT``),
so one tokenizer serves search, dedup, and pipeline ops. Scale notes per-op; the common theme is that
per-document signals are single-pass HOF arithmetic (no shuffle) and
corpus-wide ops shuffle once on a well-distributed key.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from wikid_spark.catalog import table
from wikid_spark.operators.fts import tokenize
from wikid_spark.operators.graph import _materialize as _graph_materialize
from wikid_spark.queries.dedup import (
    _SHINGLES_SQL as _ND_SHINGLES_SQL,
    BAND_R as _ND_BAND_R,
    N_PERM as _ND_N_PERM,
    PERM_P as _ND_PERM_P,
)
from wikid_spark.registry import query

SPAN = 5          # words per dedup span
CHUNK = 32        # tokens per training chunk
STEP = 24         # chunk stride (CHUNK - overlap of 8)
PACK_BUDGET = 512  # tokens per packed sequence
# Max near-dup drop-list rows to pin as a broadcast in the training-
# corpus anti-join: 20M longs ≈ 160 MB — comfortably under Spark's
# 8 GiB broadcast hard cap with headroom for the driver copy, far above
# any funnel output at benchmark scales. Above it (high-dup-rate web
# crawls) the hint is omitted and AQE picks the join strategy from the
# runtime size. See SCALE.md "Dup-rate dial".
DROP_BROADCAST_MAX_ROWS = 20_000_000

# DuckDB twin of operators.fts.tokenize.
_TOKS_CTE = """
    toks AS (
      SELECT doc_id, lang, source,
             list_filter(string_split_regex(lower(text), '[^\\p{L}\\p{N}_]+'),
                         x -> x <> '') AS ts
      FROM documents
    )
"""


def _toks(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", tokenize("text").alias("ts")
    )


@query(
    "pp_span_dedup",
    oracle=f"""
    WITH {_TOKS_CTE},
    spans AS (
      SELECT doc_id, array_to_string(ts[i + 1 : i + {SPAN}], ' ') AS span
      FROM toks, unnest(list_transform(ts, (x, i) -> i - 1)) AS u(i)
      WHERE i + {SPAN} <= len(ts)
    ),
    keepers AS (
      SELECT span, MIN(doc_id) AS keeper FROM spans GROUP BY span
    )
    SELECT s.doc_id,
           COUNT(*) AS n_spans,
           CAST(SUM(CASE WHEN k.keeper <> s.doc_id THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup_removed
    FROM spans s JOIN keepers k ON s.span = k.span
    GROUP BY s.doc_id
    ORDER BY s.doc_id
    """,
    tags=("pipeline", "dedup"),
)
def pp_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style span-level dedup (C4 removes any three-sentence span
    occurring more than once in the corpus; this corpus has no sentence
    boundaries, so the span is a sliding {SPAN}-word window): every
    duplicated span is kept only in the lowest-doc_id document and
    counted as removed everywhere else.

    Scale: spans shuffle once on an xxhash64 of the span (longs, not
    ~25-byte strings — same trick and collision bound as
    nd_ngram_jaccard; hot spans are bounded by the corpus vocabulary,
    and a df-cap like nd_ngram_jaccard's applies if not), then once on
    doc_id for the per-doc rollup — no self-join, no n² anywhere."""
    t = _toks(spark, sf_dir)
    spans = t.select(
        "doc_id",
        F.explode(
            F.when(
                F.size("ts") >= SPAN,
                F.transform(
                    F.sequence(F.lit(0), F.size("ts") - SPAN),
                    lambda i: F.array_join(F.slice("ts", i + 1, SPAN), " "),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("span_s"),
    ).select("doc_id", F.xxhash64("span_s").alias("span"))
    # keeper = MIN(doc_id) per span as a WINDOW over the one span
    # chain, not a groupBy + self-join back (round-16, guide §2.2):
    # this Spark's AQE never fires ReusedExchange, so the join shape
    # re-ran the CPU-dense span explode for both sides and shuffled
    # the spans twice. Same colocation-by-span (identical skew bound),
    # one chain + one shuffle fewer; values identical by definition.
    keeper = F.min("doc_id").over(Window.partitionBy("span"))
    return (
        spans.select("doc_id", (keeper != F.col("doc_id")).cast("long").alias("dup"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum("dup").alias("n_dup_removed"),
        )
        .orderBy("doc_id")
    )


_EMAIL = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
_PHONE = "\\+1-555-[0-9]{4}"


@query(
    "pp_pii_scrub",
    oracle=f"""
    WITH seeded AS (
      SELECT doc_id,
             text || ' contact user' || doc_id || '@' || source ||
             '.org or +1-555-' || lpad(CAST((doc_id * 7) % 10000 AS VARCHAR), 4, '0')
               AS text
      FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{_EMAIL}')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(text, '{_PHONE}')) AS BIGINT) AS n_phones,
           length(regexp_replace(
             regexp_replace(text, '{_EMAIL}', '<EMAIL>', 'g'),
             '{_PHONE}', '<PHONE>', 'g')) AS scrubbed_len
    FROM seeded
    ORDER BY doc_id
    """,
    tags=("pipeline", "pii"),
)
def pp_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction (standard pre-training scrub): replace emails and
    phone numbers with typed placeholder tokens, report per-doc match
    counts and the scrubbed length. The corpus itself is synthetic
    word-soup with no PII, so the query first seeds one deterministic
    email + phone per document from its own key columns — the regexes
    then run against realistic surrounding text.

    Scale: pure per-row regex projection — map-only, no shuffle; the
    regexes are RE2/Java-compatible subset so engines agree."""
    docs = table(spark, sf_dir, "documents")
    seeded = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@"),
            F.col("source"),
            F.lit(".org or +1-555-"),
            F.lpad(((F.col("doc_id") * 7) % 10000).cast("string"), 4, "0"),
        ).alias("text"),
    )
    scrubbed = F.regexp_replace(
        F.regexp_replace("text", _EMAIL, "<EMAIL>"), _PHONE, "<PHONE>"
    )
    return seeded.select(
        "doc_id",
        F.regexp_count("text", F.lit(_EMAIL)).cast("long").alias("n_emails"),
        F.regexp_count("text", F.lit(_PHONE)).cast("long").alias("n_phones"),
        F.length(scrubbed).alias("scrubbed_len"),
    ).orderBy("doc_id")


@query(
    "pp_repetition",
    oracle=f"""
    WITH {_TOKS_CTE},
    base AS (
      SELECT doc_id, len(ts) AS n_words,
             ROUND(1.0 - len(list_distinct(ts)) / len(ts), 6) AS dup_word_frac,
             ts
      FROM toks
      WHERE len(ts) > 0
    ),
    bigrams AS (
      SELECT doc_id, ts[i + 1] || ' ' || ts[i + 2] AS bg
      FROM toks, unnest(list_transform(ts, (x, i) -> i - 1)) AS u(i)
      WHERE i + 2 <= len(ts)
    ),
    bg_counts AS (
      SELECT doc_id, bg, COUNT(*) AS c FROM bigrams GROUP BY doc_id, bg
    ),
    top_bg AS (
      SELECT doc_id,
             ROUND(MAX(c) / CAST(SUM(c) AS DOUBLE), 6) AS top_bigram_frac
      FROM bg_counts GROUP BY doc_id
    )
    SELECT b.doc_id, b.n_words, b.dup_word_frac, t.top_bigram_frac
    FROM base b JOIN top_bg t ON b.doc_id = t.doc_id
    ORDER BY b.doc_id
    """,
    tags=("pipeline", "quality"),
)
def pp_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals: duplicate-word fraction
    (1 − distinct/total, a HOF one-pass per row — no shuffle) and the
    fraction of all bigrams taken by the single most frequent bigram
    (explode + two keyed aggregations; the (doc_id, bigram) key is
    high-cardinality and uniform, so the shuffle is well-spread).

    Rationale (public: Gopher/MassiveText filtering rules): highly
    repetitive documents are low-quality training text; these two
    fractions are the standard thresholds.

    Empty-token docs are excluded on BOTH engines (the fractions have a
    zero denominator; a no-words doc has no repetition signal)."""
    t = _toks(spark, sf_dir).filter(F.size("ts") > 0)
    base = t.select(
        "doc_id",
        F.size("ts").alias("n_words"),
        F.round(
            1.0 - F.size(F.array_distinct("ts")) / F.size("ts"), 6
        ).alias("dup_word_frac"),
        "ts",
    )
    bigrams = t.select(
        "doc_id",
        F.explode(
            F.when(
                F.size("ts") >= 2,
                F.transform(
                    F.sequence(F.lit(0), F.size("ts") - 2),
                    lambda i: F.concat(
                        F.element_at("ts", i + 1),
                        F.lit(" "),
                        F.element_at("ts", i + 2),
                    ),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("bg"),
    )
    top_bg = (
        bigrams.groupBy("doc_id", "bg")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(
            F.round(F.max("c") / F.sum("c").cast("double"), 6).alias(
                "top_bigram_frac"
            )
        )
    )
    return (
        base.drop("ts")
        .join(top_bg, "doc_id")
        .select("doc_id", "n_words", "dup_word_frac", "top_bigram_frac")
        .orderBy("doc_id")
    )


# Knuth multiplicative hash: deterministic, engine-portable, and
# decorrelated from doc_id's own ordering. Stays far under 2^63.
_HASH_MULT = 2654435761
_HASH_MOD = 4294967296


@query(
    "pp_hash_split",
    oracle=f"""
    WITH {_TOKS_CTE},
    assigned AS (
      SELECT doc_id, lang, len(ts) AS n_tok,
             ((doc_id * {_HASH_MULT}) % {_HASH_MOD}) % 10 AS h
      FROM toks
    )
    SELECT CASE WHEN h < 8 THEN 'train' WHEN h = 8 THEN 'dev' ELSE 'test' END
             AS split,
           lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS sum_tokens
    FROM assigned
    GROUP BY 1, 2
    ORDER BY split, lang
    """,
    tags=("pipeline", "split"),
)
def pp_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/dev/test split via a Knuth
    multiplicative hash of the document key (the scalable version of
    the reference's string-endswith('3') dev split, wikipedia.py:63-68:
    content-independent, reproducible across engines and runs, and
    uniform regardless of key distribution). Reported per (split, lang)
    so stratification is visible.

    Scale: map-side hash + one aggregation on a 15-key group — the
    shuffle is a handful of rows after partial aggregation."""
    t = _toks(spark, sf_dir)
    h = ((F.col("doc_id") * _HASH_MULT) % _HASH_MOD) % 10
    return (
        t.select(
            F.when(h < 8, "train").when(h == 8, "dev").otherwise("test").alias("split"),
            "lang",
            F.size("ts").alias("n_tok"),
        )
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("sum_tokens"),
        )
        .orderBy("split", "lang")
    )


@query(
    "pp_chunking",
    oracle=f"""
    WITH {_TOKS_CTE},
    starts AS (
      SELECT doc_id, ts, i AS start_pos
      FROM toks,
           unnest(list_filter(list_transform(ts, (x, i) -> i - 1),
                              i -> i % {STEP} = 0)) AS u(i)
    )
    SELECT doc_id, start_pos,
           len(ts[start_pos + 1 : start_pos + {CHUNK}]) AS n_chunk_tokens,
           array_to_string(ts[start_pos + 1 : start_pos + {CHUNK}], ' ')
             AS chunk_text
    FROM starts
    ORDER BY doc_id, start_pos
    """,
    tags=("pipeline", "chunking"),
)
def pp_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking: overlapping {CHUNK}-token windows with
    stride {STEP} (overlap {CHUNK - STEP}) — the standard way long
    documents are cut for a fixed-context model. Tail chunks are kept
    short rather than padded; every token lands in ≥1 chunk.

    Scale: per-row sequence + slice (HOFs, no UDF), then explode —
    map-only, output is ~n/STEP rows per doc with no shuffle at all."""
    t = _toks(spark, sf_dir)
    starts = t.select(
        "doc_id",
        "ts",
        # Empty-token guard: sequence(0, -1, STEP) throws in Spark
        # ("Illegal sequence boundaries") while the oracle just emits no
        # rows — an empty/whitespace-only doc must chunk to nothing.
        F.explode(
            F.when(
                F.size("ts") > 0,
                F.sequence(F.lit(0), F.size("ts") - 1, F.lit(STEP)),
            ).otherwise(F.array().cast("array<int>"))
        ).alias("start_pos"),
    )
    chunk = F.slice("ts", F.col("start_pos") + 1, CHUNK)
    return starts.select(
        "doc_id",
        "start_pos",
        F.size(chunk).alias("n_chunk_tokens"),
        F.array_join(chunk, " ").alias("chunk_text"),
    ).orderBy("doc_id", "start_pos")


@query(
    "pp_pack_sequences",
    oracle=f"""
    WITH {_TOKS_CTE},
    sized AS (
      SELECT doc_id, source, len(ts) AS n_tok FROM toks
    ),
    placed AS (
      SELECT doc_id, source, n_tok,
             SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                              ROWS UNBOUNDED PRECEDING) - n_tok AS start_off
      FROM sized
    )
    SELECT source,
           CAST(FLOOR(start_off / {PACK_BUDGET}.0) AS BIGINT) AS pack_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS pack_tokens
    FROM placed
    GROUP BY source, pack_id
    ORDER BY source, pack_id
    """,
    tags=("pipeline", "packing"),
)
def pp_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style sequence packing: concatenate documents in key order
    and cut every {PACK_BUDGET} tokens; a document belongs to the pack
    where it starts (documents may straddle pack boundaries, exactly as
    concat-then-chunk training corpora do). Output is per-pack document
    and token counts.

    Scale: the running offset is a window partitioned BY SOURCE — packs
    are per-source, so no global single-partition sort (the classic
    packing scale-killer); each source's stream packs independently,
    which is also what you want operationally (shard = source)."""
    t = _toks(spark, sf_dir)
    sized = t.select("doc_id", "source", F.size("ts").alias("n_tok"))
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    placed = sized.withColumn(
        "start_off", F.sum("n_tok").over(w) - F.col("n_tok")
    )
    return (
        placed.groupBy(
            "source",
            F.floor(F.col("start_off") / float(PACK_BUDGET))
            .cast("long")
            .alias("pack_id"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("pack_tokens"),
        )
        .orderBy("source", "pack_id")
    )


BENCH_EVERY = 97  # doc_id % 97 == 0 → held-out "benchmark" docs


@query(
    "pp_decontaminate",
    oracle=f"""
    WITH {_TOKS_CTE},
    spans AS (
      SELECT doc_id, array_to_string(ts[i + 1 : i + {SPAN}], ' ') AS span
      FROM toks, unnest(list_transform(ts, (x, i) -> i - 1)) AS u(i)
      WHERE i + {SPAN} <= len(ts)
    ),
    bench AS (
      SELECT DISTINCT span FROM spans WHERE doc_id % {BENCH_EVERY} = 0
    )
    SELECT s.doc_id,
           COUNT(DISTINCT s.span) AS n_contaminated_spans
    FROM spans s JOIN bench b ON s.span = b.span
    WHERE s.doc_id % {BENCH_EVERY} <> 0
    GROUP BY s.doc_id
    ORDER BY s.doc_id
    """,
    tags=("pipeline", "decontamination"),
)
def pp_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (public practice since GPT-2/GPT-3
    appendices: drop training docs that overlap the eval set): flags
    every training document sharing at least one {SPAN}-word span with
    the held-out benchmark subset (doc_id % {BENCH_EVERY} == 0), with
    the count of distinct overlapping spans.

    Scale: benchmark suites are tiny relative to the corpus, so the
    distinct benchmark-span set broadcasts; the corpus side is a
    map-side hash probe + one doc_id aggregation — the 100 TB side is
    never shuffled on the span."""
    t = _toks(spark, sf_dir)
    spans = t.select(
        "doc_id",
        F.explode(
            F.when(
                F.size("ts") >= SPAN,
                F.transform(
                    F.sequence(F.lit(0), F.size("ts") - SPAN),
                    lambda i: F.array_join(F.slice("ts", i + 1, SPAN), " "),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("span_s"),
    ).select("doc_id", F.xxhash64("span_s").alias("span"))
    bench = (
        spans.filter(F.col("doc_id") % BENCH_EVERY == 0)
        .select("span")
        .distinct()
    )
    return (
        spans.filter(F.col("doc_id") % BENCH_EVERY != 0)
        .join(F.broadcast(bench), "span")
        .groupBy("doc_id")
        .agg(F.count_distinct("span").alias("n_contaminated_spans"))
        .orderBy("doc_id")
    )


_STOPWORDS = ("the", "a", "of", "and")


@query(
    "pp_gopher_filter",
    oracle=f"""
    WITH {_TOKS_CTE}
    SELECT doc_id,
           len(ts) AS n_words,
           ROUND(list_sum(list_transform(ts, x -> len(x))) / CAST(len(ts) AS DOUBLE), 4)
             AS mean_word_len,
           ROUND(len(list_filter(ts, x -> x IN ('the', 'a', 'of', 'and')))
                 / CAST(len(ts) AS DOUBLE), 4) AS stop_frac,
           (len(ts) >= 50
            AND list_sum(list_transform(ts, x -> len(x))) / CAST(len(ts) AS DOUBLE)
                BETWEEN 3 AND 10
            AND len(list_filter(ts, x -> x IN ('the', 'a', 'of', 'and')))
                / CAST(len(ts) AS DOUBLE) >= 0.02) AS keep
    FROM toks
    WHERE len(ts) > 0
    ORDER BY doc_id
    """,
    tags=("pipeline", "quality"),
)
def pp_gopher_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style composite quality gate (public MassiveText rules:
    word-count bounds, mean-word-length band, stop-word presence),
    emitting the signal columns alongside the keep decision so the gate
    is auditable, not a black box.

    Scale: one HOF projection per row — map-only, no shuffle, and the
    signals come from a single tokenization shared by the whole
    pipeline family. Empty-token docs are excluded on BOTH engines
    (zero-denominator signals; they'd fail the n_words >= 50 gate
    anyway, but excluding beats emitting NULL signal columns)."""
    t = _toks(spark, sf_dir).filter(F.size("ts") > 0)
    n = F.size("ts")
    sum_len = F.aggregate(
        F.transform("ts", F.length),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    mean_len = sum_len / n.cast("double")
    stop_arr = F.array(*[F.lit(s) for s in _STOPWORDS])
    stop_frac = (
        F.size(F.filter("ts", lambda x: F.array_contains(stop_arr, x)))
        / n.cast("double")
    )
    keep = (
        (n >= 50)
        & mean_len.between(3, 10)
        & (stop_frac >= 0.02)
    )
    return t.select(
        "doc_id",
        n.alias("n_words"),
        F.round(mean_len, 4).alias("mean_word_len"),
        F.round(stop_frac, 4).alias("stop_frac"),
        keep.alias("keep"),
    ).orderBy("doc_id")


SAMPLE_K = 20  # docs kept per stratum


@query(
    "pp_stratified_sample",
    oracle=f"""
    WITH ranked AS (
      SELECT doc_id, lang, source,
             ROW_NUMBER() OVER (
               PARTITION BY lang, source
               ORDER BY (doc_id * {_HASH_MULT}) % {_HASH_MOD}, doc_id
             ) AS sample_rank
      FROM documents
    )
    SELECT doc_id, lang, source, sample_rank
    FROM ranked
    WHERE sample_rank <= {SAMPLE_K}
    ORDER BY lang, source, sample_rank
    """,
    tags=("pipeline", "sampling"),
)
def pp_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size stratified sample: exactly min(K, |stratum|) docs per
    (lang, source), selected by Knuth-hash order — the deterministic,
    engine-portable stand-in for a random draw (same hash family as
    pp_hash_split; a different constant would give an independent
    sample). Fixed-size-per-stratum is the eval-set construction
    primitive that rate-based sampling (pp_hash_split) can't express:
    rare strata keep K docs instead of rate×|stratum| ≈ 0.

    Scale: one shuffle on the stratum key; rank-within-group truncates
    to K rows per group early (WindowGroupLimit pushes the rank filter
    into the sort), so the output never exceeds K × |strata|."""
    d = table(spark, sf_dir, "documents")
    h = (F.col("doc_id") * _HASH_MULT) % _HASH_MOD
    w = Window.partitionBy("lang", "source").orderBy(h, "doc_id")
    return (
        d.select(
            "doc_id", "lang", "source", F.row_number().over(w).alias("sample_rank")
        )
        .filter(F.col("sample_rank") <= SAMPLE_K)
        .orderBy("lang", "source", "sample_rank")
    )


@query(
    "pp_training_corpus",
    oracle=f"""
    WITH RECURSIVE {_TOKS_CTE},
    gop AS (
      SELECT doc_id FROM toks
      WHERE len(ts) > 0
        AND len(ts) >= 50
        AND list_sum(list_transform(ts, x -> len(x))) / CAST(len(ts) AS DOUBLE)
            BETWEEN 3 AND 10
        AND len(list_filter(ts, x -> x IN ('the', 'a', 'of', 'and')))
            / CAST(len(ts) AS DOUBLE) >= 0.02
    ),
    d1 AS (
      SELECT d.doc_id, d.lang, d.text FROM documents d JOIN gop USING (doc_id)
    ),
    d2 AS (
      SELECT doc_id, lang FROM (
        SELECT doc_id, lang,
               ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
        FROM d1) WHERE rn = 1
    ),
    s AS (
      SELECT doc_id, {_ND_SHINGLES_SQL} AS sh FROM documents
    ), su AS (
      SELECT doc_id, unnest(sh) AS sh FROM s
    ), h AS (
      SELECT doc_id,
             ('0x' || substr(md5(sh), 1, 15))::BIGINT % 1073741824 AS h
      FROM su
    ), mh AS (
      SELECT doc_id, i AS perm,
             MIN((h * (2*i + 1) + (12345*i + 67890)) % {_ND_PERM_P}) AS minhash
      FROM h, range({_ND_N_PERM}) t(i)
      GROUP BY doc_id, i
    ), bands AS (
      SELECT doc_id, perm // {_ND_BAND_R} AS band,
             md5(string_agg(minhash::VARCHAR, '|' ORDER BY perm)) AS sig
      FROM mh GROUP BY doc_id, perm // {_ND_BAND_R}
    ), cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b ON a.band = b.band AND a.sig = b.sig
      WHERE a.doc_id < b.doc_id
    ), ver AS (
      SELECT c.doc_a, c.doc_b
      FROM cand c
      JOIN s x ON x.doc_id = c.doc_a
      JOIN s y ON y.doc_id = c.doc_b
      WHERE len(list_intersect(x.sh, y.sh))::DOUBLE
            / len(list_distinct(list_concat(x.sh, y.sh))) >= 0.2
    ), e AS (
      SELECT doc_a AS src, doc_b AS dst FROM ver
      UNION ALL
      SELECT doc_b, doc_a FROM ver
    ), reach(id, label) AS (
      SELECT DISTINCT src, src FROM e
      UNION
      SELECT e.dst, r.label FROM reach r JOIN e ON e.src = r.id
    ), drops AS (
      SELECT id AS doc_id FROM reach GROUP BY id HAVING MIN(label) <> id
    )
    SELECT d2.doc_id, d2.lang,
           CASE WHEN ((d2.doc_id * {_HASH_MULT}) % {_HASH_MOD}) % 10 < 8 THEN 'train'
                WHEN ((d2.doc_id * {_HASH_MULT}) % {_HASH_MOD}) % 10 = 8 THEN 'dev'
                ELSE 'test' END AS split,
           CAST(len(t.ts) AS BIGINT) AS n_tok
    FROM d2
    JOIN toks t ON t.doc_id = d2.doc_id
    WHERE d2.doc_id NOT IN (SELECT doc_id FROM drops)
    ORDER BY d2.doc_id
    """,
    tags=("pipeline", "capstone", "dedup", "quality", "split"),
)
def pp_training_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIPELINE CAPSTONE — the full prepare-training-corpus flow as ONE
    declarative plan: Gopher quality gate → exact dedup (deterministic
    min-doc_id keeper per md5(text)) → near-dup removal (the
    nd_dedup_clusters drop list: LSH candidates → exact-Jaccard verify
    → converged components) → deterministic 80/10/10 hash split. Output
    is the per-document manifest (doc_id, lang, split, n_tok) a trainer
    would consume.

    Every stage is a registered, independently-oracled operator
    (pp_gopher_filter / q25-style keeper / nd_dedup_clusters /
    pp_hash_split) — this query certifies their COMPOSITION end-to-end
    against one DuckDB oracle, the way a production pipeline actually
    runs them. Because the whole flow is one Catalyst plan (the only
    imperative step is the cluster fixpoint loop, which materializes
    its tiny label table), Catalyst shares the tokenize pass between
    the quality gate and the token counts, and the dedup drop list
    joins anti-style — broadcast-hinted only while it is measured small
    (``DROP_BROADCAST_MAX_ROWS``) — no orchestration glue, no
    intermediate tables."""
    from wikid_spark.queries.dedup import nd_dedup_clusters

    # One corpus scan carries text + tokens together, so the quality
    # gate, the md5 keeper key, and the n_tok output all come from a
    # single pass (joining _toks back to documents would scan the
    # corpus twice — verified via explain: 1 documents scan this side).
    t = table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text", tokenize("text").alias("ts")
    )
    n = F.size("ts")
    sum_len = F.aggregate(
        F.transform("ts", F.length), F.lit(0).cast("long"), lambda a, x: a + x
    )
    mean_len = sum_len / n.cast("double")
    stop_frac = (
        F.size(F.filter("ts", lambda x: x.isin("the", "a", "of", "and")))
        / n.cast("double")
    )
    keep = (n > 0) & (n >= 50) & mean_len.between(3.0, 10.0) & (stop_frac >= 0.02)
    d1 = t.filter(keep)
    w = Window.partitionBy(F.md5(F.col("text").cast("binary"))).orderBy("doc_id")
    d2 = d1.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    drops = nd_dedup_clusters(spark, sf_dir).filter(F.col("keep") == 0).select(
        "doc_id"
    )
    # Size-aware broadcast (the dup-rate dial): the drop list scales
    # with the corpus duplicate rate — candidate-bounded and tiny on a
    # curated corpus, but corpus-scale on a 30-50%-duplicate web crawl,
    # where a pinned broadcast would exceed the 8 GiB broadcast limit.
    # The list is disk-checkpointed anyway (the cluster fixpoint already
    # materialized its labels; this also stops the funnel joins from
    # re-executing inside the main plan), so counting it is free; hint
    # below the documented threshold, let AQE pick the strategy above.
    drops = _graph_materialize(drops)
    if drops.count() <= DROP_BROADCAST_MAX_ROWS:
        drops = F.broadcast(drops)
    d3 = d2.join(drops, "doc_id", "left_anti")
    h = ((F.col("doc_id") * _HASH_MULT) % _HASH_MOD) % 10
    return (
        d3.select(
            "doc_id",
            "lang",
            F.when(h < 8, "train").when(h == 8, "dev").otherwise("test").alias(
                "split"
            ),
            F.size("ts").cast("long").alias("n_tok"),
        )
        .orderBy("doc_id")
    )


TEMP_ALPHA = 0.7  # temperature exponent for language rebalancing


@query(
    "pp_lang_temperature",
    oracle=f"""
    WITH {_TOKS_CTE},
    per_lang AS (
      SELECT lang, COUNT(*) AS n_docs,
             CAST(SUM(len(ts)) AS BIGINT) AS n_tokens
      FROM toks GROUP BY lang
    ), tot AS (
      SELECT SUM(n_tokens) AS tok_total,
             SUM(POWER(n_tokens, {TEMP_ALPHA})) AS pow_total
      FROM per_lang
    )
    SELECT p.lang, p.n_docs, p.n_tokens,
           ROUND(p.n_tokens / t.tok_total, 4) AS p_raw,
           ROUND(POWER(p.n_tokens, {TEMP_ALPHA}) / t.pow_total, 4) AS p_temp,
           ROUND((POWER(p.n_tokens, {TEMP_ALPHA}) / t.pow_total)
                 / (p.n_tokens / t.tok_total), 4) AS boost
    FROM per_lang p, tot t
    ORDER BY lang
    """,
    tags=("pipeline", "sampling", "multilingual"),
)
def pp_lang_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based language rebalancing weights — the standard
    multilingual-training recipe (sample language l with probability
    ∝ n_tokens(l)^α, α < 1, so low-resource languages are upsampled;
    the published mBERT/XLM-R exponential-smoothing rule). Emits per
    language: raw token share, temperature-adjusted sampling
    probability, and the boost factor a sampler must apply.

    Scale: one map-side-combinable aggregation to |languages| rows,
    then a broadcast of the two scalar totals back onto them — the
    corpus is touched once, the arithmetic is on a handful of rows."""
    t = _toks(spark, sf_dir)
    per_lang = t.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size("ts")).alias("n_tokens"),
    )
    tot = per_lang.agg(
        F.sum("n_tokens").alias("tok_total"),
        F.sum(F.pow("n_tokens", F.lit(TEMP_ALPHA))).alias("pow_total"),
    )
    p_raw = F.col("n_tokens") / F.col("tok_total")
    p_temp = F.pow("n_tokens", F.lit(TEMP_ALPHA)) / F.col("pow_total")
    return (
        per_lang.crossJoin(F.broadcast(tot))
        .select(
            "lang",
            "n_docs",
            "n_tokens",
            F.round(p_raw, 4).alias("p_raw"),
            F.round(p_temp, 4).alias("p_temp"),
            F.round(p_temp / p_raw, 4).alias("boost"),
        )
        .orderBy("lang")
    )


CDC_WINDOW = 3  # rolling-hash window (tokens)
CDC_DIVISOR = 8  # boundary when window-hash % DIVISOR == 0 → mean chunk ≈ 8
# Horner base for combining the window's 16-bit token hashes. MUST be
# odd (coprime to the power-of-two DIVISOR): with base 2^16 every
# non-final term is ≡ 0 mod 8, so h % 8 collapsed to th[last] % 8 and
# the "window" hash depended on one token only. 65537 keeps the
# combination injective over 16-bit token hashes (base > max hash) and
# exact: 65537^3 < 2^52 < 2^63 in both engines.
CDC_BASE = 65537


@query(
    "pp_cdc_chunking",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ), th AS (
      SELECT doc_id, ws,
             list_transform(ws,
               w -> ('0x' || substr(md5(w), 1, 4))::BIGINT) AS th
      FROM toks
    ), bounds AS (
      SELECT doc_id, ws,
             CASE WHEN len(ws) >= {CDC_WINDOW + 1} THEN
               list_filter(range(2, len(ws) - 1), i ->
                 ((th[i - 1] * {CDC_BASE} + th[i]) * {CDC_BASE} + th[i + 1])
                   % {CDC_DIVISOR} = 0)
             ELSE CAST([] AS BIGINT[]) END AS bpos
      FROM th
    ), spans AS (
      SELECT doc_id, ws,
             list_concat(CAST([0] AS BIGINT[]),
                         list_transform(bpos, b -> b + 1)) AS starts,
             list_concat(bpos, [len(ws) - 1]) AS ends
      FROM bounds
    ), chunks AS (
      SELECT doc_id, k AS chunk_idx,
             md5(array_to_string(ws[st + 1 : en + 1], ' ')) AS chunk_hash,
             en - st + 1 AS n_tok
      FROM spans,
           LATERAL (SELECT unnest(range(0, len(starts))) AS k),
           LATERAL (SELECT starts[k + 1] AS st, ends[k + 1] AS en)
    )
    SELECT doc_id, chunk_idx, chunk_hash, n_tok,
           CASE WHEN ROW_NUMBER() OVER (PARTITION BY chunk_hash
                                        ORDER BY doc_id, chunk_idx) = 1
                THEN 1 ELSE 0 END AS is_first
    FROM chunks
    ORDER BY doc_id, chunk_idx
    """,
    tags=("pipeline", "chunking", "dedup"),
)
def pp_cdc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking (the LBFS/rolling-hash discipline
    storage dedup is built on): a chunk boundary falls wherever the
    hash of the trailing {CDC_WINDOW}-token window ≡ 0 mod
    {CDC_DIVISOR}, so boundaries depend only on LOCAL content — insert
    a paragraph into a long document and every chunk outside the edit
    re-aligns and re-deduplicates, where fixed-size chunking
    (pp_chunking) shifts every subsequent boundary. Output: one row
    per chunk with its hash, token count, and an is_first flag (0 ⇒
    this chunk's bytes already exist elsewhere in the corpus — the
    dedupable tail).

    The window hash is a ROLLING-STYLE polynomial over per-token
    hashes: each token is md5-reduced to 16 bits ONCE (one md5 per
    token), and a position's window hash is the Horner combination
    base {CDC_BASE} of the {CDC_WINDOW} trailing token hashes — pure
    integer arithmetic per position, replacing the previous
    md5-of-the-joined-window-string per position (window-length string
    builds + digests in an interpreted HOF lambda; measured ~2x the
    stage cost at sf10). The base is ODD on purpose: base 2^16 is ≡ 0
    mod the power-of-two divisor, which silently collapsed h % 8 to
    th[last] % 8 — the boundary depended on ONE token, not the window.
    An odd base coprime to 2^k lets every window token reach the
    tested low bits. The combination stays injective over the 16-bit
    token hashes (base > max hash) and tops out below
    2^{17 * CDC_WINDOW} < 2^63, exact in both
    engines (DuckDB errors on BIGINT overflow). Chunk identity is
    still md5 of the chunk text — per CHUNK, not per position.

    Scale: chunking is map-only per-row HOF arithmetic (no explode
    until the final per-chunk rows); the only shuffle is the
    first-occurrence window on chunk_hash — exactly the exact-dedup
    keeper shape, key space bounded by distinct content chunks."""
    assert CDC_BASE % 2 == 1, "even base degenerates mod power-of-two"
    assert 17 * CDC_WINDOW < 63  # Horner product must stay exact
    d = table(spark, sf_dir, "documents")
    th = F.transform(
        "ws",
        lambda w: F.conv(
            F.substring(F.md5(w.cast("binary")), 1, 4), 16, 10
        ).cast("long"),
    )
    t = d.select("doc_id", F.split(F.col("text"), " ").alias("ws")).select(
        "doc_id", "ws", th.alias("th")
    )
    size = F.size("ws")

    def is_boundary(i):
        # Horner over the window's token hashes: positions i-1 .. i+1
        # (1-based), the same window the string form hashed.
        h = F.lit(0).cast("long")
        for j in range(CDC_WINDOW):
            h = h * F.lit(CDC_BASE) + F.element_at("th", i - 1 + j)
        return h % CDC_DIVISOR == 0

    bpos = F.when(
        size >= CDC_WINDOW + 1,
        F.filter(F.sequence(F.lit(2), size - 2), is_boundary),
    ).otherwise(F.array().cast("array<int>"))
    spans = t.select("doc_id", "ws", bpos.alias("bpos")).select(
        "doc_id",
        "ws",
        F.concat(
            F.array(F.lit(0)), F.transform("bpos", lambda b: b + 1)
        ).alias("starts"),
        F.concat(F.col("bpos"), F.array(size - 1)).alias("ends"),
    )
    chunk = F.transform(
        F.sequence(F.lit(0), F.size("starts") - 1),
        lambda k: F.struct(
            F.md5(
                F.array_join(
                    F.slice(
                        "ws",
                        F.element_at("starts", k + 1) + 1,
                        F.element_at("ends", k + 1)
                        - F.element_at("starts", k + 1)
                        + 1,
                    ),
                    " ",
                ).cast("binary")
            ).alias("chunk_hash"),
            (
                F.element_at("ends", k + 1) - F.element_at("starts", k + 1) + 1
            ).cast("long").alias("n_tok"),
        ),
    )
    ch = spans.select(
        "doc_id", F.posexplode(chunk).alias("chunk_idx", "c")
    ).select(
        "doc_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        "c.chunk_hash",
        "c.n_tok",
    )
    w = Window.partitionBy("chunk_hash").orderBy("doc_id", "chunk_idx")
    return (
        ch.withColumn(
            "is_first",
            F.when(F.row_number().over(w) == 1, 1).otherwise(0).cast("int"),
        )
        .orderBy("doc_id", "chunk_idx")
    )


def _semantic_gate_oracle() -> str:
    from wikid_spark.queries.dedup import _sem_derived_cte

    return f"""
    WITH {_sem_derived_cte()}, pairs AS (
      SELECT b.vec_id AS vec_id
      FROM assigned a
      JOIN assigned b ON a.cent_id = b.cent_id AND a.vec_id < b.vec_id
      WHERE list_cosine_similarity(a.embedding::DOUBLE[],
                                   b.embedding::DOUBLE[]) >= 0.4
    ), dropped AS (
      SELECT DISTINCT vec_id FROM pairs
    )
    SELECT d.lang,
           COUNT(*) AS n_docs,
           COUNT(dropped.vec_id) AS n_dropped,
           COUNT(*) - COUNT(dropped.vec_id) AS n_kept,
           ROUND(CAST(COUNT(*) - COUNT(dropped.vec_id) AS DOUBLE)
                 / COUNT(*), 4) AS pct_kept
    FROM documents d
    LEFT JOIN dropped ON d.doc_id = dropped.vec_id
    GROUP BY d.lang
    ORDER BY d.lang
    """


@query(
    "pp_semantic_dedup_gate",
    oracle=_semantic_gate_oracle(),
    tags=("pipeline", "dedup", "semantic", "composition"),
)
def pp_semantic_dedup_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-table composition: gate the DOCUMENT corpus on its
    embeddings' semantic near-dup verdicts (doc_id ↔ vec_id) — the
    SemDeDup stage of a training-data pipeline as it actually deploys:
    `nd_semantic_dedup` (derived-K, top-2 cells, cosine >= 0.4) names
    the dropped vectors; their documents leave the corpus. Reported
    per language: total / dropped / kept document counts and the kept
    fraction — the dedup-rate dashboard row a curation run ships.

    Scale: composes the certified ~n^1.5 funnel unchanged (one
    groupBy(cent_id) over the 2x-assigned vectors); the gate itself is
    a broadcast-sized anti-join key set (dropped ids are a fraction of
    the dup pairs, not the corpus) and one lang-keyed aggregation."""
    from wikid_spark.queries.dedup import nd_semantic_dedup

    dropped = (
        nd_semantic_dedup(spark, sf_dir).select("vec_id").distinct()
    )
    docs = table(spark, sf_dir, "documents").select("doc_id", "lang")
    flagged = docs.join(
        dropped, docs["doc_id"] == dropped["vec_id"], "left"
    )
    return (
        flagged.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count("vec_id").alias("n_dropped"),
            (F.count(F.lit(1)) - F.count("vec_id")).alias("n_kept"),
            F.round(
                (F.count(F.lit(1)) - F.count("vec_id"))
                / F.count(F.lit(1)),
                4,
            ).alias("pct_kept"),
        )
        .orderBy("lang")
    )


def _dedup_funnel_oracle() -> str:
    from wikid_spark.queries.dedup import _sem_derived_cte

    return f"""
    WITH {_sem_derived_cte()}, pairs AS (
      SELECT b.vec_id AS vec_id
      FROM assigned a
      JOIN assigned b ON a.cent_id = b.cent_id AND a.vec_id < b.vec_id
      WHERE list_cosine_similarity(a.embedding::DOUBLE[],
                                   b.embedding::DOUBLE[]) >= 0.4
    ), sdropped AS (
      SELECT DISTINCT vec_id FROM pairs
    ), keepers AS (
      SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)
    ), c AS (
      SELECT (SELECT COUNT(*) FROM documents) AS n0,
             (SELECT COUNT(*) FROM keepers) AS n1,
             (SELECT COUNT(*) FROM keepers k
               WHERE EXISTS (SELECT 1 FROM sdropped s
                             WHERE s.vec_id = k.doc_id)) AS nsem
    )
    SELECT 'stage1_exact' AS stage, n0 AS docs_in,
           n0 - n1 AS docs_dropped, n1 AS docs_out FROM c
    UNION ALL
    SELECT 'stage2_semantic', n1, nsem, n1 - nsem FROM c
    ORDER BY stage
    """


@query(
    "pp_dedup_funnel_report",
    oracle=_dedup_funnel_oracle(),
    tags=("pipeline", "dedup", "composition", "report"),
)
def pp_dedup_funnel_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation-run funnel dashboard: documents flow through exact
    dedup (md5-of-text keeper, lowest doc_id survives) and then the
    SemDeDup gate (`nd_semantic_dedup`'s derived-K/top-2 dropped set,
    applied to the exact-stage survivors via doc_id ↔ vec_id). One
    row per stage: docs in, dropped, out — the numbers a pipeline
    operator watches per ingest.

    Scale: stage 1 is one hash-keyed groupBy; stage 2 composes the
    certified ~n^1.5 funnel; the stage arithmetic is three 1-row
    aggregates cross-joined (no driver loops, nothing corpus-scale
    leaves the executors)."""
    from wikid_spark.queries.dedup import nd_semantic_dedup

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    keepers = docs.groupBy(
        F.md5(F.col("text").cast("binary")).alias("h")
    ).agg(F.min("doc_id").alias("doc_id"))
    sem_dropped = (
        nd_semantic_dedup(spark, sf_dir).select("vec_id").distinct()
    )
    n0 = docs.agg(F.count(F.lit(1)).alias("n0"))
    n1 = keepers.agg(F.count(F.lit(1)).alias("n1"))
    nsem = (
        keepers.join(
            sem_dropped,
            keepers["doc_id"] == sem_dropped["vec_id"],
            "left_semi",
        ).agg(F.count(F.lit(1)).alias("nsem"))
    )
    c = n0.crossJoin(n1).crossJoin(nsem)
    exact_row = c.select(
        F.lit("stage1_exact").alias("stage"),
        F.col("n0").alias("docs_in"),
        (F.col("n0") - F.col("n1")).alias("docs_dropped"),
        F.col("n1").alias("docs_out"),
    )
    sem_row = c.select(
        F.lit("stage2_semantic").alias("stage"),
        F.col("n1").alias("docs_in"),
        F.col("nsem").alias("docs_dropped"),
        (F.col("n1") - F.col("nsem")).alias("docs_out"),
    )
    return exact_row.unionByName(sem_row).orderBy("stage")
