"""wikid_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of explosion/wikid, re-expressed Spark-first.

The reference (read-only at /root/reference/) is a single-threaded Python
ETL pipeline over Wikimedia dumps backed by SQLite; this package provides
the same operator surface — scans, filters, projections, joins,
aggregations, upsert-as-aggregation, text kernels, entity-profile and
alias-prior queries — as declarative Spark DataFrame / SQL programs, plus
the large-scale training-data-pipeline extensions (dedup, similarity
search, text analysis, streaming) that the 100 TB target demands.

Layout:
    session    — SparkSession factory tuned for the target scale
    catalog    — table registry over the parquet test data
    registry   — query registry powering __spark_entry__ and tests
    queries/   — every declared query (SURVEY.md §2.1) + extensions
    functions/ — reusable column expressions (text kernels, vectors)
    operators/ — composite operators (as-of join, minhash-lsh, sessionize)
    sources/   — wiki dump readers (typed schemas, page assembly)
    streaming/ — structured-streaming surface with batch twins
"""

__version__ = "0.1.0"
