"""catlas_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of ``ulissigroup/catlas`` (reference studied
read-only at /root/reference; see SURVEY.md), rebuilt from scratch on
idiomatic Spark.

Layout
------
- ``session``    : SparkSession factory tuned for local + cluster use
- ``schemas``    : explicit StructType schemas for every logical table
- ``sources``    : scans (parquet star schema, fixture generators)
- ``operators``  : relational + domain operators (filters, grouped top-k,
                   group-EXISTS soft delete, dedup, similarity, multimodal)
- ``functions``  : column-level function libraries (text, vector)
- ``plans``      : YAML config ("query") validation + compilation to a
                   DataFrame pipeline
- ``streaming``  : Structured Streaming surface over the events table
- ``memo``       : persistent memo-table (incremental recompute across runs)
- ``lineage``    : observe()-based per-stage row accounting (Sankey)
"""

__version__ = "0.1.0"
