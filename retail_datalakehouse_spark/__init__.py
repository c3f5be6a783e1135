"""retail_datalakehouse_spark — a PySpark-native analytics engine.

Re-expresses the capability surface of ``sayyam2002/retail-datalakehouse``
(an AWS S3/Glue medallion lakehouse over a retail star schema; reference at
``/root/reference``) as an idiomatic Spark engine: partitioned ingest,
medallion raw→bronze→silver→gold refinement with MERGE/upsert, the full
relational operator set, Structured Streaming equivalents of the daily-file
arrival pattern, and LLM-data-pipeline extensions (dedup, similarity search,
text analysis, multimodal plumbing) — all designed for 100 TB scale.

Package layout:

- ``session``     — tuned SparkSession builder (AQE, broadcast, Arrow).
- ``catalog``     — testdata table loading / temp-view registration.
- ``schemas``     — explicit StructTypes (reference retail star + testdata).
- ``sources``     — CSV/Parquet/JSON readers & writers (SURVEY §2.1).
- ``operators``   — joins, aggregates, windows, set ops, merge, dedup,
                    similarity, text ops (SURVEY §2.3–§2.6, §2.10).
- ``functions``   — scalar function helpers (SURVEY §2.7).
- ``plans``       — the medallion pipeline (raw→bronze→silver→gold).
- ``streaming``   — Structured Streaming jobs (SURVEY §2.8).
- ``queries``     — the driver-facing query registry: every implemented
                    operator exposed as (spark, sf_dir) -> DataFrame with a
                    DuckDB oracle SQL string where expressible.
"""

__version__ = "0.1.0"
