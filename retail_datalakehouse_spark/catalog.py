"""Table catalog over the driver testdata and engine warehouses.

The reference catalogs tables by running Glue crawlers over S3 prefixes and
registering them in ``retail_lakehouse_db`` (``glue_infra.py:71-79,85-120``).
In Spark the same capability is: read parquet/CSV with (inferred or explicit)
schema, register as temp views / saveAsTable, enumerate via
``spark.catalog.listTables`` — no polling barrier needed because inference is
in-process (SURVEY §3.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: Driver testdata tables (TESTDATA.md) — one parquet file each.
TESTDATA_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def table_path(sf_dir: str, name: str) -> str:
    return f"{sf_dir}/{name}.parquet"


def normalize_ntz(df: DataFrame) -> DataFrame:
    """Cast every top-level TIMESTAMP_NTZ column to TIMESTAMP.

    Testdata parquet stores timestamps without a timezone annotation
    (isAdjustedToUTC=false), which Spark 4 reads as TIMESTAMP_NTZ by default
    (``spark.sql.parquet.inferTimestampNTZ.enabled=true``). Event-time
    operators (``withWatermark``, ``unix_micros``) require TIMESTAMP; with
    the session timezone pinned to UTC the cast preserves the wall-clock
    instant, so values and DuckDB oracle hashes are unchanged.
    """
    from pyspark.sql.types import TimestampNTZType

    for field in df.schema.fields:
        if isinstance(field.dataType, TimestampNTZType):
            df = df.withColumn(field.name, F.col(field.name).cast("timestamp"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Columnar scan (SURVEY §2.1 S4): predicate pushdown + column pruning
    come free from the parquet source once filters/selects are applied.

    ``events.ts`` has shipped as parquet TIMESTAMP(NANOS) (read as long via
    ``nanosAsLong`` + converted) and as TIMESTAMP(MICROS, ntz) (read as
    TIMESTAMP_NTZ); both are normalized to a microsecond TimestampType here
    so downstream event-time operators see one type in every environment.
    """
    # Runtime-set so the contract also works on a caller-built session (the
    # driver constructs its own SparkSession without our builder): UTC keeps
    # hour/day extraction aligned with DuckDB's naive timestamps, and the
    # nanos conf lets Spark read events.ts (parquet TIMESTAMP(NANOS)).
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return normalize_ntz(df)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TESTDATA_TABLES}


def register_views(
    spark: SparkSession, sf_dir: str, tables: "tuple[str, ...] | None" = None
) -> dict[str, DataFrame]:
    """Register every testdata table as a temp view (SURVEY §2.1 S5).

    Mirrors the crawler's register-then-list flow (``glue_infra.py:146-153``)
    without the 15 s polling loop: registration is synchronous in-process.

    ``tables`` restricts registration to the named subset — loading and
    registering all ten tables costs ~0.5 s of driver time per call
    (r14 guide §7.3), which single-table SQL queries need not pay.
    """
    if tables is not None:
        dfs = {name: load_table(spark, sf_dir, name) for name in tables}
    else:
        dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs


def list_tables(spark: SparkSession, db: str | None = None) -> list[str]:
    """Catalog enumeration — analogue of ``glue_infra.py:146-153``."""
    return [t.name for t in spark.catalog.listTables(db) if t is not None]
