"""UDF-surface unit tests (SURVEY §2.9), incl. a real Python UDTF (U5)."""

from __future__ import annotations

import pandas as pd

from pyspark.sql import functions as F


def test_python_udtf_registration(spark):
    """Spark 4 native @udtf: one row in, N token rows out."""
    from pyspark.sql.functions import lit, udtf

    @udtf(returnType="word: string, pos: int")
    class Tokenize:
        def eval(self, text: str):
            for i, w in enumerate((text or "").split()):
                if w:
                    yield (w, i)

    rows = Tokenize(lit("spark is fast")).collect()
    assert [(r.word, r.pos) for r in rows] == [("spark", 0), ("is", 1), ("fast", 2)]


def test_pandas_udf_matches_builtin(spark, sf_dir):
    """U2: vectorized pandas arithmetic is bit-identical to column expr."""
    from retail_datalakehouse_spark.catalog import load_table

    @F.pandas_udf("double")
    def charged(p: pd.Series, d: pd.Series) -> pd.Series:
        return p * (1.0 - d)

    l = load_table(spark, sf_dir, "lineitem").limit(500)
    both = l.select(
        charged("l_extendedprice", "l_discount").alias("u"),
        (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).alias("b"),
    )
    assert both.filter(F.col("u") != F.col("b")).count() == 0


def test_arrow_grouped_map_matches_window_rank(spark, sf_dir):
    from retail_datalakehouse_spark.queries.udfs import u8_arrow_grouped_map
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    got = u8_arrow_grouped_map(spark, sf_dir)
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    want = o.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("orderkey"),
        F.row_number().over(w).cast("long").alias("spend_rank"),
    )
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0
