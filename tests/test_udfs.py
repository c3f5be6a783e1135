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
