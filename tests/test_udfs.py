"""Pandas-UDF surface tests."""

from pyspark.sql import functions as F

from pgferry_spark.functions.udfs import normalize_unicode, shannon_entropy


def test_normalize_unicode_strips_accents(spark):
    df = spark.createDataFrame([("Café au lait",), ("naïve ﬁle",), (None,)], "s: string")
    got = [r["o"] for r in df.select(normalize_unicode("s").alias("o")).collect()]
    assert got[0] == "Cafe au lait"
    assert got[1] == "naive file"  # ligature expanded by NFKC, diaeresis stripped
    assert got[2] is None


def test_shannon_entropy_orders_quality(spark):
    df = spark.createDataFrame([("aaaaaaaa",), ("abcdefgh",), ("",)], "s: string")
    got = [r["o"] for r in df.select(shannon_entropy("s").alias("o")).collect()]
    assert got[0] == 0.0          # single repeated char: zero entropy
    assert abs(got[1] - 3.0) < 1e-9   # 8 distinct chars: log2(8)
    assert got[2] == 0.0
