from pyspark.sql import functions as F

from pgferry_spark.functions import text as T


def vals(spark, expr, rows, schema="s: string"):
    df = spark.createDataFrame(rows, schema)
    return [r["o"] for r in df.select(expr.alias("o")).collect()]


def test_token_count(spark):
    got = vals(spark, T.token_count(F.col("s")), [("a b  c",), ("",), ("  ",), ("one",)])
    assert got == [3, 0, 0, 1]


def test_avg_token_len(spark):
    got = vals(spark, T.avg_token_len(F.col("s")), [("ab cd",), ("",)])
    assert got == [2.0, None]


def test_punct_ratio(spark):
    got = vals(spark, F.round(T.punct_ratio(F.col("s")), 2), [("a.b!",), ("abcd",)])
    assert got == [0.5, 0.0]


def test_lang_id(spark):
    rows = [
        ("the cat and the dog is in a tree for fun",),
        ("der hund ist nicht auf das und der die",),
        ("le chat est dans la maison pour le chien",),
        ("xyzzy qwerty plugh",),
    ]
    got = vals(spark, T.lang_id(F.col("s")), rows)
    assert got == ["en", "de", "fr", "und"]


def test_fingerprint_normalizes_case_ws(spark):
    got = vals(
        spark,
        T.fingerprint(F.col("s")),
        [("Hello  World",), ("hello world",), ("different",)],
    )
    assert got[0] == got[1] != got[2]


def test_quality_score_bounds(spark):
    got = vals(spark, T.quality_score(F.col("s")), [("word " * 120,), ("!!!.,;;;",)])
    assert 0.9 <= got[0] <= 1.0
    assert got[1] <= 0.4
