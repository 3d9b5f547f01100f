"""Crosstab margins + text column functions."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from sfdata_wrangler_spark.functions.text import (
    lang_id,
    normalize_text,
    token_count,
    word_shingles,
)
from sfdata_wrangler_spark.operators.crosstab import crosstab_with_margins


def test_crosstab_margins(spark):
    df = spark.createDataFrame(
        [
            Row(r="x", c="c1", v=1.0),
            Row(r="x", c="c2", v=2.0),
            Row(r="y", c="c1", v=3.0),
        ]
    )
    out = crosstab_with_margins(df, "r", "c", "v", ["c1", "c2"])
    got = {row.r: (row.c1, row.c2, row.Total) for row in out.collect()}
    assert got["x"] == (1.0, 2.0, 3.0)
    assert got["y"] == (3.0, 0.0, 3.0)  # empty cell is 0, not null
    assert got["Total"] == (4.0, 2.0, 6.0)


def test_normalize_and_tokens(spark):
    df = spark.createDataFrame(
        [Row(t="  Hello   WORLD  "), Row(t=""), Row(t="one")]
    )
    out = df.select(
        normalize_text(F.col("t")).alias("n"),
        token_count(F.col("t")).alias("c"),
    ).collect()
    assert (out[0].n, out[0].c) == ("hello world", 2)
    assert (out[1].n, out[1].c) == ("", 0)
    assert (out[2].n, out[2].c) == ("one", 1)


def test_word_shingles(spark):
    df = spark.createDataFrame([Row(t="a b c d"), Row(t="a b")])
    out = df.select(word_shingles(F.col("t"), 3).alias("s")).collect()
    assert out[0].s == ["a b c", "b c d"]
    assert out[1].s == []  # fewer tokens than n → empty, not error


def test_lang_id(spark):
    df = spark.createDataFrame(
        [
            Row(t="the cat and the dog of the house"),
            Row(t="le chat et la maison et le chien"),
            Row(t="der hund und die katze und der garten"),
            Row(t="xyzzy plugh"),
        ]
    )
    out = [r.l for r in df.select(lang_id(F.col("t")).alias("l")).collect()]
    assert out == ["en", "fr", "de", "und"]
