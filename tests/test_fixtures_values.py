"""values_df builds tiny fixtures as pure-JVM LocalRelations —
verify literal rendering (escaping, temporals, None), dict rows, and
that the plan really is a LocalRelation (no RDD/Python scan)."""

import datetime

import pytest

from sfdata_wrangler_spark.sources.inline import values_df


def test_values_df_types_and_escaping(spark):
    rows = [
        ("it's", 1, 0.5, datetime.date(2013, 3, 4),
         datetime.datetime(2013, 3, 4, 8, 0, 0, 250000), True),
        ("back\\slash", None, None, None, None, False),
    ]
    df = values_df(
        spark,
        "s: string, n: bigint, x: double, d: date, t: timestamp, b: boolean",
        rows,
    )
    assert [f.dataType.simpleString() for f in df.schema.fields] == [
        "string", "bigint", "double", "date", "timestamp", "boolean",
    ]
    got = [tuple(r) for r in df.collect()]
    assert got == rows


def test_values_df_dict_rows(spark):
    df = values_df(
        spark,
        "b: bigint, a: string",
        [{"a": "x", "b": 1}, {"a": "y", "b": 2}],
    )
    assert df.columns == ["b", "a"]
    assert [tuple(r) for r in df.sort("b").collect()] == [(1, "x"), (2, "y")]


def test_values_df_array_columns(spark):
    rows = [(0, [1.0, 2.5, -3.0]), (1, [0.0, 1e-05, 4.0])]
    df = values_df(spark, "centroid_id: int, centroid: array<double>", rows)
    assert df.schema["centroid"].dataType.simpleString() == "array<double>"
    got = [(r[0], list(r[1])) for r in df.sort("centroid_id").collect()]
    assert got == [(0, [1.0, 2.5, -3.0]), (1, [0.0, 1e-05, 4.0])]


def test_values_df_is_local_relation(spark):
    df = values_df(spark, "a: bigint", [(1,), (2,)])
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "LocalRelation" in plan


def test_values_df_rejects_ragged_rows(spark):
    with pytest.raises(ValueError):
        values_df(spark, "a: bigint, b: bigint", [(1,)])
    with pytest.raises(ValueError):
        values_df(spark, "a: bigint", [])
