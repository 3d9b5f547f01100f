"""k-anonymity / l-diversity preflight (operators/privacy.py): exact
class math on hand-built microdata, including the homogeneity attack
case k-anonymity alone cannot see."""

from pyspark.sql import functions as F

from sfdata_wrangler_spark.operators.privacy import (
    equivalence_classes,
    k_anonymity_report,
)

# (zip, age_band, diagnosis): class A has 3 rows / 2 diagnoses, class
# B has 2 rows with ONE diagnosis (l-diverse failure: an attacker who
# links (94110, 30s) learns the diagnosis), class C is a singleton.
ROWS = [
    ("94103", "20s", "flu"),
    ("94103", "20s", "flu"),
    ("94103", "20s", "cold"),
    ("94110", "30s", "asthma"),
    ("94110", "30s", "asthma"),
    ("94601", "40s", "flu"),
]


def _df(spark):
    return spark.createDataFrame(ROWS, ["zip", "age_band", "diagnosis"])


def test_equivalence_classes_exact(spark):
    out = {
        (r["zip"], r["age_band"]): (r["n_rows"], r["n_sensitive"])
        for r in equivalence_classes(
            _df(spark), ["zip", "age_band"], sensitive_col="diagnosis"
        ).collect()
    }
    assert out == {
        ("94103", "20s"): (3, 2),
        ("94110", "30s"): (2, 1),
        ("94601", "40s"): (1, 1),
    }


def test_equivalence_classes_without_sensitive(spark):
    cols = equivalence_classes(_df(spark), ["zip"]).columns
    assert cols == ["zip", "n_rows"]  # no n_sensitive column


def test_k_anonymity_report_thresholds(spark):
    r = k_anonymity_report(
        _df(spark), ["zip", "age_band"], k=3, sensitive_col="diagnosis", l=2
    ).collect()[0]
    assert r["n_classes"] == 3
    assert r["n_rows"] == 6
    assert r["min_class_size"] == 1
    assert r["n_classes_below_k"] == 2  # the 2-row and 1-row classes
    assert r["n_rows_below_k"] == 3
    # the homogeneity attack: two classes carry only one diagnosis
    assert r["min_l"] == 1
    assert r["n_classes_below_l"] == 2


def test_k_anonymous_dataset_reports_clean(spark):
    # suppress the quasi-identifiers down to zip-only: every class
    # then has >= 1 rows; with k=1 nothing violates
    r = k_anonymity_report(_df(spark), ["zip"], k=1).collect()[0]
    assert r["n_classes_below_k"] == 0
    assert r["n_rows_below_k"] == 0
    assert "min_l" not in r.asDict()


def test_report_is_single_row_and_bigint(spark):
    rep = k_anonymity_report(
        _df(spark), ["zip"], k=2, sensitive_col="diagnosis", l=2
    )
    assert rep.count() == 1
    assert all(t == "bigint" for _, t in rep.dtypes)


def test_null_quasi_values_form_their_own_class(spark):
    df = _df(spark).withColumn(
        "zip", F.when(F.col("age_band") == "40s", None).otherwise(F.col("zip"))
    )
    out = equivalence_classes(df, ["zip", "age_band"])
    # groupBy keeps the NULL key as one class (SQL grouping semantics):
    # suppressed quasi-identifiers still participate in the audit
    assert out.where(F.col("zip").isNull()).collect()[0]["n_rows"] == 1
