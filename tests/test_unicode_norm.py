"""Unicode normalization (functions/unicode_norm.py): composition,
compatibility folding, audit predicate, and null safety — verified
against stdlib unicodedata ground truth."""

import unicodedata

from pyspark.sql import Row
from pyspark.sql import functions as F

from sfdata_wrangler_spark.functions.unicode_norm import (
    is_nfc,
    nfc,
    nfkc,
    unicode_normalize,
)

# decomposed e+acute, fullwidth A, ligature fi, Hangul jamo, NBSP
_SAMPLES = [
    "cafe" + chr(0x301),
    chr(0xFF21) + "BC",
    chr(0xFB01) + "nish",
    chr(0x1100) + chr(0x1161) + chr(0x11A8),
    "plain ascii",
    "a" + chr(0xA0) + "b",
]


def _df(spark):
    rows = [Row(i=i, s=s) for i, s in enumerate(_SAMPLES)] + [
        Row(i=len(_SAMPLES), s=None)
    ]
    return spark.createDataFrame(rows)


def test_nfc_and_nfkc_match_unicodedata(spark):
    out = _df(spark).select(
        "i", nfc(F.col("s")).alias("c"), nfkc(F.col("s")).alias("kc")
    ).collect()
    for r in out:
        s = _SAMPLES[r["i"]] if r["i"] < len(_SAMPLES) else None
        if s is None:
            assert r["c"] is None and r["kc"] is None
        else:
            assert r["c"] == unicodedata.normalize("NFC", s)
            assert r["kc"] == unicodedata.normalize("NFKC", s)
    # NFKC actually folds: fullwidth A becomes A, ligature fi -> fi
    by_i = {r["i"]: r for r in out}
    assert by_i[1]["kc"] == "ABC"
    assert by_i[2]["kc"] == "finish"
    # NFC composes the decomposed acute (one char shorter)
    assert len(by_i[0]["c"]) == len(_SAMPLES[0]) - 1


def test_is_nfc_audit_flag(spark):
    rows = {r["i"]: r["f"] for r in _df(spark).select(
        "i", is_nfc(F.col("s")).alias("f")
    ).collect()}
    assert rows[0] is False       # decomposed acute
    assert rows[3] is False       # conjoining jamo
    assert rows[4] is True        # ascii
    assert rows[len(_SAMPLES)] is None  # null passes through


def test_nfd_roundtrip(spark):
    d = _df(spark).where(F.col("s").isNotNull()).select(
        "i", unicode_normalize(F.col("s"), "NFD").alias("d")
    )
    back = d.select("i", nfc(F.col("d")).alias("c")).collect()
    for r in back:
        s = _SAMPLES[r["i"]]
        assert r["c"] == unicodedata.normalize("NFC", s)
