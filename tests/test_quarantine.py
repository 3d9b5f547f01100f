"""Bad-record quarantine reader (sources/quarantine.py): clean/dirty
split, partial-parse retention, mid-file header handling, and the
no-loss invariant (clean + quarantine = all data lines)."""

import os

from sfdata_wrangler_spark.sources.quarantine import (
    read_csv_with_quarantine,
)

_FIXTURE = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "fixtures", "dirty_events.csv"
)
_SCHEMA = "event_id BIGINT, user_id BIGINT, amount DOUBLE, note STRING"


def test_fixture_split(spark):
    clean, quar = read_csv_with_quarantine(spark, _FIXTURE, _SCHEMA)
    assert clean.count() == 4
    got = {r.raw_record: r for r in quar.collect()}
    assert set(got) == {
        "2,11,not_a_number,bad-amount",
        "broken line without commas",
        "6,fourteen,1.00,bad-user",
    }
    # partial parse retained: the fields that DID type survive
    r = got["2,11,not_a_number,bad-amount"]
    assert (r.event_id, r.user_id, r.amount, r.note) == (2, 11, None, "bad-amount")
    r = got["6,fourteen,1.00,bad-user"]
    assert (r.event_id, r.user_id, r.amount) == (6, None, 1.0)
    assert all(r.src_file for r in got.values())


def test_no_loss_invariant(spark):
    clean, quar = read_csv_with_quarantine(spark, _FIXTURE, _SCHEMA)
    with open(_FIXTURE) as fh:
        data_lines = sum(1 for _ in fh) - 1  # minus header
    assert clean.count() + quar.count() == data_lines


def test_midfile_header_dropped(spark, tmp_path):
    # concatenated exports repeat the header mid-file (the reference's
    # S1 situation) — those lines must vanish, not quarantine
    p = tmp_path / "concat.csv"
    p.write_text(
        "a,b\n1,2\na,b\n3,4\nbad,line,extra\n"
    )
    clean, quar = read_csv_with_quarantine(
        spark, str(p), "a BIGINT, b BIGINT"
    )
    assert sorted((r.a, r.b) for r in clean.collect()) == [(1, 2), (3, 4)]
    assert [r.raw_record for r in quar.collect()] == ["bad,line,extra"]


def test_blank_lines_skipped_not_phantom_rows(spark, tmp_path):
    p = tmp_path / "blanks.csv"
    p.write_text("a,b\n1,2\n\n3,4\n   \n")
    clean, quar = read_csv_with_quarantine(
        spark, str(p), "a BIGINT, b BIGINT"
    )
    assert sorted((r.a, r.b) for r in clean.collect()) == [(1, 2), (3, 4)]
    assert quar.count() == 0


def test_header_variants_dropped(spark, tmp_path):
    # quoted names, spaces around commas, different case — all real
    # export variants must be recognized as headers, not quarantined
    p = tmp_path / "variants.csv"
    p.write_text('"a","b"\n1,2\nA, B\n3,4\n')
    clean, quar = read_csv_with_quarantine(
        spark, str(p), "a BIGINT, b BIGINT"
    )
    assert sorted((r.a, r.b) for r in clean.collect()) == [(1, 2), (3, 4)]
    assert quar.count() == 0


def test_quoted_data_row_resembling_header_kept(spark, tmp_path):
    # '"a ","b"' carries the VALUE 'a<space>' — grammar-distinguishable
    # from the header; the old strip-everything normalization dropped it
    p = tmp_path / "lookalike.csv"
    p.write_text('a,b\n"a ","b"\n1,2\n')
    clean, quar = read_csv_with_quarantine(
        spark, str(p), "a STRING, b STRING"
    )
    got = sorted((r.a, r.b) for r in clean.collect())
    assert got == [("1", "2"), ("a ", "b")]
    assert quar.count() == 0


def test_jsonl_literal_null_line_is_quarantined(spark, tmp_path):
    """A line containing the literal JSON `null` parses to a NULL
    struct with NO corrupt column — it must be routed to quarantine,
    not leak into CLEAN as a phantom all-null row (review r6)."""
    import os

    from sfdata_wrangler_spark.sources.quarantine import (
        read_jsonl_with_quarantine,
    )

    p = os.path.join(tmp_path, "nulls.jsonl")
    with open(p, "w") as f:
        f.write('{"a": 1}\nnull\n  null\n{"a": 2}\n')
    clean, quar = read_jsonl_with_quarantine(spark, p, "a BIGINT")
    assert sorted(r.a for r in clean.collect()) == [1, 2]
    assert sorted(r.raw_record for r in quar.collect()) == ["  null", "null"]
