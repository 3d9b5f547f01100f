"""Bad-record quarantine for CSV ingest (S3's robustness half).

The reference survives dirty inputs by embedded guards — mid-file
headers read as NA rows and dropped (``SFMuniDataHelper.py:443``),
misalignment fences like ``RDBRDNGS<1000`` (``:446-448``). The
engine's equivalent routes unparseable rows to a side table instead
of killing the job or silently dropping them (DROPMALFORMED's
failure mode — at 100 TB a silent drop is unauditable).

Shape: ``spark.read.text`` + ``from_csv`` in PERMISSIVE mode. The
line IS a column, so the raw text of a bad record is retained for
free, and the quarantine split is a plain filter — deliberately NOT
the ``spark.read.csv`` + ``_corrupt_record`` route, which forbids any
query whose referenced columns prune down to the corrupt column alone
(UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN fires on as
little as ``clean.count()``). One scan; both outputs are lazy
projections of it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

CORRUPT_COL = "_corrupt_record"


def _read_lines(spark: SparkSession, path: str) -> DataFrame:
    """Text scan with provenance; blank lines are not records (a
    PERMISSIVE parser would type them as all-NULL rows with a NULL
    corrupt column, leaking phantom rows into CLEAN — spark.read.csv
    also skips blank lines)."""
    lines = spark.read.text(path).select(
        F.col("value").alias("__raw"),
        F.input_file_name().alias("__src"),
    )
    return lines.where(F.length(F.trim("__raw")) > 0)


def _split_on_parse(lines: DataFrame, parse_expr, fields):
    """The shared split rule: a record is QUARANTINED when the
    corrupt column is set OR when the parse produced a NULL struct —
    the latter catches inputs the parser accepts as a top-level JSON
    ``null`` (no BadRecordException, so no corrupt column), which
    would otherwise leak into CLEAN as phantom all-null rows."""
    parsed = lines.select("__raw", "__src", parse_expr.alias("__p"))
    bad = F.col(f"__p.{CORRUPT_COL}").isNotNull() | F.col("__p").isNull()
    clean = parsed.where(~bad).select(
        *[F.col(f"__p.{c}").alias(c) for c in fields]
    )
    quarantine = parsed.where(bad).select(
        *[F.col(f"__p.{c}").alias(c) for c in fields],
        F.col("__raw").alias("raw_record"),
        F.col("__src").alias("src_file"),
    )
    return clean, quarantine


def read_csv_with_quarantine(
    spark: SparkSession,
    path: str,
    schema: str,
    header: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """One text scan → (clean, quarantine).

    ``schema`` is the DDL of the GOOD columns. Clean rows parsed
    fully; quarantine rows carry whatever typed fields DID parse
    (PERMISSIVE nulls only the malformed ones — the repair starting
    point), plus ``raw_record`` and ``src_file``. Blank lines are
    skipped (they are not records — matching ``spark.read.csv``).
    With ``header``, lines matching a closed set of header shapes
    (bare / fully-quoted names, optional space after commas,
    case-insensitive) are dropped wherever they appear — which also
    quarantine-proofs the mid-file header blocks of concatenated
    exports (the reference's S1 case); only a data row byte-identical
    to one of those shapes is ambiguous, and that ambiguity is
    inherent to line-level CSV.
    """
    fields = [f.name for f in StructType.fromDDL(schema).fields]
    full_schema = f"{schema}, {CORRUPT_COL} STRING"

    lines = _read_lines(spark, path)
    if header:
        # drop lines matching a CLOSED set of header shapes: the bare
        # names, fully-quoted names, and spaces after commas — each
        # compared case-insensitively. An enumerated set (not a
        # strip-everything normalization) so a quoted DATA row whose
        # field values merely resemble the names (e.g. '"a ","b"',
        # value 'a<space>') is grammar-distinguishable and KEPT; only
        # a row byte-identical to one of these shapes is ambiguous,
        # and that ambiguity is inherent to line-level CSV.
        lf = [f.lower() for f in fields]
        variants = [
            ",".join(lf),
            ",".join(f'"{f}"' for f in lf),
            ", ".join(lf),
            ", ".join(f'"{f}"' for f in lf),
        ]
        lines = lines.where(~F.lower(F.col("__raw")).isin(variants))
    return _split_on_parse(
        lines,
        F.from_csv(
            F.col("__raw"),
            full_schema,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
        ),
        fields,
    )


def read_jsonl_with_quarantine(
    spark: SparkSession,
    path: str,
    schema: str,
) -> tuple[DataFrame, DataFrame]:
    """One text scan → (clean, quarantine) for JSON-lines ingest —
    the web-crawl sibling of :func:`read_csv_with_quarantine` (JSONL
    is the lingua franca of training-data interchange, and at 100 TB
    a malformed line must be ROUTED, not silently dropped).

    ``spark.read.text`` + PERMISSIVE ``from_json``; the split rule is
    identical to the CSV path (shared helper). JSON-specific
    semantics (pinned by the s18 oracle): a MISSING field is null and
    CLEAN (absence is legal JSON); a type-mismatched field
    quarantines the record WITH its partial parse (the repair
    starting point); truncated documents, non-JSON lines, top-level
    arrays, and a literal top-level ``null`` (which from_json accepts
    as a NULL struct, setting no corrupt column) all quarantine
    all-null. Blank lines are skipped (not records)."""
    fields = [f.name for f in StructType.fromDDL(schema).fields]
    full_schema = f"{schema}, {CORRUPT_COL} STRING"

    return _split_on_parse(
        _read_lines(spark, path),
        F.from_json(
            F.col("__raw"),
            full_schema,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
        ),
        fields,
    )
