"""Catalog wave 23 (round-3 restart, fourth batch): exact near-dup
pair search and operational QC diagnostics.

- ``dd_simhash_hamming``: Hamming-ball SimHash pairs via pigeonhole
  blocking (operators/dedup.simhash_hamming_pairs) — the lossless
  complement to banded MinHash LSH: no recall loss, still an
  equi-join (Manku-style web dedup).
- ``dd_prefix_jaccard``: EXACT Jaccard-threshold similarity join via
  prefix filtering (operators/dedup.prefix_filter_pairs) — the
  no-false-negative alternative where LSH's probabilistic recall is
  unacceptable (e.g. eval-set decontamination audits).
- ``qc_skew_report``: per-group key-concentration diagnosis
  (operators/skew.skew_report) — max key count and the EXACT Σcnt²
  self-join size, the number to check before any key-keyed join at
  100 TB.
- ``qc_seasonal_anomaly``: hour-of-week baseline volume anomalies
  (operators/drift.seasonal_anomaly), all-integer cross-multiplied
  thresholds.
- ``qc_winsorize_bounds``: per-group exact percentile fences + clamp
  counts (operators/drift.winsorize_bounds) — quantile_cont parity.

Reference parity: these extend the QC-filter family (SURVEY §2.2
P2-P4, TransitReporter's monthly sanity panels) with the
distribution-level checks a 100 TB feed needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import prefix_filter_pairs, simhash_hamming_pairs
from ..operators.drift import seasonal_anomaly, winsorize_bounds
from ..operators.skew import skew_report
from .catalog import QUERIES, _events, _register, _t
from .catalog_text import _SHINGLES, _simhash16_sql

# 16-bit fingerprint, Hamming <= 2 -> 3 pigeonhole blocks of widths
# 6/5/5 at offsets 0/6/11 (mirrors simhash_hamming_pairs' layout for
# bits=16, max_hamming=2).
_HAM_BLOCKS_SQL = "\n      UNION ALL ".join(
    f"SELECT doc_id, simhash16 AS fp, {i} AS blk, "
    f"(simhash16 >> {off}) & {(1 << w) - 1} AS val FROM fps"
    for i, (off, w) in enumerate([(0, 6), (6, 5), (11, 5)])
)


@_register(
    "dd_simhash_hamming",
    f"""
    WITH fps AS ({_simhash16_sql()}),
    blocks AS (
      {_HAM_BLOCKS_SQL}
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
             a.fp AS fp_a, b.fp AS fp_b
      FROM blocks a
      JOIN blocks b
        ON a.blk = b.blk AND a.val = b.val AND a.doc_id < b.doc_id
    )
    SELECT CAST(id_a AS BIGINT) AS id_a,
           CAST(id_b AS BIGINT) AS id_b,
           CAST(bit_count(xor(fp_a, fp_b)) AS BIGINT) AS hamming
    FROM cand
    WHERE bit_count(xor(fp_a, fp_b)) <= 2
    """,
)
def dd_simhash_hamming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs at SimHash Hamming distance ≤ 2 WITHOUT an
    all-pairs scan: split the fingerprint into 3 blocks; distance-≤2
    pairs must agree exactly on ≥ 1 block (pigeonhole), so a
    (block, value) equi-join is a lossless candidate generator; one
    bit_count(XOR) verifies each candidate. Runs on the 16-bit
    md5-vote fingerprint (dd_simhash_md5's oracle-reproducible twin
    of the production 64-bit xxhash64 simhash)."""
    fps = QUERIES["dd_simhash_md5"]["fn"](spark, sf_dir)
    return simhash_hamming_pairs(
        fps, fp_col="simhash16", id_col="doc_id", bits=16, max_hamming=2
    )


@_register(
    "dd_prefix_jaccard",
    f"""
    WITH sh AS (
      SELECT doc_id AS id, unnest(list_distinct({_SHINGLES})) AS sh
      FROM documents
    ),
    freq AS (SELECT sh, count(*) AS df FROM sh GROUP BY sh),
    ranked AS (
      SELECT s.id, s.sh,
             row_number() OVER (
               PARTITION BY s.id ORDER BY f.df, s.sh
             ) AS pos,
             count(*) OVER (PARTITION BY s.id) AS n
      FROM sh s JOIN freq f USING (sh)
    ),
    prefix AS (
      SELECT id, sh FROM ranked
      WHERE pos <= n - ((50 * n + 99) // 100) + 1
    ),
    cand AS (
      SELECT DISTINCT a.id AS id_a, b.id AS id_b
      FROM prefix a JOIN prefix b ON a.sh = b.sh AND a.id < b.id
    ),
    sizes AS (SELECT id, CAST(count(*) AS BIGINT) AS n FROM sh GROUP BY id),
    inter AS (
      SELECT c.id_a, c.id_b, CAST(count(*) AS BIGINT) AS inter
      FROM cand c
      JOIN sh sa ON sa.id = c.id_a
      JOIN sh sb ON sb.id = c.id_b AND sa.sh = sb.sh
      GROUP BY c.id_a, c.id_b
    )
    SELECT CAST(i.id_a AS BIGINT) AS id_a,
           CAST(i.id_b AS BIGINT) AS id_b,
           i.inter,
           na.n + nb.n - i.inter AS union_sz
    FROM inter i
    JOIN sizes na ON na.id = i.id_a
    JOIN sizes nb ON nb.id = i.id_b
    WHERE i.inter * 100 >= 50 * (na.n + nb.n - i.inter)
    """,
)
def dd_prefix_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT Jaccard ≥ 0.5 similarity self-join with prefix
    filtering: rank each doc's shingles rarest-first (global df
    order); J(A,B) ≥ t pairs MUST share a shingle in their
    |X| - ceil(t|X|) + 1 prefixes, so the candidate equi-join probes
    only the shortest posting lists; exact intersection counts
    verify. Integer threshold math throughout — no recall loss, no
    IEEE boundaries (operators/dedup.prefix_filter_pairs)."""
    docs = _t(spark, sf_dir, "documents")
    return prefix_filter_pairs(
        docs, text_col="text", id_col="doc_id", shingle_n=3, threshold_pct=50
    )


@_register(
    "qc_skew_report",
    """
    WITH per_key AS (
      SELECT event_type, user_id, count(*) AS cnt
      FROM events GROUP BY event_type, user_id
    )
    SELECT event_type,
           CAST(sum(cnt) AS BIGINT) AS n_rows,
           CAST(count(*) AS BIGINT) AS n_keys,
           CAST(max(cnt) AS BIGINT) AS max_key_rows,
           CAST(sum(cnt * cnt) AS BIGINT) AS self_join_rows
    FROM per_key GROUP BY event_type
    """,
)
def qc_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-skew diagnosis for the user_id key per event_type:
    hottest-key row count (the straggler lower bound for any hash
    shuffle on the key) and the EXACT Σcnt² self-join output size —
    the pre-flight number for any user-keyed self-join
    (operators/skew.skew_report). Two map-side-combinable
    aggregations; group-sized output."""
    ev = _events(spark, sf_dir)
    return skew_report(ev, key_col="user_id", group_cols=("event_type",))


@_register(
    "qc_seasonal_anomaly",
    """
    WITH bucket AS (
      SELECT event_type, strftime(CAST(ts AS DATE), '%Y-%m-%d') AS date,
             CAST(dayofweek(ts) + 1 AS BIGINT) AS dow,
             CAST(hour(ts) AS BIGINT) AS hour,
             CAST(count(*) AS BIGINT) AS cnt
      FROM events GROUP BY 1, 2, 3, 4
    ),
    baseline AS (
      SELECT event_type, dow, hour,
             CAST(sum(cnt) AS BIGINT) AS slot_total,
             CAST(count(*) AS BIGINT) AS n_slot_days
      FROM bucket GROUP BY 1, 2, 3
    )
    SELECT b.event_type, b.date, b.dow, b.hour, b.cnt,
           s.slot_total, s.n_slot_days,
           b.cnt * s.n_slot_days * 100 > 150 * s.slot_total AS is_anomaly
    FROM bucket b
    JOIN baseline s
      ON b.event_type = s.event_type AND b.dow = s.dow
     AND b.hour = s.hour
    """,
)
def qc_seasonal_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-week seasonal baseline anomaly flags: a (day, hour)
    bucket is anomalous when its count exceeds 150% of the all-period
    mean for that (dow, hour) slot — tested by integer
    cross-multiplication, never float division
    (operators/drift.seasonal_anomaly). The baseline dim is
    168·|event_types| rows: broadcast at any scale."""
    ev = _events(spark, sf_dir)
    out = seasonal_anomaly(
        ev, ts_col="ts", group_col="event_type", factor_pct=150
    )
    return out.select(
        "event_type",
        F.date_format(F.col("date"), "yyyy-MM-dd").alias("date"),
        F.col("dow").cast("bigint").alias("dow"),
        F.col("hour").cast("bigint").alias("hour"),
        "cnt",
        "slot_total",
        "n_slot_days",
        "is_anomaly",
    )


@_register(
    "qc_winsorize_bounds",
    """
    WITH fences AS (
      SELECT event_type,
             quantile_cont(value, 0.05) AS p_lo,
             quantile_cont(value, 0.95) AS p_hi,
             CAST(count(*) AS BIGINT) AS n_rows
      FROM events GROUP BY event_type
    )
    SELECT e.event_type, f.p_lo, f.p_hi, f.n_rows,
           CAST(sum(CASE WHEN e.value < f.p_lo THEN 1 ELSE 0 END)
                AS BIGINT) AS n_below,
           CAST(sum(CASE WHEN e.value > f.p_hi THEN 1 ELSE 0 END)
                AS BIGINT) AS n_above
    FROM events e JOIN fences f USING (event_type)
    GROUP BY 1, 2, 3, 4
    """,
)
def qc_winsorize_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorization audit per event_type: exact p05/p95 fences
    (Spark ``percentile`` ≡ DuckDB ``quantile_cont`` bitwise — the
    prof_quantiles parity) plus how many rows each fence would
    clamp; pure comparisons after a broadcast of the group-sized
    fence dim (operators/drift.winsorize_bounds)."""
    ev = _events(spark, sf_dir)
    return winsorize_bounds(
        ev, group_col="event_type", value_col="value", lo=0.05, hi=0.95
    )
