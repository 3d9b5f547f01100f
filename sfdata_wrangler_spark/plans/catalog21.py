"""Catalog wave 21 (round-3 restart, second batch): EWMA smoothing,
drift/outlier QC, JSONL + ORC sink round trips, entity-resolution
pipeline, ViT-style image patches.

- ``w19_ewma``: truncated dyadic-weight EWMA (operators/windows.py
  ewma_bounded) — the recursive form needs per-row state; the
  truncated form is one window pass AND bit-exact cross-engine.
- ``qc_chisq_drift`` / ``qc_mad_outliers``: distributional QC
  (operators/drift.py) — chi-square (not PSI/KL: no ln) and robust
  median/MAD fences, both hash-exact including the float columns.
- ``s14_jsonl_roundtrip`` / ``s15_orc_roundtrip``: two more sink
  formats driven end-to-end (write → read back → aggregate), oracle
  computed from the source table like s8/s9.
- ``pipe_entity_resolution``: blocked fuzzy linkage → connected
  components → golden-record rollup (iterative CC → rows-only; the
  exact check is the union-find differential test).
- ``mm_image_patches``: real-BMP decode → non-overlapping 8×8 patch
  grid with exact channel sums (multimodal/image_bmp.patchify_bmp),
  closed-form oracle like mm_image_bmp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from ..operators.drift import chisq_drift, mad_outliers
from ..operators.windows import ewma_bounded
from .catalog import _events, _register, _t
from .catalog8 import _IDS_SQL, _media_ids

# ---------------------------------------------------------------------------
# EWMA
# ---------------------------------------------------------------------------

_EWMA_TERMS_SQL = " + ".join(
    f"COALESCE(lag(value, {k}) OVER w, 0.0) / {float(2 ** (k + 1))!r}"
    for k in range(8)
)


@_register(
    "w19_ewma",
    f"""
    SELECT CAST(event_id AS BIGINT) AS event_id,
           CAST(user_id AS BIGINT) AS user_id,
           {_EWMA_TERMS_SQL} AS ewma
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def w19_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user truncated EWMA (depth 8, weights 2^-1..2^-8) over the
    event stream. Dyadic weights make every product exact in IEEE
    doubles and the fixed left-to-right term sum is the identical
    expression tree in both engines — a hash-exact float column from
    a window function."""
    ev = _events(spark, sf_dir)
    out = ewma_bounded(
        ev, ["user_id"], ["ts", "event_id"], "value", depth=8
    )
    return out.select(
        F.col("event_id").cast("bigint").alias("event_id"),
        F.col("user_id").cast("bigint").alias("user_id"),
        "ewma",
    )


# ---------------------------------------------------------------------------
# drift / outlier QC
# ---------------------------------------------------------------------------

_REF_CUT = "TIMESTAMP '2024-01-16 00:00:00'"


@_register(
    "qc_chisq_drift",
    f"""
    WITH per_cat AS (
      SELECT event_type AS category,
             CAST(sum(CASE WHEN ts < {_REF_CUT} THEN 1 ELSE 0 END) AS BIGINT)
               AS n_ref,
             CAST(sum(CASE WHEN ts < {_REF_CUT} THEN 0 ELSE 1 END) AS BIGINT)
               AS n_cur
      FROM events GROUP BY 1
    ),
    tot AS (
      SELECT CAST(sum(n_ref) AS BIGINT) AS t_ref,
             CAST(sum(n_cur) AS BIGINT) AS t_cur
      FROM per_cat
    ),
    j AS (
      SELECT category, n_ref, n_cur,
             (CAST(n_ref + n_cur AS DOUBLE) * CAST(t_ref AS DOUBLE))
               / CAST(t_ref + t_cur AS DOUBLE) AS exp_ref,
             (CAST(n_ref + n_cur AS DOUBLE) * CAST(t_cur AS DOUBLE))
               / CAST(t_ref + t_cur AS DOUBLE) AS exp_cur
      FROM per_cat CROSS JOIN tot
    )
    SELECT category, n_ref, n_cur, exp_ref, exp_cur,
           (CAST(n_ref AS DOUBLE) - exp_ref) * (CAST(n_ref AS DOUBLE) - exp_ref)
             / exp_ref
           + (CAST(n_cur AS DOUBLE) - exp_cur) * (CAST(n_cur AS DOUBLE) - exp_cur)
             / exp_cur AS chisq_term
    FROM j
    """,
)
def qc_chisq_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-category chi-square drift contributions between the first
    half of January (reference cohort) and the rest of the stream
    (operators/drift.py). Chi-square instead of PSI/KL keeps the
    whole statistic inside IEEE basic ops (no ln), and emitting terms
    per category (not summed) keeps the floats order-independent —
    both are what make this hash-exact."""
    ev = _events(spark, sf_dir)
    return chisq_drift(
        ev,
        "event_type",
        F.col("ts") < F.lit("2024-01-16 00:00:00").cast("timestamp"),
    )


@_register(
    "qc_mad_outliers",
    """
    WITH med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS med
      FROM events GROUP BY 1
    ),
    wd AS (
      SELECT e.event_type, e.value, m.med, abs(e.value - m.med) AS absdev
      FROM events e JOIN med m USING (event_type)
    ),
    stats AS (
      SELECT event_type, med, quantile_cont(absdev, 0.5) AS mad,
             CAST(count(*) AS BIGINT) AS n_rows
      FROM wd GROUP BY 1, 2
    ),
    outl AS (
      SELECT w.event_type, CAST(count(*) AS BIGINT) AS n_outliers
      FROM wd w JOIN stats s USING (event_type)
      WHERE w.absdev > 3.0 * s.mad
      GROUP BY 1
    )
    SELECT s.event_type, s.med, s.mad, s.n_rows,
           CAST(COALESCE(o.n_outliers, 0) AS BIGINT) AS n_outliers
    FROM stats s LEFT JOIN outl o USING (event_type)
    """,
)
def qc_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-group outlier census: median / MAD / count outside
    the ``|x - med| > 3*MAD`` fence (operators/drift.py). Exact
    ``percentile`` ≡ DuckDB ``quantile_cont`` bit-for-bit (the
    prof_quantiles parity), and the fence is pure comparison — so
    even the float median/MAD columns hash-match."""
    ev = _events(spark, sf_dir)
    return mad_outliers(ev, "event_type", "value", k=3.0)


# ---------------------------------------------------------------------------
# sink round trips: JSONL and ORC
# ---------------------------------------------------------------------------


def _tmp_sink(sf_dir: str, leaf: str) -> str:
    import os
    import tempfile

    return os.path.join(
        tempfile.gettempdir(),
        leaf,
        os.path.basename(os.path.normpath(sf_dir)),
    )


@_register(
    "s14_jsonl_roundtrip",
    """
    SELECT CAST(n_nationkey AS BIGINT) AS nationkey,
           n_name AS name,
           CAST(n_regionkey AS BIGINT) AS regionkey
    FROM nation
    """,
)
def s14_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines sink round trip: nation → ``df.write.json`` →
    explicit-schema ``spark.read.json`` (schema pinned: inference
    would widen ints and is a scan of its own) → identity projection.
    The oracle reads the SOURCE table, so the JSONL encode/decode
    cycle is value-checked end to end. Ints and strings only —
    doubles through JSON text are a lossy detour by design, which is
    why the lake path (s8) stays parquet."""
    nation = _t(spark, sf_dir, "nation")
    path = _tmp_sink(sf_dir, "sfdata_jsonl_roundtrip")
    nation.write.mode("overwrite").json(path)
    schema = StructType(
        [
            StructField("n_nationkey", IntegerType()),
            StructField("n_name", StringType()),
            StructField("n_regionkey", IntegerType()),
        ]
    )
    back = spark.read.schema(schema).json(path)
    return back.select(
        F.col("n_nationkey").cast("bigint").alias("nationkey"),
        F.col("n_name").alias("name"),
        F.col("n_regionkey").cast("bigint").alias("regionkey"),
    )


@_register(
    "s15_orc_roundtrip",
    """
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST((floor((sum(CAST(floor(o_totalprice * 10000 + 0.5) AS BIGINT))
                        + 50) / 100.0) / 100.0) AS DOUBLE) AS revenue
    FROM orders GROUP BY 1
    """,
)
def s15_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC sink round trip (Spark's second columnar format): orders →
    ``write.orc`` → read back → priority rollup, oracle from the
    source table. Exercises the full ORC encode/decode including
    timestamp and double columns."""
    orders = _t(spark, sf_dir, "orders")
    path = _tmp_sink(sf_dir, "sfdata_orc_roundtrip")
    orders.write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    tt = F.floor(F.col("o_totalprice") * 10000 + 0.5).cast("long")
    return back.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        (F.floor((F.sum(tt) + 50) / 100.0) / 100.0).alias("revenue"),
    )


# ---------------------------------------------------------------------------
# entity resolution
# ---------------------------------------------------------------------------


_ER_ORACLE = """
WITH RECURSIVE names AS (
  SELECT DISTINCT trim(regexp_replace(lower(p_name), '\\s+', ' ', 'g'))
           AS name
  FROM part
),
blocked AS (
  SELECT name, string_split(name, ' ')[-1] AS block FROM names
),
ok AS (
  SELECT b.name, b.block FROM blocked b
  SEMI JOIN (SELECT block FROM blocked GROUP BY block
             HAVING count(*) <= 10000) s USING (block)
),
pairs AS (
  SELECT a.name AS name_a, b.name AS name_b
  FROM ok a JOIN ok b ON a.block = b.block AND a.name < b.name
  WHERE levenshtein(a.name, b.name) <= 2
),
edges AS (
  SELECT name_a AS src, name_b AS dst FROM pairs
  UNION
  SELECT name_b AS src, name_a AS dst FROM pairs
),
reach(node, label) AS (
  SELECT src AS node, src AS label FROM edges
  UNION
  SELECT e.src, r.label FROM edges e JOIN reach r ON e.dst = r.node
),
labels AS (
  SELECT node, min(label) AS cluster_id FROM reach GROUP BY node
)
SELECT cluster_id AS canonical_name,
       CAST(count(*) AS BIGINT) AS n_members
FROM labels GROUP BY cluster_id
"""


@_register("pipe_entity_resolution", _ER_ORACLE)
def pipe_entity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end entity resolution: blocked fuzzy linkage over part
    names (operators/linkage.py) → connected components
    (operators/dedup.cluster_duplicates — min-label propagation works
    unchanged on string ids) → golden-record rollup (canonical name =
    cluster label, member count). HASH-EXACT: converged min-label
    labels are a pure function of the pair graph (min string per
    component), which the oracle's recursive transitive-closure CTE
    states declaratively; tests/test_drift_er.py's union-find
    differential double-checks the Spark side."""
    from ..operators.dedup import cluster_duplicates
    from ..operators.linkage import blocked_fuzzy_pairs

    part = _t(spark, sf_dir, "part")
    pairs = blocked_fuzzy_pairs(part, "p_name", max_distance=2)
    clusters = cluster_duplicates(pairs, "name_a", "name_b")
    return (
        clusters.groupBy(F.col("cluster_id").alias("canonical_name"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_members"))
        .orderBy(F.col("n_members").desc(), F.col("canonical_name"))
    )


# ---------------------------------------------------------------------------
# image patches
# ---------------------------------------------------------------------------


@_register(
    "mm_image_patches",
    f"""
    WITH {_IDS_SQL},
    pixels AS (
      SELECT m, w, h, x, unnest(range(0, h)) AS y
      FROM (SELECT m, w, h, unnest(range(0, w)) AS x FROM dims)
    ),
    grid AS (
      SELECT m, x // 8 AS gx, y // 8 AS gy, x, y
      FROM pixels
      WHERE x < (w // 8) * 8 AND y < (h // 8) * 8
    )
    SELECT m AS media_id,
           CAST(gy AS BIGINT) AS py,
           CAST(gx AS BIGINT) AS px,
           CAST(sum((m * 3 + x * 7 + y * 11) % 256) AS BIGINT) AS sum_r,
           CAST(sum((m * 5 + x * 13 + y * 17) % 256) AS BIGINT) AS sum_g,
           CAST(sum((m * 7 + x * 19 + y * 23) % 256) AS BIGINT) AS sum_b
    FROM grid GROUP BY m, gy, gx
    """,
)
def mm_image_patches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ViT-style patch extraction through the REAL BMP codec: decode
    genuine bytes, crop to the 8×8-multiple, emit one row per patch
    with exact per-channel sums (multimodal/image_bmp.patchify_bmp).
    The oracle replays the grid arithmetic from the closed-form pixel
    formula — hash-exact per patch."""
    from ..multimodal.image_bmp import patchify_bmp, synth_bmp_corpus

    blobs = synth_bmp_corpus(_media_ids(spark, sf_dir))
    return patchify_bmp(blobs, patch=8)
