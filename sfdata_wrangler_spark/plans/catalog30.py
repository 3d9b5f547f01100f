"""Catalog wave 30 (round 4): perceptual-hash image near-duplicate
detection — the multimodal twin of the text SimHash path.

aHash (average hash) over REAL decoded BMP pixels: tiny edits that
defeat exact checksum dedup (re-encode, brightness jitter) flip few
hash bits, so image near-dup matching is Hamming search — and the
engine already has the scale machinery for that
(operators/dedup.simhash_hamming_pairs, pigeonhole-blocked, never
O(n²)). The corpus plants jittered clones with a closed pixel form,
so both the hashes AND the matched pairs are hash-checked against a
DuckDB replay of the integer sampling/threshold arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import _events, _register

_CELLS_SQL = """
    ids AS (
      SELECT CAST(event_id AS BIGINT) AS m FROM events WHERE event_id < 100
    ),
    base AS (
      SELECT m, CASE WHEN m >= 60 THEN m - 60 ELSE m END AS mb,
             CASE WHEN m >= 60 THEN 1 ELSE 0 END AS ad
      FROM ids
    ),
    dims AS (
      SELECT m, mb, ad, 24 + (mb % 9) * 4 AS w, 18 + (mb % 7) * 4 AS h
      FROM base
    ),
    gxy AS (
      SELECT m, mb, ad, w, h, gx, unnest(range(0, 8)) AS gy
      FROM (SELECT m, mb, ad, w, h, unnest(range(0, 8)) AS gx FROM dims)
    ),
    cells AS (
      SELECT m, gy * 8 + gx AS i,
             ((mb*3 + ((gx*w)//8)*7 + ((gy*h)//8)*11 + ad) % 256)
           + ((mb*5 + ((gx*w)//8)*13 + ((gy*h)//8)*17 + ad) % 256)
           + ((mb*7 + ((gx*w)//8)*19 + ((gy*h)//8)*23 + ad) % 256) AS cell
      FROM gxy
    ),
    tot AS (SELECT m, sum(cell) AS total FROM cells GROUP BY m),
    bits AS (
      SELECT c.m, c.i,
             CASE WHEN 64 * c.cell > t.total THEN 1 ELSE 0 END AS b
      FROM cells c JOIN tot t ON c.m = t.m
    )
"""


def _phashes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..multimodal.image_bmp import phash_bmp, synth_bmp_corpus_jittered

    ids = (
        _events(spark, sf_dir)
        .where(F.col("event_id") < 100)
        .select(F.col("event_id").cast("bigint").alias("media_id"))
    )
    return phash_bmp(synth_bmp_corpus_jittered(ids, clone_from=60))


@_register(
    "mm_image_phash",
    f"""
    WITH {_CELLS_SQL}
    SELECT CAST(m AS BIGINT) AS media_id,
           CAST(sum(CASE WHEN b = 1 THEN
                 CASE WHEN i < 63 THEN (CAST(1 AS BIGINT) << i)
                      ELSE CAST(-9223372036854775807 AS BIGINT) - 1 END
                 ELSE 0 END) AS BIGINT) AS phash
    FROM bits GROUP BY m
    """,
)
def mm_image_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual average-hash of every image (multimodal/image_bmp.
    phash_bmp): REAL BMP decode → integer 8×8 mosaic →
    brighter-than-mean bits (64·cell > Σcells, no float) → signed
    64-bit fingerprint. The oracle replays the identical sampling and
    threshold arithmetic from the closed pixel form."""
    return _phashes(spark, sf_dir)


@_register(
    "mm_image_phash_pairs",
    f"""
    WITH {_CELLS_SQL}
    SELECT CAST(a.m AS BIGINT) AS id_a, CAST(b.m AS BIGINT) AS id_b,
           CAST(sum(CASE WHEN a.b <> b.b THEN 1 ELSE 0 END) AS BIGINT)
             AS hamming
    FROM bits a JOIN bits b ON a.i = b.i AND a.m < b.m
    GROUP BY a.m, b.m
    HAVING sum(CASE WHEN a.b <> b.b THEN 1 ELSE 0 END) <= 8
    """,
)
def mm_image_phash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-duplicate pairs: the planted brightness-jittered
    clones (ids 60-99 vs 0-39) surface at small Hamming distance
    through the SAME pigeonhole-blocked machinery as text SimHash —
    no all-pairs comparison; the oracle computes ground-truth
    distances for every pair."""
    from ..operators.dedup import simhash_hamming_pairs

    ph = _phashes(spark, sf_dir)
    out = simhash_hamming_pairs(
        ph, fp_col="phash", id_col="media_id", bits=64, max_hamming=8
    )
    return out.select(
        F.col("id_a").cast("bigint").alias("id_a"),
        F.col("id_b").cast("bigint").alias("id_b"),
        F.col("hamming").cast("bigint").alias("hamming"),
    )
