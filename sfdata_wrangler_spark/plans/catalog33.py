"""Catalog wave 33 (round 5): the viz-sink color ramp as a declared
query — the last SURVEY §2 surface (S11) whose semantics rested on
pytest only (VERDICT r4 "What's missing" #2).

The ramp math mirrors the reference's ``getLinkTTRatioColor``
(``Visualizer.py:73-107``): half-unit buckets on the travel-time
ratio, clamped to the ramp ends, with exactly-1.0 meaning "no
observations" → gray. The oracle restates the bucket walk as a SQL
CASE generated FROM the same ``TT_RATIO_RAMP`` table the sink uses,
so the two can't drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.viz_svg import NO_OBS_COLOR, TT_RATIO_RAMP, tt_ratio_color
from .catalog import _register, _t


def _ramp_case_sql(ratio: str, bucket: str) -> str:
    lo, hi = TT_RATIO_RAMP[0][0], TT_RATIO_RAMP[-1][0]
    clamped = f"least(greatest({bucket}, {lo}), {hi})"
    arms = "\n".join(
        f"WHEN {clamped} <= {edge} THEN '{color}'"
        for edge, color in TT_RATIO_RAMP[:-1]
    )
    return f"""CASE WHEN {ratio} = 1.0 THEN '{NO_OBS_COLOR}'
    {arms}
    ELSE '{TT_RATIO_RAMP[-1][1]}' END"""


_RAMP_ORACLE = f"""
WITH r AS (
  SELECT l_quantity / 10.0 AS ratio FROM lineitem
)
SELECT {_ramp_case_sql("ratio", "floor(ratio * 2.0) / 2.0")} AS color,
       CAST(count(*) AS BIGINT) AS n_links,
       CAST(floor(min(ratio) * 100 + 0.5) AS BIGINT) AS min_ratio_c,
       CAST(floor(max(ratio) * 100 + 0.5) AS BIGINT) AS max_ratio_c
FROM r GROUP BY 1
"""


@_register("s11_viz_ramp", _RAMP_ORACLE)
def s11_viz_ramp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S11 viz sink ramp (sources/viz_svg.tt_ratio_color, mirror of
    reference Visualizer.py:73-107): l_quantity/10 plays the
    travel-time ratio (0.1..5.0, hitting both ramp ends, the clamp,
    and the exact-1.0 gray path at quantity=10); per assigned color,
    the link count and the ratio range in integer cents. The color
    assignment is the exact column expression the SVG sink runs
    pre-collect — cluster-side, shuffle-free until the final
    11-group rollup."""
    li = _t(spark, sf_dir, "lineitem")
    ratio = F.col("l_quantity") / 10.0
    return (
        li.select(ratio.alias("ratio"), tt_ratio_color(ratio).alias("color"))
        .groupBy("color")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_links"),
            F.floor(F.min("ratio") * 100 + 0.5).cast("bigint").alias("min_ratio_c"),
            F.floor(F.max("ratio") * 100 + 0.5).cast("bigint").alias("max_ratio_c"),
        )
    )
