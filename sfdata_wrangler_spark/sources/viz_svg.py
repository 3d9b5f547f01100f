"""Map/trajectory visualization sink (SURVEY.md S11, ref
``Visualizer.py:139-473``), bokeh-free.

The reference renders two bokeh HTML plots: taxi trajectory
multi-lines (``plotTrajectories``, :308-412) and a network speed map
colored by travel-time ratio (``createNetworkPlot``, :414-473). The
Spark-first split: everything data-shaped — the link frame, the
travel-time-ratio color ramp, trajectory widths — is computed with
column expressions on the cluster; only the final dim-sized link/
trajectory list (a network is a dimension, not a fact) is collected
and rendered to a standalone SVG with stdlib string building. No
bokeh, no matplotlib — the file opens in any browser.

Color/width semantics mirror the reference (``getLinkTTRatioColor``
:73-107: half-unit buckets on the ratio, exact-1.0 = no-observation
gray; ``getLinkTrajectoryColor/Width`` :109-129).
"""

from __future__ import annotations

from xml.sax.saxutils import quoteattr

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: travel-time-ratio color ramp (half-unit buckets, ref :80-90)
TT_RATIO_RAMP = [
    (0.00, "green"),
    (0.50, "green"),
    (1.00, "beige"),
    (1.50, "#fdd49e"),
    (2.00, "#fdbb84"),
    (2.50, "#fc8d59"),
    (3.00, "#ef6548"),
    (3.50, "#d7301f"),
    (4.00, "#b30000"),
    (4.50, "#7f0000"),
]
NO_OBS_COLOR = "#DCDCDC"


def tt_ratio_color(ratio: Column) -> Column:
    """Column expression for the reference's color ramp: floor the
    ratio to half-units, clamp to the ramp ends; exactly 1.0 means "no
    observations" and renders gray. JVM-side (runs on the cluster,
    pre-collect)."""
    bucket = F.floor(ratio * 2.0) / 2.0
    lo, hi = TT_RATIO_RAMP[0][0], TT_RATIO_RAMP[-1][0]
    bucket = F.least(F.greatest(bucket, F.lit(lo)), F.lit(hi))
    expr = F.lit(TT_RATIO_RAMP[-1][1])
    for edge, color in reversed(TT_RATIO_RAMP[:-1]):
        expr = F.when(bucket <= edge, F.lit(color)).otherwise(expr)
    return F.when(ratio == 1.0, F.lit(NO_OBS_COLOR)).otherwise(expr)


def trajectory_style(travel_time: Column) -> tuple[Column, Column]:
    """(color, width) columns: valid travel time → FireBrick/6,
    missing → Gray/2 (ref :109-129)."""
    ok = travel_time.isNotNull() & ~F.isnan(travel_time)
    return (
        F.when(ok, F.lit("FireBrick")).otherwise(F.lit("Gray")),
        F.when(ok, F.lit(6)).otherwise(F.lit(2)),
    )


def render_multiline_svg(
    lines: list[dict],
    width: int = 900,
    height: int = 800,
    title: str = "",
    pad: float = 0.02,
) -> str:
    """[{xs: [..], ys: [..], color, width}] → standalone SVG text.
    Coordinates are auto-fitted to the viewport (y flipped — SVG y
    grows downward, map y grows upward)."""
    all_x = [x for ln in lines for x in ln["xs"]]
    all_y = [y for ln in lines for y in ln["ys"]]
    if not all_x:
        return (
            f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" '
            f'height="{height}"/>'
        )
    x0, x1 = min(all_x), max(all_x)
    y0, y1 = min(all_y), max(all_y)
    sx = (x1 - x0) or 1.0
    sy = (y1 - y0) or 1.0
    px, py = pad * width, pad * height
    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" '
        f'height="{height}">',
    ]
    if title:
        parts.append(
            f'<title>{title}</title><text x="10" y="20" '
            f'font-size="14">{title}</text>'
        )
    for ln in lines:
        pts = " ".join(
            f"{px + (x - x0) / sx * (width - 2 * px):.2f},"
            f"{height - py - (y - y0) / sy * (height - 2 * py):.2f}"
            for x, y in zip(ln["xs"], ln["ys"])
        )
        parts.append(
            f'<polyline points="{pts}" fill="none" '
            f"stroke={quoteattr(str(ln.get('color', 'black')))} "
            f'stroke-width="{ln.get("width", 1)}"/>'
        )
    parts.append("</svg>")
    return "\n".join(parts)


def network_speed_svg(
    links: DataFrame,
    path: str,
    ratio_col: str = "tt_ratio",
    title: str = "Network speeds",
) -> int:
    """Link dim (x0, y0, x1, y1, tt_ratio) → colored speed-map SVG
    (the reference's createNetworkPlot). Color assignment runs in
    Spark; only the styled dim is collected. Returns link count."""
    styled = links.select(
        "x0", "y0", "x1", "y1",
        tt_ratio_color(F.col(ratio_col)).alias("color"),
    ).collect()
    lines = [
        {"xs": [r.x0, r.x1], "ys": [r.y0, r.y1], "color": r.color, "width": 3}
        for r in styled
    ]
    with open(path, "w") as f:
        f.write(render_multiline_svg(lines, title=title))
    return len(lines)


def trajectory_svg(
    traj: DataFrame,
    path: str,
    xs_col: str = "xs",
    ys_col: str = "ys",
    tt_col: str = "travel_time",
    title: str = "Taxi trajectories",
) -> int:
    """Trajectory frame (xs: array, ys: array, travel_time) → SVG
    (the reference's plotTrajectories): valid-time links draw heavy
    FireBrick, unobserved draw light gray."""
    color, width = trajectory_style(F.col(tt_col))
    styled = traj.select(
        F.col(xs_col).alias("xs"),
        F.col(ys_col).alias("ys"),
        color.alias("color"),
        width.alias("width"),
    ).collect()
    lines = [r.asDict() for r in styled]
    with open(path, "w") as f:
        f.write(render_multiline_svg(lines, title=title))
    return len(lines)
