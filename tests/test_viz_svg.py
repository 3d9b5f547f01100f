"""S11 visualization sink: SVG render of network speed map and
trajectories, color ramp mirrored from the reference semantics."""

from xml.etree import ElementTree as ET

from pyspark.sql import Row
from pyspark.sql import functions as F


def test_tt_ratio_color_ramp(spark):
    from sfdata_wrangler_spark.sources.viz_svg import tt_ratio_color

    df = spark.createDataFrame(
        [Row(r=0.3), Row(r=1.0), Row(r=1.2), Row(r=2.6), Row(r=9.0)]
    )
    got = {
        r.r: r.c
        for r in df.select("r", tt_ratio_color(F.col("r")).alias("c")).collect()
    }
    assert got[0.3] == "green"        # clamped low
    assert got[1.0] == "#DCDCDC"      # exactly 1 = no observations
    assert got[1.2] == "beige"        # floor(2.4)/2 = 1.0 bucket
    assert got[2.6] == "#fc8d59"      # floor(5.2)/2 = 2.5 bucket
    assert got[9.0] == "#7f0000"      # clamped high


def test_network_speed_svg_roundtrip(spark, tmp_path):
    from sfdata_wrangler_spark.sources.viz_svg import network_speed_svg

    links = spark.createDataFrame(
        [
            Row(x0=0.0, y0=0.0, x1=100.0, y1=0.0, tt_ratio=0.8),
            Row(x0=100.0, y0=0.0, x1=100.0, y1=50.0, tt_ratio=1.0),
            Row(x0=100.0, y0=50.0, x1=0.0, y1=50.0, tt_ratio=3.7),
        ]
    )
    path = str(tmp_path / "net.svg")
    n = network_speed_svg(links, path)
    assert n == 3
    root = ET.parse(path).getroot()
    polys = [el for el in root.iter() if el.tag.endswith("polyline")]
    assert len(polys) == 3
    colors = {p.get("stroke") for p in polys}
    assert colors == {"green", "#DCDCDC", "#d7301f"}
    # every point is inside the viewport
    for p in polys:
        for pt in p.get("points").split():
            x, y = map(float, pt.split(","))
            assert 0 <= x <= 900 and 0 <= y <= 800


def test_trajectory_svg(spark, tmp_path):
    from sfdata_wrangler_spark.sources.viz_svg import trajectory_svg

    traj = spark.createDataFrame(
        [
            Row(xs=[0.0, 10.0, 20.0], ys=[0.0, 5.0, 0.0], travel_time=12.5),
            Row(xs=[0.0, 20.0], ys=[10.0, 10.0], travel_time=None),
        ],
        "xs array<double>, ys array<double>, travel_time double",
    )
    path = str(tmp_path / "traj.svg")
    assert trajectory_svg(traj, path) == 2
    svg = open(path).read()
    assert 'stroke="FireBrick" stroke-width="6"' in svg
    assert 'stroke="Gray" stroke-width="2"' in svg
