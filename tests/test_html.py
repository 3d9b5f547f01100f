"""HTML → text extraction (functions/html.py): tag/script/style
stripping, entity decoding, link density, and degenerate inputs."""

from pyspark.sql import functions as F

from sfdata_wrangler_spark.functions.html import html_text_stats, strip_tags


def _extract(spark, html):
    df = spark.createDataFrame([(1, html)], ["id", "h"])
    return df.select(*html_text_stats(F.col("h"))).collect()[0]


def test_script_and_style_payloads_dropped(spark):
    r = _extract(
        spark,
        '<style>p {color: red}</style><p>keep</p>'
        '<script type="text/javascript">var x = "<b>not text</b>";</script>',
    )
    assert r.clean_text == "keep"
    assert r.n_chars == 4


def test_entities_decoded_single_level(spark):
    r = _extract(spark, "<p>&lt;a&gt; &amp;amp; &quot;q&quot;</p>")
    # &amp;amp; decodes ONE level (to '&amp;'), not recursively
    assert r.clean_text == '<a> &amp; "q"'


def test_link_density(spark):
    r = _extract(
        spark,
        '<nav><a href="/">aaaa</a></nav><p>bbbb</p>',
    )
    # anchors "aaaa" (4) over clean "aaaa bbbb" (9)
    assert abs(r.link_density - 4 / 9) < 1e-12
    r2 = _extract(spark, "<p>no links</p>")
    assert r2.link_density == 0.0


def test_empty_and_markup_only(spark):
    r = _extract(spark, "<div><br/><hr></div>")
    assert r.clean_text == "" and r.n_chars == 0
    assert r.link_density is None  # nothing to measure


def test_strip_tags_collapses_whitespace(spark):
    df = spark.createDataFrame([("a  <b> b </b>\n\n c",)], ["h"])
    out = df.select(strip_tags(F.col("h")).alias("t")).collect()[0]
    assert out.t == "a b c"


def test_multiline_script_block(spark):
    r = _extract(spark, "<p>x</p><script>\nline1\nline2\n</script><p>y</p>")
    assert r.clean_text == "x y"


def test_article_tags_not_counted_as_anchors(spark):
    # '<a[^>]*>' would treat <article> as an anchor open and count the
    # whole body as link text
    r = _extract(
        spark,
        "<article>long body text here</article><a href='/n'>next</a>",
    )
    assert r.clean_text == "long body text here next"
    # only "next" (4 chars) is anchor text
    assert abs(r.link_density - 4 / len("long body text here next")) < 1e-12


def test_anchor_markup_inside_scripts_not_counted(spark):
    r = _extract(
        spark,
        '<p>hi there</p><script>var s="<a href=x>xxxxxxxxxx</a>";</script>',
    )
    assert r.clean_text == "hi there"
    assert r.link_density == 0.0  # was 10/8 > 1 before the fix
