"""HTML head-metadata extraction (extract/meta.py)."""

from itext2kg_spark.extract.meta import html_meta

PAGE = (
    "<html><head>\n"
    "<title>The <b>Big</b> Page &amp; More</title>\n"
    '<meta name="description" content="A fine page">\n'
    "<meta content='index, NoIndex , follow' name='robots'>\n"
    '<link rel="canonical" href="https://c.example.com/real#frag">\n'
    "</head><body>x</body></html>"
).encode()

BARE = b"<html><head></head><body>no meta</body></html>"


def test_meta_extraction(spark):
    pages = spark.createDataFrame(
        [("u1", PAGE), ("u2", BARE)], "url string, html binary"
    )
    got = {r["url"]: r for r in html_meta(pages).collect()}
    m = got["u1"]
    assert m["title"] == "The Big Page & More"  # inner markup stripped
    assert m["description"] == "A fine page"
    assert m["canonical"] == "https://c.example.com/real"  # fragment cut
    assert m["robots_meta"] == "index, noindex , follow"
    assert m["noindex"] is True  # token match despite spacing/case
    b = got["u2"]
    assert b["title"] == "" and b["description"] == ""
    assert b["noindex"] is False


def test_noindex_token_not_substring(spark):
    html = b'<html><head><meta name="robots" content="noindexing"></head></html>'
    pages = spark.createDataFrame([("u", html)], "url string, html binary")
    assert html_meta(pages).collect()[0]["noindex"] is False


def test_meta_plan_stays_jvm(spark):
    pages = spark.createDataFrame([("u", PAGE)], "url string, html binary")
    plan = html_meta(pages)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan and "Exchange" not in plan
