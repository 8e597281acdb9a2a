"""Sitemap parsing + URL canonicalization (functions/sitemap.py)."""

import pyspark.sql.functions as F

from itext2kg_spark.functions.sitemap import canonicalize_url, parse_sitemap

SITEMAP = """<?xml version="1.0"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url>
    <loc>https://a.example.com/page1</loc>
    <lastmod>2024-01-05</lastmod>
    <changefreq>daily</changefreq>
    <priority>0.8</priority>
  </url>
  <url><loc> https://a.example.com/page2 </loc></url>
  <url><lastmod>2024-01-01</lastmod></url>
</urlset>"""

INDEX = """<sitemapindex>
  <sitemap><loc>https://a.example.com/sitemap-news.xml</loc>
    <lastmod>2024-02-01</lastmod></sitemap>
</sitemapindex>"""


def test_parse_sitemap_entries_and_index(spark):
    df = spark.createDataFrame(
        [("a.example.com", SITEMAP), ("a.example.com", INDEX)],
        "host string, body string",
    )
    rows = {(r["kind"], r["loc"]): r for r in parse_sitemap(df).collect()}
    full = rows[("url", "https://a.example.com/page1")]
    assert full["lastmod"] == "2024-01-05"
    assert full["changefreq"] == "daily" and full["priority"] == "0.8"
    # whitespace-trimmed loc; loc-less entries dropped
    assert ("url", "https://a.example.com/page2") in rows
    assert len([k for k in rows if k[0] == "url"]) == 2
    idx = rows[("sitemap", "https://a.example.com/sitemap-news.xml")]
    assert idx["lastmod"] == "2024-02-01" and idx["changefreq"] == ""


def test_canonicalize_url_matrix(spark):
    cases = [
        ("HTTP://WWW.Example.COM:80/a/b", "http://www.example.com/a/b"),
        ("https://h.example.com:443/x", "https://h.example.com/x"),
        ("https://h.example.com:8443/x", "https://h.example.com:8443/x"),
        ("http://h.example.com/a//b///c", "http://h.example.com/a/b/c"),
        ("http://h.example.com", "http://h.example.com/"),
        ("http://h.example.com/p#frag", "http://h.example.com/p"),
        ("http://h.example.com/p?b=2&a=1", "http://h.example.com/p?a=1&b=2"),
        ("http://h.example.com/p?z=1", "http://h.example.com/p?z=1"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [
        r["c"]
        for r in df.select(canonicalize_url(F.col("url")).alias("c")).collect()
    ]
    assert got == [want for _, want in cases]


def test_canonicalize_is_idempotent(spark):
    urls = [
        "HTTP://A.example.Com:80//x//y?b=2&a=1#f",
        "https://b.example.com/",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    once = df.select(canonicalize_url(F.col("url")).alias("u"))
    twice = once.select(canonicalize_url(F.col("u")).alias("u"))
    assert [r["u"] for r in once.collect()] == [r["u"] for r in twice.collect()]


from hypothesis import given, settings, strategies as st

_SEG = st.text(alphabet="abcXYZ09-._~", min_size=1, max_size=6)
_URLS = st.builds(
    lambda scheme, host, port, segs, q, frag: (
        scheme + "://" + host + port + "/" + "/".join(segs)
        + ("?" + "&".join(q) if q else "") + ("#" + frag if frag else "")
    ),
    st.sampled_from(["http", "HTTP", "https", "HtTpS"]),
    st.builds(lambda a, b: f"{a}.{b}.example.com",
              st.sampled_from(["w", "W", "site", "SITE"]), _SEG),
    st.sampled_from(["", ":80", ":443", ":8080"]),
    st.lists(_SEG, min_size=0, max_size=3),
    st.lists(st.builds(lambda k, v: f"{k}={v}", _SEG, _SEG), max_size=3),
    st.sampled_from(["", "sec", "x"]),
)


@settings(max_examples=5, deadline=None)
@given(st.lists(_URLS, min_size=1, max_size=25))
def test_canonicalize_idempotent_property(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    once = [
        r["c"]
        for r in df.select(canonicalize_url(F.col("url")).alias("c")).collect()
    ]
    df2 = spark.createDataFrame([(u,) for u in once], "url string")
    twice = [
        r["c"]
        for r in df2.select(canonicalize_url(F.col("url")).alias("c")).collect()
    ]
    assert once == twice
    # canonical forms keep lowercase scheme+host and carry no fragment
    for c in once:
        assert "#" not in c
        assert c.split("://")[0].islower()
