"""Outlink extraction and resolution (extract/links.py)."""

from itext2kg_spark.extract.links import extract_links

PAGE = (
    '<html><body>'
    '<a href="https://other.example.org/x">abs</a>'
    "<a href='//cdn.example.net/lib.js'>proto-rel</a>"
    '<a href="/root/path">root-rel</a>'
    '<a href="sibling.html">rel</a>'
    '<a href="sub/dir/page">rel-deep</a>'
    '<a href="javascript:void(0)">pseudo</a>'
    '<a href="mailto:a@b.c">mail</a>'
    '<a href="/frag#section">frag</a>'
    '<A HREF="UPPER.html">case</A>'
    '</body></html>'
).encode()


def _pages(spark, base_url):
    return spark.createDataFrame([(base_url, PAGE)], "url string, html binary")


def test_extract_and_resolve(spark):
    rows = (
        extract_links(_pages(spark, "http://host.example.com/a/b/page.html"))
        .orderBy("link_pos")
        .collect()
    )
    got = [(r["href"], r["target"]) for r in rows]
    assert got == [
        ("https://other.example.org/x", "https://other.example.org/x"),
        ("//cdn.example.net/lib.js", "http://cdn.example.net/lib.js"),
        ("/root/path", "http://host.example.com/root/path"),
        ("sibling.html", "http://host.example.com/a/b/sibling.html"),
        ("sub/dir/page", "http://host.example.com/a/b/sub/dir/page"),
        ("/frag", "http://host.example.com/frag"),  # fragment never extracts
        ("UPPER.html", "http://host.example.com/a/b/UPPER.html"),
    ]
    # pseudo-links dropped, positions keep document order (gaps where
    # pseudo-links sat are fine — posexplode runs before the filter)
    poss = [r["link_pos"] for r in rows]
    assert poss == sorted(poss)


def test_pathless_base_and_query_base(spark):
    rows = {
        r["href"]: r["target"]
        for r in extract_links(_pages(spark, "https://bare.example.com")).collect()
    }
    assert rows["sibling.html"] == "https://bare.example.com/sibling.html"
    rows_q = {
        r["href"]: r["target"]
        for r in extract_links(
            _pages(spark, "https://h.example.com/dir/p?q=1")
        ).collect()
    }
    # query string never leaks into the resolved directory
    assert rows_q["sibling.html"] == "https://h.example.com/dir/sibling.html"


def test_links_plan_stays_jvm(spark):
    plan = (
        extract_links(_pages(spark, "http://h/p"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "EvalPython" not in plan
    assert "Exchange" not in plan
    assert "Generate" in plan


def test_anchor_text_extraction(spark):
    from itext2kg_spark.extract.links import extract_anchor_texts

    html = (
        '<html><body>'
        '<a href="https://x.example.org/a">Plain text</a>'
        '<a href="/b">with <b>bold</b> inside</a>'
        '<a href="c.html">ents &amp; stuff</a>'
        '<a href="mailto:z@y">mail</a>'
        '<a href="/multi">line\none</a>'
        '</body></html>'
    ).encode()
    pages = spark.createDataFrame(
        [("http://h.example.com/d/p.html", html)], "url string, html binary"
    )
    rows = extract_anchor_texts(pages).orderBy("link_pos").collect()
    got = [(r["href"], r["target"], r["anchor"]) for r in rows]
    assert got == [
        ("https://x.example.org/a", "https://x.example.org/a", "Plain text"),
        ("/b", "http://h.example.com/b", "with bold inside"),
        ("c.html", "http://h.example.com/d/c.html", "ents & stuff"),
        ("/multi", "http://h.example.com/multi", "line\none"),
    ]
