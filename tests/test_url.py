"""URL/domain operators: host regex contract, eTLD+1 rollup, stats, filters."""

import pyspark.sql.functions as F

from itext2kg_spark.functions.url import (
    domain_stats,
    filter_domains,
    host_col,
    registrable_domain_col,
)

CASES = [
    ("https://www.example.com/a/b?q=1", "www.example.com", "example.com"),
    ("HTTP://Example.COM:8080/x", "example.com", "example.com"),
    ("https://user:pw@news.bbc.co.uk/story#frag", "news.bbc.co.uk", "bbc.co.uk"),
    ("ftp://files.example.org", "files.example.org", "example.org"),
    ("https://localhost/path", "localhost", "localhost"),
    ("git+ssh://host.co.jp", "host.co.jp", "host.co.jp"),  # 2 labels: kept
    ("https://a.b.site.com.au/", "a.b.site.com.au", "site.com.au"),
    ("notaurl", "", ""),
    ("/relative/path", "", ""),
]


def test_host_and_registrable_domain(spark):
    df = spark.createDataFrame(
        [(u,) for u, _, _ in CASES], "url string"
    ).select(
        "url",
        host_col(F.col("url")).alias("host"),
        registrable_domain_col(host_col(F.col("url"))).alias("dom"),
    )
    got = {r["url"]: (r["host"], r["dom"]) for r in df.collect()}
    for url, host, dom in CASES:
        assert got[url] == (host, dom), url


def test_domain_stats_counts_and_share(spark):
    rows = [
        (f"https://h{i % 2}.hot.example.com/p/{i}", "x" * (i + 1))
        for i in range(8)
    ] + [("https://only.example.org/p", "yy")] + [
        ("https://news.bbc.co.uk/s", "zzz")
    ]
    pages = spark.createDataFrame(rows, "url string, text string")
    out = {r["domain"]: r for r in domain_stats(pages).collect()}
    assert out["example.com"]["n_pages"] == 8
    assert out["example.com"]["n_hosts"] == 2  # h0.hot... and h1.hot...
    assert out["example.com"]["n_chars"] == sum(i + 1 for i in range(8))
    assert out["example.com"]["share_10k"] == 8000
    assert out["example.org"]["n_pages"] == 1
    assert out["bbc.co.uk"]["share_10k"] == 1000


def test_filter_domains_block_and_allow(spark):
    pages = spark.createDataFrame(
        [
            ("https://spam.example.com/1", 1),
            ("https://a.good.org/2", 2),
            ("https://b.good.org/3", 3),
            ("https://other.net/4", 4),
        ],
        "url string, doc_id long",
    )
    blocked = filter_domains(pages, blocklist=["example.com"])
    assert sorted(r["doc_id"] for r in blocked.collect()) == [2, 3, 4]
    allowed = filter_domains(
        pages, blocklist=["example.com"], allowlist=["good.org"]
    )
    assert sorted(r["doc_id"] for r in allowed.collect()) == [2, 3]
    # schema passes through untouched
    assert allowed.columns == ["url", "doc_id"]


def test_filter_domains_plan_broadcasts_lists(spark):
    pages = spark.createDataFrame(
        [("https://x.example.com/1", 1)], "url string, doc_id long"
    )
    plan = (
        filter_domains(pages, blocklist=["example.com"], allowlist=["y.org"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "EvalPython" not in plan
