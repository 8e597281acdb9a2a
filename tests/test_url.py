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


# ---------------------------------------------------------------------------
# Full public-suffix-list algorithm (VERDICT r5 ask #7)
# ---------------------------------------------------------------------------

# snapshot fixture in the public .dat format: comments, blank lines, exact
# multi-level rules, wildcard and exception rules (the kawasaki.jp and ck
# blocks are verbatim shapes from the real list)
PSL_SNAPSHOT = """\
// ===BEGIN ICANN DOMAINS===

com
biz
uk
co.uk

jp
kawasaki.jp
*.kawasaki.jp
!city.kawasaki.jp

ck
*.ck
!www.ck

us
k12.ma.us
pvt.k12.ma.us
// ===END ICANN DOMAINS===
"""


def _psl():
    from itext2kg_spark.functions.url import load_public_suffix_list

    return load_public_suffix_list(PSL_SNAPSHOT.splitlines())


def test_psl_loader_partitions_rules():
    psl = _psl()
    assert psl.exact[1] == {"com", "biz", "uk", "jp", "ck", "us"}
    assert "co.uk" in psl.exact[2] and "kawasaki.jp" in psl.exact[2]
    assert psl.exact[3] == {"k12.ma.us"}
    assert psl.exact[4] == {"pvt.k12.ma.us"}
    assert psl.wildcard[3] == {"kawasaki.jp"} and psl.wildcard[2] == {"ck"}
    assert psl.exception[3] == {"city.kawasaki.jp"}
    assert psl.exception[2] == {"www.ck"}
    assert psl.max_labels == 4


def test_psl_registrable_domain_algorithm(spark):
    """Cases from the publicsuffix.org reference test vectors: exact rules,
    longest-match, wildcard, exception, implicit-'*' default, and
    pass-through for hosts that ARE a public suffix."""
    from itext2kg_spark.functions.url import psl_registrable_domain_col

    cases = [
        ("example.com", "example.com"),
        ("b.example.com", "example.com"),
        ("example.co.uk", "example.co.uk"),          # longest rule wins
        ("b.example.co.uk", "example.co.uk"),
        ("test.kawasaki.jp", "test.kawasaki.jp"),    # *.kawasaki.jp -> ps
        ("www.test.kawasaki.jp", "www.test.kawasaki.jp"),
        ("city.kawasaki.jp", "city.kawasaki.jp"),    # exception rule
        ("www.city.kawasaki.jp", "city.kawasaki.jp"),
        ("www.ck", "www.ck"),                        # exception rule
        ("www.www.ck", "www.ck"),
        ("b.test.ck", "b.test.ck"),                  # wildcard ps=test.ck
        ("example.xyzzy", "example.xyzzy"),          # unlisted TLD -> '*'
        ("a.b.example.xyzzy", "example.xyzzy"),
        ("n.pvt.k12.ma.us", "n.pvt.k12.ma.us"),      # 3-label exact rule
        ("a.n.pvt.k12.ma.us", "n.pvt.k12.ma.us"),
        ("com", "com"),                              # host IS a suffix
        ("test.ck", "test.ck"),                      # host IS a ps (*.ck)
        ("", ""),
    ]
    df = spark.createDataFrame([(h,) for h, _ in cases], "host string")
    got = {
        r["host"]: r["reg"]
        for r in df.select(
            "host", psl_registrable_domain_col(F.col("host"), _psl()).alias("reg")
        ).collect()
    }
    for host, want in cases:
        assert got[host] == want, f"{host}: got {got[host]!r}, want {want!r}"


def test_psl_in_domain_stats_and_filter(spark):
    """The psl= parameter routes the full algorithm through the rollup and
    the allow/blocklist operators."""
    from itext2kg_spark.functions.url import domain_stats, filter_domains

    pages = spark.createDataFrame(
        [
            (0, "https://a.example.co.uk/x", "aaaa"),
            (1, "https://b.example.co.uk/y", "bb"),
            (2, "https://www.city.kawasaki.jp/", "c"),
        ],
        "doc_id long, url string, text string",
    )
    stats = {r["domain"]: r.asDict()
             for r in domain_stats(pages, psl=_psl()).collect()}
    assert stats["example.co.uk"]["n_pages"] == 2
    assert stats["example.co.uk"]["n_hosts"] == 2
    assert stats["city.kawasaki.jp"]["n_pages"] == 1
    kept = filter_domains(pages, blocklist=["example.co.uk"], psl=_psl())
    assert [r["doc_id"] for r in kept.collect()] == [2]
