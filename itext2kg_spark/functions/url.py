"""URL/domain operators for web corpora — pure Catalyst, cross-engine regex.

Web-crawl pipelines key politeness, per-site dedup, quality priors, and
blocklists by domain; crawls are domain-skewed (north rule: hot-domain
salting — see functions/skew.py for the partitioning side). These are the
query-side operators: host extraction, registrable-domain rollup, per-domain
corpus stats with corpus share, and allow/blocklist filtering.

`host_col` deliberately uses a plain regex instead of Spark's `parse_url`:
the contract must hold bit-for-bit in the DuckDB oracle (and any other
engine a lineage consumer uses), and `parse_url`'s Java URI semantics are
not portable. The regex handles scheme (any RFC 3986 scheme token),
userinfo, port, path/query/fragment; no-scheme strings yield '' (they are
not URLs — callers decide whether to drop or default them).

Registrable domains use a small fixed two-level public-suffix list shared
verbatim with the SQL oracle — the real PSL is ~9k rules and changes
monthly; pipelines that need it can pass their own suffix list. The
heuristic (last two labels, or three when the last two are a listed
suffix) is the standard approximation used by crawl processors.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# scheme '://' [userinfo '@'] host [':' port] [/?#...]
HOST_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://(?:[^/@?#]*@)?([^/:?#]+)"

# shared verbatim with the SQL oracle (see __spark_entry__.py web_domain_stats)
TWO_LEVEL_SUFFIXES = [
    "co.uk", "org.uk", "ac.uk", "gov.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp",
    "com.br", "com.cn", "co.in", "co.kr", "com.mx",
]


def host_col(url: Column) -> Column:
    """Lowercased host of a URL; '' when the string has no scheme+host."""
    return F.lower(F.regexp_extract(url, HOST_RE, 1))


def registrable_domain_col(
    host: Column, suffixes: list[str] | None = None
) -> Column:
    """eTLD+1 approximation: last two labels, or last three when the last
    two form a listed two-level suffix; hosts with < 2 labels (or '')
    pass through unchanged."""
    sfx = TWO_LEVEL_SUFFIXES if suffixes is None else suffixes
    labels = F.split(host, r"\.")
    n = F.size(labels)
    last2 = F.concat_ws(
        ".", F.element_at(labels, -2), F.element_at(labels, -1)
    )
    last3 = F.concat_ws(
        ".",
        F.element_at(labels, -3),
        F.element_at(labels, -2),
        F.element_at(labels, -1),
    )
    return (
        F.when((n >= 3) & last2.isin(*sfx), last3)
        .when(n >= 2, last2)
        .otherwise(host)
    )


def domain_stats(
    pages: DataFrame,
    url_col: str = "url",
    text_col: str = "text",
    suffixes: list[str] | None = None,
) -> DataFrame:
    """Per-registrable-domain corpus stats:
    (domain, n_pages, n_hosts, n_chars, share_10k) where share_10k =
    floor(10000 * n_pages / total_pages).

    Shape at scale: one groupBy on domain with map-side partial aggregation
    (count/sum/approx-free distinct via a two-level agg on (domain, host)),
    plus a one-row broadcast for the corpus total. The output is
    domain-cardinality-sized — the natural input for hot-domain detection
    (share_10k filter) and blocklist joins."""
    host = host_col(F.col(url_col))
    dom = registrable_domain_col(host, suffixes)
    per_host = (
        pages.select(
            dom.alias("domain"),
            host.alias("host"),
            F.length(F.col(text_col)).alias("n_chars"),
        )
        .groupBy("domain", "host")
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.sum("n_chars").alias("n_chars"),
        )
    )
    per_dom = per_host.groupBy("domain").agg(
        F.sum("n_pages").alias("n_pages"),
        F.count(F.lit(1)).alias("n_hosts"),
        F.sum("n_chars").alias("n_chars"),
    )
    total = per_dom.agg(F.sum("n_pages").alias("total_pages"))
    return (
        per_dom.crossJoin(F.broadcast(total))
        .select(
            "domain",
            "n_pages",
            "n_hosts",
            "n_chars",
            F.floor(F.col("n_pages") * 10000.0 / F.col("total_pages"))
            .cast("long")
            .alias("share_10k"),
        )
    )


def filter_domains(
    pages: DataFrame,
    blocklist: DataFrame | list[str] | None = None,
    allowlist: DataFrame | list[str] | None = None,
    url_col: str = "url",
    suffixes: list[str] | None = None,
) -> DataFrame:
    """Drop pages whose registrable domain is blocklisted (anti-join) and,
    if an allowlist is given, keep only allowlisted domains (semi-join).
    List inputs become single-column DataFrames; both joins broadcast the
    list side — domain lists are dimension-table sized even when the pages
    side is the whole crawl."""
    spark = pages.sparkSession
    dom = registrable_domain_col(host_col(F.col(url_col)), suffixes)
    out = pages.withColumn("__domain", dom)

    def _as_df(lst):
        if isinstance(lst, DataFrame):
            return lst.toDF("__domain")
        return spark.createDataFrame(
            [(d,) for d in lst], "__domain string"
        )

    if blocklist is not None:
        out = out.join(
            F.broadcast(_as_df(blocklist)), "__domain", "left_anti"
        )
    if allowlist is not None:
        out = out.join(
            F.broadcast(_as_df(allowlist)), "__domain", "left_semi"
        )
    return out.drop("__domain")
