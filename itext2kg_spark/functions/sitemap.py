"""Sitemap parsing + URL canonicalization — the crawl frontier's other
two inputs (robots.txt being the first, functions/robots.py).

parse_sitemap: <url><loc>/<lastmod>/<changefreq>/<priority> entries out
of sitemap XML bodies, pure Catalyst (regexp_extract_all over the <url>
blocks, field regexps inside each block — index alignment by splitting
on <url> elements first, so partial entries keep their own fields).
Sitemap-INDEX files (<sitemapindex><sitemap><loc>) list child sitemaps;
`kind` distinguishes the two so a crawler can recurse.

canonicalize_url: the dedup key a frontier needs before "have we seen
this URL" — RFC 3986 normalizations that never change the resource:
lowercase scheme+host, strip the default port (:80 http / :443 https),
drop the fragment, collapse duplicate slashes in the path (not in the
query), strip a trailing '/' on the root path only, and sort query
parameters byte-wise (equal multisets of params compare equal). All
string expressions; one projection, no shuffle, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

URL_BLOCK_RE = r"(?is)<url>(.*?)</url>"
SITEMAP_BLOCK_RE = r"(?is)<sitemap>(.*?)</sitemap>"


def _field(block: Column, tag: str) -> Column:
    return F.regexp_extract(block, rf"(?is)<{tag}>\s*(.*?)\s*</{tag}>", 1)


def parse_sitemap(
    sitemaps: DataFrame, host_col: str = "host", body_col: str = "body"
) -> DataFrame:
    """host, kind('url'|'sitemap'), entry_pos, loc, lastmod, changefreq,
    priority — one row per entry of every sitemap body; index entries
    carry kind='sitemap' and only loc/lastmod."""
    def blocks(pattern, kind):
        b = sitemaps.select(
            F.col(host_col).alias("host"),
            F.posexplode(
                F.regexp_extract_all(F.col(body_col), F.lit(pattern), 1)
            ).alias("entry_pos", "block"),
        )
        return b.select(
            "host",
            F.lit(kind).alias("kind"),
            F.col("entry_pos").cast("long").alias("entry_pos"),
            _field(F.col("block"), "loc").alias("loc"),
            _field(F.col("block"), "lastmod").alias("lastmod"),
            _field(F.col("block"), "changefreq").alias("changefreq"),
            _field(F.col("block"), "priority").alias("priority"),
        ).where(F.col("loc") != "")

    return blocks(URL_BLOCK_RE, "url").unionByName(
        blocks(SITEMAP_BLOCK_RE, "sitemap")
    )


def canonicalize_url(url: Column) -> Column:
    """The frontier dedup key: scheme+host lowercased, default port
    stripped, fragment dropped (RFC-3986-safe normalizations), plus two
    crawl-dedup heuristics BEYOND the RFC-safe set — duplicate path
    slashes collapsed and query params byte-sorted ('//a' vs '/a' and
    order-sensitive query handlers can in principle differ); right for a
    frontier key, not a general-purpose URL rewriter. Root trailing slash
    normalized."""
    no_frag = F.regexp_replace(url, r"#.*$", "")
    scheme = F.lower(F.regexp_extract(no_frag, r"^([A-Za-z][A-Za-z0-9+.\-]*)://", 1))
    hostport = F.lower(
        F.regexp_extract(no_frag, r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]+)", 1)
    )
    host = F.when(
        (scheme == "http") & hostport.endswith(":80"),
        hostport.substr(F.lit(1), F.length(hostport) - 3),
    ).when(
        (scheme == "https") & hostport.endswith(":443"),
        hostport.substr(F.lit(1), F.length(hostport) - 4),
    ).otherwise(hostport)
    rest = F.regexp_replace(no_frag, r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]+", "")
    path = F.regexp_replace(F.regexp_extract(rest, r"^([^?]*)", 1), "/{2,}", "/")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(rest, r"\?(.*)$", 1)
    sorted_q = F.array_join(
        F.array_sort(F.split(query, "&")), "&"
    )
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(query == "", F.lit("")).otherwise(F.concat(F.lit("?"), sorted_q)),
    )
