"""Outlink extraction — the web link graph, built with Catalyst only.

A webtext pipeline needs (page -> outlink) edges for crawl frontier
ranking, spam/domain analysis, and link-based centrality (the existing
functions/pagerank.py and functions/graph.py operators run unchanged on
the edge table this module produces, since they only need (src, dst)
columns). The extraction is one regexp_extract_all + posexplode + a
resolution expression — whole-stage codegen, no Python worker, no
shuffle.

Resolution rules (RFC 3986 subset, the cases that dominate crawl HTML;
all Catalyst `when` chains so the same rules replay in the SQL oracle):
- scheme://...            absolute: kept as-is
- //host/...              protocol-relative: base scheme prepended
- /path                   root-relative: base origin prepended
- javascript:/mailto:/tel: pseudo-links: dropped
- anything else           relative: resolved against the base directory
  (base URLs without a path segment treat the origin as the directory)

Fragments never extract (the href character class stops at '#').
Contract: hrefs must be quoted (single or double) — unquoted attributes
are vanishingly rare post-2005 and would need an HTML tokenizer;
`..` segments are not collapsed (canonicalize downstream if needed).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HREF_RE = r"(?i)<a\s[^>]*href\s*=\s*[\"\x27]([^\"\x27#]+)"
# href + inner anchor text in one pattern: the two regexp_extract_all
# calls (group 1, group 2) align index-for-index because the pattern is
# identical; (?s) lets anchors span lines, the lazy .*? stops at the
# first </a> (nested <a> is invalid HTML and out of contract)
ANCHOR_RE = r"(?is)<a\s[^>]*href\s*=\s*[\"\x27]([^\"\x27#]+)[^>]*>(.*?)</a>"
SCHEME_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://"
ORIGIN_RE = r"^([A-Za-z][A-Za-z0-9+.\-]*://(?:[^/@?#]*@)?[^/?#]+)"
PSEUDO_RE = r"(?i)^(javascript|mailto|tel|data):"


def _resolve(base: Column, href: Column) -> Column:
    origin = F.regexp_extract(base, ORIGIN_RE, 1)
    scheme = F.regexp_extract(base, r"^([A-Za-z][A-Za-z0-9+.\-]*):", 1)
    no_query = F.regexp_replace(base, r"[?#].*$", "")
    base_dir = F.when(
        no_query.rlike(r"://[^/]*$"), F.concat(no_query, F.lit("/"))
    ).otherwise(F.regexp_replace(no_query, r"[^/]*$", ""))
    return (
        F.when(href.rlike(SCHEME_RE), href)
        .when(href.startswith("//"), F.concat(scheme, F.lit(":"), href))
        .when(href.startswith("/"), F.concat(origin, href))
        .otherwise(F.concat(base_dir, href))
    )


def extract_links(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """url, link_pos, href, target — one row per non-pseudo anchor href,
    in document order, with `target` the resolved absolute URL. Feed
    (url, target) straight into pagerank/degrees as the link graph."""
    raw = F.decode(F.col(html_col), "UTF-8")
    links = pages.select(
        F.col(url_col).alias("url"),
        F.posexplode(F.regexp_extract_all(raw, F.lit(HREF_RE), 1)).alias(
            "link_pos", "href"
        ),
    ).where(~F.col("href").rlike(PSEUDO_RE))
    return links.select(
        "url",
        F.col("link_pos").cast("long").alias("link_pos"),
        "href",
        _resolve(F.col("url"), F.col("href")).alias("target"),
    )


def extract_anchor_texts(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """url, link_pos, href, target, anchor — like extract_links, plus the
    anchor's inner text (inner markup stripped, entities unescaped,
    whitespace-trimmed). The incoming-anchor-text signal: group the
    output by `target` to get the text the web uses to describe a page."""
    from itext2kg_spark.extract.boilerplate import _unescape

    raw = F.decode(F.col(html_col), "UTF-8")
    pairs = F.arrays_zip(
        F.regexp_extract_all(raw, F.lit(ANCHOR_RE), 1).alias("href"),
        F.regexp_extract_all(raw, F.lit(ANCHOR_RE), 2).alias("rawtext"),
    )
    links = pages.select(
        F.col(url_col).alias("url"),
        F.posexplode(pairs).alias("link_pos", "p"),
    ).where(~F.col("p.href").rlike(PSEUDO_RE))
    anchor = F.trim(
        _unescape(F.regexp_replace(F.col("p.rawtext"), "<[^>]*>", ""))
    )
    return links.select(
        "url",
        F.col("link_pos").cast("long").alias("link_pos"),
        F.col("p.href").alias("href"),
        _resolve(F.col("url"), F.col("p.href")).alias("target"),
        anchor.alias("anchor"),
    )
