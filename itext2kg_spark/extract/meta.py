"""HTML head-metadata extraction — title, description, canonical link,
robots meta — the page-level signals a webtext pipeline joins onto every
document (and `noindex`, the third crawl-permission input after
robots.txt and sitemaps).

Pure Catalyst: four regexp_extract calls over the decoded html plus the
shared entity unescape — one projection, codegen end to end, no Python,
no shuffle. Attribute order inside the tags is free (name= before or
after content=); values must be quoted (same contract as
extract/links.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from itext2kg_spark.extract.boilerplate import _unescape

TITLE_RE = r"(?is)<title[^>]*>(.*?)</title>"
_Q = "[\"\\x27]"


def _meta_content(raw: Column, name: str) -> Column:
    """content of <meta name=NAME content=...> with either attribute
    order; first match wins."""
    before = rf"(?is)<meta\s[^>]*name\s*=\s*{_Q}{name}{_Q}[^>]*content\s*=\s*{_Q}([^\"\x27]*)"
    after = rf"(?is)<meta\s[^>]*content\s*=\s*{_Q}([^\"\x27]*){_Q}[^>]*name\s*=\s*{_Q}{name}{_Q}"
    b = F.regexp_extract(raw, before, 1)
    return F.when(b != "", b).otherwise(F.regexp_extract(raw, after, 1))


def html_meta(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """url, title, description, canonical, robots_meta, noindex."""
    raw = F.decode(F.col(html_col), "UTF-8")
    title = F.trim(
        _unescape(
            F.regexp_replace(F.regexp_extract(raw, TITLE_RE, 1), "<[^>]*>", "")
        )
    )
    desc = F.trim(_unescape(_meta_content(raw, "description")))
    robots = F.lower(F.trim(_meta_content(raw, "robots")))
    canonical = F.regexp_extract(
        raw,
        rf"(?is)<link\s[^>]*rel\s*=\s*{_Q}canonical{_Q}[^>]*href\s*=\s*{_Q}([^\"\x27#]+)",
        1,
    )
    return pages.select(
        F.col(url_col).alias("url"),
        title.alias("title"),
        desc.alias("description"),
        canonical.alias("canonical"),
        robots.alias("robots_meta"),
        robots.rlike(r"(^|[,\s])noindex([,\s]|$)").alias("noindex"),
    )
