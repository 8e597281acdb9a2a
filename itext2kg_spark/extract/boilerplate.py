"""Pure-Catalyst HTML boilerplate removal — the trafilatura-style block
classifier of a webtext pipeline, kept entirely JVM-side.

The mapInPandas distiller (extract/distill.py) is the general escape hatch
for arbitrary payloads; THIS module is the scale path for the common case:
tag-delimited block segmentation + tag-class keep/drop + text-density
stats, expressed as split/regexp/replace column expressions so the whole
stage runs inside whole-stage codegen — no Python worker, no Arrow hop,
and Catalyst prunes the (large, binary) html column out of every scan that
does not need it.

Reference parity: the reference distills documents with an LLM call per
document (documents_distiller/documents_distiller.py:176-196); our
corpus-scale stand-in extracts the main content deterministically. On the
synthetic CC-style envelope (sources/pages.py:pages_from_documents) the
extraction is byte-identical to the wrapped text — the same per-url
invariant the Arrow distiller is held to.

Algorithm (all Catalyst):
1. decode(html) and mark every OPENING block-level tag with a \\x01
   sentinel (regexp_replace with a backreference), then split on the
   sentinel — a closing tag never opens a block, so `<main>body</main>`
   stays one block. Escaped user text cannot collide: `<` inside content
   arrives as `&lt;`, and the sentinel itself is not a printable byte
   (documents containing a literal \\x01 are out of contract; real WARC
   payloads strip C0 controls upstream).
2. per block: the opening tag name, a `<[^>]*>` tag strip, entity
   unescape in inverse-escape order (&lt; &gt; &quot; &#x27; first,
   &amp; LAST — the order that exactly inverts html escaping),
   char-count text density.
3. kept = opening tag not in the boilerplate class (nav, footer, header,
   aside, script, style, head, title, html, body, noscript, form,
   iframe, button).

Scale shape: one projection + one generator (posexplode) per page — no
shuffle at all for html_blocks; extract_text adds exactly one groupBy(url)
whose payload is the kept text blocks (boilerplate already dropped
pre-shuffle, so the shuffle carries main content only).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# opening tags that DELIMIT blocks (closing tags never match: the regex
# requires '<' + tagname, and a closing tag starts '</')
BLOCK_TAGS = (
    "html|head|title|body|nav|main|article|section|aside|header|footer|"
    "p|div|h[1-6]|ul|ol|li|table|tr|td|th|pre|blockquote|"
    "script|style|noscript|form|iframe|button"
)
# block classes whose text is boilerplate, not content
DROP_TAGS = (
    "nav", "footer", "header", "aside", "script", "style", "head",
    "title", "html", "body", "noscript", "form", "iframe", "button",
)
_SENTINEL = "\x01"


def _unescape(c: Column) -> Column:
    """Exact inverse of html escaping: named/numeric entities for the
    escaped characters first, &amp; strictly last."""
    for ent, ch in (
        ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
        ("&#x27;", "'"), ("&#39;", "'"), ("&amp;", "&"),
    ):
        c = F.replace(c, F.lit(ent), F.lit(ch))
    return c


def html_blocks(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """url, block_id, tag, n_raw, n_text, density, kept, text — one row
    per non-empty block-level segment of every page, classified
    keep/drop by the opening tag. Everything whole-stage codegen."""
    raw = F.decode(F.col(html_col), "UTF-8")
    marked = F.regexp_replace(
        raw, f"(?i)(<(?:{BLOCK_TAGS})\\b)", _SENTINEL + "$1"
    )
    b = (
        pages.select(
            F.col(url_col).alias("url"),
            F.posexplode(F.split(marked, _SENTINEL)).alias("block_id", "raw_block"),
        )
        .withColumn(
            "text",
            _unescape(F.regexp_replace(F.col("raw_block"), "<[^>]*>", "")),
        )
        .where(F.trim(F.col("text")) != "")
        .withColumn(
            "tag",
            F.lower(F.regexp_extract(F.col("raw_block"), "^<([a-zA-Z0-9]+)", 1)),
        )
    )
    n_raw = F.length("raw_block").cast("long")
    n_text = F.length("text").cast("long")
    return b.select(
        "url",
        F.col("block_id").cast("long").alias("block_id"),
        "tag",
        n_raw.alias("n_raw"),
        n_text.alias("n_text"),
        F.round(n_text.cast("double") / F.greatest(n_raw, F.lit(1)), 9).alias(
            "density"
        ),
        (~F.col("tag").isin(*DROP_TAGS)).alias("kept"),
        "text",
    )


def extract_text(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
    sep: str = "\n\n",
) -> DataFrame:
    """url, text — kept blocks reassembled in document order. On the
    synthetic envelope this equals the wrapped text byte-identically (one
    kept <main> block); on multi-block pages blocks join with `sep`.
    Pages with no kept block still emit a row with text = ''."""
    blocks = html_blocks(pages, url_col=url_col, html_col=html_col)
    agg = (
        blocks.where("kept")
        .groupBy("url")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("block_id", "text"))),
                    lambda s: s["text"],
                ),
                sep,
            ).alias("text")
        )
    )
    urls = pages.select(F.col(url_col).alias("url")).distinct()
    return urls.join(agg, "url", "left").select(
        "url", F.coalesce("text", F.lit("")).alias("text")
    )
