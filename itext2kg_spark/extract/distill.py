"""Distill stage (S1/S2): html binary -> text, byte-identical per url.

The reference's distiller is an LLM structured-output call per document
(documents_distiller/documents_distiller.py:176-196); its callers also read
raw files (pypdf etc). Our input is the Common-Crawl-style pages table
(url, warc_ts, html, lang, [text]) per BASELINE.json input_hint, and the
contract is: `distill(html) == text` byte-identically for every url.

Implementation: pure Catalyst (decode + regexp_extract + entity replace) —
no Python stage, so the whole distill pass is whole-stage-codegen'd and the
JVM<->Arrow round-trip over the (large, binary) html column disappears from
every pipeline lineage. The envelope contract makes this exact: the body
inside <main>…</main> is `html.escape(text, quote=False)` output, whose only
entities are &amp;/&lt;/&gt;, and replacing &lt;, &gt; first and &amp; LAST
is the exact inverse (any literal '&' in the original text became '&amp;',
so no bare '&lt;'/'&gt;' sequence survives that did not come from '<'/'>').
`extract_main_text` remains the row-level Python reference implementation
(equivalence-tested in tests/test_pipeline.py) and the escape hatch for a
real boilerplate extractor with the same signature. Everything downstream
never reads `html` again, so Catalyst prunes the binary column out of every
later scan.
"""

from __future__ import annotations

import html as _htmllib
import re

from pyspark.sql import DataFrame

_MAIN_RE = re.compile(rb"<main>(.*?)</main>", re.DOTALL)

DISTILLED_SCHEMA = "url string, obs_ts timestamp, lang string, text string"


def synth_html(text: str, title: str = "") -> bytes:
    """Deterministic page wrapper whose extraction inverts exactly."""
    body = _htmllib.escape(text, quote=False)
    return (
        f"<html><head><title>{_htmllib.escape(title, quote=False)}</title></head>"
        f"<body><nav>boilerplate nav</nav><main>{body}</main>"
        f"<footer>boilerplate footer</footer></body></html>"
    ).encode("utf-8")


def extract_main_text(html_bytes: bytes) -> str:
    if html_bytes is None:
        return ""
    m = _MAIN_RE.search(html_bytes)
    if not m:
        return ""
    return _htmllib.unescape(m.group(1).decode("utf-8", errors="replace"))


def main_text_col(html_col) -> "F.Column":
    """Catalyst expression mirror of `extract_main_text`: first <main> body,
    entities &lt;/&gt;/&amp; unescaped (&amp; LAST — the exact inverse of
    html.escape, see module docstring), '' for null/unmatched html."""
    from pyspark.sql import functions as F

    body = F.regexp_extract(
        F.decode(html_col, "UTF-8"), r"(?s)<main>(.*?)</main>", 1
    )
    return F.coalesce(
        F.replace(
            F.replace(F.replace(body, F.lit("&lt;"), F.lit("<")),
                      F.lit("&gt;"), F.lit(">")),
            F.lit("&amp;"), F.lit("&"),
        ),
        F.lit(""),
    )


def distill_pages(pages: DataFrame) -> DataFrame:
    """pages(url, warc_ts, html, lang, ...) -> (url, obs_ts, lang, text)."""
    from pyspark.sql import functions as F

    from itext2kg_spark.functions.partitioning import ensure_scan_parallelism

    # the stages chained on distill (sentence split, extraction, normalize)
    # are narrow off the page scan — floor the scan parallelism so a small
    # single-row-group pages table does not serialize them on one core
    pages = ensure_scan_parallelism(pages)
    return pages.select(
        "url",
        F.col("warc_ts").alias("obs_ts"),
        "lang",
        main_text_col(F.col("html")).alias("text"),
    )
