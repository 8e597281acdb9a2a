"""Distill stage (S1/S2): html binary -> text, byte-identical per url.

The reference's distiller is an LLM structured-output call per document
(documents_distiller/documents_distiller.py:176-196); its callers also read
raw files (pypdf etc). Our input is the Common-Crawl-style pages table
(url, warc_ts, html, lang, [text]) per BASELINE.json input_hint, and the
contract is: `distill(html) == text` byte-identically for every url.

Implementation: `mapInPandas` over Arrow batches — the single place raw bytes
are touched. Extraction is a deterministic main-content parse (the synthetic
pages embed the text inside <main>…</main>; real WARC payloads would swap in a
real extractor here with the same signature). Everything downstream never
reads `html` again, so Catalyst prunes the (large, binary) column out of every
later scan.
"""

from __future__ import annotations

import html as _htmllib
import re
from collections.abc import Iterator

import pandas as pd
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


def distill_pages(pages: DataFrame) -> DataFrame:
    """pages(url, warc_ts, html, lang, ...) -> (url, obs_ts, lang, text)."""

    def _distill(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "url": pdf["url"],
                    "obs_ts": pdf["warc_ts"],
                    "lang": pdf["lang"],
                    "text": [extract_main_text(h) for h in pdf["html"]],
                }
            )

    return pages.select("url", "warc_ts", "html", "lang").mapInPandas(
        _distill, schema=DISTILLED_SCHEMA
    )
