"""Deterministic synthetic Common-Crawl-style pages (FIXTURES.md F1).

Schema matches BASELINE.json input_hint:
    url string, warc_ts timestamp, html binary, text string, lang string

Generation is a pure function of (page id, seed), distributed via
`spark.range(n).mapInPandas` so bench-scale tables never materialize on the
driver. Text is 1-5 atomic-fact sentences from the grammar that
`GrammarExtractor` inverts exactly; html wraps text such that
`distill(html) == text` byte-identically (the per-url invariant).

Mention variation is tuned to the hash-embedding geometry: a 2-token name vs
its 3-token variant ("acme corp" ~ "acme corp inc") has cosine ≈ 2/sqrt(6) ≈
0.816 >= θ_E=0.8, while different orgs sharing one token ≈ 0.5 stay apart —
so similarity merging does real work on this corpus and the differential
harness measures it.

Skew: a configurable share of pages lands on one hot domain, reproducing the
hot-host skew the north rule calls out; the pipeline's shuffles key on url /
canonical names, with AQE skew-join splitting as the backstop.
"""

from __future__ import annotations

from collections.abc import Iterator
from datetime import datetime, timedelta, timezone

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from itext2kg_spark.extract.distill import synth_html

PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"

_FIRST = ["john", "jane", "alex", "maria", "wei", "amina", "ivan", "sofia", "kenji", "lena"]
_LAST = ["doe", "smith", "kim", "lopez", "chen", "okafor", "petrov", "rossi", "tanaka", "novak"]
_MIDDLE = ["p", "q", "r"]
_ORG_A = ["acme", "globex", "initech", "umbrella", "stark", "wayne", "hooli", "vehement", "massive", "soylent"]
_ORG_B = ["corp", "labs", "industries", "systems", "dynamics", "holdings", "networks", "media", "energy", "logistics"]
_ROLES = ["ceo", "cto", "founder", "president", "director"]
_BASE = datetime(2024, 1, 1, tzinfo=timezone.utc)


def _person(rng: np.random.Generator) -> str:
    name = f"{_FIRST[rng.integers(len(_FIRST))]} {_LAST[rng.integers(len(_LAST))]}"
    if rng.random() < 0.25:  # near-dup variant: middle initial
        parts = name.split()
        name = f"{parts[0]} {_MIDDLE[rng.integers(len(_MIDDLE))]} {parts[1]}"
    # title-case like real web text; the engine's P1 normalization lowercases,
    # so every parity/embedding path is unaffected
    return name.title()


def _org(rng: np.random.Generator) -> str:
    name = f"{_ORG_A[rng.integers(len(_ORG_A))]} {_ORG_B[rng.integers(len(_ORG_B))]}"
    if rng.random() < 0.25:  # near-dup variant: legal suffix
        name = f"{name} inc"
    return name.title()


def _date_str(rng: np.random.Generator) -> str:
    d = _BASE + timedelta(days=int(rng.integers(0, 700)))
    r = rng.random()
    if r < 0.2:  # non-ISO fast-parse format
        return d.strftime("%B") + f" {d.day} {d.year}"
    if r < 0.3:  # dateutil-only: ordinal day ("July 17th, 2025")
        day = d.day
        suf = (
            "th"
            if 10 <= day % 100 <= 20
            else {1: "st", 2: "nd", 3: "rd"}.get(day % 10, "th")
        )
        return d.strftime("%B") + f" {day}{suf}, {d.year}"
    if r < 0.4:  # dateutil-only: dotted form ("17.07.2025")
        return f"{d.day:02d}.{d.month:02d}.{d.year}"
    return d.strftime("%Y-%m-%d")


def _fact(rng: np.random.Generator) -> str:
    kind = rng.random()
    if kind < 0.35:
        return f"{_person(rng)} is the {_ROLES[rng.integers(len(_ROLES))]} of {_org(rng)} since {_date_str(rng)}."
    if kind < 0.45:
        return f"{_person(rng)} is no longer the {_ROLES[rng.integers(len(_ROLES))]} of {_org(rng)} since {_date_str(rng)}."
    if kind < 0.8:
        return f"{_person(rng)} works at {_org(rng)} since {_date_str(rng)}."
    if kind < 0.9:
        return f"{_person(rng)} no longer works at {_org(rng)} since {_date_str(rng)}."
    return f"{_org(rng)} acquired {_org(rng)} on {_date_str(rng)}."


def generate_page(
    page_id: int,
    seed: int = 42,
    hot_share: float = 0.2,
    min_facts: int = 1,
    max_facts: int = 5,
) -> dict:
    rng = np.random.Generator(np.random.PCG64([seed, page_id]))
    n_facts = int(rng.integers(min_facts, max_facts + 1))
    text = " ".join(_fact(rng) for _ in range(n_facts))
    hot = rng.random() < hot_share
    domain = "hot.example.com" if hot else f"site{int(rng.integers(0, 1000)):04d}.example.org"
    url = f"https://{domain}/p/{page_id}"
    ts = _BASE + timedelta(days=int(rng.integers(0, 365)), seconds=int(rng.integers(0, 86400)))
    lang = "en" if rng.random() < 0.95 else "fr"
    return {
        "url": url,
        "warc_ts": ts.replace(tzinfo=None),
        "html": synth_html(text, title=url),
        "text": text,
        "lang": lang,
    }


def pages_from_documents(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Wrap an arbitrary documents(doc_id, text, lang) table as pages with the
    distill-invertible html envelope — pure Catalyst (escape + concat +
    encode), no Python. warc_ts derives deterministically from doc_id."""
    from pyspark.sql import functions as F

    esc = F.expr(
        "replace(replace(replace(text, '&', '&amp;'), '<', '&lt;'), '>', '&gt;')"
    )
    html = F.encode(
        F.concat(
            F.lit("<html><head><title>d</title></head><body>"
                  "<nav>boilerplate nav</nav><main>"),
            esc,
            F.lit("</main><footer>boilerplate footer</footer></body></html>"),
        ),
        "UTF-8",
    )
    return docs.select(
        F.concat(F.lit("doc://"), F.col(id_col).cast("string")).alias("url"),
        F.timestamp_seconds(
            F.lit(1704067200) + (F.col(id_col) % 365) * 86400
        ).alias("warc_ts"),
        html.alias("html"),
        F.col("text"),
        F.col("lang"),
    )


def synth_pages(
    spark: SparkSession,
    n_pages: int,
    seed: int = 42,
    hot_share: float = 0.2,
    partitions: int | None = None,
    min_facts: int = 1,
    max_facts: int = 5,
) -> DataFrame:
    rng_seed, share = seed, hot_share

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                generate_page(int(i), rng_seed, share, min_facts, max_facts)
                for i in pdf["id"]
            ]
            yield pd.DataFrame(rows)

    base = spark.range(n_pages, numPartitions=partitions)
    return base.mapInPandas(gen, schema=PAGES_SCHEMA)
