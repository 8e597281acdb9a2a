"""Pure-Catalyst HTML boilerplate removal (extract/boilerplate.py)."""

import pyspark.sql.functions as F
import pytest

from itext2kg_spark.extract.boilerplate import extract_text, html_blocks
from itext2kg_spark.sources.pages import pages_from_documents

TRICKY = [
    (0, "plain words here", "en"),
    (1, "a < b & b > c means a&lt;c?", "en"),
    (2, "  leading and trailing  ", "en"),
    (3, "", "en"),
    (4, "line one\nline two\n\nline four", "en"),
    (5, "tag soup &amp; pre-escaped &lt;div&gt; stays literal", "en"),
]


def _docs(spark):
    return spark.createDataFrame(TRICKY, "doc_id long, text string, lang string")


def test_extract_text_byte_identity_on_envelope(spark):
    """The Catalyst extractor is held to the same per-url invariant as the
    Arrow distiller: extract(wrap(text)) == text, byte for byte, including
    entity round-trips, whitespace, newlines, and the empty document."""
    docs = _docs(spark)
    got = {r["url"]: r["text"] for r in extract_text(pages_from_documents(docs)).collect()}
    want = {f"doc://{i}": t for i, t, _ in TRICKY}
    assert got == want


def test_block_classification_on_envelope(spark):
    docs = _docs(spark).where("doc_id = 0")
    rows = {r["tag"]: r for r in html_blocks(pages_from_documents(docs)).collect()}
    # title/nav/footer blocks exist and are classified boilerplate
    assert set(rows) == {"title", "nav", "main", "footer"}
    assert not rows["title"]["kept"] and not rows["nav"]["kept"]
    assert not rows["footer"]["kept"] and rows["main"]["kept"]
    assert rows["nav"]["text"] == "boilerplate nav"
    assert rows["main"]["text"] == "plain words here"
    # block ids are document-ordered
    assert (
        rows["title"]["block_id"] < rows["nav"]["block_id"]
        < rows["main"]["block_id"] < rows["footer"]["block_id"]
    )
    # density: main block raw is '<main>plain words here</main>'
    m = rows["main"]
    assert m["n_text"] == len("plain words here")
    assert m["n_raw"] == len("<main>plain words here</main>")
    assert m["density"] == pytest.approx(m["n_text"] / m["n_raw"], abs=1e-9)


def test_multiblock_page_order_and_sep(spark):
    html = (
        "<html><body><nav>menu</nav><h1>Title</h1><p>first para</p>"
        "<div>second <b>bold</b> div</div><aside>ads</aside>"
        "<footer>(c) foo</footer></body></html>"
    ).encode()
    pages = spark.createDataFrame([("u", html)], "url string, html binary")
    out = extract_text(pages).collect()
    assert out[0]["text"] == "Title\n\nfirst para\n\nsecond bold div"
    tags = [
        (r["tag"], r["kept"])
        for r in html_blocks(pages).orderBy("block_id").collect()
    ]
    assert tags == [
        ("nav", False), ("h1", True), ("p", True), ("div", True),
        ("aside", False), ("footer", False),
    ]


def test_no_kept_blocks_yields_empty_row(spark):
    pages = spark.createDataFrame(
        [("u", b"<html><body><nav>only chrome</nav></body></html>")],
        "url string, html binary",
    )
    assert extract_text(pages).collect()[0]["text"] == ""


def test_html_blocks_plan_no_python_no_shuffle(spark):
    """The scale contract: block segmentation is generator + projection
    only — no Python eval node, no Exchange."""
    docs = _docs(spark)
    plan = (
        html_blocks(pages_from_documents(docs))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "EvalPython" not in plan
    assert "Exchange" not in plan
    assert "Generate" in plan  # the posexplode
