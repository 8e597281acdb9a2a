"""WARC source (sources/warc.py): Catalyst record parsing, file reader."""

import pyspark.sql.functions as F

from itext2kg_spark.sources.warc import parse_warc_records, read_warc, synth_warc

DOCS = [
    (0, "plain body"),
    (1, ""),
    (2, "multi\nline\nbody with trailing space "),
    (3, "body containing a blank\r\n\r\nline — length-framed slice keeps it"),
    (4, "x" * 500),
]


def _docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_warc_roundtrip_byte_identity(spark):
    parsed = parse_warc_records(synth_warc(_docs(spark), group=2))
    got = {r["url"]: r for r in parsed.collect()}
    assert set(got) == {f"doc://{i}" for i, _ in DOCS}
    for i, text in DOCS:
        r = got[f"doc://{i}"]
        assert r["body"] == text
        assert r["content_length"] == len(text)
        assert r["warc_type"] == "response"
        assert r["warc_date"] is not None


def test_warc_grouping(spark):
    payloads = synth_warc(_docs(spark), group=2)
    assert payloads.count() == 2  # warc_id in {0, 1}
    # every payload self-delimits: starts with the record header line
    for r in payloads.collect():
        assert r["payload"].startswith("WARC/1.0\r\n")


def test_read_warc_from_files(spark, tmp_path):
    p = str(tmp_path / "warc")
    synth_warc(_docs(spark), group=2).select("payload").write.text(p)
    got = {r["url"]: r["body"] for r in read_warc(spark, p).collect()}
    assert got == {f"doc://{i}": t for i, t in DOCS}


def test_warc_feeds_corpus_prep(spark, tmp_path):
    """Source-to-pipeline handoff: documents round-tripped through WARC
    files and read back via read_warc must survive corpus preparation
    IDENTICALLY to the originals (byte-identical bodies => identical
    kept set)."""
    from itext2kg_spark.corpus import prepare_corpus

    vocab = ("the quick brown fox jumps over the lazy dog and then it sat "
             "down with a friend to share some of this fine bread").split()
    rows = [
        (
            i,
            " ".join(vocab[(i * 7 + j) % len(vocab)] for j in range((i % 30) + 5)),
            "en",
        )
        for i in range(60)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    p = str(tmp_path / "warc")
    synth_warc(docs, group=7).select("payload").write.text(p)
    from_warc = read_warc(spark, p).select(
        F.regexp_extract("url", r"doc://(\d+)", 1).cast("long").alias("doc_id"),
        F.col("body").alias("text"),
        F.lit("en").alias("lang"),
    )
    kw = {"langs": ("en",), "min_tokens": 10, "near_dup_threshold": None}
    got = {r["doc_id"] for r in prepare_corpus(from_warc, **kw).collect()}
    want = {r["doc_id"] for r in prepare_corpus(docs, **kw).collect()}
    assert got == want and len(want) > 0


def test_parse_warc_plan_stays_jvm(spark):
    plan = (
        parse_warc_records(synth_warc(_docs(spark)))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "EvalPython" not in plan
    assert "Generate" in plan


def test_read_warc_gz_member_per_record(spark, tmp_path):
    """Common-Crawl layout: one gzip member per record, members
    concatenated per file — the member-wise gunzip must recover every
    record byte-identically."""
    import gzip
    import os

    from itext2kg_spark.sources.warc import read_warc_gz

    docs = _docs(spark)
    payloads = [
        r["payload"]
        for r in synth_warc(docs, group=2).orderBy("warc_id").collect()
    ]
    p = str(tmp_path / "warcgz")
    os.makedirs(p)
    for i, payload in enumerate(payloads):
        # split the grouped payload back into records, one member each
        recs = ["WARC/1.0\r\n" + r for r in payload.split("WARC/1.0\r\n") if r]
        with open(f"{p}/part{i}.warc.gz", "wb") as f:
            for rec in recs:
                f.write(gzip.compress(rec.encode()))
    got = {r["url"]: r["body"] for r in read_warc_gz(spark, p).collect()}
    assert got == {f"doc://{i}": t for i, t in DOCS}

    # scale contract (r6 verdict #1): the gunzip stage emits ONE ROW PER
    # MEMBER, never one concatenated row per file — per-row memory is one
    # record even when a shard holds millions of members
    from itext2kg_spark.sources.warc import gunzip_warc_members

    members = gunzip_warc_members(spark, p).collect()
    assert len(members) == sum(
        1 for payload in payloads
        for r in payload.split("WARC/1.0\r\n") if r
    )
    assert all(m["payload"].startswith("WARC/1.0\r\n") for m in members)
