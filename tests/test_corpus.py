"""prepare_corpus: every stage of the fused training-corpus pass acts."""

import pyspark.sql.functions as F

from itext2kg_spark.corpus import prepare_corpus

EN = ("the cat and the dog of the house in a tree that runs for fun "
      "and it is a good day for the animals to play in the sun today")
FR = "le chat et le chien de la maison est dans un arbre pour la journee"


def _docs(spark):
    base = EN.split()
    near = list(base)
    near[5] = "hound"          # one token changed -> Jaccard ~ 0.9
    rows = [
        (0, EN),                               # survives everything
        (1, FR),                               # dropped: lang filter
        (2, "short text only"),                # dropped: min_tokens
        (3, "  " + EN + "  "),                 # dropped: exact dup of 0 (normalized fp)
        (4, " ".join(near)),                   # dropped: near-dup of 0, keep min id
        (5, "!!! ??? ... ;;; " * 10),          # dropped: quality (pure punctuation)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_prepare_corpus_all_stages(spark):
    out = prepare_corpus(
        _docs(spark), langs=("en",), min_tokens=10,
        min_quality_10k=4500, near_dup_threshold=0.8,
    )
    rows = out.collect()
    assert [r["doc_id"] for r in rows] == [0]
    r = rows[0]
    assert r["lang_pred"] == "en"
    assert r["n_tokens"] == len(EN.split())
    assert r["rep_id"] == 0
    # enrichment is carried, not recomputed downstream
    assert set(out.columns) == {
        "fp", "doc_id", "text", "lang_pred", "n_tokens", "quality_10k", "rep_id"
    }


def test_prepare_corpus_exact_only_mode(spark):
    out = prepare_corpus(
        _docs(spark), langs=("en", "fr", "und"), min_tokens=1,
        min_quality_10k=0, near_dup_threshold=None,
    )
    # only the normalized exact dup (doc 3) is dropped
    assert sorted(r["doc_id"] for r in out.collect()) == [0, 1, 2, 4, 5]


def test_prepare_corpus_single_scan_enrichment(spark):
    """The enrichment + filters compile into the scan-side projection: no
    UDF (BatchEvalPython/ArrowEvalPython) stages anywhere in the plan, and
    the near-dup stage is the only source of shuffles beyond the exact-dedup
    groupBy."""
    plan = prepare_corpus(
        _docs(spark), near_dup_threshold=None
    )._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


def test_incremental_survivors_stored_wins(spark, tmp_path):
    """Cross-batch dedup through CorpusStore: stored survivors always win
    (exact fp and near-dup), within-batch keep-one still applies, replay of
    a committed batch id is a no-op, and a partial snapshot without
    _COMMITTED is invisible."""
    import os

    from itext2kg_spark.corpus import CorpusStore

    store = CorpusStore(str(tmp_path / "corpus"))
    kwargs = dict(langs=("en",), min_tokens=10, min_quality_10k=0,
                  near_dup_threshold=0.7)

    base = EN.split()
    near = list(base); near[5] = "hound"
    other = ("a fine day for the old dog and the young cat to nap in the "
             "big warm house by the sea with the wind and the rain outside")
    o_near = other.split(); o_near[4] = "ancient"

    b1 = spark.createDataFrame(
        [(0, EN), (1, " ".join(near))], "doc_id long, text string"
    )
    d1 = store.run_batch(b1, **kwargs)
    assert [r["doc_id"] for r in d1.collect()] == [0]  # keep-one within batch

    b2 = spark.createDataFrame(
        [
            (10, "   " + EN),            # exact dup of stored 0 (normalized fp)
            (11, " ".join(near)),        # near-dup of stored 0
            (12, other),                 # genuinely new
            (13, " ".join(o_near)),      # near-dup of 12 (same batch)
        ],
        "doc_id long, text string",
    )
    d2 = store.run_batch(b2, **kwargs)
    assert sorted(r["doc_id"] for r in d2.collect()) == [12]

    # replay: same batch id returns the stored delta without recompute
    replay = store.run_batch(b2, batch_id=1, **kwargs)
    assert sorted(r["doc_id"] for r in replay.collect()) == [12]
    assert store.committed_batches() == [0, 1]

    # survivor corpus is the union of deltas
    surv = store.load_survivors(spark)
    assert sorted(r["doc_id"] for r in surv.collect()) == [0, 12]

    # a partial snapshot without _COMMITTED is invisible
    partial = store._snap_dir(7)
    os.makedirs(partial)
    assert store.committed_batches() == [0, 1]


def test_incremental_bridge_through_dropped_doc(spark):
    """Documented streaming approximation: batch-2 doc near the DROPPED
    batch-1 doc (but not the kept one) is retained, because the dropped
    doc's cluster edges left with it."""
    from itext2kg_spark.corpus import incremental_survivors

    base = [f"w{i}" for i in range(50)]
    b = list(base); b[10] = "xx"      # near base (kept drops it)
    c = list(b); c[30] = "yy"        # near b only, NOT near base

    batch1 = spark.createDataFrame(
        [(0, " ".join(base)), (1, " ".join(b))], "doc_id long, text string"
    )
    s1 = incremental_survivors(batch1, None, langs=("en", "und"),
                               near_dup_threshold=0.8)
    assert [r["doc_id"] for r in s1.collect()] == [0]

    batch2 = spark.createDataFrame(
        [(10, " ".join(c))], "doc_id long, text string"
    )
    s2 = incremental_survivors(batch2, s1, langs=("en", "und"),
                               near_dup_threshold=0.8)
    # one-shot over {base, b, c} would keep only doc 0; incrementally the
    # bridge doc b is gone, so c (id 10) survives — the documented delta
    assert [r["doc_id"] for r in s2.collect()] == [10]


def test_incremental_exact_equals_one_shot(spark):
    """Exact mode (near_dup_threshold=None) over range-ordered batches is
    EXACTLY the one-shot pass — the contract the corpus_incremental_exact
    driver oracle pins at scale."""
    from itext2kg_spark.corpus import incremental_survivors, prepare_corpus

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    kwargs = dict(langs=("en",), min_tokens=20, min_quality_10k=4500,
                  near_dup_threshold=None)
    lo = docs.where(F.col("doc_id") < 250)
    hi = docs.where(F.col("doc_id") >= 250)
    s1 = incremental_survivors(lo, None, **kwargs)
    s2 = incremental_survivors(hi, s1, **kwargs)
    inc = {r["doc_id"] for r in s1.select("doc_id").collect()} | {
        r["doc_id"] for r in s2.select("doc_id").collect()
    }
    one = {r["doc_id"] for r in prepare_corpus(docs, **kwargs).collect()}
    assert inc == one
