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
