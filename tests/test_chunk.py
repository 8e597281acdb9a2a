"""Token-window chunking (functions/chunk.py)."""

import pytest

from itext2kg_spark.functions.chunk import chunk_documents


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _py_chunks(text, size, stride):
    toks = text.split()
    return [
        (i, s, toks[s : s + size])
        for i, s in enumerate(range(0, len(toks), stride))
    ]


def test_disjoint_cover_and_short_tail(spark):
    text = " ".join(f"t{i}" for i in range(10))
    got = sorted(
        (r["chunk_id"], r["start_tok"], r["n_tokens"], r["chunk"])
        for r in chunk_documents(_docs(spark, [(0, text)]), size=4).collect()
    )
    assert got == [
        (0, 0, 4, "t0 t1 t2 t3"),
        (1, 4, 4, "t4 t5 t6 t7"),
        (2, 8, 2, "t8 t9"),
    ]
    # disjoint cover: concatenation reconstructs the document
    assert " ".join(c for *_, c in got) == text


def test_overlap_matches_reference(spark):
    text = " ".join(f"w{i}" for i in range(23))
    rows = chunk_documents(_docs(spark, [(0, text)]), size=8, stride=5).collect()
    got = {r["chunk_id"]: (r["start_tok"], r["chunk"].split()) for r in rows}
    for cid, s, toks in _py_chunks(text, 8, 5):
        assert got[cid] == (s, toks)
    assert len(got) == len(_py_chunks(text, 8, 5))


def test_empty_and_whitespace_docs_emit_nothing(spark):
    out = chunk_documents(
        _docs(spark, [(0, ""), (1, "   "), (2, "one")]), size=400
    ).collect()
    assert [(r["doc_id"], r["chunk"]) for r in out] == [(2, "one")]


def test_bad_params_raise(spark):
    with pytest.raises(ValueError):
        chunk_documents(_docs(spark, [(0, "a")]), size=0)
    with pytest.raises(ValueError):
        chunk_documents(_docs(spark, [(0, "a")]), size=4, stride=0)


def test_chunk_plan_no_shuffle_no_python(spark):
    plan = (
        chunk_documents(_docs(spark, [(0, "a b c")]), size=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "EvalPython" not in plan
    assert "Generate" in plan
