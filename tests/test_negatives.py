"""Deterministic KG negative sampling (functions/negatives.py)."""

import hashlib

from itext2kg_spark.functions.negatives import entity_index, kg_negative_samples

EDGES = [
    ("a", "knows", "b"),
    ("a", "knows", "c"),
    ("b", "likes", "c"),
    ("c", "knows", "a"),
    ("d", "likes", "a"),
]


def _edges(spark):
    return spark.createDataFrame(
        EDGES, "src_name string, pred string, dst_name string"
    )


def _py_cand(src, pred, dst, j, n, names):
    h = int(
        hashlib.md5(f"kgneg-v1:{src}:{pred}:{dst}:{j}".encode()).hexdigest()[:15],
        16,
    )
    return names[h % n]


def test_candidates_pinned_to_hashlib_and_filtered(spark):
    names = sorted({x for e in EDGES for x in (e[0], e[2])})
    got = {
        (r["src_name"], r["pred"], r["dst_name"], r["neg_j"]): r["neg_dst"]
        for r in kg_negative_samples(_edges(spark), k=3).collect()
    }
    true_set = set(EDGES)
    expected = {}
    for s, p, d in EDGES:
        for j in (1, 2, 3):
            c = _py_cand(s, p, d, j, len(names), names)
            if (s, p, c) not in true_set:
                expected[(s, p, d, j)] = c
    assert got == expected
    assert len(expected) > 0
    # nothing in the output is an accidental positive
    for (s, p, _d, _j), c in got.items():
        assert (s, p, c) not in true_set


def test_entity_index_dense_and_ordered(spark):
    idx = {r["name"]: r["idx"] for r in entity_index(_edges(spark)).collect()}
    names = sorted(idx)
    assert [idx[n] for n in names] == list(range(len(names)))


def test_deterministic_replay(spark):
    a = sorted(map(tuple, kg_negative_samples(_edges(spark), k=2).collect()))
    b = sorted(map(tuple, kg_negative_samples(_edges(spark), k=2).collect()))
    assert a == b
