"""Distributed BPE induction (functions/bpe.py) vs a pure-python
Sennrich reference with identical greedy/tie-break semantics."""

from collections import Counter

from itext2kg_spark.functions.bpe import EOW, bpe_segment, bpe_train


def _py_symbols(word):
    return list(word) + [EOW]


def _py_apply(symbols, a, b):
    out, pend = [], None
    for s in symbols:
        if pend == a and s == b:
            out.append(a + b)
            pend = None
        elif pend is None:
            pend = s
        else:
            out.append(pend)
            pend = s
    if pend is not None:
        out.append(pend)
    return out


def _py_train(texts, k):
    wf = Counter(w for t in texts for w in t.lower().split())
    syms = {w: _py_symbols(w) for w in wf}
    merges = []
    for _ in range(k):
        pc = Counter()
        for w, f in wf.items():
            s = syms[w]
            for x, y in zip(s, s[1:]):
                pc[(x, y)] += f
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        syms = {w: _py_apply(s, *best) for w, s in syms.items()}
    return merges, syms


CORPUS = [
    "low lower lowest low low",
    "new newer newest new newer",
    "wide wider widest",
    "aaa aa a aaa",        # overlap greediness
]


def test_train_matches_reference(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string"
    )
    merges, wf = bpe_train(docs, k=8)
    py_merges, py_syms = _py_train(CORPUS, 8)
    assert merges == py_merges
    got = {r["word"]: list(r["symbols"]) for r in wf.collect()}
    assert got == py_syms


def test_segment_matches_reference(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string"
    )
    merges, py_syms = _py_train(CORPUS, 6)
    seg = {
        r["doc_id"]: (r["n_pieces"], r["pieces"])
        for r in bpe_segment(docs, merges).collect()
    }
    for i, t in enumerate(CORPUS):
        pieces = [s for w in t.lower().split() for s in py_syms[w]]
        assert seg[i] == (len(pieces), " ".join(pieces))


def test_merge_is_greedy_left_to_right(spark):
    docs = spark.createDataFrame([(0, "aaaa aaaa")], "doc_id long, text string")
    merges, wf = bpe_train(docs, k=1)
    assert merges == [("a", "a")]
    syms = list(wf.collect()[0]["symbols"])
    assert syms == ["aa", "aa", EOW]
