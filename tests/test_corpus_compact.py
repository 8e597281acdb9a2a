"""CorpusStore compaction: base folding, vacuum semantics, stream safety."""

import os

from itext2kg_spark.corpus import CorpusStore
from itext2kg_spark.streaming.corpus_stream import run_corpus_stream_batch

KW = dict(langs=("en", "und"), min_tokens=5, min_quality_10k=0,
          near_dup_threshold=None)

TEXTS = [
    "the cat and the dog of the house in a tree that runs for fun today",
    "a fine day for the old dog and the young cat to nap in the big house",
    "rivers run down from the hills to the valley where the town sleeps",
    "numbers and letters fill the page while the quiet machine hums along",
]


def _docs(spark, ids_texts):
    return spark.createDataFrame(ids_texts, "doc_id long, text string")


def _surv_ids(spark, store):
    return sorted(r["doc_id"] for r in store.load_survivors(spark).collect())


def test_compact_preserves_survivors_and_shrinks_reads(spark, tmp_path):
    store = CorpusStore(str(tmp_path / "c"))
    for i, t in enumerate(TEXTS[:3]):
        store.run_batch(_docs(spark, [(i, t)]), **KW)
    before = _surv_ids(spark, store)
    assert store.compact(spark) == 2
    assert _surv_ids(spark, store) == before
    # loads now come from the single base directory, not 3 delta dirs
    files = store.load_survivors(spark).inputFiles()
    assert all("/base/through=2/" in f for f in files)
    # nothing newer than the base: compaction is a no-op
    assert store.compact(spark) is None


def test_compact_then_append_then_recompact(spark, tmp_path):
    store = CorpusStore(str(tmp_path / "c2"))
    store.run_batch(_docs(spark, [(0, TEXTS[0])]), **KW)
    store.run_batch(_docs(spark, [(1, TEXTS[1])]), **KW)
    assert store.compact(spark) == 1
    # appends keep working against the base; dedup still sees stored docs
    d = store.run_batch(_docs(spark, [(10, TEXTS[0]), (2, TEXTS[2])]), **KW)
    assert sorted(r["doc_id"] for r in d.collect()) == [2]  # 10 is a dup
    assert _surv_ids(spark, store) == [0, 1, 2]
    # recompact folds base + the new delta; the old base is superseded
    assert store.compact(spark, vacuum=True) == 2
    assert _surv_ids(spark, store) == [0, 1, 2]
    assert store.current_base() == 2
    assert not os.path.exists(store._base_dir(1))


def test_vacuum_keeps_markers_and_stream_tracking(spark, tmp_path):
    store = CorpusStore(str(tmp_path / "c3"))
    for epoch, t in enumerate(TEXTS[:2]):
        assert run_corpus_stream_batch(
            _docs(spark, [(epoch, t)]), epoch, store, stream_key="s", **KW
        ) is True
    assert store.compact(spark, vacuum=True) == 1
    # folded delta data is gone, markers remain
    assert not os.path.exists(os.path.join(store._snap_dir(0), "docs"))
    assert os.path.exists(os.path.join(store._snap_dir(0), "_COMMITTED"))
    assert store.committed_batches() == [0, 1]
    # stream replay detection survives vacuum (markers carry the epochs)
    assert store.last_stream_epoch("s") == 1
    assert run_corpus_stream_batch(
        _docs(spark, [(0, TEXTS[0])]), 1, store, stream_key="s", **KW
    ) is False
    # and new epochs keep applying with correct dedup against the base
    assert run_corpus_stream_batch(
        _docs(spark, [(7, TEXTS[0]), (8, TEXTS[2])]), 2, store,
        stream_key="s", **KW
    ) is True
    assert _surv_ids(spark, store) == [0, 1, 8]
    # batch ids allocated after vacuum continue past the folded range
    assert store.committed_batches() == [0, 1, 2]
