"""Merge-semantics tests mirroring the reference's matcher unit tests
(tests/atom/test_atom_matching.py scenarios, re-expressed over DataFrames)."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from itext2kg_spark.config import ATOM
from itext2kg_spark.extract.embed import HashEmbedder
from itext2kg_spark.merge.kg import canonicalize_kg
from tests.kg_helpers import quintuples_df

EMB = HashEmbedder(256, 42)

OBS1 = datetime(2025, 7, 17)
OBS2 = datetime(2025, 9, 15)
OBS3 = datetime(2025, 9, 30)


def q(url, obs, idx, fact, s, sl, p, o, ol, t_start=None, t_end=None):
    return {
        "url": url,
        "obs_ts": obs,
        "lang": "en",
        "fact_idx": idx,
        "fact": fact,
        "subj_name": s,
        "subj_label": sl,
        "pred": p,
        "obj_name": o,
        "obj_label": ol,
        "t_start": t_start or [],
        "t_end": t_end or [],
    }


def build(spark, rows, existing=None):
    ents_prev, edges_prev = existing if existing else (None, None)
    return canonicalize_kg(
        quintuples_df(spark, rows), ATOM, EMB, ents_prev, edges_prev
    )


# -- exact entity matching (ref test :217-239) ------------------------------
def test_exact_entity_match_unifies(spark):
    rows = [
        q("u1", OBS1, 0, "John Doe works at Google since 2025-01-01.",
          "John Doe", "Person", "works_at", "Google", "Company", ["2025-01-01"]),
        q("u2", OBS2, 0, "John Doe works at Google since 2025-01-01.",
          "John Doe", "Person", "works_at", "Google", "Company", ["2025-01-01"]),
    ]
    ents, edges = build(spark, rows)
    assert ents.count() == 2  # john doe, google
    e = edges.collect()
    assert len(e) == 1
    assert e[0]["src_name"] == "john doe" and e[0]["dst_name"] == "google"


# -- timestamp combining (ref :241-280, :540-567) -----------------------------
def test_timestamp_lists_extend_on_merge(spark):
    rows = [
        q("u1", OBS1, 0, "f1", "John Doe", "Person", "works_at", "Google",
          "Company", ["2025-01-01"]),
        q("u2", OBS2, 0, "f2", "John Doe", "Person", "works_at", "Google",
          "Company", ["2025-03-01"]),
    ]
    _, edges = build(spark, rows)
    row = edges.collect()[0]
    assert len(row["t_obs"]) == 2
    assert len(row["t_start"]) == 2
    assert sorted(row["atomic_facts"]) == ["f1", "f2"]


# -- relationship equality ignores timestamps (ref :282-305) ------------------
def test_edge_identity_ignores_timestamps(spark):
    rows = [
        q("u1", OBS1, 0, "f1", "A", "Person", "works_at", "B", "Company",
          ["2025-01-01"]),
        q("u2", OBS2, 0, "f2", "A", "Person", "works_at", "B", "Company",
          ["2030-12-31"]),
    ]
    _, edges = build(spark, rows)
    assert edges.count() == 1


# -- 3-snapshot timeline (ref :428-538 / FIXTURES.md F4) ----------------------
def test_three_snapshot_timeline(spark):
    rows = [
        q("u1", OBS1, 0, "John Doe works at Google since 2025-01-01.",
          "John Doe", "Person", "works_at", "Google", "Company", ["2025-01-01"]),
        q("u1", OBS1, 1, "Jane Smith is the ceo of Apple since 2024-06-01.",
          "Jane Smith", "Person", "ceo_of", "Apple", "Company", ["2024-06-01"]),
        q("u2", OBS2, 0, "John Doe works at Google since 2025-01-01.",
          "John Doe", "Person", "works_at", "Google", "Company", ["2025-01-01"]),
        q("u2", OBS2, 1, "Jane Smith is the ceo of XAI since 2025-09-01.",
          "Jane Smith", "Person", "ceo_of", "XAI", "Company", ["2025-09-01"]),
        q("u3", OBS3, 0, "John Doe works at Google since 2025-01-01.",
          "John Doe", "Person", "works_at", "Google", "Company", ["2025-01-01"]),
        q("u3", OBS3, 1, "Jane Smith is no longer the ceo of Apple since 2025-09-01.",
          "Jane Smith", "Person", "ceo_of", "Apple", "Company", [], ["2025-09-01"]),
    ]
    ents, edges = build(spark, rows)
    names = {(r["name"], r["label"]) for r in ents.collect()}
    assert names == {
        ("john doe", "person"),
        ("jane smith", "person"),
        ("google", "company"),
        ("apple", "company"),
        ("xai", "company"),
    }
    by_key = {
        (r["src_name"], r["pred"], r["dst_name"]): r for r in edges.collect()
    }
    works = by_key[("john doe", "works_at", "google")]
    assert len(works["t_obs"]) >= 2 and len(works["atomic_facts"]) >= 2
    ceo_apple = by_key[("jane smith", "ceo_of", "apple")]
    assert len(ceo_apple["t_obs"]) == 2
    assert len(ceo_apple["t_end"]) == 1  # end-of-validity recorded
    assert ("jane smith", "ceo_of", "xai") in by_key


# -- invalid timestamps tolerated (ref :589-607) ------------------------------
def test_invalid_timestamps_skipped_not_fatal(spark):
    rows = [
        q("u1", OBS1, 0, "f", "A", "Person", "works_at", "B", "Company",
          ["not a date", "2025-01-01", "garbage!!"]),
    ]
    _, edges = build(spark, rows)
    row = edges.collect()[0]
    assert len(row["t_start"]) == 1  # only the parseable one survives


# -- empty inputs (ref :609-639) ----------------------------------------------
def test_empty_batch_merge_is_identity(spark):
    rows = [
        q("u1", OBS1, 0, "f", "A", "Person", "works_at", "B", "Company",
          ["2025-01-01"]),
    ]
    ents1, edges1 = build(spark, rows)
    # merge an empty batch against the existing KG
    empty = quintuples_df(spark, [])
    ents2, edges2 = canonicalize_kg(empty, ATOM, EMB, ents1, edges1)
    assert sorted((r["name"], r["label"]) for r in ents2.collect()) == sorted(
        (r["name"], r["label"]) for r in ents1.collect()
    )
    assert edges2.count() == edges1.count()


# -- similarity merge: variants unify, strangers don't ------------------------
def test_similarity_merge_thresholds(spark):
    rows = [
        q("u1", OBS1, 0, "f1", "acme corp", "Company", "acquired",
          "globex labs", "Company", ["2025-01-01"]),
        q("u2", OBS2, 0, "f2", "acme corp inc", "Company", "acquired",
          "globex labs", "Company", ["2025-01-01"]),
        q("u3", OBS3, 0, "f3", "soylent media", "Company", "acquired",
          "globex labs", "Company", ["2025-02-02"]),
    ]
    ents, edges = build(spark, rows)
    names = {r["name"] for r in ents.collect()}
    # "acme corp" and "acme corp inc" merge (cos≈0.83 >= 0.8); representative
    # is the lexicographic min; soylent stays separate (cos≈0.2)
    assert "acme corp" in names and "acme corp inc" not in names
    assert "soylent media" in names
    srcs = {r["src_name"] for r in edges.collect()}
    assert srcs == {"acme corp", "soylent media"}


# -- incremental: store representative wins (matcher.py:81-87) ----------------
def test_existing_store_representative_wins(spark):
    rows1 = [
        q("u1", OBS1, 0, "f1", "acme corp inc", "Company", "acquired",
          "globex labs", "Company", ["2025-01-01"]),
    ]
    store = build(spark, rows1)
    rows2 = [
        q("u2", OBS2, 0, "f2", "acme corp", "Company", "acquired",
          "globex labs", "Company", ["2025-06-01"]),
    ]
    ents, edges = build(spark, rows2, existing=store)
    names = {r["name"] for r in ents.collect()}
    # "acme corp" < "acme corp inc" lexicographically, but the STORE holds
    # "acme corp inc" — the existing object must win the representative choice
    assert "acme corp inc" in names and "acme corp" not in names
    row = edges.collect()[0]
    assert row["src_name"] == "acme corp inc"
    assert len(row["t_obs"]) == 2  # original + re-observation


def test_distributed_leader_refuses_above_sort_limit(spark):
    """Leader mode's distributed path needs a single-partition sort of the
    distinct-item table for the fold rank; above leader_sort_limit it must
    refuse with guidance instead of silently sorting (resolve.py guard)."""
    from itext2kg_spark.config import MatchConfig
    from itext2kg_spark.merge.resolve import resolve_items

    df = spark.createDataFrame(
        [(f"n{i}", i, [1.0, 0.0]) for i in range(6)],
        "name string, first_seen long, emb array<double>",
    )
    cfg = MatchConfig(
        link_mode="leader",
        broadcast_limit=0,  # force the distributed path
        candidate_method="broadcast",
        leader_sort_limit=3,
    )
    with pytest.raises(ValueError, match="leader_sort_limit"):
        resolve_items(
            df, cfg, 0.8, key_cols=["name"], emb_col="emb",
            order_col="first_seen",
        )
    # at/below the limit the distributed fold still runs
    ok = resolve_items(
        df.limit(3), cfg, 0.8, key_cols=["name"], emb_col="emb",
        order_col="first_seen",
    )
    assert ok.count() == 3


def test_salted_edge_aggregation_identical_output(spark):
    """cfg.edge_salt > 1 (two-phase salted list accumulation for hot edges)
    must produce byte-identical edges to the single-phase default — the sort
    runs once over the final multiset, so bucketing cannot reorder it."""
    from dataclasses import replace

    from itext2kg_spark.config import ATOM
    from itext2kg_spark.pipeline import KGPipeline
    from itext2kg_spark.sources.pages import synth_pages

    pages = synth_pages(spark, 80, seed=17).localCheckpoint()
    base = sorted(map(tuple, KGPipeline(ATOM).build_graph(pages)[1].collect()))
    salted = sorted(
        map(
            tuple,
            KGPipeline(replace(ATOM, edge_salt=8)).build_graph(pages)[1].collect(),
        )
    )
    assert base == salted and len(base) > 0


def test_driver_and_distributed_paths_equivalent_randomized(spark):
    """Randomized equivalence of the two physical resolution strategies: the
    driver BLAS path and the LSH/CC distributed path must induce the same
    clustering (keys grouped by component) and the same key -> canonical-key
    mapping, for both is_existing mixes and both threshold regimes. comp ids
    themselves differ by construction (indices vs xxhash64), so the partition
    structure is compared, not the labels."""
    import random

    from itext2kg_spark.config import MatchConfig
    from itext2kg_spark.merge.resolve import resolve_items

    rnd = random.Random(1234)

    def run(cfg, rows):
        df = spark.createDataFrame(
            rows, "name string, first_seen long, is_existing boolean,"
            " emb array<double>"
        )
        out = resolve_items(
            df, cfg, 0.9, key_cols=["name"], emb_col="emb",
            order_col="first_seen",
        ).collect()
        groups = {}
        for r in out:
            groups.setdefault(r["comp"], set()).add(r["name"])
        partition = frozenset(frozenset(g) for g in groups.values())
        canon = {r["name"]: r["canon_name"] for r in out}
        return partition, canon

    for trial in range(4):
        # clustered unit vectors in 2D: a few base angles, per-item jitter
        # small enough that same-base cosine > 0.9 > cross-base cosine
        import math

        rows = []
        n_bases = rnd.randint(2, 4)
        bases = [rnd.uniform(0, math.pi) for _ in range(n_bases)]
        for i in range(rnd.randint(4, 12)):
            a = bases[rnd.randrange(n_bases)] + rnd.uniform(-0.05, 0.05)
            rows.append(
                (
                    f"n{i}",
                    i,
                    rnd.random() < 0.3,
                    [math.cos(a), math.sin(a)],
                )
            )
        driver_cfg = MatchConfig(candidate_method="broadcast")
        dist_cfg = MatchConfig(broadcast_limit=0, candidate_method="broadcast")
        got_d = run(driver_cfg, rows)
        got_x = run(dist_cfg, rows)
        assert got_d == got_x, f"trial {trial}: {got_d} != {got_x}"


def test_empty_batch_build_graph(spark):
    """Zero-page batches must produce empty (entities, edges) standalone AND
    leave an existing store state untouched when merged incrementally —
    exercises the n=0 driver-resolve path and its empty LocalRelation."""
    from itext2kg_spark.pipeline import KGPipeline
    from itext2kg_spark.sources.pages import synth_pages

    pipe = KGPipeline()
    empty = synth_pages(spark, 5, seed=1).limit(0)
    ents, edges = pipe.build_graph(empty)
    assert ents.count() == 0 and edges.count() == 0

    prev_e, prev_d = pipe.build_graph(synth_pages(spark, 20, seed=3))
    prev_e, prev_d = prev_e.localCheckpoint(), prev_d.localCheckpoint()
    e2, d2 = pipe.build_graph(empty, prev_e, prev_d)
    assert e2.count() == prev_e.count()
    assert sorted(map(tuple, d2.collect())) == sorted(map(tuple, prev_d.collect()))
