"""Unit tests for the training-data operators: dedup family, ANN, text
analysis, multimodal plumbing, LSH candidate recall."""

import pytest
from pyspark.sql import functions as F

from itext2kg_spark.config import MatchConfig
from itext2kg_spark.dedup.exact import dedup_keep_first, exact_duplicates
from itext2kg_spark.dedup.minhash import minhash_lsh_pairs
from itext2kg_spark.dedup.ngram import jaccard_pairs
from itext2kg_spark.dedup.simhash import simhash_pairs
from itext2kg_spark.dedup.embedding import embedding_near_dups
from itext2kg_spark.extract.embed import HashEmbedder
from itext2kg_spark.functions.text import lang_id, text_stats
from itext2kg_spark.merge.candidates import candidate_pairs
from itext2kg_spark.functions.vectors import unit
from itext2kg_spark.similarity.ann import ann_topk_bruteforce, ann_topk_lsh


BASE = "the quick brown fox jumps over the lazy dog again and again today"
NEAR = BASE + " tonight"  # high 3-gram overlap
FAR = "completely different content about spark shuffles and joins here now"


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, BASE),
        (1, BASE),          # exact dup of 0
        (2, NEAR),          # near dup of 0/1
        (3, FAR),
        (4, "tiny"),        # shorter than one 3-gram window
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup(spark, docs):
    groups = exact_duplicates(docs).collect()
    sizes = sorted(g["n_dups"] for g in groups)
    assert sizes == [1, 1, 1, 2]
    kept = dedup_keep_first(docs)
    assert kept.count() == 4
    assert kept.where(F.col("doc_id") == 1).count() == 0  # min-id keeper wins


def test_ngram_jaccard_pairs(spark, docs):
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard_10k"]
        for r in jaccard_pairs(docs, threshold=0.5).collect()
    }
    assert pairs[(0, 1)] == 10000  # identical
    assert (0, 2) in pairs and pairs[(0, 2)] >= 5000
    assert all(3 not in p and 4 not in p for p in pairs)


def test_ngram_hot_gram_cutoff(spark):
    """max_gram_df drops boilerplate grams BEFORE the self-join: a gram
    shared by every doc would otherwise expand to n^2/2 candidate pairs at
    web scale. With the cutoff below the corpus size, docs related only
    through the hot gram produce no pair."""
    hot = "all rights reserved"  # one shared boilerplate 3-gram
    rows = [(i, f"unique{i} article{i} body{i} " + hot) for i in range(6)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    with_cut = jaccard_pairs(docs, threshold=0.1, max_gram_df=3).collect()
    assert with_cut == []
    without = jaccard_pairs(docs, threshold=0.1, max_gram_df=None).collect()
    assert len(without) == 15  # all C(6,2) pairs share the hot gram


def test_minhash_matches_exact_jaccard(spark, docs):
    exact = {
        (r["id_a"], r["id_b"]) for r in jaccard_pairs(docs, threshold=0.8).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(docs, threshold=0.8).collect()
    }
    assert lsh == exact


def test_simhash_finds_near_dups(spark, docs):
    pairs = {(r["id_a"], r["id_b"]): r["hamming"] for r in
             simhash_pairs(docs, max_hamming=6, bands=8).collect()}
    assert pairs.get((0, 1)) == 0  # identical text -> identical signature
    assert (0, 3) not in pairs


def test_embedding_near_dups_and_lsh_agree(spark):
    emb = HashEmbedder(32, 7)
    texts = [f"cluster{i // 3} item variant {i % 3}" for i in range(30)]
    mat = emb(texts)
    rows = [(i, [float(x) for x in mat[i]]) for i in range(len(texts))]
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    exact = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_dups(vecs, 0.8, method="broadcast").collect()
    }
    lsh = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_dups(vecs, 0.8, method="lsh").collect()
    }
    assert exact, "fixture should produce near-dup pairs"
    # LSH with default (6,24) at θ=0.8 has ≥0.999 per-pair recall
    assert lsh == exact


def test_lsh_candidate_recall_against_broadcast(spark):
    emb = HashEmbedder(64, 42)
    texts = [f"entity {i % 20} variant {i % 4}" for i in range(100)]
    mat = emb(texts)
    rows = [(i, [float(x) for x in mat[i]]) for i in range(100)]
    df = spark.createDataFrame(rows, "id long, emb array<float>").withColumn(
        "emb", unit(F.col("emb").cast("array<double>"))
    )
    exact = candidate_pairs(
        df, MatchConfig(candidate_method="broadcast"), 0.8
    )
    lsh = candidate_pairs(df, MatchConfig(candidate_method="lsh"), 0.8)
    e = {(r["id_a"], r["id_b"]) for r in exact.collect()}
    l = {(r["id_a"], r["id_b"]) for r in lsh.collect()}
    assert len(e) > 0
    recall = len(e & l) / len(e)
    assert recall >= 0.99, f"LSH recall {recall}"
    assert l <= e  # exact-cosine verification removes false candidates


def test_ann_topk_and_lsh(spark):
    emb = HashEmbedder(32, 3)
    texts = [f"doc number {i} about topic {i % 5}" for i in range(40)]
    mat = emb(texts)
    rows = [(i, [float(x) for x in mat[i]]) for i in range(40)]
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = vecs.where(F.col("vec_id") < 3)
    bf = ann_topk_bruteforce(q, vecs, k=4)
    got = bf.collect()
    assert len(got) == 12
    for r in got:
        assert r["query_id"] != r["neighbor_id"]
    # rank 1 neighbor shares the topic (highest token overlap)
    top1 = {r["query_id"]: r["neighbor_id"] for r in got if r["rank"] == 1}
    for qid, nid in top1.items():
        assert nid % 5 == qid % 5
    # LSH version returns <= k rows per query with plausible overlap
    lsh = ann_topk_lsh(q, vecs, k=4, rows=4, bands=16)
    per_q = lsh.groupBy("query_id").count().collect()
    assert all(r["count"] <= 4 for r in per_q)


def test_text_stats_and_langid(spark):
    rows = [
        (0, "the cat and the dog, in a house."),
        (1, "le chat est dans la maison et il dort."),
        (2, "xyzzy qwerty asdf"),
        (3, ""),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    stats = {r["doc_id"]: r for r in text_stats(docs).collect()}
    assert stats[0]["n_tokens"] == 8
    assert stats[3]["n_tokens"] == 0
    assert stats[0]["stop_ratio_10k"] > 0
    langs = {r["doc_id"]: r["lang_pred"] for r in lang_id(docs).collect()}
    assert langs[0] == "en"
    assert langs[1] == "fr"
    assert langs[2] == "und"


def test_multimodal_plumbing(spark):
    from itext2kg_spark.extract.multimodal import (
        decode_image,
        extract_media_features,
        synth_media,
    )

    media = synth_media(spark, 12)
    feats = extract_media_features(media, fake=True)
    rows = feats.collect()
    assert len(rows) == 12
    for r in rows:
        assert len(r["feature"]) == 16
        assert r["n_bytes"] > 0 and len(r["sha"]) == 64
    # determinism across runs
    again = {r["url"]: r["sha"] for r in extract_media_features(media, fake=True).collect()}
    assert {r["url"]: r["sha"] for r in rows} == again
    # the real decode path is explicitly stubbed
    with pytest.raises(NotImplementedError):
        decode_image(b"\x00")


def test_multimodal_resize_and_frame_sampling(spark):
    from itext2kg_spark.extract.multimodal import (
        resize_images,
        sample_frames,
        synth_media,
    )

    media = synth_media(spark, 18).localCheckpoint()
    resized = resize_images(media, 64, 64, fake=True).collect()
    n_images = media.where(F.col("kind") == "image").count()
    assert len(resized) == n_images > 0
    for r in resized:
        assert r["meta"]["width"] == 64 and r["meta"]["height"] == 64
        assert len(r["content"]) == max(16, 64 * 64 // 256)

    frames = sample_frames(media, every_ms=5000, max_frames=8, fake=True)
    rows = frames.collect()
    videos = {
        r["url"]: r["meta"]["duration_ms"]
        for r in media.where(F.col("kind") == "video").collect()
    }
    assert {r["url"] for r in rows} <= set(videos)
    by_url = {}
    for r in rows:
        by_url.setdefault(r["url"], []).append((r["frame_idx"], r["t_ms"]))
        assert len(r["frame"]) == 32
    for url, fs in by_url.items():
        expected = min(8, videos[url] // 5000 + 1)
        assert sorted(fs) == [(k, k * 5000) for k in range(expected)]
    # determinism
    again = sorted(
        (r["url"], r["frame_idx"], bytes(r["frame"])) for r in frames.collect()
    )
    assert again == sorted(
        (r["url"], r["frame_idx"], bytes(r["frame"])) for r in rows
    )


def test_ann_ivf_recall(spark):
    from itext2kg_spark.similarity.ann import ann_topk_bruteforce, ann_topk_ivf

    emb = HashEmbedder(32, 9)
    texts = [f"doc {i} topic {i % 6} cluster token{i % 6}" for i in range(120)]
    mat = emb(texts)
    rows = [(i, [float(x) for x in mat[i]]) for i in range(120)]
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = vecs.where(F.col("vec_id") < 6)
    exact = {(r["query_id"], r["neighbor_id"]) for r in
             ann_topk_bruteforce(q, vecs, k=5).collect()}
    ivf = {(r["query_id"], r["neighbor_id"]) for r in
           ann_topk_ivf(q, vecs, k=5, n_cells=8, n_probe=3).collect()}
    recall = len(exact & ivf) / len(exact)
    assert recall >= 0.9, f"IVF recall {recall}"


def test_bpe_token_count_matches_re(spark):
    """BPE-ish piece counting: Spark's Java-regex tokenization must agree
    with Python re (leftmost-first over the same alternation) on contraction
    / mixed-alnum / whitespace edges — the same property the DuckDB oracle
    relies on (RE2 is leftmost-first too)."""
    import re

    from pyspark.sql import functions as F

    from itext2kg_spark.functions.text import BPE_PIECE_RE, token_counts

    texts = [
        "it's a test",
        "don't stop",
        "abc123!@# def",
        "  leading",
        "",
        "CamelCase99'll",
        "a'sb",
        "x''y",
        "multi  spaces\tand\nnewlines",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_ws_tokens"], r["n_bpe_pieces"])
        for r in token_counts(df).collect()
    }
    rx = re.compile(BPE_PIECE_RE)
    for i, t in enumerate(texts):
        n_bpe = sum(1 for m in rx.finditer(t) if m.group(0).strip() != "")
        n_ws = len(t.split()) if t.strip() else 0
        assert got[i] == (n_ws, n_bpe), f"{t!r}: {got[i]} != {(n_ws, n_bpe)}"


def test_ann_ivf_auto_scaling_recall(spark):
    """VERDICT r3 #7: with AUTO cell count (ceil(sqrt(N)), ~1/8 probe
    fraction) recall must stay stable across a 10x corpus growth WITHOUT
    retuning — a fixed cell count degenerates to either a scan (too few
    cells at large N) or empty cells (too many at small N)."""
    import numpy as np

    from itext2kg_spark.similarity.ann import ann_topk_bruteforce, ann_topk_ivf

    for n in (400, 4000):
        rng = np.random.Generator(np.random.PCG64(11))
        n_clusters = max(8, n // 50)
        centers = rng.normal(size=(n_clusters, 64))
        centers /= np.linalg.norm(centers, axis=1, keepdims=True)
        v = centers[rng.integers(0, n_clusters, n)] + 0.15 * rng.normal(size=(n, 64))
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        df = spark.createDataFrame(
            [(i, v[i].tolist()) for i in range(n)],
            "vec_id long, embedding array<double>",
        )
        q = df.where("vec_id < 25")
        exact = {
            (r.query_id, r.neighbor_id)
            for r in ann_topk_bruteforce(q, df, k=5).collect()
        }
        ivf = {
            (r.query_id, r.neighbor_id)
            for r in ann_topk_ivf(q, df, k=5).collect()  # no tuning args
        }
        recall = len(exact & ivf) / len(exact)
        assert recall >= 0.9, f"auto-IVF recall {recall} at n={n}"


def test_ann_ivf_full_probe_is_exact(spark):
    """Probing every cell must reproduce brute force exactly (the plumbing
    invariant behind the ann_ivf_recall oracle query)."""
    import numpy as np

    from itext2kg_spark.similarity.ann import ann_topk_bruteforce, ann_topk_ivf

    rng = np.random.Generator(np.random.PCG64(3))
    v = rng.normal(size=(300, 32))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    df = spark.createDataFrame(
        [(i, v[i].tolist()) for i in range(300)],
        "vec_id long, embedding array<double>",
    )
    q = df.where("vec_id < 10")
    exact = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in ann_topk_bruteforce(q, df, k=4).collect()
    }
    full = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in ann_topk_ivf(q, df, k=4, n_cells=12, n_probe=12).collect()
    }
    assert full == exact


def test_simhash_verified_equals_ngram_truth(spark, docs):
    """simhash_verified_pairs == jaccard_pairs whenever true pairs sit
    within the Hamming budget (the dedup_simhash_verified oracle contract)."""
    from itext2kg_spark.dedup.ngram import jaccard_pairs
    from itext2kg_spark.dedup.simhash import simhash_verified_pairs

    truth = {tuple(r) for r in jaccard_pairs(docs, threshold=0.8, n=3).collect()}
    got = {
        tuple(r)
        for r in simhash_verified_pairs(
            docs, threshold=0.8, max_hamming=15, bands=16, n=3
        ).collect()
    }
    assert got == truth and len(truth) > 0


def test_simhash_batch_matches_reference():
    """The vectorized batch kernel (cached token bits + counts@bits matmul)
    must equal the per-doc reference `_simhash` value-for-value — incl.
    repeated tokens, unicode, empty/whitespace text, and cache reuse across
    two calls."""
    from itext2kg_spark.dedup.simhash import _simhash, _simhash_batch

    texts = [
        "the quick brown fox the quick",
        "completely different content here",
        "x",
        "",
        "   ",
        "café naïve résumé café",
        "a b c d e f g h i j k l m n o p",
    ]
    for _ in range(2):  # second pass exercises the warm cache path
        assert list(_simhash_batch(texts)) == [_simhash(t) for t in texts]


def test_simhash_signature_sql_parity():
    """The md5 bit-source contract behind the dedup_simhash oracle:
    DuckDB's md5_number_upper(tok) IS int.from_bytes(md5(tok)[:8],'little'),
    and the full signature arithmetic (tf-weighted sign sums, LSB-first bit
    packing) reproduces _simhash bit-exactly in SQL — incl. repeated tokens,
    unicode, and the empty-text zero signature."""
    import duckdb

    from itext2kg_spark.dedup.simhash import _simhash

    texts = [
        "the quick brown fox the quick",
        "completely different content here",
        "x",
        "",
        "   ",
        "café naïve résumé café",
        "a b c d e f g h i j k l m n o p",
    ]
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE docs AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, ?)" for i in range(len(texts)))
        + ") t(doc_id, text)",
        texts,
    )
    rows = dict(
        con.sql(
            r"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
  FROM docs WHERE length(trim(text)) > 0
),
tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY doc_id, tok),
hv AS (SELECT doc_id, tf, md5_number_upper(tok) AS h FROM tf),
bits AS (
  SELECT doc_id, j, sum(tf * (2 * CAST((h >> j) & 1 AS BIGINT) - 1)) AS acc
  FROM hv CROSS JOIN (SELECT unnest(range(64)) AS j) js
  GROUP BY doc_id, j
),
sig0 AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN acc > 0 THEN (1::UBIGINT << j) ELSE 0::UBIGINT END)
              AS UBIGINT) AS sig
  FROM bits GROUP BY doc_id
)
SELECT d.doc_id, COALESCE(s.sig, 0::UBIGINT) AS sig
FROM docs d LEFT JOIN sig0 s USING (doc_id)
"""
        ).fetchall()
    )
    for i, t in enumerate(texts):
        assert _simhash(t) & ((1 << 64) - 1) == int(rows[i]), repr(t)


def test_verified_df_cutoff_counts_full_corpus(spark):
    """The df cutoff inside candidate-verified dedup must count document
    frequency over the FULL corpus, not the candidate-restricted gram table
    (round-4 advice): a boilerplate gram with corpus df above the cutoff but
    candidate df below it must be dropped by BOTH plain jaccard_pairs and
    the verified paths, or shared counts / |A| / |B| diverge."""
    from itext2kg_spark.dedup.simhash import simhash_verified_pairs

    boiler = "all rights reserved worldwide"
    near_a = "the quick brown fox jumps over the lazy dog " + boiler
    near_b = "the quick brown fox jumps over the lazy dog tonight " + boiler
    rows = [(0, near_a), (1, near_b)] + [
        # six unrelated docs that share ONLY the boilerplate tail: corpus df
        # of the boiler grams is 8 (> cutoff 3), candidate df is 2 (<= 3)
        (i, f"totally unrelated filler number {i} with unique words {i*7} " + boiler)
        for i in range(2, 8)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    cut = 3
    truth = {
        tuple(r)
        for r in jaccard_pairs(docs, threshold=0.5, max_gram_df=cut).collect()
    }
    got = {
        tuple(r)
        for r in simhash_verified_pairs(
            docs, threshold=0.5, max_hamming=14, bands=16, max_gram_df=cut
        ).collect()
    }
    assert got == truth
    got_mh = {
        tuple(r)
        for r in minhash_lsh_pairs(docs, threshold=0.5, max_gram_df=cut).collect()
    }
    assert got_mh == truth


def test_gram_materialize_guard_flips(spark, docs, monkeypatch):
    """The "auto" gram materialization picks non-fault-tolerant
    localCheckpoint only below GRAM_LOCAL_CKPT_MAX_BYTES (estimated); above
    it the table goes to persist(DISK_ONLY) with lineage retained. Output is
    identical under every strategy."""
    from itext2kg_spark.dedup import ngram
    from pyspark.storagelevel import StorageLevel

    base = {tuple(r) for r in jaccard_pairs(docs, threshold=0.5).collect()}
    for strategy in ("none", "local", "persist"):
        got = {
            tuple(r)
            for r in jaccard_pairs(
                docs, threshold=0.5, materialize=strategy
            ).collect()
        }
        assert got == base, strategy

    # parquet scans carry real Catalyst size statistics — that is the plan
    # shape the guard reads (createDataFrame plans report "unknown", which
    # falls back to the fault-tolerant choice)
    pq = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    monkeypatch.setattr(ngram, "GRAM_LOCAL_CKPT_MAX_BYTES", 1)
    assert ngram._auto_strategy(pq) == "persist"
    persisted = ngram._materialize(ngram.word_ngrams(pq), "persist")
    assert persisted.storageLevel == StorageLevel.DISK_ONLY
    persisted.unpersist()
    monkeypatch.setattr(ngram, "GRAM_LOCAL_CKPT_MAX_BYTES", 1 << 60)
    assert ngram._auto_strategy(pq) == "local"
    # unknown-stats plans (createDataFrame) take the fault-tolerant branch
    assert ngram._auto_strategy(docs) == "persist"


def test_near_dup_clusters_transitive(spark):
    """Chained near-dups (a~b, b~c, a!~c) collapse to ONE cluster under the
    min-id representative; unrelated docs stay singletons; survivors keep
    exactly one doc per cluster."""
    from itext2kg_spark.dedup.clusters import dedup_survivors, near_dup_clusters

    base = [f"w{i}" for i in range(50)]
    b = list(base)
    b[10] = "xx"
    c = list(b)
    c[30] = "yy"
    rows = [
        (0, " ".join(base)),
        (1, " ".join(b)),      # j(0,1) = 45/51 ~ 0.88
        (2, " ".join(c)),      # j(1,2) ~ 0.88, j(0,2) = 42/54 ~ 0.78 < 0.8
        (3, " ".join(f"z{i}" for i in range(50))),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    # premise: the pair graph is exactly the open chain 0-1-2
    got_pairs = {
        (r["id_a"], r["id_b"])
        for r in jaccard_pairs(docs, threshold=0.8).collect()
    }
    assert got_pairs == {(0, 1), (1, 2)}

    cl = near_dup_clusters(docs, threshold=0.8, method="minhash")
    mapping = {r["doc_id"]: r["rep_id"] for r in cl.collect()}
    assert mapping == {0: 0, 1: 0, 2: 0, 3: 3}

    surv = dedup_survivors(docs, clusters=cl)
    assert sorted(r["doc_id"] for r in surv.collect()) == [0, 3]


def test_near_dup_clusters_pairs_injection(spark):
    """Any pair family plugs in via `pairs=` (e.g. embedding_near_dups
    output); docs untouched by a pair map to themselves."""
    from itext2kg_spark.dedup.clusters import near_dup_clusters

    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(5)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame([(3, 4)], "id_a long, id_b long")
    mapping = {
        r["doc_id"]: r["rep_id"]
        for r in near_dup_clusters(docs, pairs=pairs).collect()
    }
    assert mapping == {0: 0, 1: 1, 2: 2, 3: 3, 4: 3}


def test_ngram_repetition_handcomputed(spark):
    """Gopher-style repetition stats against hand-computed values.

    'a b a b a b' (11 chars): 2-grams 'a b'x3/'b a'x2 -> top2 = 3*3=9
    -> floor(9/11*1e4)=8181; 3-grams both x2, len 5 -> 10/11 -> 9090;
    4-grams 'a b a b'x2 len 7 -> 14/11 capped at 1.0 -> 10000; no
    duplicated 5- or 10-grams. A no-repeat doc and an empty doc report
    all zeros (the left join keeps their rows)."""
    from itext2kg_spark.functions.repetition import ngram_repetition

    docs = spark.createDataFrame(
        [(0, "a b a b a b"), (1, "all tokens here are distinct"), (2, "")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r.asDict() for r in ngram_repetition(docs).collect()}
    assert len(rows) == 3
    assert rows[0] == {
        "doc_id": 0, "top2_frac_10k": 8181, "top3_frac_10k": 9090,
        "top4_frac_10k": 10000, "dup5_frac_10k": 0, "dup10_frac_10k": 0,
    }
    for d in (1, 2):
        assert all(v == 0 for k, v in rows[d].items() if k != "doc_id")


def test_ngram_repetition_dup_band(spark):
    """A doc that is one 5-gram repeated twice: 'v w x y z v w x y z'
    (19 chars) -> the 5-gram 'v w x y z' occurs x2 (len 9 -> 18 chars)
    -> dup5 = floor(18/19*1e4) = 9473; top2/3/4 all nonzero too."""
    from itext2kg_spark.functions.repetition import ngram_repetition

    docs = spark.createDataFrame(
        [(0, "v w x y z v w x y z")], "doc_id long, text string"
    )
    r = ngram_repetition(docs).collect()[0]
    assert r["dup5_frac_10k"] == 9473
    assert r["dup10_frac_10k"] == 0  # the single 10-gram occurs once
    assert r["top2_frac_10k"] > 0


def test_unigram_lm_handcomputed(spark):
    """Corpus tf: x=3, y=1, z=1. d0='x x y': n=3, sum_tf=2*3+1=7,
    avg=floor(70000/3)=23333, min=1. d1='x z': 20000/1. d2='' -> zeros."""
    from itext2kg_spark.functions.lm import unigram_lm_scores

    docs = spark.createDataFrame(
        [(0, "x x y"), (1, "x z"), (2, "")], "doc_id long, text string"
    )
    for bcast in (False, True):
        rows = {
            r["doc_id"]: r.asDict()
            for r in unigram_lm_scores(docs, broadcast_vocab=bcast).collect()
        }
        assert rows[0] == {
            "doc_id": 0, "n_tokens": 3, "sum_tf": 7,
            "avg_tf_10k": 23333, "min_tf": 1,
        }
        assert rows[1] == {
            "doc_id": 1, "n_tokens": 2, "sum_tf": 4,
            "avg_tf_10k": 20000, "min_tf": 1,
        }
        assert rows[2] == {
            "doc_id": 2, "n_tokens": 0, "sum_tf": 0,
            "avg_tf_10k": 0, "min_tf": 0,
        }


def test_ngram_decontaminate(spark):
    """Doc 10 shares the 3-gram 'q r s' with the eval set, doc 11 shares
    nothing, doc 12 is entirely an eval passage (all grams hit). Distinct
    semantics: doc 13 repeats a hit gram twice but counts it once."""
    from itext2kg_spark.dedup.decontam import ngram_decontaminate

    corpus = spark.createDataFrame(
        [
            (10, "a b q r s c d"),
            (11, "u v w x y z"),
            (12, "m n o p"),
            (13, "q r s t q r s t q r s"),
        ],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [(0, "q r s"), (1, "m n o p")], "doc_id long, text string"
    )
    for bcast in (True, False):
        rows = {
            r["doc_id"]: r.asDict()
            for r in ngram_decontaminate(
                corpus, ev, n=3, broadcast_eval=bcast
            ).collect()
        }
        assert rows[10] == {"doc_id": 10, "n_hit_grams": 1, "contaminated": True}
        assert rows[11] == {"doc_id": 11, "n_hit_grams": 0, "contaminated": False}
        # doc 12's grams: 'm n o', 'n o p' — both in the eval passage
        assert rows[12] == {"doc_id": 12, "n_hit_grams": 2, "contaminated": True}
        # doc 13 contains 'q r s' (3x) and 'r s t'/'s t q'/'t q r' etc.;
        # only 'q r s' is in the eval set and it counts once
        assert rows[13]["n_hit_grams"] == 1


def test_hash_stratified_sample_contract(spark):
    """The md5 bucket is pinned to hashlib (60 digest bits of 'salt:id'),
    the kept set is deterministic across runs, and sampling a SUPERSET
    corpus keeps exactly the same original documents."""
    import hashlib

    from itext2kg_spark.functions.sampling import hash_stratified_sample

    docs = spark.createDataFrame(
        [(i, f"text {i}", "en" if i % 2 == 0 else "fr") for i in range(200)],
        "doc_id long, text string, lang string",
    )

    def expect_bucket(i, salt="mix-v1"):
        return int(hashlib.md5(f"{salt}:{i}".encode()).hexdigest()[:15], 16) % 10000

    out = hash_stratified_sample(docs, {"en": 5000}, default_10k=2000)
    rows = {r["doc_id"]: r["bucket"] for r in out.collect()}
    for i, b in rows.items():
        assert b == expect_bucket(i)
        assert b < (5000 if i % 2 == 0 else 2000)
    # determinism + superset stability
    again = {r["doc_id"] for r in out.collect()}
    assert again == set(rows)
    bigger = spark.createDataFrame(
        [(i, f"text {i}", "en" if i % 2 == 0 else "fr") for i in range(400)],
        "doc_id long, text string, lang string",
    )
    sup = {
        r["doc_id"]
        for r in hash_stratified_sample(bigger, {"en": 5000}, default_10k=2000)
        .collect()
    }
    assert {i for i in sup if i < 200} == set(rows)


def test_global_running_total_matches_naive(spark):
    """Two-phase bucketed cumsum == single-window cumsum, with a bucket
    width small enough to force many buckets and sparse/shuffled ids."""
    from pyspark.sql import Window

    from itext2kg_spark.functions.sampling import global_running_total

    rows = [(i * 7 % 997, (i * 13) % 50 + 1) for i in range(500)]
    ids = {r[0] for r in rows}
    rows = [r for r in rows if r[0] in ids]  # ids unique by construction? ensure:
    seen, uniq = set(), []
    for k, v in rows:
        if k not in seen:
            seen.add(k)
            uniq.append((k, v))
    df = spark.createDataFrame(uniq, "k long, v long").repartition(8)
    got = {
        r["k"]: r["running_total"]
        for r in global_running_total(
            df, "k", "v", bucket_width=64
        ).collect()
    }
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    want = {
        r["k"]: r["rt"]
        for r in df.select("k", F.sum("v").over(w).alias("rt")).collect()
    }
    assert got == want


def test_pack_sequences_handcomputed(spark):
    """budget=5; docs of 3/4/0/6 tokens at ids 0..3: offsets 0,3,7,7;
    doc1 straddles chunks 0-1, the empty doc spans no chunk
    (bin_last = bin_first - 1), doc3 covers chunks 1-2."""
    from itext2kg_spark.functions.sampling import pack_sequences

    docs = spark.createDataFrame(
        [(0, "a b c"), (1, "d e f g"), (2, ""), (3, "h i j k l m")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r.asDict() for r in pack_sequences(docs, budget=5).collect()}
    assert rows[0] == {"doc_id": 0, "n_tokens": 3, "tok_offset": 0,
                       "bin_first": 0, "bin_last": 0}
    assert rows[1] == {"doc_id": 1, "n_tokens": 4, "tok_offset": 3,
                       "bin_first": 0, "bin_last": 1}
    assert rows[2] == {"doc_id": 2, "n_tokens": 0, "tok_offset": 7,
                       "bin_first": 1, "bin_last": 0}
    assert rows[3] == {"doc_id": 3, "n_tokens": 6, "tok_offset": 7,
                       "bin_first": 1, "bin_last": 2}


PII_ADVERSARIAL = [
    "contact me at john.doe+spam@example.co.uk or 192.168.1.1 now",
    "call +1 (555) 123-4567 today",
    "no pii here at all",
    "a@b.io x 999.999.999.999 and 12345678 and 1.2.3.4.5",
    "double @@ not@valid a@b.c",
    "phone 123-456-7890, ip 10.0.0.255.",
    "edge +44 20 7946 0958 end",
    "",
]


def test_pii_scrub_handcomputed(spark):
    from itext2kg_spark.functions.pii import pii_scrub

    docs = spark.createDataFrame(
        list(enumerate(PII_ADVERSARIAL)), "doc_id long, text string"
    )
    rows = {r["doc_id"]: r.asDict() for r in pii_scrub(docs).collect()}
    assert (rows[0]["n_emails"], rows[0]["n_ips"], rows[0]["n_phones"]) == (1, 1, 1)
    assert "<EMAIL>" in rows[0]["redacted"] and "<IP>" in rows[0]["redacted"]
    assert "john.doe" not in rows[0]["redacted"]
    assert rows[1]["n_phones"] == 1 and "<PHONE>" in rows[1]["redacted"]
    assert rows[2] == {"doc_id": 2, "n_emails": 0, "n_ips": 0, "n_phones": 0,
                       "redacted": "no pii here at all"}
    # single-letter TLD rejected; over-matching IP accepted by design
    assert rows[4]["n_emails"] == 0
    assert rows[3]["n_ips"] == 2


def test_pii_cross_engine_contract(spark):
    """Java regex (Spark) and RE2 (DuckDB) must agree on every match
    boundary for the three patterns — the property the corpus_pii oracle
    rests on, pinned here over the adversarial set."""
    import duckdb

    from itext2kg_spark.functions.pii import EMAIL_RE, IPV4_RE, PHONE_RE, pii_scrub

    docs = spark.createDataFrame(
        list(enumerate(PII_ADVERSARIAL)), "doc_id long, text string"
    )
    got = {r["doc_id"]: r.asDict() for r in pii_scrub(docs).collect()}
    con = duckdb.connect()
    for i, t in enumerate(PII_ADVERSARIAL):
        ne, ni, np_, red = con.execute(
            """SELECT len(regexp_extract_all(?, ?)), len(regexp_extract_all(?, ?)),
                      len(regexp_extract_all(?, ?)),
                      regexp_replace(regexp_replace(regexp_replace(?, ?, '<EMAIL>', 'g'),
                                     ?, '<IP>', 'g'), ?, '<PHONE>', 'g')""",
            [t, EMAIL_RE, t, IPV4_RE, t, PHONE_RE,
             t, EMAIL_RE, IPV4_RE, PHONE_RE],
        ).fetchone()
        assert (got[i]["n_emails"], got[i]["n_ips"], got[i]["n_phones"]) == (ne, ni, np_)
        assert got[i]["redacted"] == red


def test_dedup_lines_handcomputed(spark):
    """The cookie-banner line appears in 3 docs -> removed everywhere
    (case/whitespace-insensitively); unique lines and empty lines stay;
    an untouched document reassembles byte-identically."""
    from itext2kg_spark.dedup.lines import dedup_lines

    banner = "Accept cookies to continue"
    docs = spark.createDataFrame(
        [
            (0, f"{banner}\nunique zero\n\nlast zero"),
            (1, f"first one\n  accept COOKIES to continue \nlast one"),
            (2, f"{banner}"),
            (3, "totally unique\ndocument three"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r.asDict() for r in dedup_lines(docs, min_doc_df=3).collect()}
    assert rows[0] == {"doc_id": 0, "n_lines": 4, "n_removed": 1,
                       "cleaned": "unique zero\n\nlast zero"}
    assert rows[1] == {"doc_id": 1, "n_lines": 3, "n_removed": 1,
                       "cleaned": "first one\nlast one"}
    assert rows[2] == {"doc_id": 2, "n_lines": 1, "n_removed": 1, "cleaned": ""}
    assert rows[3] == {"doc_id": 3, "n_lines": 2, "n_removed": 0,
                       "cleaned": "totally unique\ndocument three"}


def test_dedup_lines_threshold_and_identity(spark):
    """Below min_doc_df nothing is removed and every document — including
    ones with leading/trailing/double separators — reassembles exactly."""
    from itext2kg_spark.dedup.lines import dedup_lines

    texts = ["a\n\nb\n", "\nx y\nz", "plain"]
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    rows = {r["doc_id"]: r.asDict() for r in dedup_lines(docs, min_doc_df=5).collect()}
    for i, t in enumerate(texts):
        assert rows[i]["n_removed"] == 0
        assert rows[i]["cleaned"] == t


def test_dedup_lines_regex_meta_separator(spark):
    """ADVICE r5: F.split takes a Java regex, array_join a literal — a
    regex-meta separator ('.', '|') must be quoted or every document is
    silently shredded on split and glued back differently on join."""
    from itext2kg_spark.dedup.lines import dedup_lines

    banner = "common part"
    texts = [f"{banner}.unique a.x y", f"keep.{banner}.tail", f"{banner}.solo",
             "un|touched . doc"]
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    rows = {r["doc_id"]: r.asDict()
            for r in dedup_lines(docs, sep=".", min_doc_df=3).collect()}
    assert rows[0]["cleaned"] == "unique a.x y"
    assert rows[1]["cleaned"] == "keep.tail"
    assert rows[2]["cleaned"] == "solo"
    # byte-faithful identity for the untouched doc, '|' and ' . ' intact
    assert rows[3] == {"doc_id": 3, "n_lines": 2, "n_removed": 0,
                       "cleaned": "un|touched . doc"}
    # '|' separator: unquoted it splits between EVERY char (empty pattern)
    rows = {r["doc_id"]: r.asDict()
            for r in dedup_lines(docs, sep="|", min_doc_df=9).collect()}
    assert rows[3]["cleaned"] == "un|touched . doc"
    assert rows[3]["n_lines"] == 2
