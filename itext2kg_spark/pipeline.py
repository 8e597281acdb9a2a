"""End-to-end pipeline: pages -> facts -> quintuples -> canonical KG.

Spark re-expression of `Atom.build_graph` / `build_graph_from_different_obs_times`
(itext2kg/atom/atom.py:155-234): where the reference fans out per observation
date and pairwise-merges per-snapshot KGs on driver threads, this pipeline
processes *all* observation timestamps of a batch in one dataflow — the t_obs
stamp is carried per-mention from warc_ts, and one global resolution replaces
the whole merge tree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

import re
from collections.abc import Iterator

import pandas as pd

from itext2kg_spark.config import PipelineConfig, ATOM
from itext2kg_spark.extract.distill import distill_pages, extract_main_text
from itext2kg_spark.extract.embed import HashEmbedder
from itext2kg_spark.extract.facts import split_atomic_facts
from itext2kg_spark.extract.quintuples import GrammarExtractor, extract_quintuples
from itext2kg_spark.merge.kg import canonicalize_kg
from itext2kg_spark.sources.store import KGStore

_SENT_SPLIT = re.compile(r"(?<=[.!?])\s+")

FUSED_SCHEMA = (
    "url string, obs_ts timestamp, lang string, fact_idx int, fact string,"
    " subj_name string, subj_label string, pred string, obj_name string,"
    " obj_label string, t_start array<string>, t_end array<string>"
)


def fused_quintuples(pages: DataFrame, extractor) -> DataFrame:
    """distill + sentence-split + extract in a single Arrow pass."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "url", "obs_ts", "lang", "fact_idx", "fact", "subj_name",
                "subj_label", "pred", "obj_name", "obj_label", "t_start",
                "t_end")}
            for url, ts, html, lang in zip(
                pdf["url"], pdf["warc_ts"], pdf["html"], pdf["lang"]
            ):
                text = extract_main_text(html)
                for idx, sent in enumerate(
                    s for s in (x.strip() for x in _SENT_SPLIT.split(text)) if s
                ):
                    for qd in extractor.extract(sent, ts):
                        out["url"].append(url)
                        out["obs_ts"].append(ts)
                        out["lang"].append(lang)
                        out["fact_idx"].append(idx)
                        out["fact"].append(sent)
                        out["subj_name"].append(qd["subj_name"])
                        out["subj_label"].append(qd["subj_label"])
                        out["pred"].append(qd["pred"])
                        out["obj_name"].append(qd["obj_name"])
                        out["obj_label"].append(qd["obj_label"])
                        out["t_start"].append(qd["t_start"])
                        out["t_end"].append(qd["t_end"])
            yield pd.DataFrame(out)

    return pages.select("url", "warc_ts", "html", "lang").mapInPandas(
        run, schema=FUSED_SCHEMA
    )


def fused_quintuples_vectorized(pages: DataFrame) -> DataFrame:
    """distill + sentence-split + grammar-extract in ONE Arrow pass, fully
    vectorized: html -> text per row (cheap regex), pandas .str.split +
    explode for the sentence split, then the shared .str.extract batch
    kernel. One JVM<->Python round-trip instead of three — at high core
    counts the Arrow serialization traffic is the bandwidth bottleneck, so
    this is the scaling-friendly shape of the extraction stage."""
    import pandas as pd

    from itext2kg_spark.extract.quintuples import (
        _VEC_SCHEMA,
        _vectorized_extract_pdf,
    )

    def run(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            texts = pd.Series(
                [extract_main_text(h) for h in pdf["html"]], index=pdf.index
            )
            sents = texts.str.split(_SENT_SPLIT)
            base = pd.DataFrame(
                {
                    "url": pdf["url"],
                    "obs_ts": pdf["warc_ts"],
                    "lang": pdf["lang"],
                    "fact": sents,
                }
            ).explode("fact", ignore_index=True)
            base["fact"] = base["fact"].fillna("").str.strip()
            base = base[base["fact"] != ""]
            base = base.reset_index(drop=True)
            base["fact_idx"] = base.groupby("url").cumcount()
            yield _vectorized_extract_pdf(base)

    return pages.select("url", "warc_ts", "html", "lang").mapInPandas(
        run, schema=_VEC_SCHEMA
    )


class KGPipeline:
    def __init__(
        self,
        cfg: PipelineConfig = ATOM,
        embedder=None,
        extractor=None,
        extraction: str = "grammar",
    ):
        """extraction="grammar" (default) uses the sentence-grammar
        extractor (or a custom `extractor`); extraction="token" routes every
        stage — including run_batch's incremental store path — through the
        pure-Catalyst token-triple extractor, the right mode for corpora
        with no grammar structure (arbitrary web text)."""
        self.cfg = cfg
        self.embedder = embedder or HashEmbedder(cfg.embed.dim, cfg.embed.seed)
        self.extractor = extractor or GrammarExtractor()
        self.extraction = extraction

    # -- stage views ----------------------------------------------------------
    def quintuples_from_pages(self, pages: DataFrame, fused: bool = False) -> DataFrame:
        """pages -> quintuple rows.

        fused=True runs distill+split+extract in ONE mapInPandas pass — one
        JVM<->Python Arrow round-trip instead of three. Same rows, same
        schema; the staged path remains for mixing extractors or inspecting
        intermediate tables.
        """
        if self.extraction == "token":
            return self.token_quintuples_from_pages(pages)
        if fused:
            if type(self.extractor) is GrammarExtractor:
                return fused_quintuples_vectorized(pages)
            return fused_quintuples(pages, self.extractor)
        distilled = distill_pages(pages)
        facts = split_atomic_facts(distilled)
        if type(self.extractor) is GrammarExtractor:
            # row-identical vectorized path (pandas .str.extract — C regex
            # over the whole Arrow batch, no per-row Python loop); custom
            # extractors keep the pluggable per-batch UDF below
            from itext2kg_spark.extract.quintuples import (
                extract_quintuples_vectorized,
            )

            return extract_quintuples_vectorized(facts)
        return extract_quintuples(facts, self.extractor)

    def token_quintuples_from_pages(self, pages: DataFrame) -> DataFrame:
        """Pure-Catalyst extraction variant (TokenTripleExtractor): used when
        the corpus has no grammar structure (arbitrary web text) and by the
        oracle-checked queries. Emits the same quintuple schema with empty
        temporal arrays."""
        from itext2kg_spark.extract.quintuples import TokenTripleExtractor

        distilled = distill_pages(pages)
        facts = split_atomic_facts(distilled)
        q = TokenTripleExtractor.apply(facts, text_col="fact")
        return q.select(
            "url",
            "obs_ts",
            "lang",
            "fact_idx",
            "fact",
            "subj_name",
            "subj_label",
            "pred",
            "obj_name",
            "obj_label",
            F.array().cast("array<string>").alias("t_start"),
            F.array().cast("array<string>").alias("t_end"),
        )

    # -- one batch ------------------------------------------------------------
    def build_graph(
        self,
        pages: DataFrame,
        existing_entities: DataFrame | None = None,
        existing_edges: DataFrame | None = None,
        existing_edges_merge: str = "union",
    ) -> tuple[DataFrame, DataFrame]:
        q = self.quintuples_from_pages(pages)
        return canonicalize_kg(
            q,
            self.cfg,
            self.embedder,
            existing_entities=existing_entities,
            existing_edges=existing_edges,
            existing_edges_merge=existing_edges_merge,
            # the token extractor emits literal empty temporal arrays, so
            # the timestamp parse collapses to typed empty literals
            temporal_empty=self.extraction == "token",
        )

    # -- incremental batches with checkpoint/resume ----------------------------
    def run_batch(self, pages: DataFrame, store: KGStore) -> int:
        """Merge one page batch into the store; returns the committed batch id.

        Equivalent of one `build_graph(existing_knowledge_graph=...)` call +
        checkpoint (atom/atom.py:196-208 + testing_atom.py batch loop). On a
        cluster this is an Iceberg MERGE INTO + snapshot commit.
        """
        spark = pages.sparkSession
        existing = store.load(spark)
        ents_prev, edges_prev = existing if existing else (None, None)
        # a bucketed store serves edges_prev as a bucketed table scan — the
        # join-form merge then reads stored buckets in place and only the
        # batch side shuffles (plan-pinned in tests/test_bucketed.py)
        merge_mode = "join" if getattr(store, "bucketed_edges", False) else "union"
        entities, edges = self.build_graph(
            pages, ents_prev, edges_prev, existing_edges_merge=merge_mode
        )

        batch_id = store.next_batch_id()
        n_pages = pages.count()
        store.write_snapshot(
            batch_id,
            entities,
            edges,
            metrics={"n_pages": n_pages},
            lineage=partition_lineage(pages).withColumn(
                "batch_id", F.lit(batch_id)
            ),
        )
        return batch_id


def partition_lineage(df: DataFrame, key: str = "url") -> DataFrame:
    """Per-partition lineage/metrics rows (north rule): partition id, row
    count, distinct keys — written alongside each snapshot by callers."""
    return df.groupBy(F.spark_partition_id().alias("partition_id")).agg(
        F.count("*").alias("rows"),
        F.approx_count_distinct(key).alias(f"approx_distinct_{key}"),
    )
