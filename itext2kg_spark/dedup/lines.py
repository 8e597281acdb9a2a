"""Corpus-level repeated-line removal (CCNet / RefinedWeb boilerplate pass).

Web pages carry boilerplate — nav bars, cookie banners, footers — that
whole-document dedup never touches because the surrounding text differs.
The published fix (CCNet §3.1; RefinedWeb removed ~30% of raw text this
way) works at LINE granularity: a line whose normalized form appears in
many distinct documents is boilerplate; strip it everywhere and keep the
rest of each document intact, in order.

Spark shape: explode lines with position -> count DISTINCT documents per
normalized-line hash (two partial-agg aggregations) -> semi-join the line
stream against the over-threshold set -> reassemble each document with
sort_array over (pos, line) structs + array_join. All Catalyst; the join
key is md5(normalized line), which keeps the shuffle rows narrow no
matter how long lines get (an md5 collision would over-remove one line —
at 2^-64 per pair that is noise against the filter's own false-positive
rate). Reassembly is byte-faithful: split + array_join on the same
literal separator reconstructs untouched documents exactly — F.split
treats its pattern as a Java regex, so the separator is regex-quoted
before splitting (otherwise sep='.' or '|' would silently shred every
document while array_join rebuilt it literally).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_JAVA_REGEX_META = set("\\^$.|?*+()[]{}")


def _regex_literal(s: str) -> str:
    """Quote a literal string for use as a Java regex (what F.split takes)."""
    return "".join("\\" + c if c in _JAVA_REGEX_META else c for c in s)


def dedup_lines(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
    min_doc_df: int = 2,
) -> DataFrame:
    """doc_id, n_lines, n_removed, cleaned.

    A line is removed when lower(trim(line)) is non-empty and occurs in
    >= min_doc_df DISTINCT documents. Empty/whitespace lines are document
    structure, never boilerplate — always kept. n_lines counts all lines
    of the original document (empty ones included).
    """
    lines = docs.select(
        F.col(id_col),
        F.posexplode(
            F.split(F.col(text_col), _regex_literal(sep), -1)
        ).alias("pos", "line"),
    ).withColumn("norm", F.lower(F.trim(F.col("line"))))

    common = (
        lines.where(F.col("norm") != "")
        .select(F.md5("norm").alias("h"), id_col)
        .distinct()
        .groupBy("h")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") >= min_doc_df)
        .select("h")
    )

    flagged = lines.join(
        common.withColumn("__common", F.lit(True)),
        on=F.md5(lines["norm"]) == common["h"],
        how="left",
    ).select(
        id_col,
        "pos",
        "line",
        (F.coalesce(F.col("__common"), F.lit(False)) & (F.col("norm") != ""))
        .alias("removed"),
    )

    return flagged.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.sum(F.col("removed").cast("long")).cast("long").alias("n_removed"),
        F.array_join(
            F.transform(
                F.sort_array(
                    F.collect_list(
                        F.when(
                            ~F.col("removed"),
                            F.struct(F.col("pos"), F.col("line")),
                        )
                    )
                ),
                lambda s: s.line,
            ),
            sep,
        ).alias("cleaned"),
    )
