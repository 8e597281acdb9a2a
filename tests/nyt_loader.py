"""Loader for the reference's shipped NYT COVID golden dataset
(datasets/atom/nyt_news/2020_nyt_COVID_last_version_ready.pkl, 122 annotated
rows with gold + multi-run predicted quintuple columns) — the corpus behind
the reference's quality/stability/exhaustivity evaluations.

Read-only access; nothing is copied into the repo. Returns plain Python
structures (lists of quintuple tuples) plus a row-table form suitable for
building Spark DataFrames for the quality operators."""

from __future__ import annotations

NYT_PKL = (
    "/root/reference/datasets/atom/nyt_news/2020_nyt_COVID_last_version_ready.pkl"
)

GOLD_COL = "quintuples_g_truth"
PRED_COL = "quintuples_gpt41"
RUN2_COL = "quintuples_gpt41_run2"
FACTOID_PRED_COL = "quintuples_gpt41_from_factoids"
FACTOID_RUN2_COL = "quintuples_gpt41_from_factoids_run2"


def load_nyt(max_rows: int | None = None):
    """pandas DataFrame of the golden pickle, or None if unavailable."""
    import pandas as pd

    try:
        df = pd.read_pickle(NYT_PKL)
    except Exception:
        return None
    return df.head(max_rows) if max_rows else df


def stringify_temporal(v):
    """Spark quintuple tables carry STRING temporal columns; the reference's
    temporal logic only ever sees str(value) (its is_empty/parse/compare all
    coerce) except the None/empty checks, which map exactly: None -> None
    here keeps is_empty true on both sides."""
    if v is None:
        return None
    return str(v)


def quintuple_rows(quints, doc_id: int):
    """One row dict per quintuple: (doc_id, idx, head, rel, tail, t_start,
    t_end) with stringified temporals — the schema the quality operators eat."""
    out = []
    for idx, q in enumerate(quints or []):
        out.append(
            {
                "doc_id": int(doc_id),
                "idx": int(idx),
                "head": str(q[0]),
                "rel": str(q[1]),
                "tail": str(q[2]),
                "t_start": stringify_temporal(q[3]) if len(q) > 3 else None,
                "t_end": stringify_temporal(q[4]) if len(q) > 4 else None,
            }
        )
    return out


def stringified_tuples(quints):
    """The same stringification as quintuple_rows, as tuples — for running
    the local scoring kernels on exactly what the Spark operator sees."""
    return [
        (
            str(q[0]),
            str(q[1]),
            str(q[2]),
            stringify_temporal(q[3]) if len(q) > 3 else None,
            stringify_temporal(q[4]) if len(q) > 4 else None,
        )
        for q in (quints or [])
    ]
