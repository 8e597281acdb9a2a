"""Snapshot diff (functions/kg_diff.py)."""

from itext2kg_spark.functions.kg_diff import kg_diff


def _snap(spark, rows):
    return spark.createDataFrame(
        rows,
        "src_name string, src_label string, pred string, "
        "dst_name string, dst_label string, n_obs long",
    )


def test_diff_classifies_all_three(spark):
    old = _snap(spark, [
        ("a", "E", "r", "b", "E", 2),   # unchanged
        ("a", "E", "r", "c", "E", 1),   # changed (1 -> 3)
        ("x", "E", "r", "y", "E", 1),   # removed
    ])
    new = _snap(spark, [
        ("a", "E", "r", "b", "E", 2),
        ("a", "E", "r", "c", "E", 3),
        ("p", "E", "r", "q", "E", 5),   # added
    ])
    got = {
        (r["src_name"], r["dst_name"]): (r["old_n"], r["new_n"], r["change_type"])
        for r in kg_diff(old, new).collect()
    }
    assert got == {
        ("a", "c"): (1, 3, "changed"),
        ("x", "y"): (1, 0, "removed"),
        ("p", "q"): (0, 5, "added"),
    }  # the unchanged edge is absent


def test_diff_of_identical_snapshots_is_empty(spark):
    s = _snap(spark, [("a", "E", "r", "b", "E", 2)])
    assert kg_diff(s, s).count() == 0
