"""Parity of our Catalyst normalization expressions vs the reference's
Entity.process / Relationship.process (run live from /root/reference)."""

import pytest
from pyspark.sql import functions as F

from itext2kg_spark.functions.normalize import (
    norm_label,
    norm_name,
    norm_predicate,
    sanitize_storage_label,
    sanitize_storage_reltype,
)
from tests.ref_loader import get_reference

ADVERSARIAL = [
    "John Doe",
    'quoted "name"',
    "UPPER_case-mixed",
    "a&b Corp",
    "  spaced  out  ",
    "hy-phen_under\"quote",
    "café crème",
    "123 numbers 456",
    "",
    "___",
    "R&D department",
    "semi;colon:and.dots",
    "tabs\tand\nnewlines",
]


@pytest.fixture(scope="module")
def ref():
    r = get_reference()
    if r is None:
        pytest.skip("reference tree not loadable")
    return r


def _spark_vals(spark, expr_fn, values):
    df = spark.createDataFrame([(v,) for v in values], ["s"])
    return [r["out"] for r in df.select(expr_fn(F.col("s")).alias("out")).collect()]


def test_label_normalization_matches_reference(spark, ref):
    expected = []
    for v in ADVERSARIAL:
        e = ref.Entity(name="x", label=v)
        e.process()
        expected.append(e.label)
    got = _spark_vals(spark, norm_label, ADVERSARIAL)
    assert got == expected


def test_name_normalization_matches_reference(spark, ref):
    expected = []
    for v in ADVERSARIAL:
        e = ref.Entity(name=v, label="x")
        e.process()
        expected.append(e.name)
    got = _spark_vals(spark, norm_name, ADVERSARIAL)
    assert got == expected


def test_predicate_normalization_matches_reference(spark, ref):
    expected = []
    for v in ADVERSARIAL:
        r = ref.Relationship(name=v)
        r.process()
        expected.append(r.name)
    got = _spark_vals(spark, norm_predicate, ADVERSARIAL)
    assert got == expected


def test_storage_sanitization(spark):
    vals = ["9lives", "", "ok_label", "we!rd", "###"]
    got_l = _spark_vals(spark, sanitize_storage_label, vals)
    assert got_l == ["L9lives", "Entity", "ok_label", "werd", "Entity"]
    got_r = _spark_vals(spark, sanitize_storage_reltype, vals)
    assert got_r == ["R9lives", "RELATES_TO", "ok_label", "werd", "RELATES_TO"]
