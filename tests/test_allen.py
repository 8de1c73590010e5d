"""Allen interval algebra (kgloom/ops/temporal.py:allen_relation /
allen_pairs): all 13 relations, exhaustiveness, inverse symmetry."""

import pytest
from pyspark.sql import functions as F

from kgloom.ops.temporal import allen_pairs, allen_relation

# canonical examples of each relation for [s1,e1] vs [s2,e2]
CASES = [
    (0, 2, 5, 9, "before"),
    (5, 9, 0, 2, "after"),
    (0, 5, 5, 9, "meets"),
    (5, 9, 0, 5, "met_by"),
    (0, 6, 5, 9, "overlaps"),
    (5, 9, 0, 6, "overlapped_by"),
    (5, 9, 5, 12, "starts"),
    (5, 12, 5, 9, "started_by"),
    (6, 9, 5, 9, "finishes"),
    (5, 9, 6, 9, "finished_by"),
    (6, 8, 5, 9, "during"),
    (5, 9, 6, 8, "contains"),
    (5, 9, 5, 9, "equals"),
]

INVERSE = {
    "before": "after", "meets": "met_by", "overlaps": "overlapped_by",
    "starts": "started_by", "during": "contains",
    "finishes": "finished_by", "equals": "equals",
}
INVERSE.update({v: k for k, v in INVERSE.items()})


def test_all_13_relations(spark):
    df = spark.createDataFrame(
        [(s1, e1, s2, e2, want) for s1, e1, s2, e2, want in CASES],
        "s1 int, e1 int, s2 int, e2 int, want string")
    got = df.select("want", allen_relation(
        F.col("s1"), F.col("e1"), F.col("s2"),
        F.col("e2")).alias("got")).collect()
    for r in got:
        assert r.got == r.want, (r.want, r.got)


def test_inverse_symmetry_exhaustive(spark):
    """For every endpoint combination over a small grid, rel(a,b) must
    be the Allen inverse of rel(b,a), and classification is total."""
    grid = [(s, e) for s in range(5) for e in range(s + 1, 5)]
    rows = [(s1, e1, s2, e2) for (s1, e1) in grid for (s2, e2) in grid]
    df = spark.createDataFrame(rows, "s1 int, e1 int, s2 int, e2 int")
    out = df.select(
        allen_relation(F.col("s1"), F.col("e1"), F.col("s2"),
                       F.col("e2")).alias("ab"),
        allen_relation(F.col("s2"), F.col("e2"), F.col("s1"),
                       F.col("e1")).alias("ba")).collect()
    for r in out:
        assert r.ab is not None and r.ba is not None
        assert INVERSE[r.ab] == r.ba, (r.ab, r.ba)


def test_allen_pairs_grouped(spark):
    df = spark.createDataFrame(
        [("k1", "i1", 0, 10), ("k1", "i2", 3, 7), ("k1", "i3", 10, 12),
         ("k2", "i1", 0, 5)],
        "k string, iid string, valid_from int, valid_to int")
    got = {(r.k, r.id_a, r.id_b): r.relation
           for r in allen_pairs(df, ["k"], "iid").collect()}
    assert got == {
        ("k1", "i1", "i2"): "contains",
        ("k1", "i1", "i3"): "meets",
        ("k1", "i2", "i3"): "before",
    }
