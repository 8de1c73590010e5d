"""Skew diagnostics and salted joins (kgloom/ops/skew.py)."""

import pytest
from pyspark.sql import functions as F

from kgloom.ops.skew import salted_join, skew_report, top_keys


@pytest.fixture(scope="module")
def skewed(spark):
    rows = [("hot", i) for i in range(150)] + \
           [("warm", i) for i in range(12)] + \
           [(f"cold{i}", i) for i in range(5)] + \
           [(None, 0)]
    return spark.createDataFrame(rows, "k string, v int")


def test_skew_report_magnitudes(skewed):
    got = {r.magnitude: (r.n_keys, r.n_rows, r.max_count, r.example_key)
           for r in skew_report(skewed, "k").collect()}
    assert got == {
        2: (1, 150, 150, "hot"),
        1: (1, 12, 12, "warm"),
        0: (5, 5, 1, "cold0"),
    }


def test_top_keys(skewed):
    got = [(r.key, r.n_rows) for r in top_keys(skewed, "k", k=3).collect()]
    assert got == [("hot", 150), ("warm", 12), ("cold0", 1)]


def test_salted_join_equals_plain_join(spark, skewed):
    small = spark.createDataFrame(
        [("hot", "H"), ("warm", "W"), ("cold2", "C"), ("absent", "A")],
        "k string, tag string")
    for how in ("inner", "left"):
        plain = sorted(map(tuple, skewed.join(small, "k", how).collect()),
                       key=str)
        salted = sorted(map(tuple,
                            salted_join(skewed, small, "k", n_salts=4,
                                        how=how).collect()), key=str)
        assert salted == plain
    with pytest.raises(ValueError):
        salted_join(skewed, small, "k", how="full")


def test_salted_join_spreads_hot_key(spark, skewed):
    """The salt column takes every value in [0, n_salts) over the hot
    key's rows — the single hot reducer is provably split."""
    from kgloom.ops.skew import F as _F  # same module funcs
    n = 4
    salt = F.pmod(F.hash(*[F.col(c) for c in skewed.columns]), F.lit(n))
    got = (skewed.where(F.col("k") == "hot")
           .select(salt.alias("s")).distinct().count())
    assert got == n
