"""Unit tests for the KMV distinct-count sketch
(kgloom/ops/sketch.py)."""

import pytest
from pyspark.sql import functions as F

from kgloom.ops.sketch import kmv_distinct


@pytest.fixture(scope="module")
def groups(spark):
    # group "big": 5000 distinct values (+ duplicates); group
    # "small": 10 distinct values, far below k
    big = spark.range(5000).select(
        F.lit("big").alias("g"),
        F.concat(F.lit("v"), F.col("id")).alias("v"))
    dup = big.limit(500)
    small = spark.range(10).select(
        F.lit("small").alias("g"),
        F.concat(F.lit("w"), F.col("id")).alias("v"))
    return big.unionAll(dup).unionAll(small)


def test_kmv_exact_branch_below_k(spark, groups):
    rows = {r.g: r for r in kmv_distinct(groups, ["g"], "v",
                                         k=64).collect()}
    s = rows["small"]
    assert s.n_minima == 10 and s.estimate == 10.0


def test_kmv_estimator_within_error(spark, groups):
    rows = {r.g: r for r in kmv_distinct(groups, ["g"], "v",
                                         k=64).collect()}
    b = rows["big"]
    assert b.n_minima == 64
    # standard error ~ 1/sqrt(k-2) ≈ 12.7%; allow 4 sigma
    assert abs(b.estimate - 5000) / 5000 < 0.51
    # duplicates must not shift the estimate (set semantics)
    nodup = {r.g: r for r in kmv_distinct(
        groups.distinct(), ["g"], "v", k=64).collect()}
    assert nodup["big"].estimate == b.estimate


def test_kmv_deterministic_across_partitionings(spark, groups):
    a = sorted(map(tuple, kmv_distinct(groups, ["g"], "v").collect()))
    b = sorted(map(tuple, kmv_distinct(
        groups.repartition(17), ["g"], "v").collect()))
    assert a == b


def test_kmv_no_python_in_plan(spark, groups):
    plan = kmv_distinct(groups, ["g"], "v")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "EvalPython" not in plan
