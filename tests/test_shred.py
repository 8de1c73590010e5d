"""JSON schema induction + typed shredding (kgloom/ops/shred.py)."""

import pytest
from pyspark.sql import functions as F

from kgloom.ops.shred import induce_json_schema, shred_json


@pytest.fixture(scope="module")
def blobs(spark):
    rows = [
        ('{"i": 1, "s": "a", "f": 1.5}',),
        ('{"i": 2, "s": "b", "b": true, "n": null}',),
        ('{"i": "three", "o": {"z": 1}, "a": [1, 2]}',),  # i flips type
        ('{"q": "69"}',),   # JSON string of digits stays a string
        ('not json at all',),
    ]
    return spark.createDataFrame(rows, "j string")


def test_induce_json_schema(spark, blobs):
    got = {(r.path, r.json_type): (r.n, r.frac) for r in
           induce_json_schema(blobs, "j").collect()}
    assert got[("i", "integer")] == (2, 0.5)   # 4 parseable rows
    assert got[("i", "string")] == (1, 0.25)   # heterogeneity surfaces
    assert got[("s", "string")] == (2, 0.5)
    assert got[("f", "number")] == (1, 0.25)
    assert got[("b", "boolean")] == (1, 0.25)
    assert got[("n", "null")] == (1, 0.25)
    assert got[("o", "object")] == (1, 0.25)
    assert got[("a", "array")] == (1, 0.25)
    assert got[("q", "string")] == (1, 0.25)   # "69" is NOT integer
    assert not any(p == "i" and t == "number" for p, t in got)


def test_shred_json_typed(spark, blobs):
    out = shred_json(blobs.where(F.col("j").startswith("{")), "j",
                     {"i_int": ("$.i", "bigint"),
                      "s_str": ("$.s", "string")})
    got = sorted(((r.i_int, r.s_str) for r in out.collect()),
                 key=lambda t: (t[0] is None, t))
    # "three" extracted as bigint -> null (type-aware, no coercion)
    assert got == [(1, "a"), (2, "b"), (None, None), (None, None)]


def test_shred_no_python_in_plan(spark, blobs):
    plan = induce_json_schema(blobs, "j")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan
