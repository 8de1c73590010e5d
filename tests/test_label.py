"""Weak-supervision vote aggregation (kgloom/ops/label.py)."""

import pytest
from pyspark.sql import functions as F

from kgloom.ops.label import apply_lfs, majority_label, vote_matrix


@pytest.fixture(scope="module")
def labeled(spark):
    df = spark.createDataFrame(
        [(0, 10), (1, 100), (2, 50), (3, 200)], ["id", "x"])
    return apply_lfs(df, {
        "lf_big": F.when(F.col("x") >= 100, "keep"),
        "lf_small": F.when(F.col("x") < 40, "drop"),
        "lf_mid": F.when(F.col("x").between(40, 150), "keep"),
        "lf_contra": F.when(F.col("x") == 100, "drop"),
    })


def test_vote_matrix_counts(spark, labeled):
    vm = {(r.id, r.label): r.n_votes
          for r in vote_matrix(labeled, "id",
                               ["lf_big", "lf_small", "lf_mid",
                                "lf_contra"]).collect()}
    assert vm == {(0, "drop"): 1, (1, "keep"): 2, (1, "drop"): 1,
                  (2, "keep"): 1, (3, "keep"): 1}


def test_majority_with_margin_and_ties(spark, labeled):
    out = {r.id: r for r in majority_label(
        labeled, "id",
        ["lf_big", "lf_small", "lf_mid", "lf_contra"]).collect()}
    assert out[1].label == "keep" and out[1].margin == 1 \
        and out[1].n_total == 3
    assert out[0].label == "drop" and out[0].margin == 1
    assert out[3].label == "keep" and out[3].margin == 1


def test_tie_breaks_lexicographically(spark):
    df = spark.createDataFrame([(0,)], ["id"])
    lf = apply_lfs(df, {"a": F.lit("zebra"), "b": F.lit("apple")})
    out = majority_label(lf, "id", ["a", "b"]).collect()[0]
    assert out.label == "apple" and out.margin == 0


def test_all_abstain_dropped_and_min_votes(spark):
    df = spark.createDataFrame([(0,), (1,)], ["id"])
    lf = apply_lfs(df, {
        "a": F.when(F.col("id") == 1, "keep"),
        "b": F.lit(None).cast("string")})
    assert majority_label(lf, "id", ["a", "b"]).count() == 1
    assert majority_label(lf, "id", ["a", "b"], min_votes=2).count() == 0


# --- normalize_text ---------------------------------------------------------

def test_normalize_text_rules_and_idempotence(spark):
    from kgloom.ops.textstats import normalize_text
    rows = [
        (0, "  a\tb\n\nc  "),
        (1, "x\x00\x01y\x7fz"),
        (2, "a​‌b﻿c"),
        (3, "Mixed CASE  Words"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r.text for r in normalize_text(df).collect()}
    assert out[0] == "a b c"
    assert out[1] == "xyz"
    assert out[2] == "abc"
    assert out[3] == "Mixed CASE Words"
    low = {r.doc_id: r.text
           for r in normalize_text(df, lowercase=True).collect()}
    assert low[3] == "mixed case words"
    once = normalize_text(df)
    twice = normalize_text(once)
    assert sorted(map(tuple, once.collect())) == \
        sorted(map(tuple, twice.collect()))


# --- harmonic centrality ----------------------------------------------------

def test_harmonic_centrality_exact_small_graph(spark):
    """k larger than any ball -> KMV is exact, so H equals the true
    truncated harmonic sum computed by hand."""
    from kgloom.ops.graph import harmonic_centrality
    # path a->b->c->d plus a->c shortcut
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("a", "c")],
        ["src", "dst"])
    got = {r.node: r.harmonic
           for r in harmonic_centrality(edges, radius=3,
                                        k=64).collect()}
    import math
    # out-balls: a reaches b(1) c(1) d(2); b: c(1) d(2); c: d(1); d: -
    want = {
        "a": 1 + 1 + 1 / 2,
        "b": 1 + 1 / 2,
        "c": 1.0,
        "d": 0.0,
    }
    for n, h in want.items():
        assert got[n] == pytest.approx(round(h, 6), abs=1e-6), n


def test_harmonic_centrality_monotone_nonnegative(spark):
    from kgloom.ops.graph import harmonic_centrality
    edges = spark.createDataFrame(
        [(f"n{i}", f"n{(i * 7 + 1) % 23}") for i in range(23)],
        ["src", "dst"])
    out = harmonic_centrality(edges, radius=4, k=4).collect()
    assert all(r.harmonic >= 0 for r in out)
    # n19's only edge is the self-loop 7·19+1 ≡ 19 (mod 23), which the
    # operator drops — 22 nodes carry edges
    assert len(out) == 22


def test_effective_diameter_path_graph(spark):
    """Path a->b->c->d->e, k large -> exact N(r); check against hand
    computation with 0.9-quantile interpolation."""
    from kgloom.ops.graph import effective_diameter
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")],
        ["src", "dst"])
    row = effective_diameter(edges, max_radius=4, k=64).collect()[0]
    # N(0)=5, N(1)=9, N(2)=12, N(3)=14, N(4)=15; 0.9*15=13.5
    # straddles r=2 (12) and r=3 (14): eff = 2 + (13.5-12)/(14-12)
    assert row.total_pairs == 15.0
    assert row.eff_diameter == pytest.approx(2.75, abs=1e-6)


def test_effective_diameter_complete_graph_is_one_or_less(spark):
    from kgloom.ops.graph import effective_diameter
    nodes = [f"n{i}" for i in range(5)]
    edges = spark.createDataFrame(
        [(a, b) for a in nodes for b in nodes if a != b],
        ["src", "dst"])
    row = effective_diameter(edges, max_radius=3, k=64).collect()[0]
    assert row.eff_diameter <= 1.0
