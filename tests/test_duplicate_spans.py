"""Cross-document repeated-span detection
(kgloom/ops/dedup.py:duplicate_spans)."""

import pytest

from kgloom.ops.dedup import duplicate_spans

DOCS = [
    # docs 0 and 1 share the exact 6-token run "a b c d e f"
    (0, "a b c d e f x y"),
    (1, "q a b c d e f"),
    (2, "u v w x y z"),
    (3, "one two"),  # shorter than the window: no row
]


@pytest.fixture(scope="module")
def out(spark):
    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    return {r.doc_id: r for r in
            duplicate_spans(docs, span_len=5, min_docs=2).collect()}


def test_window_counts(out):
    # doc 0: 8 tokens -> 4 windows; doc 1: 7 -> 3; doc 2: 6 -> 2
    assert out[0].n_windows == 4
    assert out[1].n_windows == 3
    assert out[2].n_windows == 2
    assert 3 not in out  # too short for any window


def test_shared_run_marks_both_docs(out):
    # the shared 6-token run yields two shared 5-windows: "a b c d e"
    # and "b c d e f" — both present in doc 0 and doc 1
    assert out[0].n_dup_windows == 2
    assert out[1].n_dup_windows == 2
    assert out[0].max_span_docs == 2
    assert out[1].max_span_docs == 2


def test_unique_doc_is_clean(out):
    assert out[2].n_dup_windows == 0
    assert out[2].max_span_docs == 1


def test_keep_best_in_clusters(spark):
    from kgloom.ops.dedup import keep_best_in_clusters
    clusters = spark.createDataFrame(
        [("1", "c1"), ("2", "c1"), ("3", "c1"),
         ("4", "c2"), ("9", "solo")],
        ["doc_id", "cluster_id"])
    scores = spark.createDataFrame(
        [("1", 0.5), ("2", 0.9), ("3", 0.9), ("4", 0.1)],
        ["doc_id", "score"])
    out = {r.cluster_id: r
           for r in keep_best_in_clusters(clusters, scores).collect()}
    # c1: 2 and 3 tie at 0.9 -> smaller doc_id wins
    assert out["c1"].doc_id == "2" and out["c1"].n_members == 3
    assert out["c2"].doc_id == "4"
    # unscored singleton survives with null score
    assert out["solo"].doc_id == "9" and out["solo"].score is None
