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
