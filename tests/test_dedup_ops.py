"""Dedup-operator scale-safety tests.

The oracle mirror (test_entry_oracles.py) proves value correctness;
these tests pin the *plan-shape* guarantees the 100-TB design relies
on: the shingle document-frequency cap keeps the inverted-index join
linear under skew, and the simhash banding is complete for the
configured Hamming radius.
"""

import pytest
from pyspark.sql import functions as F

from kgloom.ops import dedup as D


@pytest.fixture(scope="module")
def skewed_docs(spark):
    """60 docs; every doc contains the same 3-token shingle ("a b c")
    plus a unique tail — the classic stop-word-shingle skew corpus."""
    rows = [(i, f"a b c unique{i} tail{i} end{i}") for i in range(60)]
    return spark.createDataFrame(rows, "doc_id int, text string")


def test_shingle_df_cap_bounds_candidates(skewed_docs):
    # Uncapped: the ubiquitous shingle alone creates the full 60*59/2
    # cross product of candidate pairs (even though no pair passes the
    # final jaccard threshold) — the inverted-index scale-killer.
    sh = D.doc_shingles(skewed_docs, n=3)
    uncapped_candidates = (sh.alias("a").join(sh.alias("b"), "shingle")
                           .where(F.col("a.doc_id") < F.col("b.doc_id"))
                           .count())
    assert uncapped_candidates >= 60 * 59 / 2

    # Capped (df <= 5 < 60): the shared shingle is dropped before the
    # self-join; unique-tail shingles co-occur nowhere, so the candidate
    # set is EMPTY — linear behavior under total skew.
    sh_capped = sh.join(
        sh.groupBy("shingle").count().where(F.col("count") <= 5)
          .select("shingle"), "shingle")
    assert (sh_capped.alias("a").join(sh_capped.alias("b"), "shingle")
            .where(F.col("a.doc_id") < F.col("b.doc_id")).count()) == 0

    # And the public operator applies the cap by default (non-None).
    assert D.ngram_jaccard_pairs(skewed_docs, n=3, threshold=0.1,
                                 max_shingle_df=5).count() == 0


def test_cap_preserves_true_pairs_below_df(spark):
    """Docs sharing low-DF shingles still pair up under the cap."""
    rows = [(1, "x y z common tail one"),
            (2, "x y z common tail two"),
            (3, "totally different text here now")]
    docs = spark.createDataFrame(rows, "doc_id int, text string")
    pairs = {(r.doc_a, r.doc_b)
             for r in D.ngram_jaccard_pairs(docs, n=3, threshold=0.3).collect()}
    assert pairs == {(1, 2)}


def test_simhash_banding_complete_vs_exact(spark):
    """Banded candidates + popcount verify == exact all-pairs Hamming
    filter (pigeonhole completeness for d+1 blocks) on a corpus with
    near-identical docs."""
    base = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [(0, base), (1, base), (2, base + " iota"),
            (3, "completely unrelated words list nine ten")]
    docs = spark.createDataFrame(rows, "doc_id int, text string")
    banded = {(r.doc_a, r.doc_b, r.hamming)
              for r in D.simhash_near_pairs(docs, max_hamming=6).collect()}
    sig = {r.doc_id: r.simhash for r in D.simhash64(docs).collect()}
    exact = {(a, b, bin(sig[a] ^ sig[b]).count("1"))
             for a in sig for b in sig if a < b
             and bin(sig[a] ^ sig[b]).count("1") <= 6}
    assert banded == exact
    assert (0, 1, 0) in banded  # identical docs at distance 0
