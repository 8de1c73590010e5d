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


# --- k-means IVF similarity ------------------------------------------------

def test_kmeans_ivf_exhaustive_probe_equals_brute_force(spark):
    """n_probe >= n_cells probes every cell — the IVF result must equal
    exact brute-force top-k (strong equivalence oracle for the whole
    k-means assign/probe/score path)."""
    from kgloom.ops import similarity as S
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qids = list(range(8))
    brute = {(r.query_id, r.neighbor_id, r.rank)
             for r in S.cosine_topk(emb, k=3, query_ids=qids).collect()}
    ivf = {(r.query_id, r.neighbor_id, r.rank)
           for r in S.ivf_topk_kmeans(emb, k=3, n_cells=4, n_probe=4,
                                      query_ids=qids).collect()}
    assert ivf == brute


def test_kmeans_ivf_pruned_recall(spark):
    """Pruned probing (n_probe < n_cells) keeps useful recall vs exact
    top-k and returns exactly k ranked rows per query."""
    from kgloom.ops import similarity as S
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qids = list(range(10))
    brute = {(r.query_id, r.neighbor_id)
             for r in S.cosine_topk(emb, k=3, query_ids=qids).collect()}
    ivf_rows = S.ivf_topk_kmeans(emb, k=3, n_cells=8, n_probe=3,
                                 query_ids=qids).collect()
    ivf = {(r.query_id, r.neighbor_id) for r in ivf_rows}
    per_query = {}
    for r in ivf_rows:
        per_query.setdefault(r.query_id, []).append(r.rank)
    assert all(sorted(v) == [1, 2, 3] for v in per_query.values())
    recall = len(brute & ivf) / len(brute)
    assert recall >= 0.5, recall


def test_kmeans_assigns_nearest_centroid(spark):
    """Every corpus vector lands in its argmax-cosine centroid cell."""
    from kgloom.ops import similarity as S
    from pyspark.sql import functions as F
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet") \
        .limit(50)
    cents = S.kmeans_centroids(emb, n_cells=4, max_iter=2)
    cdf = spark.createDataFrame(cents, "cell int, centroid array<double>")
    assigned = S._assign(emb, cdf).select("vec_id", "cell")
    best = (emb.crossJoin(F.broadcast(cdf))
            .withColumn("csim", S.cosine(F.col("embedding"),
                                         F.col("centroid"))))
    from pyspark.sql.window import Window
    w = Window.partitionBy("vec_id").orderBy(F.desc("csim"), "cell")
    expect = (best.withColumn("r", F.row_number().over(w))
              .where("r = 1").select("vec_id", F.col("cell").alias("exp")))
    mism = assigned.join(expect, "vec_id") \
        .where(F.col("cell") != F.col("exp")).count()
    assert mism == 0


def test_minhash_band_bucket_cap(spark):
    """A mega-group of identical docs creates one quadratic band
    bucket; the bucket cap drops it while distinct near-dup pairs in
    small buckets survive."""
    rows = [(i, "same boilerplate text repeated everywhere here") for i
            in range(40)]
    rows += [(100, "alpha beta gamma delta epsilon zeta"),
             (101, "alpha beta gamma delta epsilon eta")]
    docs = spark.createDataFrame(rows, "doc_id int, text string")
    uncapped = D.minhash_lsh_pairs(docs).count()
    assert uncapped >= 40 * 39 / 2
    capped = {(r.doc_a, r.doc_b)
              for r in D.minhash_lsh_pairs(
                  docs, max_band_bucket=10).collect()}
    assert (100, 101) in capped          # true near-dup pair survives
    assert all(a >= 100 for a, _ in capped)  # mega-bucket dropped
