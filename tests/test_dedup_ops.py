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
    uncapped = D.minhash_lsh_pairs(docs, max_band_bucket=None).count()
    assert uncapped >= 40 * 39 / 2
    capped = {(r.doc_a, r.doc_b)
              for r in D.minhash_lsh_pairs(
                  docs, max_band_bucket=10).collect()}
    assert (100, 101) in capped          # true near-dup pair survives
    assert all(a >= 100 for a, _ in capped)  # mega-bucket dropped


def test_minhash_default_cap_is_on(spark):
    """The band-bucket cap is the DEFAULT: a >1000-copy boilerplate
    group (the 100-TB scale-killer) is dropped by the default call
    while a genuine near-dup pair in a small bucket survives."""
    rows = [(i, "same boilerplate text repeated everywhere endlessly")
            for i in range(1200)]
    rows += [(2000, "alpha beta gamma delta epsilon zeta"),
             (2001, "alpha beta gamma delta epsilon eta")]
    docs = spark.createDataFrame(rows, "doc_id int, text string")
    got = {(r.doc_a, r.doc_b) for r in D.minhash_lsh_pairs(docs).collect()}
    assert got == {(2000, 2001)}


def test_clusters_boilerplate_corpus_linear(spark):
    """near_duplicate_clusters collapses exact duplicates BEFORE
    banding: 1k copies of one document produce ZERO rep-level candidate
    pairs (candidate count linear in the corpus, not quadratic in the
    duplicate group), yet all copies land in one cluster labeled by the
    min doc_id, near-dups still merge, and singletons stay alone."""
    boiler = "identical boilerplate document body repeated many times"
    rows = [(i, boiler) for i in range(1000)]
    rows += [(5000, "alpha beta gamma delta epsilon zeta"),
             (5001, "alpha beta gamma delta epsilon eta"),
             (6000, "a lone unrelated document with its own words")]
    docs = spark.createDataFrame(rows, "doc_id int, text string")

    # rep-level candidate generation is what runs inside the operator:
    # one representative per distinct text -> no mega-bucket self-join
    reps = D.exact_dedup(docs).select(
        F.col("rep_doc_id").alias("doc_id"))
    rep_pairs = D.minhash_lsh_pairs(docs.join(reps, "doc_id")).count()
    assert rep_pairs == 1  # only (5000, 5001)

    clusters = {r.doc_id: r.cluster_id
                for r in D.near_duplicate_clusters(docs).collect()}
    assert len(clusters) == 1003
    assert all(clusters[str(i)] == "0" for i in range(1000))
    assert clusters["5000"] == clusters["5001"] == "5000"
    assert clusters["6000"] == "6000"


def test_embedding_cosine_threshold_one_keeps_exact_duplicates(spark):
    """threshold=1.0 must detect identical vectors: the guard band sits
    strictly below the threshold, so sim == 1.0 (or 1.0 - 1ulp from a
    different fold order) is kept, not silently dropped."""
    rows = [(0, [1.0, 2.0, 3.0], "a"),
            (1, [1.0, 2.0, 3.0], "a"),
            (2, [3.0, 2.0, 1.0], "a")]
    emb = spark.createDataFrame(
        rows, "vec_id int, embedding array<float>, label string")
    got = {(r.vec_a, r.vec_b) for r in
           D.embedding_cosine_pairs(emb, threshold=1.0).collect()}
    assert got == {(0, 1)}


def test_unpersist_tracked_releases_operator_caches(spark):
    """Operators register their persisted intermediates; a long-lived
    session releases them all with one call."""
    from kgloom.ops.cache import unpersist_tracked
    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma doc{i} tail{i}") for i in range(20)],
        "doc_id int, text string")
    unpersist_tracked()  # reset whatever earlier tests registered
    D.ngram_jaccard_pairs(docs, threshold=0.1).count()
    D.minhash_lsh_pairs(docs).count()
    released = unpersist_tracked()
    assert released >= 2
    assert unpersist_tracked() == 0  # registry drained


# --- int8 quantization -------------------------------------------------------

def test_quantize_error_bound_and_range(spark):
    from kgloom.ops import similarity as S
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = S.quantize_embeddings(emb, keep_scale=True)
    row = q.select(
        F.max(F.array_max(F.transform("qembedding",
                                      lambda x: F.abs(x)))).alias("qmax"),
        F.max(F.array_max(F.zip_with(
            "embedding", "qembedding",
            lambda x, y: F.abs(x.cast("double")
                               - y.cast("double") / F.col("__scale")))))
        .alias("err"),
        F.first("__scale").alias("scale")).collect()[0]
    assert row.qmax <= 127
    # dequantization error per element is at most half a quant step
    assert row.err <= 0.5 / row.scale + 1e-12
    # the max-magnitude element hits the top of the int8 range exactly
    assert row.qmax == 127
    assert dict(q.select("qembedding").schema.fields[0].dataType
                .__dict__)["elementType"].simpleString() == "tinyint"


def test_quantized_topk_recall_vs_float(spark):
    """int8 scoring keeps high top-k agreement with exact float cosine
    on the (seeded, deterministic) embeddings table."""
    from kgloom.ops import similarity as S
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qids = list(range(10))
    exact = {(r.query_id, r.neighbor_id)
             for r in S.cosine_topk(emb, k=5, query_ids=qids).collect()}
    quant = {(r.query_id, r.neighbor_id)
             for r in S.quantized_topk(emb, k=5, query_ids=qids).collect()}
    assert len(quant & exact) / len(exact) >= 0.8


def test_quantized_dot_is_exact_integer(spark):
    from kgloom.ops import similarity as S
    df = spark.createDataFrame(
        [([127, -128, 1],), ([100, 100, -100],)], "v array<tinyint>")
    got = df.select(S.quantized_dot(F.col("v"), F.col("v"))
                    .alias("d")).collect()
    assert [r.d for r in got] == [127 * 127 + 128 * 128 + 1, 30000]
