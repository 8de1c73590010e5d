"""DSIR importance resampling (kgloom/ops/curate.py:dsir_weights /
dsir_sample) — Xie et al. 2023, hashed-n-gram likelihood-ratio
selection with a deterministic Gumbel-top-k draw."""

import hashlib
import math

import pytest

from kgloom.ops.curate import dsir_sample, dsir_weights

DOCS = [
    (0, "alpha alpha beta"),
    (1, "alpha gamma"),
    (2, "delta delta delta"),
    (3, "alpha beta"),
    (4, "epsilon zeta eta"),
    (5, "alpha alpha alpha"),
]
TARGET_IDS = {0, 1, 3, 5}  # the alpha-heavy target distribution


@pytest.fixture(scope="module")
def frames(spark):
    raw = spark.createDataFrame(DOCS, ["doc_id", "text"])
    target = raw.where(raw.doc_id.isin(*TARGET_IDS))
    return raw, target


def _bucket(gram: str, n_buckets: int) -> int:
    return int(hashlib.md5(gram.encode()).hexdigest()[:15], 16) % n_buckets


def _grams(text: str) -> list:
    t = text.lower().split(" ")
    return t + [" ".join(t[i:i + 2]) for i in range(len(t) - 1)]


def _expected_weights(n_buckets=64, a=1.0):
    tgt, rawc = {}, {}
    for doc_id, text in DOCS:
        for g in _grams(text):
            b = _bucket(g, n_buckets)
            rawc[b] = rawc.get(b, 0) + 1
            if doc_id in TARGET_IDS:
                tgt[b] = tgt.get(b, 0) + 1
    tt, tr = sum(tgt.values()), sum(rawc.values())
    out = {}
    for doc_id, text in DOCS:
        w = 0.0
        for g in _grams(text):
            b = _bucket(g, n_buckets)
            w += (math.log((tgt.get(b, 0) + a) / (tt + a * n_buckets))
                  - math.log((rawc.get(b, 0) + a) / (tr + a * n_buckets)))
        out[doc_id] = w
    return out


def test_weights_match_reference_model(spark, frames):
    raw, target = frames
    got = {r.doc_id: r.dsir_logw
           for r in dsir_weights(raw, target, n_buckets=64).collect()}
    want = _expected_weights(n_buckets=64)
    assert set(got) == set(want)
    for doc_id in want:
        assert got[doc_id] == pytest.approx(want[doc_id], abs=1e-9)


def test_target_like_docs_outweigh_off_target(spark, frames):
    raw, target = frames
    w = {r.doc_id: r.dsir_logw
         for r in dsir_weights(raw, target, n_buckets=64).collect()}
    # all-alpha doc must outrank the all-delta doc (delta never
    # appears in the target corpus)
    assert w[5] > w[2]


def test_sample_deterministic_and_sized(spark, frames):
    raw, target = frames
    s1 = dsir_sample(raw, target, 3, n_buckets=64).collect()
    s2 = dsir_sample(raw, target, 3, n_buckets=64).collect()
    assert [tuple(r) for r in s1] == [tuple(r) for r in s2]
    assert len(s1) == 3
    ids = {r.doc_id for r in s1}
    assert ids <= {d for d, _ in DOCS}
    # scores are the weight plus the doc's Gumbel perturbation
    for r in s1:
        u = int(hashlib.md5(f"{r.doc_id}dsir".encode())
                .hexdigest()[:15], 16) / float(16 ** 15)
        g = -math.log(-math.log(u))
        w = _expected_weights(n_buckets=64)[r.doc_id]
        assert r.dsir_score == pytest.approx(round(w + g, 6), abs=1e-6)


def test_salt_changes_the_draw_not_the_weights(spark, frames):
    raw, target = frames
    a = {r.doc_id: r.dsir_logw
         for r in dsir_sample(raw, target, 6, n_buckets=64,
                              salt="a").collect()}
    b = {r.doc_id: r.dsir_logw
         for r in dsir_sample(raw, target, 6, n_buckets=64,
                              salt="b").collect()}
    assert a == b  # k = n: same docs, same weights, any salt


def test_per_group_sample_exact_counts_and_determinism(spark):
    from kgloom.ops.curate import per_group_sample
    rows = [(i, "g%d" % (i % 3)) for i in range(50)]
    df = spark.createDataFrame(rows, ["k", "g"])
    out1 = per_group_sample(df, "k", "g", 5).collect()
    out2 = per_group_sample(df.repartition(7), "k", "g", 5).collect()
    assert sorted(map(tuple, out1)) == sorted(map(tuple, out2))
    from collections import Counter
    counts = Counter(r.g for r in out1)
    assert counts == {"g0": 5, "g1": 5, "g2": 5}
    # small groups keep everything
    tiny = per_group_sample(df.where("k < 4"), "k", "g", 5).collect()
    assert len(tiny) == 4
    # the kept set is the k smallest md5 ranks per group
    import hashlib
    for g in ("g0", "g1", "g2"):
        members = [k for k, gg in rows if gg == g]
        want = sorted(members, key=lambda k: (
            hashlib.md5(str(k).encode()).hexdigest()[:8], k))[:5]
        got = sorted(r.k for r in out1 if r.g == g)
        assert got == sorted(want)
