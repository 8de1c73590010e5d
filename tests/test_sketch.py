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


# ---------------------------------------------------------------------------
# KLL-style mergeable quantile sketch
# ---------------------------------------------------------------------------

from kgloom.ops.sketch import kll_merge, kll_quantiles, kll_sketch  # noqa: E402


def _rank_err(values: list[int], est: float, q: float) -> int:
    """True-rank distance of est from the target rank ceil(q*n)."""
    import bisect
    s = sorted(values)
    target = -(-q * len(s) // 1)  # ceil
    lo = bisect.bisect_left(s, est)
    hi = bisect.bisect_right(s, est)
    if lo <= target <= hi:
        return 0
    return int(min(abs(lo - target), abs(hi - target)))


def _dists(seed: int, n: int) -> dict[str, list[int]]:
    import random
    rng = random.Random(seed)
    return {
        "uniform": [rng.randrange(0, 100_000) for _ in range(n)],
        "zipf": [int(1000 / (rng.random() + 0.01)) for _ in range(n)],
        "bimodal": [rng.randrange(0, 100) if rng.random() < 0.5
                    else rng.randrange(90_000, 100_000) for _ in range(n)],
        "constant": [42] * n,
    }


def test_kll_quantiles_rank_error_bound(spark):
    """Empirical bound across distributions: for every q, the
    estimate's true rank is within 3n/k of the target rank (stage-1
    bucket width n/k per salt + one merged bucket, with slack)."""
    K, S, N = 32, 4, 4000
    data = _dists(20260820, N)
    rows = [(name, v) for name, vs in data.items() for v in vs]
    df = spark.createDataFrame(rows, "g string, v long")
    qs = [0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99]
    got = kll_quantiles(df, ["g"], "v", qs, k=K, n_salts=S).collect()
    assert len(got) == len(data) * len(qs)
    bound = 3 * N / K
    for r in got:
        assert r.n == N
        err = _rank_err(data[r.g], r.est, r.q)
        assert err <= bound, (r.g, r.q, r.est, err, bound)
    # constant input is exact at every q
    for r in got:
        if r.g == "constant":
            assert r.est == 42.0


def test_kll_sketch_bounded_size(spark):
    """A group's sketch never exceeds n_salts*k centroids however
    large the input — the whole point of the summary."""
    df = spark.range(50_000).select(F.lit("g").alias("g"),
                                    (F.col("id") % 9973).alias("v"))
    cent = kll_sketch(df, ["g"], "v", k=16, n_salts=4)
    assert cent.count() <= 16 * 4
    merged = kll_merge(cent, ["g"], k=16)
    assert merged.count() <= 16
    # weight and sum are conserved exactly through both stages
    tot = merged.groupBy("g").agg(F.sum("cnt").alias("c"),
                                  F.sum("vsum").alias("s")).collect()[0]
    want = df.groupBy("g").agg(F.count(F.lit(1)).alias("c"),
                               F.sum("v").alias("s")).collect()[0]
    assert (tot.c, tot.s) == (want.c, want.s)


def test_kll_merge_of_partition_sketches_matches_bound(spark):
    """Mergeability: sketch each half separately, merge the centroid
    bags, and the merged sketch still meets the rank bound on the
    union — the 100-TB tree-merge path."""
    import random
    rng = random.Random(7)
    N, K, S = 3000, 32, 4
    a = [rng.randrange(0, 10_000) for _ in range(N)]
    b = [rng.randrange(5_000, 50_000) for _ in range(N)]
    da = spark.createDataFrame([("g", v) for v in a], "g string, v long")
    db = spark.createDataFrame([("g", v) for v in b], "g string, v long")
    bag = (kll_merge(kll_sketch(da, ["g"], "v", k=K, n_salts=S), ["g"], k=K)
           .unionByName(
               kll_merge(kll_sketch(db, ["g"], "v", k=K, n_salts=S),
                         ["g"], k=K))
           .select("g", "cnt", "vsum", "lo", "hi"))
    merged = kll_merge(bag, ["g"], k=K)
    assert merged.count() <= K
    # read q off the merged sketch exactly as kll_quantiles does
    from pyspark.sql.window import Window
    wc = (Window.partitionBy("g").orderBy("bucket")
          .rowsBetween(Window.unboundedPreceding, 0))
    m = (merged.withColumn("cum", F.sum("cnt").over(wc))
         .withColumn("n", F.sum("cnt").over(Window.partitionBy("g"))))
    union = a + b
    for q in (0.1, 0.5, 0.9):
        est = (m.where(F.col("cum") >= F.ceil(F.lit(q) * F.col("n")))
               .orderBy("cum").limit(1).collect()[0].avg)
        # merging two k-sketches doubles the per-stage slack
        assert _rank_err(union, est, q) <= 6 * len(union) / K, q


def test_kll_deterministic_under_repartition(spark):
    """The sketch is a pure function of the value multiset — physical
    partitioning must not change a single output bit."""
    df = spark.createDataFrame(
        [("g", (i * 37) % 5000) for i in range(8000)], "g string, v long")
    qs = [0.25, 0.5, 0.75]
    one = {(r.g, r.q): (r.n, r.est) for r in kll_quantiles(
        df.coalesce(1), ["g"], "v", qs, k=16, n_salts=4).collect()}
    many = {(r.g, r.q): (r.n, r.est) for r in kll_quantiles(
        df.repartition(13), ["g"], "v", qs, k=16, n_salts=4).collect()}
    assert one == many


@pytest.fixture(scope="module")
def skewed(spark):
    """Zipf-ish skew: two groups, a few hot values + a long uniform
    tail, shuffled across partitions."""
    import random
    rng = random.Random(20260820)
    rows = []
    for g, hot in (("a", ["h1"] * 400 + ["h2"] * 250 + ["h3"] * 90),
                   ("b", ["x"] * 700)):
        tail = [f"t{rng.randrange(0, 2000)}" for _ in range(1000)]
        rows += [(g, v) for v in hot + tail]
    rng.shuffle(rows)
    return rows


def _exact_heavy(rows, m):
    from collections import Counter
    out = set()
    for g in {r[0] for r in rows}:
        vals = [r[1] for r in rows if r[0] == g]
        n = len(vals)
        for v, c in Counter(vals).items():
            if c * (m + 1) > n:
                out.add((g, v, c, n))
    return out


def test_heavy_hitters_exact_vs_bruteforce(spark, skewed):
    from kgloom.ops.sketch import heavy_hitters
    df = spark.createDataFrame(skewed, "g string, v string")
    m = 8
    got = set(map(tuple, heavy_hitters(df, ["g"], "v", m=m).collect()))
    assert got == _exact_heavy(skewed, m)
    assert len(got) > 0  # the fixture does contain heavy hitters


def test_heavy_hitters_partition_layout_independent(spark, skewed):
    """MG candidates vary with the partition layout; the exact-verify
    pass must erase that — identical output at 1 and 16 partitions."""
    from kgloom.ops.sketch import heavy_hitters
    df = spark.createDataFrame(skewed, "g string, v string")
    a = set(map(tuple, heavy_hitters(
        df.repartition(1), ["g"], "v", m=6).collect()))
    b = set(map(tuple, heavy_hitters(
        df.repartition(16), ["g"], "v", m=6).collect()))
    assert a == b == _exact_heavy(skewed, 6)


def test_heavy_hitters_uniform_is_empty(spark):
    from kgloom.ops.sketch import heavy_hitters
    df = spark.range(3000).select(
        F.lit("g").alias("g"),
        F.concat(F.lit("u"), (F.col("id") % 1000)).alias("v"))
    # 1000 distinct × 3 each; threshold N/(m+1) = 3000/5 = 600 ≫ 3
    assert heavy_hitters(df, ["g"], "v", m=4).count() == 0


def test_heavy_hitters_null_values_counted(spark):
    """Nulls can't ride MG's counters; they must still surface when
    genuinely heavy, and count toward the group size."""
    from kgloom.ops.sketch import heavy_hitters
    rows = [("g", None)] * 50 + [("g", "a")] * 40 + \
           [("g", f"t{i}") for i in range(10)]
    df = spark.createDataFrame(rows, "g string, v string")
    got = {(r.v, r.cnt, r.n_group) for r in
           heavy_hitters(df, ["g"], "v", m=3).collect()}
    # threshold 100/4 = 25: null (50) and "a" (40) qualify
    assert got == {(None, 50, 100), ("a", 40, 100)}


def test_mg_candidates_bounded_and_superset(spark, skewed):
    from kgloom.ops.sketch import mg_candidates
    df = spark.createDataFrame(skewed, "g string, v string").repartition(8)
    m = 8
    cand = mg_candidates(df, ["g"], "v", m=m)
    per_g = {r.g: r.c for r in cand.groupBy("g").agg(
        F.count(F.lit(1)).alias("c")).collect()}
    assert all(c <= m * 8 for c in per_g.values())  # ≤ m·partitions
    got = set(map(tuple, cand.collect()))
    for g, v, _c, _n in _exact_heavy(skewed, m):
        assert (g, v) in got  # every true heavy hitter survives


def test_kmv_set_estimates_exact_branch(spark):
    from kgloom.ops.sketch import kmv_set_estimates
    a = spark.createDataFrame(
        [("g", f"v{i}") for i in range(20)], "g string, v string")
    b = spark.createDataFrame(
        [("g", f"v{i}") for i in range(10, 40)], "g string, v string")
    r = kmv_set_estimates(a, b, ["g"], "v", k=64).collect()[0]
    # union < k → synopses are complete sets → exact everything
    assert r.n_union_minima == 40 and r.est_union == 40.0
    assert r.k_inter == 10 and r.est_inter == 10.0
    assert abs(r.jaccard - 10 / 40) < 1e-12


def test_kmv_set_estimates_disjoint(spark):
    from kgloom.ops.sketch import kmv_set_estimates
    a = spark.createDataFrame([("g", f"a{i}") for i in range(30)],
                              "g string, v string")
    b = spark.createDataFrame([("g", f"b{i}") for i in range(30)],
                              "g string, v string")
    r = kmv_set_estimates(a, b, ["g"], "v", k=64).collect()[0]
    assert r.k_inter == 0 and r.est_inter == 0.0 and r.jaccard == 0.0
    assert r.est_union == 60.0


def test_kmv_set_estimates_estimator_accuracy(spark):
    """5000 ∪ 5000 with 2500 shared (true union 7500, jaccard 1/3):
    k=256 keeps relative error well inside 3/sqrt(k)."""
    from kgloom.ops.sketch import kmv_set_estimates
    a = spark.createDataFrame([("g", f"v{i}") for i in range(5000)],
                              "g string, v string")
    b = spark.createDataFrame(
        [("g", f"v{i}") for i in range(2500, 7500)], "g string, v string")
    r = kmv_set_estimates(a, b, ["g"], "v", k=256).collect()[0]
    assert abs(r.est_union - 7500) / 7500 < 3 / (256 ** 0.5)
    assert abs(r.jaccard - 1 / 3) < 0.15
    assert abs(r.est_inter - 2500) / 2500 < 0.35


def test_kmv_set_estimates_deterministic(spark):
    from kgloom.ops.sketch import kmv_set_estimates
    a = spark.createDataFrame([("g", f"v{i}") for i in range(3000)],
                              "g string, v string")
    b = spark.createDataFrame([("g", f"v{i}") for i in range(1000, 4000)],
                              "g string, v string")
    r1 = sorted(map(tuple, kmv_set_estimates(
        a.repartition(1), b.repartition(7), ["g"], "v", k=64).collect()))
    r2 = sorted(map(tuple, kmv_set_estimates(
        a.repartition(13), b.repartition(2), ["g"], "v", k=64).collect()))
    assert r1 == r2


def test_table_profile(spark):
    from kgloom.ops.sketch import table_profile
    rows = [(i, "en" if i % 10 else None, f"u{i}") for i in range(200)]
    df = spark.createDataFrame(rows, "id long, lang string, uid string")
    got = {r.column: r for r in
           table_profile(df, ["id", "lang", "uid"], k=256).collect()}
    assert got["id"].n_rows == 200 and got["id"].n_nulls == 0
    # k=256 > 200 distinct → exact branch
    assert got["id"].distinct_est == 200.0
    # near-unique: no value above N/(m+1) → honest null top
    assert got["id"].top_value is None and got["id"].top_cnt is None
    assert got["lang"].n_nulls == 20
    assert got["lang"].distinct_est == 1.0  # nulls excluded
    assert got["lang"].top_value == "en" and got["lang"].top_cnt == 180
    assert got["uid"].distinct_est == 200.0


def test_table_profile_deterministic(spark):
    from kgloom.ops.sketch import table_profile
    df = spark.range(5000).select(
        F.col("id"), (F.col("id") % 7).alias("mod7"))
    a = sorted(map(tuple, table_profile(
        df.repartition(1), ["id", "mod7"]).collect()))
    b = sorted(map(tuple, table_profile(
        df.repartition(16), ["id", "mod7"]).collect()))
    assert a == b
