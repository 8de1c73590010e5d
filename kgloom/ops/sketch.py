"""Deterministic cardinality sketching: KMV (k-minimum-values)
distinct-count estimation.

Why not ``approx_count_distinct``: Spark's HLL++ is a black box whose
estimate depends on its internal hash — it cannot be replayed by
another engine, so it cannot be oracle-gated, and two engines (or two
versions) disagree.  KMV (Bar-Yossef et al. 2002, "Counting distinct
elements in a data stream" — public method) with an md5-derived hash
is a *pure function of the value set*: any engine with md5 reproduces
the exact same k minima and therefore the exact same estimate.  That
determinism is what makes sketch-based pipelines testable: the DuckDB
oracle reproduces the ESTIMATE bit-for-bit, not just the true count.

Estimator: map each distinct value to a hash fraction in [0, 1); with
``f_k`` the k-th smallest fraction of a group, the group's distinct
count is estimated by ``(k - 1) / f_k`` (the classic unbiased KMV
form); groups with fewer than ``k`` distinct values report their exact
count.  Standard error ~ 1/sqrt(k-2).

Scale shape: a naive per-group sort of all distinct hashes defeats the
point of a sketch.  The k minima are found with a TWO-STAGE bounded
top-k — stage 1 takes the k smallest within (group, hash-bucket)
sub-partitions, stage 2 the k smallest of those ≤ n_buckets·k
survivors per group — so no task ever materializes more than
``n_buckets · k`` rows per group and the heavy first stage runs at
full parallelism even for a single hot group (the same salting shape
as :mod:`kgloom.ops.skew`).  All Catalyst; no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

#: 16^15 — md5's first 15 hex chars as a fraction denominator.  60
#: bits exceed a double's 53-bit mantissa, so the long→double cast
#: rounds; cross-engine determinism holds anyway because Spark and
#: DuckDB apply the same IEEE-754 round-to-nearest on the cast and
#: then divide by the same power of two — identical inputs produce
#: bit-identical doubles in both engines (not because the value is
#: exactly representable).
_DENOM = float(16 ** 15)


def _hash_fraction(col) -> F.Column:
    """Deterministic hash of a value to a double in [0, 1): integer
    value of the first 15 md5 hex chars / 16^15."""
    return (F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10)
            .cast("long") / F.lit(_DENOM))


def kmv_distinct(df: DataFrame, keys: list[str], value: str, k: int = 64,
                 n_buckets: int = 16) -> DataFrame:
    """Per-``keys`` KMV distinct-count estimate of ``value``.

    Returns ``(keys…, n_minima, f_k, estimate)`` where ``n_minima`` is
    the number of retained minima (= min(k, true distinct)), ``f_k``
    the largest retained hash fraction, and ``estimate`` the KMV
    cardinality estimate — exact when the group has < ``k`` distinct
    values, ``(k-1)/f_k`` otherwise.  Deterministic: replayable on any
    engine with md5 (the DuckDB oracle matches the estimate exactly).
    """
    return kmv_estimate(
        kmv_minima(df, keys, value, k=k, n_buckets=n_buckets), keys, k=k)


def kmv_minima(df: DataFrame, keys: list[str], value: str, k: int = 64,
               n_buckets: int = 16) -> DataFrame:
    """(keys…, __f): the ``k`` smallest DISTINCT hash fractions of
    ``value`` per group — the KMV synopsis itself.  Exactly mergeable:
    the k smallest of a union are among the union of each side's k
    smallest, which is what makes the streaming fold
    (kgloom/streaming/distinct.py) bit-identical to batch."""
    h = (df.select(*keys, _hash_fraction(F.col(value)).alias("__f"))
         .distinct())
    # stage 1: k smallest per (keys, bucket) — bounded, fully
    # parallel.  The bucket assignment only shapes EXECUTION (stage 1
    # retains a superset of the global k minima for any assignment),
    # so it can use Spark's native hash — no replayability needed.
    bucket = F.pmod(F.hash("__f"), F.lit(n_buckets))
    w1 = Window.partitionBy(*keys, "__b").orderBy("__f")
    local = (h.withColumn("__b", bucket)
             .withColumn("__rn", F.row_number().over(w1))
             .where(F.col("__rn") <= k))
    # stage 2: k smallest of the ≤ n_buckets·k survivors per group
    w2 = Window.partitionBy(*keys).orderBy("__f")
    return (local.drop("__b", "__rn")
            .withColumn("__rn", F.row_number().over(w2))
            .where(F.col("__rn") <= k)
            .drop("__rn"))


def kmv_estimate(minima: DataFrame, keys: list[str],
                 k: int = 64) -> DataFrame:
    """(keys…, n_minima, f_k, estimate) from a minima synopsis."""
    agg = minima.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_minima"),
        F.max("__f").alias("f_k"))
    est = (F.when(F.col("n_minima") < k,
                  F.col("n_minima").cast("double"))
           .otherwise(F.lit(float(k - 1)) / F.col("f_k")))
    return agg.select(*keys, "n_minima", "f_k", est.alias("estimate"))


# ---------------------------------------------------------------------------
# Mergeable quantile sketch (equal-frequency centroids, KLL-style)
# ---------------------------------------------------------------------------
#
# Why not approxQuantile / approx_percentile: like HLL++, Spark's
# Greenwald-Khanna variant is engine-internal — not replayable, not
# oracle-gatable.  This sketch is a pure function of the value multiset:
#
#   stage 1 (local)  — rows are salted by an md5 content hash of the
#     value (equal values co-locate; the salt is itself replayable),
#     each (group, salt) cell is sorted once and compacted to ``k``
#     equal-frequency centroids via ntile — a centroid is
#     (cnt, vsum, lo, hi), SUMS not averages, so integral inputs stay
#     exact and order-independent across engines;
#   stage 2 (merge)  — any bag of centroids is re-compacted to ``k``
#     by cumulative-weight assignment: order centroids by (avg, lo,
#     hi, cnt, vsum) (total up to fully-identical — hence
#     interchangeable — rows), assign each to bucket
#     floor((cum_before + cnt/2) · k / total), and re-aggregate.
#     Merging is associative in shape: sketches of disjoint partitions
#     merge into a sketch of the union (the 100-TB path: per-partition
#     stage 1 at full parallelism, tree-merge of ≤ n_salts·k-row
#     summaries per group).
#
# Rank guarantee of stage 1: an equal-frequency bucket spans at most
# ceil(n_salt/k) ranks, so a quantile read off local centroids errs by
# ≤ n/k ranks per salt; merging adds the weight of one merged bucket
# (~n/k).  The property tests pin an empirical 3n/k bound across
# uniform/zipf/bimodal/constant inputs (tests/test_sketch.py).
#
# Every arithmetic step is written identically in the DuckDB oracle
# (same association, same integer/double cast points), so the ESTIMATE
# matches bit-for-bit — same philosophy as KMV above.


def _value_salt(col, n_salts: int) -> F.Column:
    """Deterministic content salt: md5 of the value's string form,
    first 15 hex chars, mod n_salts.  Equal values share a salt —
    required for replayability (the salt must be a pure function of
    the row content, not of physical placement)."""
    return F.pmod(F.conv(F.substring(F.md5(col.cast("string")), 1, 15),
                         16, 10).cast("long"), F.lit(n_salts))


def kll_sketch(df: DataFrame, keys: list[str], value: str, k: int = 64,
               n_salts: int = 8) -> DataFrame:
    """Stage 1: per-(keys, salt) equal-frequency compaction of
    ``value`` to ≤ ``k`` centroids.  Returns
    ``(keys…, __salt, __bkt, cnt, vsum, lo, hi)`` — ≤ n_salts·k rows
    per group regardless of input size.  The per-cell sort runs at
    ``groups × n_salts`` parallelism; no task sees more than one
    cell."""
    v = F.col(value).cast("long")
    rows = df.select(*keys, v.alias("__v"))
    rows = rows.withColumn("__salt", _value_salt(F.col("__v"), n_salts))
    w = Window.partitionBy(*keys, "__salt").orderBy("__v")
    return (rows.withColumn("__bkt", F.ntile(k).over(w))
            .groupBy(*keys, "__salt", "__bkt")
            .agg(F.count(F.lit(1)).alias("cnt"),
                 F.sum("__v").alias("vsum"),
                 F.min("__v").alias("lo"),
                 F.max("__v").alias("hi")))


def kll_merge(centroids: DataFrame, keys: list[str],
              k: int = 64) -> DataFrame:
    """Stage 2: merge any per-group bag of centroids
    ``(cnt, vsum, lo, hi)`` down to ≤ ``k``.  Returns
    ``(keys…, bucket, cnt, vsum, lo, hi, avg)`` with ``bucket``
    ascending in value order (unique per group — the downstream
    cumulative windows order by it).  Deterministic: the ordering key
    (avg, lo, hi, cnt, vsum) is total up to fully-identical rows,
    which are interchangeable."""
    avg = F.col("vsum").cast("double") / F.col("cnt")
    order = [avg, F.col("lo"), F.col("hi"), F.col("cnt"), F.col("vsum")]
    w = (Window.partitionBy(*keys).orderBy(*order)
         .rowsBetween(Window.unboundedPreceding, -1))
    cumx = F.coalesce(F.sum("cnt").over(w), F.lit(0))
    total = F.sum("cnt").over(Window.partitionBy(*keys))
    mb = F.least(
        F.lit(k - 1),
        F.floor(((cumx + F.col("cnt") / 2.0) * F.lit(k)) / total))
    out = (centroids
           .withColumn("bucket", mb.cast("int"))
           .groupBy(*keys, "bucket")
           .agg(F.sum("cnt").alias("cnt"), F.sum("vsum").alias("vsum"),
                F.min("lo").alias("lo"), F.max("hi").alias("hi")))
    return out.withColumn(
        "avg", F.col("vsum").cast("double") / F.col("cnt"))


def kll_extract(merged: DataFrame, keys: list[str],
                qs: list[float]) -> DataFrame:
    """Per-``q`` estimates off a merged centroid table (the output
    shape of :func:`kll_merge`): ``est`` is the average of the first
    centroid whose inclusive cumulative weight reaches ``ceil(q·n)``.
    Returns ``(keys…, q, n, est)``."""
    wc = (Window.partitionBy(*keys).orderBy("bucket")
          .rowsBetween(Window.unboundedPreceding, 0))
    m = (merged
         .withColumn("cum", F.sum("cnt").over(wc))
         .withColumn("n", F.sum("cnt").over(Window.partitionBy(*keys))))
    qcol = F.explode(F.array(*[F.lit(float(q)) for q in qs])).alias("q")
    hits = (m.select(*keys, "avg", "cum", "n", qcol)
            .where(F.col("cum") >= F.ceil(F.col("q") * F.col("n"))))
    return (hits.groupBy(*keys, "q")
            .agg(F.first("n").alias("n"),
                 F.min_by("avg", "cum").alias("est")))


def kll_quantiles(df: DataFrame, keys: list[str], value: str,
                  qs: list[float], k: int = 64,
                  n_salts: int = 8) -> DataFrame:
    """End-to-end sketched quantiles: sketch → merge → per-``q``
    estimate (``(keys…, q, n, est)``).  Rank error is bounded by the
    merged bucket weight (~n/k per side; 3n/k pinned empirically in
    tests/test_sketch.py)."""
    merged = kll_merge(kll_sketch(df, keys, value, k=k,
                                  n_salts=n_salts), keys, k=k)
    return kll_extract(merged, keys, qs)


def mg_candidates(df: DataFrame, keys: list[str], value: str,
                  m: int = 64) -> DataFrame:
    """Per-partition Misra-Gries heavy-hitter candidates: ≤ ``m``
    counters of bounded state per (partition, group) — the scale path
    of :func:`heavy_hitters`.

    Soundness (the property heavy_hitters relies on): within one
    partition's slice of a group, every value with slice-count
    > slice_N/(m+1) survives MG (total decrement weight ≤
    slice_N/(m+1), each decrement hits m+1 counters).  Summing over
    partitions: a value with GLOBAL count > N_g/(m+1) must exceed the
    local threshold in at least one partition (pigeonhole — if it were
    ≤ everywhere, the sum would be ≤ N_g/(m+1)), so the union of
    per-partition candidates is a superset of every true heavy
    hitter.  Candidate set size ≤ m · n_partitions per group.

    Output: distinct ``(keys…, value)`` candidate rows.  The candidate
    SET depends on the partition layout; :func:`heavy_hitters`'
    exact-verify pass makes the final answer layout-independent.
    """
    import pandas as pd  # noqa: F401  (mapInPandas path)

    cols = [*keys, value]
    slim = df.select(*cols)

    def gen(batches):
        state: dict = {}  # key-tuple -> {value: counter}
        for pdf in batches:
            grp = pdf.groupby(cols, dropna=False).size()
            for idx, c in grp.items():
                if not isinstance(idx, tuple):
                    idx = (idx,)
                kt, v = idx[:-1], idx[-1]
                ctr = state.setdefault(kt, {})
                if v in ctr:
                    ctr[v] += int(c)
                else:
                    ctr[v] = int(c)
                    if len(ctr) > m:
                        d = min(ctr.values())
                        for vv in list(ctr):
                            ctr[vv] -= d
                            if ctr[vv] <= 0:
                                del ctr[vv]
        out = [(*kt, v) for kt, ctr in state.items() for v in ctr]
        yield pd.DataFrame(out, columns=cols)

    return slim.mapInPandas(gen, schema=slim.schema)


def heavy_hitters(df: DataFrame, keys: list[str], value: str,
                  m: int = 64) -> DataFrame:
    """EXACT per-group heavy hitters — every ``value`` whose count
    exceeds ``N_group/(m+1)`` — in two bounded passes (the classic
    MG-prune-then-verify pattern; Misra & Gries 1982, Agarwal et al.
    2013 "Mergeable Summaries", both public methods).

    Pass 1 (:func:`mg_candidates`) runs bounded-state Misra-Gries per
    partition; the candidate union (≤ m·partitions rows per group) is
    a proven superset of the answer.  Pass 2 exactly counts ONLY the
    candidates (broadcast semi join — no full groupBy over a
    value domain that may be near-unique at 100 TB) and filters by the
    group threshold ``cnt·(m+1) > N_group``.  Null values can't ride
    MG's dict counters, so their (per-group, hence tiny) exact counts
    are unioned in unconditionally.

    Because pass 2 is exact and pass 1 is a superset, the result is
    INDEPENDENT of the partition layout (pinned in tests) and equals
    the plain SQL ``HAVING cnt·(m+1) > N_group`` answer — a sketch
    pipeline you can hash-match against an oracle.

    Returns ``(keys…, value, cnt, n_group)`` with ``cnt`` the exact
    count and ``n_group`` the exact group size (nulls included).
    """
    totals = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n_group"))
    nn = df.where(F.col(value).isNotNull())
    cand = mg_candidates(nn, keys, value, m=m)
    counted = (nn.join(F.broadcast(cand), on=[*keys, value], how="leftsemi")
               .groupBy(*keys, value)
               .agg(F.count(F.lit(1)).alias("cnt")))
    nulls = (df.where(F.col(value).isNull())
             .groupBy(*keys)
             .agg(F.first(F.col(value)).alias(value),
                  F.count(F.lit(1)).alias("cnt")))
    # totals is one row per group — billions of groups is possible at
    # scale, so no broadcast hint (AQE promotes it when it IS small);
    # the probe side is candidate-sized either way
    return (counted.unionByName(nulls)
            .join(totals, on=list(keys))
            .where(F.col("cnt") * (m + 1) > F.col("n_group"))
            .select(*keys, value, "cnt", "n_group"))


def kmv_set_estimates(a: DataFrame, b: DataFrame, keys: list[str],
                      value: str, k: int = 64,
                      n_buckets: int = 16) -> DataFrame:
    """Per-``keys`` distinct-cardinality estimates for the UNION,
    INTERSECTION and Jaccard of two sides' ``value`` sets from their
    KMV synopses alone (Beyer et al. 2007, "On synopses for
    distinct-value estimation under multiset operations" — public
    method): the k smallest of ``M_a ∪ M_b`` form the union synopsis;
    the fraction of those present in BOTH side synopses estimates the
    Jaccard; ``est_inter = jaccard · est_union``.

    This is join-size-advisor machinery: |A ⋈ B| on a key column is
    bounded below by the key intersection, and a planner can decide
    broadcast vs shuffle from two k-row synopses without touching
    either table again.  Deterministic md5 hashing makes every output
    column a pure function of the two value sets — the DuckDB oracle
    reproduces the ESTIMATES bit-for-bit.

    Exactness: when the union synopsis holds fewer than ``k`` minima
    both side synopses are complete sets, so ``est_union`` and
    ``est_inter`` are exact counts.  Groups present on only one side
    report an empty intersection.

    Returns ``(keys…, n_union_minima, f_k, est_union, k_inter,
    jaccard, est_inter)``.
    """
    ma = kmv_minima(a, keys, value, k=k, n_buckets=n_buckets)
    mb = kmv_minima(b, keys, value, k=k, n_buckets=n_buckets)
    u = ma.unionByName(mb).distinct()
    w = Window.partitionBy(*keys).orderBy("__f")
    uk = (u.withColumn("__rn", F.row_number().over(w))
          .where(F.col("__rn") <= k).drop("__rn"))
    flagged = (uk
               .join(ma.withColumn("__ina", F.lit(1)),
                     on=[*keys, "__f"], how="left")
               .join(mb.withColumn("__inb", F.lit(1)),
                     on=[*keys, "__f"], how="left"))
    agg = flagged.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_union_minima"),
        F.max("__f").alias("f_k"),
        F.sum(F.when(F.col("__ina").isNotNull() &
                     F.col("__inb").isNotNull(), 1).otherwise(0))
         .alias("k_inter"))
    est_union = F.when(F.col("n_union_minima") < k,
                       F.col("n_union_minima").cast("double")) \
                 .otherwise((k - 1) / F.col("f_k"))
    return (agg.withColumn("est_union", est_union)
            .withColumn("jaccard",
                        F.col("k_inter") / F.col("n_union_minima"))
            .withColumn("est_inter",
                        F.when(F.col("n_union_minima") < k,
                               F.col("k_inter").cast("double"))
                        .otherwise(F.col("jaccard") *
                                   F.col("est_union"))))


def table_profile(df: DataFrame, cols: list[str], k: int = 64,
                  m: int = 64) -> DataFrame:
    """ANALYZE-style one-pass column profiling: per column the exact
    row/null counts, the KMV distinct estimate, and the dominant value
    with its exact count when one exists — the statistics a catalog
    keeps per 100-TB table, built from this module's deterministic
    sketches so every cell is oracle-replayable.

    Shape: the selected columns MELT to long form ``(c, v)`` (values
    cast to string) with one ``explode``, then every per-column sketch
    is ONE grouped pass over that table — adding columns adds rows,
    not jobs.  ``top_value`` comes from :func:`heavy_hitters`
    (MG-prune + exact verify), so it is only reported when the value's
    frequency truly exceeds ``N_col/(m+1)`` — a near-unique column
    honestly reports null rather than an arbitrary sample.

    Returns ``(column, n_rows, n_nulls, distinct_est, top_value,
    top_cnt)``, one row per requested column.
    """
    pairs = F.explode(F.array(*[
        F.struct(F.lit(c).alias("c"),
                 F.col(c).cast("string").alias("v"))
        for c in cols])).alias("p")
    melted = df.select(pairs).select("p.c", "p.v")
    counts = melted.groupBy("c").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("v").isNull(), 1).otherwise(0))
         .alias("n_nulls"))
    nn = melted.where(F.col("v").isNotNull())
    dist = (kmv_distinct(nn, ["c"], "v", k=k)
            .select("c", F.col("estimate").alias("distinct_est")))
    hh = heavy_hitters(nn, ["c"], "v", m=m)
    w = Window.partitionBy("c").orderBy(F.desc("cnt"), "v")
    top = (hh.withColumn("__rk", F.row_number().over(w))
           .where(F.col("__rk") == 1)
           .select("c", F.col("v").alias("top_value"),
                   F.col("cnt").alias("top_cnt")))
    return (counts.join(dist, "c", "left").join(top, "c", "left")
            .select(F.col("c").alias("column"), "n_rows", "n_nulls",
                    "distinct_est", "top_value", "top_cnt"))
