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
    minima = (local.drop("__b", "__rn")
              .withColumn("__rn", F.row_number().over(w2))
              .where(F.col("__rn") <= k))
    agg = minima.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_minima"),
        F.max("__f").alias("f_k"))
    est = (F.when(F.col("n_minima") < k,
                  F.col("n_minima").cast("double"))
           .otherwise(F.lit(float(k - 1)) / F.col("f_k")))
    return agg.select(*keys, "n_minima", "f_k", est.alias("estimate"))
