"""Skew diagnostics and mitigation — the operational half of "
partitioning / shuffle / skew handled explicitly" (BASELINE.json north
rule): measure per-key skew cheaply, list the hot keys, and join
through a skewed key without one straggler task owning the hot
partition.

At 100 TB the failure mode is ONE conversation / entity / join key
holding 10⁶× the median row count: every shuffle keyed on it sends
that key's rows to one reducer.  AQE's skew-join split handles the
shuffle-join case at runtime; :func:`salted_join` is the explicit,
plan-stable form for when the salt must be chosen by the pipeline
(deterministic reruns, pre-partitioned writes, joins AQE cannot split).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def skew_report(df: DataFrame, key: str) -> DataFrame:
    """Log10-magnitude histogram of per-key row counts:
    ``(magnitude, n_keys, n_rows, max_count, example_key)`` where
    magnitude ``m`` covers keys with ``10^m ≤ count < 10^(m+1)``.

    The skew dashboard row a pipeline logs before choosing a shuffle
    strategy: a healthy key space concentrates in one or two
    magnitudes; rows in a high magnitude with tiny ``n_keys`` are the
    hot keys.  Two hash aggregates (per-key count → per-magnitude
    rollup), no sort over the key space, ``example_key`` = MIN key per
    bucket for deterministic output."""
    counts = df.where(F.col(key).isNotNull()) \
        .groupBy(F.col(key).alias("__k")) \
        .agg(F.count(F.lit(1)).alias("__n"))
    mag = F.floor(F.log10(F.col("__n"))).cast("int")
    return (counts.groupBy(mag.alias("magnitude"))
            .agg(F.count(F.lit(1)).alias("n_keys"),
                 F.sum("__n").alias("n_rows"),
                 F.max("__n").alias("max_count"),
                 F.min("__k").alias("example_key")))


def top_keys(df: DataFrame, key: str, k: int = 20) -> DataFrame:
    """The ``k`` hottest keys by row count: ``(key, n_rows)``, count
    descending then key ascending (deterministic).  Compiles to
    TakeOrderedAndProject over the per-key aggregate — only ``k`` rows
    ever leave the final stage."""
    return (df.where(F.col(key).isNotNull())
            .groupBy(F.col(key).alias("key"))
            .agg(F.count(F.lit(1)).alias("n_rows"))
            .orderBy(F.desc("n_rows"), F.asc("key"))
            .limit(k))


def salted_join(big: DataFrame, small: DataFrame, key: str,
                n_salts: int = 16, how: str = "inner") -> DataFrame:
    """Inner/left join ``big ⋈ small`` on ``key`` with the hot-key
    salt trick: each big-side row gets a deterministic salt in
    ``[0, n_salts)`` (hash of the whole row — content-stable across
    reruns and repartitioning, no ``rand()``), the small side is
    replicated once per salt value, and the join runs on
    ``(key, salt)`` — a key that used to land on ONE reducer now
    spreads over ``n_salts`` of them.

    Result equality: bit-identical rows to the unsalted join (salt
    columns are internal and dropped).  Cost: the small side is
    materialized ``n_salts``× into the shuffle — use for genuinely
    skewed keys with a SMALL right side; for dimension-table sizes
    prefer ``F.broadcast`` (no shuffle at all), and let AQE's skew
    split handle one-off interactive queries."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    salt = F.pmod(F.hash(*[F.col(c) for c in big.columns]),
                  F.lit(n_salts)).alias("__salt")
    b = big.select("*", salt)
    s = small.crossJoin(
        big.sparkSession.range(n_salts)
        .select(F.col("id").cast("int").alias("__salt")))
    out = b.join(s, [key, "__salt"], how)
    return out.drop("__salt")
