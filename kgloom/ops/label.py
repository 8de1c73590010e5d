"""Weak supervision: labeling-function application + vote aggregation.

The data-programming pattern (Ratner et al., "Snorkel: Rapid Training
Data Creation with Weak Supervision", VLDB 2018 — public literature):
many noisy, partial labeling functions (LFs) vote on each example;
an aggregator resolves them into one training label plus confidence
signals.  This module implements the deterministic majority-vote
aggregator (the Snorkel baseline) — the full generative model is a
small driver-side EM over the bounded (LF x label) agreement matrix
and can be layered on top of :func:`vote_matrix`.

Scale shape: LFs are Catalyst column expressions (map-side, codegen);
aggregation is one explode of the per-row vote array + one
groupBy(id, label) with partial aggregation + one window max — two
shuffles keyed by the example id, no Python, no collects.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def apply_lfs(df: DataFrame, lfs: dict[str, Column]) -> DataFrame:
    """Attach one column per labeling function (sorted by name for a
    deterministic schema).  An LF returns a label string or null
    (abstain)."""
    out = df
    for name in sorted(lfs):
        out = out.withColumn(name, lfs[name])
    return out


def vote_matrix(df: DataFrame, id_col: str,
                lf_cols: list[str]) -> DataFrame:
    """(id, label, n_votes) — per-example vote counts over the
    non-abstaining LFs; the bounded input of any downstream label
    model."""
    votes = F.array(*[F.col(c) for c in lf_cols])
    return (df.select(id_col,
                      F.explode(F.filter(votes,
                                         lambda v: v.isNotNull()))
                      .alias("label"))
            .groupBy(id_col, "label")
            .agg(F.count(F.lit(1)).alias("n_votes")))


def majority_label(df: DataFrame, id_col: str, lf_cols: list[str],
                   min_votes: int = 1) -> DataFrame:
    """(id, label, n_votes, n_total, margin): the majority vote over
    non-abstaining LFs, ties broken by the lexicographically smallest
    label (deterministic, engine-portable).  ``margin`` = winner votes
    minus runner-up votes (0 for a tie, n_votes when unopposed);
    examples where every LF abstains — or the winner has fewer than
    ``min_votes`` — are dropped (no label emitted)."""
    vm = vote_matrix(df, id_col, lf_cols)
    w = Window.partitionBy(id_col).orderBy(F.desc("n_votes"), "label")
    ranked = (vm.withColumn("__rn", F.row_number().over(w))
              .withColumn("__tot", F.sum("n_votes").over(
                  Window.partitionBy(id_col)))
              .withColumn("__next", F.lead("n_votes").over(w)))
    return (ranked.where((F.col("__rn") == 1)
                         & (F.col("n_votes") >= min_votes))
            .select(id_col, "label", "n_votes",
                    F.col("__tot").alias("n_total"),
                    (F.col("n_votes")
                     - F.coalesce(F.col("__next"), F.lit(0)))
                    .alias("margin")))
