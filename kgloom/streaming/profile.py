"""Streaming incremental table profiling: catalog statistics
(row/null counts, distinct estimates, dominant values) maintained
over an unbounded stream with bounded state.

Composes the three mergeable folds this package already pins:

- exact counters  — ``counts_k = counts_{k-1} + Counts(batch_k)``
  (associative integer addition; exact forever);
- KMV minima      — :func:`kgloom.streaming.distinct.fold_minima`
  (BIT-identical to batch ``kmv_distinct`` over everything streamed);
- MG summaries    — :func:`kgloom.streaming.heavyhitters.fold_summary`
  (every value with count > N/(m+1) present; ``cnt ≤ true ≤ cnt+err``).

The batch is MELTED to long form (column-name, value-as-string) once
per trigger, so every per-column statistic is one grouped pass and
adding columns adds rows, not jobs — the same shape as the batch
:func:`kgloom.ops.sketch.table_profile`.

``read_profile`` returns ``(column, n_rows, n_nulls, distinct_est,
top_value, top_cnt, top_err)``: counts exact, ``distinct_est``
bit-identical to batch KMV (pinned stream==batch in tests), and the
top value the MG winner with its lower bound + error — the honest
streaming substitute for the batch profile's exact verify pass, which
would need a history rescan.

State layout mirrors the sibling monitors: versioned parquet
(``cnt/ minima/ summ/ tot/`` under ``v={batch_id}``), ``_SUCCESS``-
gated, deterministic in (prior state, batch) → retry-idempotent under
Structured Streaming's replay contract.
"""

from __future__ import annotations

import glob
import os
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .distinct import fold_minima
from .heavyhitters import fold_summary

_CNT_DDL = "c string, n_rows bigint, n_nulls bigint"
_MIN_DDL = "c string, __f double"
_SUMM_DDL = "c string, v string, cnt bigint"
_TOT_DDL = "c string, n_total bigint"


def _melt(batch_df: DataFrame, cols: list[str]) -> DataFrame:
    pairs = F.explode(F.array(*[
        F.struct(F.lit(c).alias("c"),
                 F.col(c).cast("string").alias("v"))
        for c in cols])).alias("p")
    return batch_df.select(pairs).select("p.c", "p.v")


def _versions(state_path: str, sub: str,
              before: Optional[int] = None) -> list:
    out = []
    for d in glob.glob(os.path.join(state_path, sub, "v=*")):
        try:
            v = int(os.path.basename(d).split("=", 1)[1])
        except ValueError:
            continue
        if os.path.exists(os.path.join(d, "_SUCCESS")) and \
                (before is None or v < before):
            out.append(v)
    return sorted(out)


def _read(spark: SparkSession, state_path: str, sub: str, ddl: str,
          before: Optional[int] = None) -> Optional[DataFrame]:
    versions = _versions(state_path, sub, before)
    if not versions:
        return None
    return spark.read.schema(ddl).parquet(
        os.path.join(state_path, sub, f"v={versions[-1]}"))


def profile_batch(spark: SparkSession, state_path: str,
                  batch_df: DataFrame, batch_id: int, cols: list[str],
                  k: int = 64, m: int = 64) -> None:
    """Fold one micro-batch into all four state tables."""
    melted = _melt(batch_df, cols).localCheckpoint()
    nn = melted.where(F.col("v").isNotNull())

    cnt = melted.groupBy("c").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("v").isNull(), 1).otherwise(0))
         .alias("n_nulls"))
    pcnt = _read(spark, state_path, "cnt", _CNT_DDL, before=batch_id)
    if pcnt is not None:
        cnt = (cnt.unionByName(pcnt).groupBy("c")
               .agg(F.sum("n_rows").alias("n_rows"),
                    F.sum("n_nulls").alias("n_nulls")))
    cnt.write.mode("overwrite").parquet(
        os.path.join(state_path, "cnt", f"v={batch_id}"))

    pmin = _read(spark, state_path, "minima", _MIN_DDL, before=batch_id)
    fold_minima(pmin, nn, ["c"], "v", k=k).write.mode("overwrite") \
        .parquet(os.path.join(state_path, "minima", f"v={batch_id}"))

    psum = _read(spark, state_path, "summ", _SUMM_DDL, before=batch_id)
    fold_summary(psum, nn, ["c"], "v", m=m).write.mode("overwrite") \
        .parquet(os.path.join(state_path, "summ", f"v={batch_id}"))

    tot = nn.groupBy("c").agg(F.count(F.lit(1)).alias("n_total"))
    ptot = _read(spark, state_path, "tot", _TOT_DDL, before=batch_id)
    if ptot is not None:
        tot = (tot.unionByName(ptot).groupBy("c")
               .agg(F.sum("n_total").alias("n_total")))
    tot.write.mode("overwrite").parquet(
        os.path.join(state_path, "tot", f"v={batch_id}"))


def stream_profile(spark: SparkSession, stream_df: DataFrame,
                   state_path: str, checkpoint_path: str,
                   cols: list[str], k: int = 64, m: int = 64,
                   available_now: bool = True):
    """Fold a streaming DataFrame into profile state; read the current
    statistics any time with :func:`read_profile`."""
    def _hook(batch_df: DataFrame, batch_id: int) -> None:
        profile_batch(spark, state_path, batch_df, batch_id, cols,
                      k=k, m=m)

    writer = (stream_df.writeStream
              .foreachBatch(_hook)
              .option("checkpointLocation", checkpoint_path))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_profile(spark: SparkSession, state_path: str, k: int = 64,
                 m: int = 64) -> DataFrame:
    """Current per-column statistics off the latest state —
    O(k·columns + m·columns), never touches history."""
    cnt = _read(spark, state_path, "cnt", _CNT_DDL)
    if cnt is None:
        raise ValueError(f"no complete profile state under {state_path}")
    minima = _read(spark, state_path, "minima", _MIN_DDL)
    summ = _read(spark, state_path, "summ", _SUMM_DDL)
    tot = _read(spark, state_path, "tot", _TOT_DDL)

    agg = minima.groupBy("c").agg(
        F.count(F.lit(1)).alias("n_minima"), F.max("__f").alias("f_k"))
    dist = agg.select(
        "c", F.when(F.col("n_minima") < k,
                    F.col("n_minima").cast("double"))
        .otherwise(F.lit(float(k - 1)) / F.col("f_k"))
        .alias("distinct_est"))

    kept = summ.groupBy("c").agg(F.sum("cnt").alias("__kept"))
    w = Window.partitionBy("c").orderBy(F.desc("cnt"), "v")
    top = (summ.withColumn("__rk", F.row_number().over(w))
           .where(F.col("__rk") == 1)
           .join(tot, "c").join(kept, "c")
           .select("c", F.col("v").alias("top_value"),
                   F.col("cnt").alias("top_cnt"),
                   F.floor((F.col("n_total") - F.col("__kept"))
                           / (m + 1)).alias("top_err")))
    return (cnt.join(dist, "c", "left").join(top, "c", "left")
            .select(F.col("c").alias("column"), "n_rows", "n_nulls",
                    "distinct_est", "top_value", "top_cnt", "top_err"))
