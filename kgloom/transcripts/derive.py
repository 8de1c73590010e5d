"""Derive a transcripts table (BASELINE.json input_hint schema) from the
driver's deterministic ``events`` table — used by the correctness gate
so the north-rule pipeline has a DuckDB-oracle-checkable input without
external data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def transcripts_from_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    role = (F.when(F.col("event_type").isin("click", "view"), "user")
            .when(F.col("event_type").isin("purchase", "signup"), "assistant")
            .otherwise("tool"))
    tool = F.when(role == "tool", F.col("event_type"))
    df = (ev
          .withColumn("turn_idx", (F.row_number().over(w) - 1).cast("int"))
          .withColumn("role", role)
          .withColumn("tool", tool))
    text = F.concat(
        F.lit("turn "), F.col("turn_idx").cast("string"),
        F.lit(": "), F.col("role"), F.lit(" discusses Entity_"),
        (F.col("event_id") % 100).cast("string"),
        F.lit(" via "), F.coalesce(F.col("tool"), F.lit("chat")))
    return df.select(
        F.concat(F.lit("conv-"), F.col("user_id").cast("string"))
         .alias("conv_id"),
        "turn_idx", "role", text.alias("text"), "tool", "ts")


#: the same derivation as ANSI SQL for the DuckDB oracle
TRANSCRIPTS_SQL = """
SELECT 'conv-' || CAST(user_id AS VARCHAR) AS conv_id,
       CAST(turn_idx AS INTEGER) AS turn_idx,
       role,
       'turn ' || CAST(turn_idx AS VARCHAR) || ': ' || role
         || ' discusses Entity_' || CAST(event_id % 100 AS VARCHAR)
         || ' via ' || COALESCE(tool, 'chat') AS text,
       tool, ts
FROM (
  SELECT *,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1
           AS turn_idx,
         CASE WHEN event_type IN ('click','view') THEN 'user'
              WHEN event_type IN ('purchase','signup') THEN 'assistant'
              ELSE 'tool' END AS role,
         CASE WHEN event_type NOT IN ('click','view','purchase','signup')
              THEN event_type END AS tool
  FROM events
)
"""
