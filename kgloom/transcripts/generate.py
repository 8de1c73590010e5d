"""Deterministic synthetic transcript generator.

Schema — exactly BASELINE.json ``input_hint``:
``conv_id:string, turn_idx:int32, role:string, text:string, tool:string,
ts:timestamp``.

Design (FIXTURES.md §B):

- fully distributed: every column is a pure function of the global turn
  number (``spark.range`` + hash functions), so the SAME rows are
  produced at any parallelism level and any scale — no driver-side
  loops, no RNG state;
- Zipfian-ish conv_id skew: conversation index = ``floor(C * u^3)`` for
  uniform u ⇒ a few hot conversations (conv 0 collects ~10% of turns at
  C=1000) to exercise salting/skew handling;
- ``text`` embeds entity mentions in one of four surface-form variants
  plus the tool name, giving mention-detection and entity-resolution
  ground truth (all variants of entity *k* normalize back to *k*);
- ``ts`` strictly increasing within a conversation (monotone in
  turn_idx).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

ROLES = ["user", "assistant", "tool"]
TOOLS = ["search", "browser", "python", "calculator", "sql", "editor"]
#: surface-form variants for entity k (entity-resolution ground truth:
#: normalizing digits recovers k)
VARIANT_FMTS = ["Entity_%s", "entity %s", "E-%s", "ENT:%s"]

FILLER = ["considering", "the", "relevant", "context", "we", "should",
          "review", "results", "carefully", "before", "proceeding",
          "further", "with", "analysis", "planning", "steps"]


def _h(seed: str, *cols) -> F.Column:
    """Deterministic non-negative 64-bit hash of (seed, cols...)."""
    return F.abs(F.xxhash64(F.lit(seed), *cols))


def generate_transcripts(spark: SparkSession, n_turns: int,
                         n_convs: int = 1000, n_entities: int = 500,
                         partitions: int = 32) -> DataFrame:
    df = spark.range(0, n_turns, 1, partitions).withColumnRenamed("id", "t")

    # Zipf-ish conversation assignment: u^3 concentrates mass at low ids
    u = (_h("conv", F.col("t")) % 1_000_000) / 1_000_000.0
    conv_idx = F.floor(F.lit(n_convs) * F.pow(u, F.lit(3.0))).cast("long")
    df = df.withColumn("conv_idx", conv_idx)
    # stable turn order within a conversation
    w = Window.partitionBy("conv_idx").orderBy("t")
    df = df.withColumn("turn_idx",
                       (F.row_number().over(w) - 1).cast("int"))

    role = F.element_at(F.array(*[F.lit(r) for r in ROLES]),
                        (F.col("turn_idx") % 3 + 1).cast("int"))
    tool = F.when(
        role == "tool",
        F.element_at(F.array(*[F.lit(t) for t in TOOLS]),
                     (_h("tool", F.col("t")) % len(TOOLS) + 1).cast("int")))

    ent_id = (_h("ent", F.col("conv_idx"), F.col("turn_idx")) % n_entities)
    variant = (_h("var", F.col("t")) % len(VARIANT_FMTS))
    mention = None
    for i, fmt in enumerate(VARIANT_FMTS):
        pre, post = fmt.split("%s")
        formed = F.concat(F.lit(pre), ent_id.cast("string"), F.lit(post))
        mention = formed if mention is None else \
            F.when(variant == i, formed).otherwise(mention)

    ent2_id = (_h("ent2", F.col("conv_idx"), F.col("turn_idx")) % n_entities)
    second = F.when(_h("has2", F.col("t")) % 3 == 0,
                    F.concat(F.lit(" and also Entity_"),
                             ent2_id.cast("string"))).otherwise(F.lit(""))

    filler = F.element_at(F.array(*[F.lit(wd) for wd in FILLER]),
                          (_h("fill", F.col("t")) % len(FILLER) + 1).cast("int"))
    text = F.concat(
        F.lit("turn "), F.col("turn_idx").cast("string"),
        F.lit(": "), role, F.lit(" discusses "), mention, second,
        F.lit(" via "), F.coalesce(tool, F.lit("chat")),
        F.lit(" while "), filler)

    ts = F.to_timestamp(
        F.from_unixtime(F.lit(1700000000)
                        + F.col("conv_idx") * 100000
                        + F.col("turn_idx") * 7))

    return df.select(
        F.concat(F.lit("conv-"), F.col("conv_idx").cast("string"))
         .alias("conv_id"),
        F.col("turn_idx"),
        role.alias("role"),
        text.alias("text"),
        tool.alias("tool"),
        ts.alias("ts"),
    )


def write_transcripts(spark: SparkSession, path: str, n_turns: int,
                      **kw) -> None:
    generate_transcripts(spark, n_turns, **kw).write.mode("overwrite") \
        .parquet(path)
