"""Entity summarization over triple tables.

Top-k facts per entity ranked by predicate informativeness — the
RELIN/FACES-family idea (Cheng et al., ISWC'11; public literature)
reduced to its scale-robust core: a fact is informative in proportion
to the global rarity of its predicate (an IDF over the predicate
distribution), so a summary keeps ``ex:penName`` over ``rdf:type``.
The summary stage of entity cards, KG search snippets, and
context-window packing for LLM grounding (pick the k facts worth the
tokens).

Scale design: the predicate histogram is predicate-cardinality-sized
(tiny — it rides the join as a broadcast), and the top-k is one
window over the store's natural subject partitioning; no Python, no
collects, one shuffle.  Deterministic: ties break on the full
(count, pred, obj) tuple, so the op replays exactly on any engine.

The reference stops at serialization
(/root/reference/operator/src/lib.rs); this is beyond-reference
surface over the constructed KG.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def entity_summary(triples: DataFrame, k: int = 3) -> DataFrame:
    """(subj, pred, obj, rank) — each subject's ``k`` most informative
    facts: rank 1 = the fact whose predicate is globally rarest,
    ties by (pred, obj) byte order.  Input must be a triple set."""
    if k < 1:
        raise ValueError("k must be >= 1")
    pred_n = triples.groupBy("pred").agg(
        F.count(F.lit(1)).alias("__pn"))
    w = Window.partitionBy("subj").orderBy(
        F.col("__pn").asc(), F.col("pred").asc(), F.col("obj").asc())
    return (triples.join(F.broadcast(pred_n), "pred")
            .withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("subj", "pred", "obj",
                    F.col("rank").cast("int").alias("rank")))
