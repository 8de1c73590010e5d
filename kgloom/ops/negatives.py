"""Negative sampling for KG-embedding training (TransE/DistMult-style):
for every positive triple, ``n_neg`` corrupted copies with the object
replaced by a pseudo-random entity — the training-pair construction
step between a materialized KG and a link-prediction run.

Determinism is the design constraint: the replacement entity is chosen
by an md5 draw over ``(subj, pred, obj, i)`` (the same engine-portable
hash the curation samplers use, `kgloom/ops/curate.py`), so reruns,
partial re-executions, and the DuckDB oracle all pick the SAME
negatives — no ``rand()``, no seed plumbing, no per-partition RNG
state.

100-TB shape: the entity vocabulary is indexed once (sort + row_number
— the only global sort, over the ENTITY set, not the triples), the
draw is a narrow per-row expression, and the replacement is one
shuffle join on the drawn index.  Corruptions that accidentally
reproduce a true triple are flagged, not silently kept or dropped —
filtered negative sampling is ``where(~is_positive)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


#: fixed bucket fan-out for entity_index — part of the index's public
#: contract (changing it changes every assignment), NOT a tuning knob
INDEX_BUCKETS = 256


def entity_index(triples: DataFrame) -> DataFrame:
    """(entity, idx): every IRI/blank node appearing as subject or
    non-literal object, densely indexed 0..n-1 in ``(md5-bucket,
    entity)`` order — the deterministic vocabulary the sampler and
    the DuckDB oracle share (both engines compute the same md5, so
    the oracle replays the identical assignment with one
    ``ROW_NUMBER() OVER (ORDER BY bucket, entity)``).

    Pure-Catalyst two-phase rank, deterministic BY CONSTRUCTION on
    every re-evaluation: a ``zipWithIndex`` RDD here was observed to
    materialize DIFFERENT (entity, idx) pairings in different tasks
    of one query on Spark 4.1 (its creation-time partition offsets
    race with plan-branch re-evaluation, and localCheckpoint did not
    pin it), making slot→entity non-functional within one result.
    Here rank = per-bucket ``row_number`` (distributed across
    ``INDEX_BUCKETS`` shuffle groups — no single-partition global
    sort) + broadcast cumulative bucket offsets (``INDEX_BUCKETS``
    rows).  md5 bucketing is also uniform, so no lexical-prefix skew
    at billion-entity vocabularies."""
    from pyspark.sql import Window

    ents = (triples.select(F.col("subj").alias("entity"))
            .unionByName(triples.where(~F.col("obj").startswith('"'))
                         .select(F.col("obj").alias("entity")))
            .distinct()
            .withColumn("__b", F.conv(
                F.substring(F.md5("entity"), 1, 4), 16, 10)
                .cast("long") % INDEX_BUCKETS))
    offs = (ents.groupBy("__b").count()
            .select("__b", (F.sum("count").over(
                Window.orderBy("__b")
                .rowsBetween(Window.unboundedPreceding, -1)))
                .alias("__off"))
            .na.fill({"__off": 0}))
    ranked = ents.withColumn("__r", F.row_number().over(
        Window.partitionBy("__b").orderBy("entity")))
    return (ranked.join(F.broadcast(offs), "__b")
            .select("entity", (F.col("__off") + F.col("__r") - 1)
                    .cast("long").alias("idx")))


def negative_samples(triples: DataFrame, n_neg: int = 2,
                     corrupt: str = "obj") -> DataFrame:
    """(subj, pred, obj, neg_idx, neg_obj|neg_subj, is_positive):
    ``n_neg`` corrupted negatives per positive triple, replacing the
    ``corrupt`` side ("obj" — the default — or "subj"; TransE-style
    training corrupts both, so call twice and union).  The draw for
    copy ``i`` is ``int(md5(subj‖pred‖obj‖i)[:8hex]) mod |entities|``
    (side-corruption uses the same draw — the two sides are separate
    calls with separate collision joins); ``is_positive`` marks
    corruptions that collide with a true triple (filter them for the
    classic "filtered" protocol)."""
    if n_neg < 1:
        raise ValueError("n_neg must be >= 1")
    if corrupt not in ("obj", "subj"):
        raise ValueError("corrupt must be 'obj' or 'subj'")
    if corrupt == "subj":
        return _negative_samples_subj(triples, n_neg)
    ents = entity_index(triples)
    n_df = ents.agg(F.count(F.lit(1)).alias("__n_ent"))
    expanded = (triples.select("subj", "pred", "obj")
                .distinct()
                .select("*", F.explode(F.sequence(
                    F.lit(0), F.lit(n_neg - 1))).alias("neg_idx")))
    # The draw is STAGED through explicit named columns on purpose:
    # the single fused conv(substring(md5(concat_ws(..)))) expression
    # returned corrupted values on Spark 4.1.2 when the optimizer
    # shared it between this projection and the isnotnull() join
    # condition it pushes into the cross join (verified in one plan,
    # same row: fused draw wrong, staged draw correct; conv's
    # NumberConverter output buffer is the suspect).  Materializing
    # md5-hex8 as its own column isolates each evaluation.
    drawn = (expanded.crossJoin(F.broadcast(n_df))
             .withColumn("__hex8", F.substring(F.md5(F.concat_ws(
                 "", "subj", "pred", "obj",
                 F.col("neg_idx").cast("string"))), 1, 8))
             .withColumn("__draw",
                         F.conv("__hex8", 16, 10).cast("long"))
             .withColumn("__slot", F.col("__draw") % F.col("__n_ent"))
             .drop("__n_ent"))
    joined = drawn.join(ents, drawn["__slot"] == ents["idx"])
    # collision flag via (subj, pred) → set-of-true-objects membership:
    # one equi-join on two columns instead of a three-key self-join,
    # and the per-key object sets are bounded by out-degree
    truth = (triples.groupBy(F.col("subj").alias("__ts"),
                             F.col("pred").alias("__tp"))
             .agg(F.collect_set("obj").alias("__objs")))
    return (joined.join(
        truth, (joined["subj"] == truth["__ts"])
        & (joined["pred"] == truth["__tp"]), "left")
        .select("subj", "pred", "obj", "neg_idx",
                F.col("entity").alias("neg_obj"),
                F.coalesce(F.array_contains("__objs", F.col("entity")),
                           F.lit(False)).alias("is_positive")))


def _negative_samples_subj(triples: DataFrame, n_neg: int) -> DataFrame:
    """Subject-side corruption: same vocabulary, same draw, collision
    flag via an (obj, pred) → subject-set membership join."""
    ents = entity_index(triples)
    n_df = ents.agg(F.count(F.lit(1)).alias("__n_ent"))
    expanded = (triples.select("subj", "pred", "obj")
                .distinct()
                .select("*", F.explode(F.sequence(
                    F.lit(0), F.lit(n_neg - 1))).alias("neg_idx")))
    drawn = (expanded.crossJoin(F.broadcast(n_df))
             .withColumn("__hex8", F.substring(F.md5(F.concat_ws(
                 "", "subj", "pred", "obj",
                 F.col("neg_idx").cast("string"))), 1, 8))
             .withColumn("__draw",
                         F.conv("__hex8", 16, 10).cast("long"))
             .withColumn("__slot", F.col("__draw") % F.col("__n_ent"))
             .drop("__n_ent"))
    joined = drawn.join(ents, drawn["__slot"] == ents["idx"])
    truth = (triples.groupBy(F.col("obj").alias("__to"),
                             F.col("pred").alias("__tp"))
             .agg(F.collect_set("subj").alias("__subjs")))
    return (joined.join(
        truth, (joined["obj"] == truth["__to"])
        & (joined["pred"] == truth["__tp"]), "left")
        .select("subj", "pred", "obj", "neg_idx",
                F.col("entity").alias("neg_subj"),
                F.coalesce(F.array_contains("__subjs", F.col("entity")),
                           F.lit(False)).alias("is_positive")))
