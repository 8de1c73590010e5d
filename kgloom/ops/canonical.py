"""Weisfeiler–Leman structural signatures over triple tables.

1-WL color refinement (Weisfeiler & Leman 1968; Shervashidze et al.,
JMLR 2011 — public literature) adapted to directed, edge-labelled RDF:
every node gets a deterministic hash of its k-hop neighbourhood
STRUCTURE, so structurally identical KG fragments collide.  This is
the signature stage of graph canonicalization / KG-fragment dedup
(cf. Hogan, "Canonical forms for isomorphic and equivalent RDF
graphs", 2017): blank nodes and IRIs start from one uniform color, so
two entities with the same shape of attributes and the same literal
leaves hash identically wherever they appear.

Uses: conversation-template fingerprinting (dedup whole subgraphs,
not rows), blank-node canonical labelling, cross-snapshot structural
diff.  The reference stops at serialization
(/root/reference/operator/src/lib.rs); this is beyond-reference
surface over the constructed KG.

Semantics
---------
color_0(n) = 'L:' + term          if n is a literal
           = 'R'                  otherwise (IRI / blank node)
color_{i+1}(n) = md5(color_i(n) || '|' ||
                     sorted-multiset of  'O|' + p + '|' + color_i(o)
                                  over outgoing (n, p, o)
                            and of 'I|' + p + '|' + color_i(s)
                                  over incoming (s, p, n),
                     comma-joined)

A FIXED iteration count (not a fixpoint) keeps the op replayable on
any engine as k unrolled join+aggregate rounds — the DuckDB oracle
chains the identical CTEs.  k-WL sound: equal signatures ⇒ equal
k-hop unfoldings; distinct signatures ⇒ structurally distinct (the
usual 1-WL completeness caveat applies).

Scale design
------------
Per iteration: two shuffled joins (colors onto each triple end) and
one groupBy(node) — all keyed on the node column, the triple store's
natural partitioning; colors persist per round so both joins read one
materialization, and lineage is truncated per round.  The per-node
message list is degree-sized: at web scale, pass ``hub_cap`` to
replace the message multiset of nodes with degree > cap by their
degree alone ('HUB:' + count) — hubs (rdf:type objects, popular
tools) carry no discriminating neighbourhood structure anyway, and
the giant sorted-string row disappears.  No Python UDFs, no collects.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .cache import tracked_persist


def wl_colors(triples: DataFrame, iterations: int = 2,
              hub_cap: Optional[int] = None) -> DataFrame:
    """(node, color) — the WL color of every node (every distinct
    subj/obj term) after ``iterations`` refinement rounds.  Input must
    be a triple SET (duplicate rows would double messages)."""
    if iterations < 0:
        raise ValueError("iterations must be >= 0")
    t = triples.select("subj", "pred", "obj")
    nodes = (t.select(F.col("subj").alias("node"))
             .unionByName(t.select(F.col("obj").alias("node")))
             .distinct())
    is_res = (F.col("node").startswith("<")
              | F.col("node").startswith("_:"))
    colors = nodes.select(
        "node",
        F.when(is_res, F.lit("R"))
        .otherwise(F.concat(F.lit("L:"), F.col("node"))).alias("color"))
    for _ in range(iterations):
        colors = tracked_persist(colors)
        msgs = (
            t.join(colors.withColumnRenamed("node", "obj"), "obj")
            .select(F.col("subj").alias("node"),
                    F.concat(F.lit("O|"), "pred", F.lit("|"),
                             "color").alias("msg"))
            .unionByName(
                t.join(colors.withColumnRenamed("node", "subj"), "subj")
                .select(F.col("obj").alias("node"),
                        F.concat(F.lit("I|"), "pred", F.lit("|"),
                                 "color").alias("msg"))))
        agg = msgs.groupBy("node").agg(
            F.concat_ws(",", F.sort_array(F.collect_list("msg")))
            .alias("__m"),
            F.count(F.lit(1)).alias("__deg"))
        if hub_cap is not None:
            agg = agg.withColumn(
                "__m",
                F.when(F.col("__deg") > hub_cap,
                       F.concat(F.lit("HUB:"),
                                F.col("__deg").cast("string")))
                .otherwise(F.col("__m")))
        colors = (colors.join(agg, "node", "left")
                  .select("node",
                          F.md5(F.concat(
                              "color", F.lit("|"),
                              F.coalesce("__m", F.lit(""))))
                          .alias("color")))
        # per-round checkpoint: each round's plan reads the persisted
        # previous colors, not the whole unrolled join tree
        colors = colors.localCheckpoint(eager=False)
    return colors


def wl_signature_groups(triples: DataFrame, iterations: int = 2,
                        hub_cap: Optional[int] = None) -> DataFrame:
    """(signature, n_nodes, example) — nodes grouped by WL color:
    each row is one structural equivalence class, ``example`` its
    lexicographically smallest member.  The compact fingerprint
    report for structural dedup."""
    return (wl_colors(triples, iterations, hub_cap)
            .groupBy(F.col("color").alias("signature"))
            .agg(F.count(F.lit(1)).alias("n_nodes"),
                 F.min("node").alias("example")))
