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


def distinct_surfaces(mentions: DataFrame) -> DataFrame:
    """The node set: one aggregation over the mention stream, then
    localCheckpoint so every downstream consumer (edges, hubs, the
    canonical join) reuses the small result instead of re-deduplicating
    the full stream."""
    return (mentions.select("surface", "norm_key").distinct()
            .localCheckpoint())


def build_edges(mentions: DataFrame, score_threshold: float = 0.5,
                surfaces: DataFrame | None = None) -> DataFrame:
    """Distinct mention surfaces → undirected similarity edges.

    Works on DISTINCT surfaces only (the node set), never on mention
    occurrences — at 10^12 turns the distinct-surface set is orders of
    magnitude smaller than the mention stream.
    """
    if surfaces is None:
        surfaces = distinct_surfaces(mentions)
    surfaces = (surfaces
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


#: below this edge count the component computation runs driver-side
#: (union-find) instead of iterative joins — two-level strategy: the
#: distinct-surface graph after blocking is usually tiny relative to the
#: mention stream, and a driver union-find on ≤ a few million edges is
#: milliseconds vs seconds of per-round job latency.  Above it, the
#: GraphFrames-style iterative hash-join propagation takes over.
DRIVER_CC_MAX_EDGES = 2_000_000


def _driver_union_find(edge_rows) -> dict[str, str]:
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    for src, dst in edge_rows:
        parent.setdefault(src, src)
        parent.setdefault(dst, dst)
        rs, rd = find(src), find(dst)
        if rs != rd:
            # union by label order so the component id is the min node
            lo, hi = (rs, rd) if rs < rd else (rd, rs)
            parent[hi] = lo
    return {n: find(n) for n in parent}


def connected_components(edges: DataFrame, max_iter: int = 20,
                         driver_max_edges: int = DRIVER_CC_MAX_EDGES
                         ) -> DataFrame:
    """(src, dst) string edges → (node, component) with component = the
    lexicographically minimal node of each component.

    Size-gated two-level strategy (see DRIVER_CC_MAX_EDGES); the
    distributed path repartitions its iteration state size-aware
    (~500k edges per partition, min 1): small graphs run single-task
    rounds, huge graphs scale out with hash joins on the node key.

    Each distributed round does BOTH a 1-hop neighbor-min propagation
    AND a pointer jump (``label ← min(label, label(label))``, the
    Shiloach–Vishkin / hash-to-min device), so convergence is
    O(log diameter) rounds — plain min-label propagation alone is
    O(diameter), which silently mislabels any component deeper than
    ``max_iter`` (a 101-node chain previously split into 81
    components on this path).  The pointer-jump join keys on the
    label, which skews toward component minima as big components
    coalesce — AQE skew-join handling (on in every session builder
    here) splits those hot partitions.  If ``max_iter`` rounds still
    don't converge, a ``RuntimeWarning`` is raised rather than
    returning wrong labels silently.
    """
    spark = edges.sparkSession
    # materialize BEFORE the size probe: the probe count() and the
    # first consumer would otherwise each recompute the full upstream
    # edge pipeline (mention detection + canonicalization when fed
    # from the transcript path)
    bidirected = (edges.select("src", "dst")
                  .unionByName(edges.select(F.col("dst").alias("src"),
                                            F.col("src").alias("dst")))
                  .distinct()
                  .localCheckpoint())
    n_edges = bidirected.count()
    if n_edges <= driver_max_edges:
        # Arrow both ways: toPandas() fetches columnar batches (a
        # pickled Row list measured ~3-5s slower at the 100k-edge
        # scale of one sf0.1 closure query), and handing
        # createDataFrame a pandas frame keeps the return trip on the
        # Arrow path too; bounded by the gate either way.
        # ensure_arrow: the conf defaults to FALSE, which silently
        # reverts both transfers to row pickling (measured 7x slower)
        import pandas as pd

        from ..ops.cache import ensure_arrow
        ensure_arrow(spark)
        pdf = bidirected.toPandas()
        mapping = _driver_union_find(zip(pdf["src"], pdf["dst"]))
        if not mapping:
            return spark.createDataFrame([], "node string, component string")
        out = pd.DataFrame(list(mapping.items()),
                           columns=["node", "component"])
        return spark.createDataFrame(out)

    parts = max(1, min(int(spark.conf.get(
        "spark.sql.shuffle.partitions")), n_edges // 500_000 + 1))
    bidirected = bidirected.repartition(parts, "src").localCheckpoint()
    # (reads the checkpoint above, not the raw upstream)
    nodes = (bidirected.select(F.col("src").alias("node")).distinct())
    labels = nodes.withColumn("label", F.col("node")) \
        .repartition(parts, "node")

    converged = False
    for _ in range(max_iter):
        neighbor_min = (bidirected
                        .join(labels.withColumnRenamed("node", "dst"), "dst")
                        .groupBy("src")
                        .agg(F.min("label").alias("nlabel"))
                        .withColumnRenamed("src", "node"))
        stepped = (labels.join(neighbor_min, "node", "left")
                   .select("node",
                           F.least(F.col("label"),
                                   F.coalesce(F.col("nlabel"),
                                              F.col("label")))
                           .alias("label")))
        # pointer jump: label ← label(label) — halves every pointer
        # chain, turning O(diameter) propagation into O(log diameter)
        ptr = stepped.select(F.col("node").alias("__pnode"),
                             F.col("label").alias("__plabel"))
        new_labels = (stepped
                      .join(ptr, stepped["label"] == ptr["__pnode"], "left")
                      .select(stepped["node"],
                              F.least(stepped["label"],
                                      F.coalesce(F.col("__plabel"),
                                                 stepped["label"]))
                              .alias("label"))
                      .repartition(parts, "node")
                      .localCheckpoint())
        changed = (new_labels.alias("n")
                   .join(labels.alias("o"), "node")
                   .where(F.col("n.label") != F.col("o.label"))
                   .limit(1).count())
        labels = new_labels
        if changed == 0:
            converged = True
            break
    if not converged:
        import warnings
        warnings.warn(
            f"connected_components did not converge in {max_iter} "
            f"rounds — labels may merge further; raise max_iter "
            f"(pointer-jumped rounds cover diameter ~2^{max_iter})",
            RuntimeWarning, stacklevel=2)
    return labels.withColumnRenamed("label", "component")


#: below this many distinct surfaces the whole ER graph phase (scoring,
#: two-stage blocking, union-find) runs driver-side on the collected
#: node set — ONE distributed job (the distinct aggregation, which is
#: the only part proportional to the mention stream) instead of ~8
#: small shuffle rounds whose fixed job latency dominates at any core
#: count and caps scaling efficiency.  2M surfaces ≈ 100 MB on the
#: driver; above the gate the distributed blocking + iterative-join CC
#: path takes over unchanged.
DRIVER_ER_MAX_SURFACES = 2_000_000


def _driver_link_score(surface: str, key: str) -> float:
    """Python twin of :func:`kgloom.transcripts.mentions.link_score`
    (kept in lockstep; both are covered by the agreement test)."""
    if surface is None or key is None:
        return 0.0
    import re as _re
    if _re.sub(r"[^0-9]", "", surface.lower()) != key:
        return 0.0
    if surface.startswith("Entity_"):
        return 1.0
    if surface.startswith("entity "):
        return 0.95
    if surface.startswith("E-"):
        return 0.9
    return 0.85


def _driver_canonical(rows: list[tuple[str, str]],
                      score_threshold: float) -> list[tuple[str, str]]:
    """Driver-side twin of build_edges + connected_components over the
    collected (surface, norm_key) node set — same blocking stages, same
    min-label component ids."""
    from collections import defaultdict

    scored = [(s, k) for s, k in rows
              if _driver_link_score(s, k) >= score_threshold]
    edges: list[tuple[str, str]] = []
    # stage 1: exact normalized-key block → star edges to the min surface
    blocks: dict[str, list[str]] = defaultdict(list)
    for s, k in scored:
        blocks[k].append(s)
    for ss in blocks.values():
        hub = min(ss)
        edges.extend((s, hub) for s in ss if s != hub)
    # stage 2: coarse (digit-multiset) candidate block + exact-key verify
    coarse: dict[str, list[tuple[str, str]]] = defaultdict(list)
    for s, k in scored:
        coarse["".join(sorted(k))].append((s, k))
    for items in coarse.values():
        hub, hub_key = min(items)
        edges.extend((s, hub) for s, k in items
                     if s != hub and k == hub_key)
    mapping = _driver_union_find(edges)
    return [(s, mapping.get(s, s)) for s, _ in rows]


def canonical_map(mentions: DataFrame, score_threshold: float = 0.5,
                  driver_max_surfaces: int = DRIVER_ER_MAX_SURFACES
                  ) -> DataFrame:
    """surface → canonical entity key for every distinct surface
    (including singletons that have no edges).  The mention stream is
    aggregated exactly once (distinct_surfaces); all graph work happens
    on the checkpointed node set — driver-side below the size gate,
    distributed blocking + iterative-join CC above it."""
    # checkpoint BEFORE the size probe so the distinct aggregation over
    # the mention stream runs exactly once: the gated limit().collect()
    # probe and (above the gate) the distributed blocking/CC path both
    # read this one materialization instead of recomputing the distinct
    surfaces = mentions.select("surface", "norm_key").distinct() \
        .localCheckpoint()
    if driver_max_surfaces > 0:
        # Arrow transfer both ways (same reasoning as the driver CC
        # path): at the 2M-surface gate a pickled Row list costs tens
        # of seconds that columnar batches don't
        import pandas as pd

        from ..ops.cache import ensure_arrow
        ensure_arrow(mentions.sparkSession)
        head = surfaces.limit(driver_max_surfaces + 1).toPandas()
        if len(head) <= driver_max_surfaces:
            spark = mentions.sparkSession
            pairs = _driver_canonical(
                list(zip(head["surface"], head["norm_key"])),
                score_threshold)
            out = pd.DataFrame(pairs, columns=["surface", "canonical"])
            return spark.createDataFrame(out) if pairs else \
                spark.createDataFrame([],
                                      "surface string, canonical string")
    edges = build_edges(mentions, score_threshold, surfaces=surfaces)
    components = connected_components(edges)
    return (surfaces.select("surface")
            .join(components.withColumnRenamed("node", "surface"),
                  "surface", "left")
            .select("surface",
                    F.coalesce(F.col("component"), F.col("surface"))
                    .alias("canonical")))
