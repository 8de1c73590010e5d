"""Temporal KG operators: as-of join, validity-interval coalescing,
and snapshot delta.

These are the time-dimension operators a transcript KG needs that
Spark has no built-in for (the reference has none either — its algebra
is time-agnostic; `/root/reference/operator/src/lib.rs` carries `ts`
only as an opaque field).  All three are pure Catalyst compositions —
no Python in the data path — and each costs exactly ONE shuffle:

``asof_join``
    the classic "latest right row at-or-before each left row" join.
    A naive range join explodes to O(left × right) per key; the
    scalable shape used here is *union + window*: tag both sides,
    union them, sort each key's rows once by (ts, side), and carry the
    right side's payload forward with ``last(..., ignorenulls=True)``.
    One shuffle on the key, linear scan per key, no join at all —
    the same shape a 1000-executor cluster wants at 10^12 turns
    (per-key data stays within a partition; skewed keys are bounded by
    conversation length, not corpus size).

``interval_coalesce``
    gaps-and-islands: collapse consecutive rows with the same value
    into one validity interval ``[valid_from, valid_to)`` per key.
    Change detection via ``lag``, island ids via a running sum, then
    one aggregate.  The standard temporal-table coalesce (SQL:2011
    periods), expressed as two windows over one partitioning — the
    shuffle for the window is reused by the final groupBy (same keys),
    so AQE plans a single exchange.

``snapshot_delta``
    set-difference diff of two triple snapshots with a change tag —
    the lineage/debugging primitive for the checkpointed pipeline
    (which triples did snapshot k+1 add/remove vs k?).  Implemented as
    tag + union + one hash aggregate (sum of side flags), NOT two
    anti-joins: one shuffle instead of two, and the aggregate is
    map-side combinable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(left: DataFrame, right: DataFrame, on: list[str],
              left_ts: str = "ts", right_ts: str = "ts",
              right_payload: list[str] | None = None,
              suffix: str = "_r", strict: bool = False) -> DataFrame:
    """For every left row, attach the right row with the greatest
    ``right_ts`` satisfying ``right_ts <= left_ts`` (``<`` when
    ``strict``) within the same ``on`` key — a left as-of join.

    Returns all left columns plus each requested right payload column
    renamed ``<col><suffix>`` and ``<right_ts><suffix>``; left rows
    with no preceding right row keep nulls (left-outer semantics).

    Ties: right rows sharing one exact ``right_ts`` within a key are
    broken by comparing the payload struct field-by-field in declared
    order (``right_ts`` first, then the payload columns left to
    right); the largest wins via ``last()`` over the ordered window —
    deterministic as long as the payload columns are orderable types
    (struct ordering rejects maps).  At equal left/right timestamps
    the right row is visible unless ``strict``.  One shuffle on
    ``on``; no range-join explosion.
    """
    if right_payload is None:
        right_payload = [c for c in right.columns
                         if c not in on and c != right_ts]
    # the payload travels as ONE struct so a right row is carried
    # atomically (a legitimately-null payload column must not fall
    # back to an older row's value while ts comes from a newer one)
    pay_struct = F.struct(
        F.col(right_ts).alias(f"{right_ts}{suffix}"),
        *[F.col(c).alias(f"{c}{suffix}") for c in right_payload])
    null_pay = F.lit(None).cast(
        right.select(pay_struct.alias("__pay")).schema["__pay"].dataType)

    # visibility at equal timestamps: right rows sort BEFORE left rows
    # (side 0 < 1) so they are already visible — unless ``strict``, in
    # which case they sort AFTER (side 2 > 1) and are not.
    lhs = left.select(
        *on, F.col(left_ts).alias("__ts"), F.lit(1).alias("__side"),
        *[F.col(c) for c in left.columns if c not in on],
        null_pay.alias("__pay"))
    rhs = right.select(
        *on, F.col(right_ts).alias("__ts"),
        F.lit(2 if strict else 0).alias("__side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c not in on],
        pay_struct.alias("__pay"))

    both = lhs.unionByName(rhs)
    w = (Window.partitionBy(*on)
         .orderBy("__ts", "__side", "__pay")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    left_cols = [c for c in left.columns if c not in on]
    carried = F.last("__pay", ignorenulls=True).over(w).alias("__pay")
    out = (both
           .select(*on, "__side", *left_cols, carried)
           .where(F.col("__side") == 1))
    return out.select(
        *on, *left_cols,
        *[F.col(f"__pay.{c}{suffix}").alias(f"{c}{suffix}")
          for c in right_payload],
        F.col(f"__pay.{right_ts}{suffix}").alias(f"{right_ts}{suffix}"))


def interval_coalesce(df: DataFrame, keys: list[str], value: str,
                      ts: str = "ts",
                      order_extra: list[str] | None = None) -> DataFrame:
    """Collapse each key's time-ordered value sequence into maximal
    constant-value intervals: ``(keys, value, valid_from, valid_to,
    n_rows)`` where ``valid_to`` is the start of the NEXT interval
    (null for the currently-valid one) — closed-open SQL:2011 periods.

    Null values are their own island (null-safe change detection via
    ``<=>``).  Two windows + one aggregate over the same partitioning.
    """
    order = [ts] + (order_extra or [])
    w = Window.partitionBy(*keys).orderBy(*order)
    changed = F.when(
        F.col(value).eqNullSafe(F.lag(value).over(w)), 0).otherwise(1)
    isl = df.withColumn("__isl", F.sum(changed).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    agg = (isl.groupBy(*keys, "__isl")
           .agg(F.first(value).alias(value),
                F.min(ts).alias("valid_from"),
                F.count(F.lit(1)).alias("n_rows")))
    # order by (valid_from, __isl): two adjacent islands can share a
    # valid_from when equal timestamps at a change boundary are
    # disambiguated only by order_extra — __isl makes the island
    # order total so lead() is deterministic
    w2 = Window.partitionBy(*keys).orderBy("valid_from", "__isl")
    return (agg
            .withColumn("valid_to", F.lead("valid_from").over(w2))
            .drop("__isl")
            .select(*keys, value, "valid_from", "valid_to", "n_rows"))


def snapshot_delta(old: DataFrame, new: DataFrame,
                   keys: list[str] | None = None) -> DataFrame:
    """Diff two snapshots of a (deduplicated) relation: rows only in
    ``new`` come back tagged ``'added'``, rows only in ``old`` tagged
    ``'removed'``; shared rows are dropped.

    Both inputs are deduplicated on ``keys`` first (snapshots are
    sets).  Tag + union + one sum-aggregate — a single shuffle, with
    map-side partial aggregation, instead of two anti-joins (two
    shuffles + two full builds).  At 10^12 triples the aggregate keys
    are the triples themselves, so this is the minimal-movement diff.
    """
    keys = keys or old.columns
    a = old.select(*keys).distinct().withColumn("__old", F.lit(1)) \
           .withColumn("__new", F.lit(0))
    b = new.select(*keys).distinct().withColumn("__old", F.lit(0)) \
           .withColumn("__new", F.lit(1))
    return (a.unionByName(b)
            .groupBy(*keys)
            .agg(F.sum("__old").alias("o"), F.sum("__new").alias("n"))
            .where((F.col("o") == 0) | (F.col("n") == 0))
            .select(*keys,
                    F.when(F.col("n") > 0, F.lit("added"))
                     .otherwise(F.lit("removed")).alias("change")))


def funnel(events: DataFrame, steps: list[str], user: str = "user_id",
           ts: str = "ts", event: str = "event_type",
           within=None) -> DataFrame:
    """Per-user ordered funnel completion: the earliest chain
    ``steps[0] < steps[1] < …`` in event time — ``(user, ts_1…ts_k,
    completed)`` with ``ts_i`` the i-th step's timestamp (null once
    the chain breaks) and ``completed`` the number of steps reached.

    Semantics: greedy-earliest (the classic funnel definition) —
    step 1 anchors at the user's FIRST occurrence, each later step at
    the first occurrence STRICTLY after the previous step.  ``within``
    (a Spark interval Column, e.g. ``F.expr("INTERVAL 7 DAYS")``)
    invalidates steps later than ``ts_1 + within``; monotonicity makes
    the per-column mask consistent (a masked step's successors exceed
    the bound too).  Users who never reach step 1 are absent.

    Scale shape: k-1 equi-joins + min-aggregates, all keyed on
    ``user`` — one shuffle partitioning reused across the chain,
    state one row per user per stage, no windows over full history.
    """
    if len(steps) < 2:
        raise ValueError("funnel needs at least 2 steps")
    base = events.select(F.col(user).alias("u"), F.col(ts).alias("t"),
                         F.col(event).alias("e"))
    out = (base.where(F.col("e") == steps[0])
           .groupBy("u").agg(F.min("t").alias("ts_1")))
    for i, st in enumerate(steps[1:], start=2):
        nxt = (base.where(F.col("e") == st)
               .join(out.select("u", f"ts_{i - 1}"), "u")
               .where(F.col("t") > F.col(f"ts_{i - 1}"))
               .groupBy("u").agg(F.min("t").alias(f"ts_{i}")))
        out = out.join(nxt, "u", "left")
    if within is not None:
        for i in range(2, len(steps) + 1):
            out = out.withColumn(
                f"ts_{i}",
                F.when(F.col(f"ts_{i}") <= F.col("ts_1") + within,
                       F.col(f"ts_{i}")))
    completed = F.lit(1)
    for i in range(2, len(steps) + 1):
        completed = completed + F.when(
            F.col(f"ts_{i}").isNotNull(), 1).otherwise(0)
    return out.select(F.col("u").alias(user),
                      *[f"ts_{i}" for i in range(1, len(steps) + 1)],
                      completed.alias("completed"))


def transition_graph(events: DataFrame, user: str = "user_id",
                     ts: str = "ts", event: str = "event_type"
                     ) -> DataFrame:
    """User-journey Markov transitions: ``(src, dst, cnt, prob)`` —
    how often each event type is immediately followed by each other
    within a user's time-ordered stream, with the row-normalized
    transition probability.

    One window (lag-free: ``lead`` over the per-user time order,
    deterministic because ``(user, ts)`` is the sort key) + one
    aggregate; ``prob`` is a single division of exact counts, so it
    replays bit-for-bit cross-engine.  The output is an edge list —
    it feeds the graph family directly (PageRank over the journey
    graph = which states users sink into).
    """
    w = Window.partitionBy(user).orderBy(ts, event)
    pairs = (events.select(F.col(event).alias("src"),
                           F.lead(event).over(w).alias("dst"))
             .where(F.col("dst").isNotNull())
             .groupBy("src", "dst")
             .agg(F.count(F.lit(1)).alias("cnt")))
    totals = pairs.groupBy("src").agg(F.sum("cnt").alias("__tot"))
    return (pairs.join(totals, "src")
            .select("src", "dst", "cnt",
                    (F.col("cnt") / F.col("__tot")).alias("prob")))


def cohort_retention(events: DataFrame, user: str = "user_id",
                     ts: str = "ts") -> DataFrame:
    """Weekly cohort retention: ``(cohort_week, week_offset,
    n_users)`` — users grouped by the ISO week of their FIRST event,
    counted distinct in every later week they return.

    Two aggregates (first-event per user, then distinct users per
    (cohort, offset) cell) — both keyed shuffles, no windows over
    history; integer week arithmetic replays exactly.
    """
    first = events.groupBy(user).agg(F.min(ts).alias("__first"))
    acts = (events.join(first, user)
            .select(F.col(user).alias("u"),
                    F.date_trunc("week", F.col("__first"))
                    .cast("date").alias("cohort_week"),
                    F.date_trunc("week", F.col(ts))
                    .cast("date").alias("__aw")))
    return (acts.groupBy(
        "cohort_week",
        (F.datediff(F.col("__aw"), F.col("cohort_week")) / 7)
        .cast("int").alias("week_offset"))
        .agg(F.count_distinct(F.col("u")).alias("n_users")))


def allen_relation(s1, e1, s2, e2):
    """Column expression classifying two intervals into the 13 Allen
    interval-algebra relations (Allen, CACM 1983 — public literature).
    Inputs are the two intervals' endpoints (any orderable type; both
    engines of a cross-engine oracle must share the evaluation order,
    so the CASE ladder below is the normative order: equality forms
    first, then meets, then disjoint, then containment, then overlap).
    The ladder is exhaustive and inverse-consistent (rel(a,b) is
    always the Allen inverse of rel(b,a)) for PROPER intervals
    (s < e); degenerate point intervals still classify
    deterministically but fall outside the classical 13-relation
    algebra (a point at another interval's endpoint reads as
    meets/finishes depending on side)."""
    return (
        F.when((s1 == s2) & (e1 == e2), "equals")
        .when((s1 == s2) & (e1 < e2), "starts")
        .when((s1 == s2), "started_by")
        .when((e1 == e2) & (s1 > s2), "finishes")
        .when((e1 == e2), "finished_by")
        .when(e1 == s2, "meets")
        .when(e2 == s1, "met_by")
        .when(e1 < s2, "before")
        .when(e2 < s1, "after")
        .when((s1 > s2) & (e1 < e2), "during")
        .when((s1 < s2) & (e1 > e2), "contains")
        .when(s1 < s2, "overlaps")
        .otherwise("overlapped_by"))


def allen_pairs(df: DataFrame, keys: list[str], id_col: str,
                from_col: str = "valid_from",
                to_col: str = "valid_to") -> DataFrame:
    """All ordered interval pairs within each key group (``id_a <
    id_b``), classified by Allen relation: ``(*keys, id_a, id_b,
    relation)``.

    The pair join is an equi-join on ``keys`` — per-key interval sets
    are small in temporal-KG practice (one entity's versions), so the
    quadratic blow-up is bounded per key while the number of keys
    scales out; skewed hot keys fall to AQE.  No Python, no collects.
    """
    a = df.select(*keys, F.col(id_col).alias("id_a"),
                  F.col(from_col).alias("__s1"),
                  F.col(to_col).alias("__e1"))
    b = df.select(*keys, F.col(id_col).alias("id_b"),
                  F.col(from_col).alias("__s2"),
                  F.col(to_col).alias("__e2"))
    return (a.join(b, keys)
            .where(F.col("id_a") < F.col("id_b"))
            .select(*keys, "id_a", "id_b",
                    allen_relation(F.col("__s1"), F.col("__e1"),
                                   F.col("__s2"), F.col("__e2"))
                    .alias("relation")))
