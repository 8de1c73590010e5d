"""Training-data shaping over transcript tables (the BASELINE.json
input_hint schema ``conv_id, turn_idx, role, text, tool, ts``) — the
step between a cleaned conversation corpus and an SFT/pretraining run:
time-gap sessionization and prompt/response example extraction.

100-TB design: both operators are ONE shuffle on ``conv_id`` followed
by per-conversation window functions — the same partitioning the
construction pipeline already uses, so co-partitioned inputs reuse the
exchange.  Per-conversation work is linear in the conversation length
(windows stream the sorted partition); the only skew surface is a
single pathologically long conversation, which the ``max_context_turns``
cap also bounds on the output side (an uncapped full-context prompt
is O(n²) text per conversation — cap it at scale).  No Python, no
collect: everything is Catalyst window + string expressions.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _unix_micros(df: DataFrame, ts: str):
    """Unix microseconds of ``ts`` as an exact integer Column.  A
    TIMESTAMP_NTZ column (what parquet scans yield) is measured from
    the naive epoch with ``timestamp_diff`` — NO session-timezone
    interpretation, matching DuckDB's ``epoch_us`` on naive
    timestamps; a zoned TIMESTAMP goes through ``unix_micros``."""
    if dict(df.dtypes).get(ts) == "timestamp_ntz":
        epoch = F.lit("1970-01-01 00:00:00").cast("timestamp_ntz")
        return F.timestamp_diff("MICROSECOND", epoch, F.col(ts))
    return F.unix_micros(F.col(ts))


def sessionize(turns: DataFrame, gap_seconds: int = 21600,
               conv: str = "conv_id", ts: str = "ts",
               order_cols: Sequence[str] = ("ts", "turn_idx")
               ) -> DataFrame:
    """Split each conversation into sessions at inactivity gaps larger
    than ``gap_seconds``: adds ``session_idx`` (0-based within the
    conversation) and ``session_id`` (``<conv_id>#<session_idx>``).

    The standard LAG-boundary / running-sum formulation: a turn opens a
    new session when it is the conversation's first or follows its
    predecessor by more than the gap; the session index is the running
    count of boundaries.  One window partition per conversation, rows
    emitted in stream order — no materialized per-session state.
    """
    w = Window.partitionBy(conv).orderBy(*[F.col(c) for c in order_cols])
    # exact integer microseconds on both sides of the comparison —
    # float epoch seconds would round differently engine to engine
    us = _unix_micros(turns, ts)
    boundary = (F.lag(us).over(w).isNull()
                | ((us - F.lag(us).over(w))
                   > gap_seconds * 1_000_000)).cast("int")
    sess = (F.sum(boundary)
            .over(w.rowsBetween(Window.unboundedPreceding, 0))
            - F.lit(1)).cast("int")
    out = turns.withColumn("session_idx", sess)
    return out.withColumn(
        "session_id",
        F.concat(F.col(conv), F.lit("#"),
                 F.col("session_idx").cast("string")))


def session_summary(turns: DataFrame, gap_seconds: int = 21600,
                    conv: str = "conv_id", ts: str = "ts") -> DataFrame:
    """Per-session rollup of :func:`sessionize`: ``(conv_id,
    session_id, n_turns, n_tool_turns, t_start_us, t_end_us)`` with
    the bounds as unix MICROseconds (exact integers, no float epoch) —
    the partition-level metric row a construction pipeline logs per
    micro-batch."""
    s = sessionize(turns, gap_seconds, conv=conv, ts=ts)
    return (s.groupBy(F.col(conv), F.col("session_id"))
            .agg(F.count(F.lit(1)).alias("n_turns"),
                 F.count("tool").alias("n_tool_turns"),
                 F.min(_unix_micros(s, ts)).alias("t_start_us"),
                 F.max(_unix_micros(s, ts)).alias("t_end_us")))


def sft_examples(turns: DataFrame,
                 max_context_turns: Optional[int] = None,
                 response_role: str = "assistant",
                 turn_format: str = "{role}: {text}",
                 sep: str = "\n") -> DataFrame:
    """Extract (prompt, response) training examples: one example per
    ``response_role`` turn, whose prompt is the ``sep``-joined render
    of the preceding turns in the conversation (all of them, or the
    last ``max_context_turns`` when capped).  Turns with no preceding
    context (a conversation-opening assistant turn) are dropped —
    there is nothing to condition on.

    Returns ``(conv_id, turn_idx, prompt, response)``.  The context is
    a ``collect_list`` over a bounded window frame (frames respect the
    window's ORDER BY, so the render is deterministic) joined JVM-side
    — no Python row path, no driver traffic.  ``turn_format`` may use
    ``{role}`` and ``{text}``.
    """
    if turn_format.index("{role}") > turn_format.index("{text}"):
        raise ValueError("turn_format must place {role} before {text}")
    head, rest = turn_format.split("{role}", 1)
    mid, tail = rest.split("{text}", 1)
    rendered = F.concat(F.lit(head), F.col("role"), F.lit(mid),
                        F.col("text"), F.lit(tail))
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    lo = (Window.unboundedPreceding if max_context_turns is None
          else -int(max_context_turns))
    ctx = F.array_join(
        F.collect_list(rendered).over(w.rowsBetween(lo, -1)), sep)
    return (turns
            .withColumn("prompt", ctx)
            .where((F.col("role") == response_role)
                   & (F.col("prompt") != ""))
            .select("conv_id", "turn_idx", "prompt",
                    F.col("text").alias("response")))


def chat_render(turns: DataFrame,
                template: str = "<|{role}|>{text}<|end|>",
                mask_role: str = "assistant",
                sep: str = "\n") -> DataFrame:
    """Render each conversation into ONE training string under a chat
    template, with the loss-mask character spans attached:
    ``(conv_id, rendered, mask_starts, mask_ends)`` where
    ``[mask_starts[i], mask_ends[i])`` are the offsets of the i-th
    ``mask_role`` turn's TEXT inside ``rendered`` — the
    template-and-mask step an SFT tokenizer consumes (only assistant
    content contributes loss; template scaffolding and other roles
    are masked out).

    Everything is integer offset arithmetic over the deterministic
    (conv_id, turn_idx) order: per-turn start = windowed SUM of
    preceding rendered lengths (+ separators), text start = turn
    start + the template prefix length — exact in any engine, no
    tokenizer dependency (char offsets convert downstream).  One
    window + one grouped sort-collect per conversation; no Python."""
    if template.index("{role}") > template.index("{text}"):
        raise ValueError("template must place {role} before {text}")
    head, rest = template.split("{role}", 1)
    mid, tail = rest.split("{text}", 1)
    rt = F.concat(F.lit(head), F.col("role"), F.lit(mid),
                  F.col("text"), F.lit(tail))
    w = (Window.partitionBy("conv_id").orderBy("turn_idx")
         .rowsBetween(Window.unboundedPreceding, -1))
    turn_start = F.coalesce(
        F.sum(F.length(rt) + F.lit(len(sep))).over(w), F.lit(0))
    text_start = (turn_start + F.length(F.lit(head))
                  + F.length(F.col("role")) + F.length(F.lit(mid)))
    staged = turns.select(
        "conv_id", "turn_idx", "role",
        rt.alias("__rt"),
        text_start.cast("long").alias("__ts"),
        (text_start + F.length("text")).cast("long").alias("__te"))
    masked = F.col("role") == mask_role
    return (staged.groupBy("conv_id").agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(
                    F.struct("turn_idx", F.col("__rt").alias("rt")))),
                lambda x: x["rt"]), sep).alias("rendered"),
        F.transform(
            F.sort_array(F.collect_list(
                F.when(masked, F.struct("turn_idx",
                                        F.col("__ts").alias("v"))))),
            lambda x: x["v"]).alias("mask_starts"),
        F.transform(
            F.sort_array(F.collect_list(
                F.when(masked, F.struct("turn_idx",
                                        F.col("__te").alias("v"))))),
            lambda x: x["v"]).alias("mask_ends")))
