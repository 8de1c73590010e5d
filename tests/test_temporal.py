"""Unit tests for the temporal operator family
(kgloom/ops/temporal.py) and the FIM transform
(kgloom/ops/packing.py) — hand-checked semantics, tie/null edge
cases, and plan-shape gates."""

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from kgloom.ops.packing import fim_transform
from kgloom.ops.temporal import asof_join, interval_coalesce, snapshot_delta


def _ts(s):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


@pytest.fixture(scope="module")
def asof_frames(spark):
    left = spark.createDataFrame(
        [("a", 0, _ts(5)), ("a", 1, _ts(10)), ("a", 2, _ts(20)),
         ("b", 0, _ts(1)),  # before any right row
         ("c", 0, _ts(7))], "k string, idx int, ts timestamp")
    right = spark.createDataFrame(
        [("a", "x", _ts(4)), ("a", "y", _ts(10)),   # tie with left idx=1
         ("a", "z", _ts(15)),
         ("c", None, _ts(7))],                       # null payload at tie
        "k string, val string, ts timestamp")
    return left, right


def test_asof_join_latest_at_or_before(spark, asof_frames):
    left, right = asof_frames
    out = {(r.k, r.idx): (r.val_r, r.ts_r)
           for r in asof_join(left, right, on=["k"]).collect()}
    assert len(out) == 5
    assert out[("a", 0)] == ("x", _ts(4))
    # tie: right row AT the left timestamp is visible (non-strict)
    assert out[("a", 1)] == ("y", _ts(10))
    assert out[("a", 2)] == ("z", _ts(15))
    # no preceding right row -> left-outer nulls
    assert out[("b", 0)] == (None, None)
    # a legitimately-null payload column must NOT fall back to an
    # older right row: the whole payload travels as one struct
    assert out[("c", 0)] == (None, _ts(7))


def test_asof_join_strict(spark, asof_frames):
    left, right = asof_frames
    out = {(r.k, r.idx): (r.val_r, r.ts_r)
           for r in asof_join(left, right, on=["k"],
                              strict=True).collect()}
    # with strict=True the ts=10 right row is no longer visible to
    # the ts=10 left row — it falls back to the ts=4 row
    assert out[("a", 1)] == ("x", _ts(4))
    assert out[("a", 0)] == ("x", _ts(4))
    assert out[("c", 0)] == (None, None)


def test_asof_join_single_shuffle(spark, asof_frames):
    left, right = asof_frames
    plan = asof_join(left, right, on=["k"])._jdf.queryExecution() \
        .executedPlan().toString()
    # union + window: exactly one hash-partition exchange, no join
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan


def test_interval_coalesce(spark):
    df = spark.createDataFrame(
        [("a", "A", _ts(0), 0), ("a", "A", _ts(10), 1),
         ("a", "B", _ts(20), 2), ("a", "A", _ts(30), 3),
         ("b", None, _ts(0), 0), ("b", None, _ts(5), 1)],
        "k string, v string, ts timestamp, idx int")
    rows = sorted(
        interval_coalesce(df, ["k"], "v", "ts", ["idx"]).collect(),
        key=lambda r: (r.k, r.valid_from))
    got = [(r.k, r.v, r.valid_from, r.valid_to, r.n_rows) for r in rows]
    assert got == [
        ("a", "A", _ts(0), _ts(20), 2),
        ("a", "B", _ts(20), _ts(30), 1),
        ("a", "A", _ts(30), None, 1),       # re-occurrence = new island
        ("b", None, _ts(0), None, 2),       # nulls form one island
    ]


def test_snapshot_delta(spark):
    old = spark.createDataFrame(
        [("s1", "p", "o1"), ("s2", "p", "o2"), ("s2", "p", "o2")],
        "subj string, pred string, obj string")
    new = spark.createDataFrame(
        [("s2", "p", "o2"), ("s3", "p", "o3")],
        "subj string, pred string, obj string")
    got = {(r.subj, r.change) for r in snapshot_delta(old, new).collect()}
    # duplicates deduped, shared row dropped, one added + one removed
    assert got == {("s1", "removed"), ("s3", "added")}


def test_fim_reassembles_and_is_deterministic(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=f"document number {i} with some body text")
         for i in range(20)] + [Row(doc_id=99, text="tiny")])
    out = fim_transform(docs, "doc_id", "text")
    rows = {r.doc_id: r for r in out.collect()}
    texts = {r.doc_id: r.text for r in docs.collect()}
    for did, orig in texts.items():
        r = rows[did]
        if did == 99:
            assert not r.fim and r.fim_text == "tiny" \
                and r.cut1 is None and r.cut2 is None
            continue
        assert r.fim and 1 <= r.cut1 < r.cut2 < len(orig)
        # <PRE>prefix<SUF>suffix<MID>middle reassembles the original
        body = r.fim_text[len("<PRE>"):]
        pre, rest = body.split("<SUF>", 1)
        suf, mid = rest.split("<MID>", 1)
        assert pre + mid + suf == orig
    again = {r.doc_id: r.fim_text
             for r in fim_transform(docs, "doc_id", "text").collect()}
    assert again == {d: r.fim_text for d, r in rows.items()}


def test_fim_is_map_only_jvm_plan(spark):
    docs = spark.createDataFrame([Row(doc_id=1, text="abcdefghij")])
    plan = fim_transform(docs, "doc_id", "text")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan
    assert "EvalPython" not in plan


def test_funnel_greedy_earliest(spark):
    """Classic funnel semantics: step1 anchors at the FIRST
    occurrence; each later step at the first occurrence strictly
    after the previous one — even when an earlier later-step event
    exists before the anchor."""
    from kgloom.ops.temporal import funnel
    rows = [
        # u1 completes all three (click before view must NOT count)
        ("u1", "2026-01-01 00:00:05", "click"),
        ("u1", "2026-01-01 00:00:10", "view"),
        ("u1", "2026-01-01 00:00:20", "click"),
        ("u1", "2026-01-01 00:00:30", "buy"),
        # u2 stalls after view
        ("u2", "2026-01-01 01:00:00", "view"),
        # u3 never views (absent from output)
        ("u3", "2026-01-01 02:00:00", "click"),
        # u4: buy BEFORE its click -> only 2 steps
        ("u4", "2026-01-01 03:00:00", "view"),
        ("u4", "2026-01-01 03:00:10", "buy"),
        ("u4", "2026-01-01 03:00:20", "click"),
    ]
    df = spark.createDataFrame(rows, "user_id string, ts string, "
                               "event_type string") \
        .withColumn("ts", F.to_timestamp("ts"))
    got = {r.user_id: (str(r.ts_1)[11:19], r.ts_2 and str(r.ts_2)[11:19],
                       r.ts_3 and str(r.ts_3)[11:19], r.completed)
           for r in funnel(df, ["view", "click", "buy"]).collect()}
    assert got == {
        "u1": ("00:00:10", "00:00:20", "00:00:30", 3),
        "u2": ("01:00:00", None, None, 1),
        "u4": ("03:00:00", "03:00:20", None, 2),
    }


def test_funnel_within_window(spark):
    from kgloom.ops.temporal import funnel
    rows = [
        ("u1", "2026-01-01 00:00:00", "a"),
        ("u1", "2026-01-01 00:00:30", "b"),   # inside 1 minute
        ("u1", "2026-01-01 00:05:00", "c"),   # outside -> masked
    ]
    df = spark.createDataFrame(rows, "user_id string, ts string, "
                               "event_type string") \
        .withColumn("ts", F.to_timestamp("ts"))
    r = funnel(df, ["a", "b", "c"],
               within=F.expr("INTERVAL 1 MINUTE")).collect()[0]
    assert r.completed == 2 and r.ts_2 is not None and r.ts_3 is None


def test_transition_graph(spark):
    from kgloom.ops.temporal import transition_graph
    rows = [("u1", "2026-01-01 00:00:01", "a"),
            ("u1", "2026-01-01 00:00:02", "b"),
            ("u1", "2026-01-01 00:00:03", "a"),
            ("u2", "2026-01-01 00:00:01", "a"),
            ("u2", "2026-01-01 00:00:02", "b")]
    df = spark.createDataFrame(rows, "user_id string, ts string, "
                               "event_type string") \
        .withColumn("ts", F.to_timestamp("ts"))
    got = {(r.src, r.dst): (r.cnt, r.prob) for r in
           transition_graph(df).collect()}
    assert got == {("a", "b"): (2, 1.0), ("b", "a"): (1, 1.0)}


def test_cohort_retention(spark):
    from kgloom.ops.temporal import cohort_retention
    rows = [  # u1 joins week of Jan 5 (Mon), returns 2 weeks later
        ("u1", "2026-01-06 10:00:00"), ("u1", "2026-01-20 10:00:00"),
        # u2 same cohort week, active only then
        ("u2", "2026-01-07 10:00:00"),
        # u3 next week's cohort
        ("u3", "2026-01-13 10:00:00"), ("u3", "2026-01-14 10:00:00")]
    df = spark.createDataFrame(rows, "user_id string, ts string") \
        .withColumn("ts", F.to_timestamp("ts"))
    got = {(str(r.cohort_week), r.week_offset): r.n_users
           for r in cohort_retention(df).collect()}
    assert got == {("2026-01-05", 0): 2, ("2026-01-05", 2): 1,
                   ("2026-01-12", 0): 1}
