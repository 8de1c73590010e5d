"""Training-data shaping: sessionization and SFT example extraction
(kgloom/transcripts/training.py)."""

import datetime

import pytest
from pyspark.sql import functions as F

from kgloom.transcripts.training import (session_summary, sessionize,
                                         sft_examples)


def _ts(minute, second=0, micro=0):
    return datetime.datetime(2024, 1, 1, 0, minute, second, micro)


@pytest.fixture(scope="module")
def turns(spark):
    rows = [
        # conv A: two sessions split by a >60s gap
        ("A", 0, "user", "hi", None, _ts(0)),
        ("A", 1, "assistant", "hello", None, _ts(0, 30)),
        ("A", 2, "user", "later", None, _ts(5)),
        ("A", 3, "tool", "grep", "grep", _ts(5, 10)),
        ("A", 4, "assistant", "found", None, _ts(5, 20)),
        # conv B: one session; opens with an assistant turn
        ("B", 0, "assistant", "welcome", None, _ts(1)),
        ("B", 1, "user", "thanks", None, _ts(1, 30)),
        ("B", 2, "assistant", "np", None, _ts(1, 45)),
    ]
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
              "tool string, ts timestamp")


def test_sessionize_gap_boundaries(turns):
    got = {(r.conv_id, r.turn_idx): (r.session_idx, r.session_id)
           for r in sessionize(turns, gap_seconds=60).collect()}
    assert got == {
        ("A", 0): (0, "A#0"), ("A", 1): (0, "A#0"),
        ("A", 2): (1, "A#1"), ("A", 3): (1, "A#1"), ("A", 4): (1, "A#1"),
        ("B", 0): (0, "B#0"), ("B", 1): (0, "B#0"), ("B", 2): (0, "B#0"),
    }


def test_sessionize_exact_gap_is_same_session(spark):
    # the boundary is STRICTLY greater-than, compared in exact micros
    rows = [("C", 0, "user", "a", None, _ts(0)),
            ("C", 1, "user", "b", None, _ts(1)),          # exactly 60s
            ("C", 2, "user", "c", None, _ts(2, 0, 1))]    # 60.000001s
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
              "tool string, ts timestamp")
    got = {r.turn_idx: r.session_idx
           for r in sessionize(df, gap_seconds=60).collect()}
    assert got == {0: 0, 1: 0, 2: 1}


def test_session_summary(turns):
    got = {r.session_id: (r.n_turns, r.n_tool_turns)
           for r in session_summary(turns, gap_seconds=60).collect()}
    assert got == {"A#0": (2, 0), "A#1": (3, 1), "B#0": (3, 0)}
    row = [r for r in session_summary(turns, gap_seconds=60).collect()
           if r.session_id == "A#1"][0]
    assert row.t_end_us - row.t_start_us == 20_000_000


def test_sft_examples_full_context(turns):
    got = {(r.conv_id, r.turn_idx): (r.prompt, r.response)
           for r in sft_examples(turns).collect()}
    assert got == {
        ("A", 1): ("user: hi", "hello"),
        ("A", 4): ("user: hi\nassistant: hello\nuser: later\ntool: grep",
                   "found"),
        # B's opening assistant turn has no context -> dropped
        ("B", 2): ("assistant: welcome\nuser: thanks", "np"),
    }


def test_sft_examples_capped_context(turns):
    got = {(r.conv_id, r.turn_idx): r.prompt
           for r in sft_examples(turns, max_context_turns=2).collect()}
    assert got[("A", 4)] == "user: later\ntool: grep"


def test_sft_examples_custom_format(turns):
    got = {(r.conv_id, r.turn_idx): r.prompt
           for r in sft_examples(
               turns, max_context_turns=1,
               turn_format="<{role}>{text}</>", sep=" ").collect()}
    assert got[("A", 1)] == "<user>hi</>"
    with pytest.raises(ValueError):
        sft_examples(turns, turn_format="{text} by {role}")


def test_training_ops_jvm_only(turns):
    from tests.test_plan_quality import explain_str
    from kgloom.transcripts.training import chat_render
    assert "EvalPython" not in explain_str(sft_examples(turns, 4))
    assert "EvalPython" not in explain_str(session_summary(turns))
    assert "EvalPython" not in explain_str(chat_render(turns))


def test_chat_render_spans_slice_masked_text(spark):
    from kgloom.transcripts.training import chat_render
    rows = [("c1", 0, "user", "hi there"),
            ("c1", 1, "assistant", "hello!"),
            ("c1", 2, "tool", "lookup"),
            ("c1", 3, "assistant", "done"),
            ("c2", 0, "assistant", "solo")]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string")
    out = {r["conv_id"]: r for r in chat_render(df).collect()}
    assert out["c1"]["rendered"] == (
        "<|user|>hi there<|end|>\n<|assistant|>hello!<|end|>\n"
        "<|tool|>lookup<|end|>\n<|assistant|>done<|end|>")
    # every span slices exactly the masked turn's text, in turn order
    for cid, want in [("c1", ["hello!", "done"]), ("c2", ["solo"])]:
        r = out[cid]
        got = [r["rendered"][s:e]
               for s, e in zip(r["mask_starts"], r["mask_ends"])]
        assert got == want
    # no masked turns → empty span arrays, rendered still complete
    none = chat_render(df, mask_role="system").collect()
    assert all(r["mask_starts"] == [] and r["mask_ends"] == []
               for r in none)
    import pytest as _pytest
    with _pytest.raises(ValueError):
        chat_render(df, template="{text}:{role}")
