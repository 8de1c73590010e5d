"""WL structural-signature tests (kgloom/ops/canonical.py):
isomorphic fragments collide, structural differences separate,
literal leaves discriminate, hub capping, and an exact Python replay
of the refinement semantics."""

import hashlib

import pytest

from kgloom.ops.canonical import wl_colors, wl_signature_groups


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "subj string, pred string, obj string")


@pytest.fixture(scope="module")
def frag(spark):
    """Two isomorphic 'order' fragments (o1, o2) and one structurally
    different (o3: missing the status edge, extra item)."""
    rows = []
    for o, item in (("<o1>", "<i1>"), ("<o2>", "<i2>")):
        rows += [(o, "<p:item>", item), (o, "<p:status>", '"open"'),
                 (item, "<p:qty>", '"2"')]
    rows += [("<o3>", "<p:item>", "<i3a>"), ("<o3>", "<p:item>", "<i3b>"),
             ("<i3a>", "<p:qty>", '"2"'), ("<i3b>", "<p:qty>", '"2"')]
    return _df(spark, rows)


def _colors(triples, **kw):
    return {r.node: r.color for r in wl_colors(triples, **kw).collect()}


def test_isomorphic_fragments_collide(spark, frag):
    c = _colors(frag, iterations=3)
    assert c["<o1>"] == c["<o2>"]
    assert c["<i1>"] == c["<i2>"]
    assert c["<o1>"] != c["<o3>"]
    assert c["<i1>"] != c["<i3a>"]
    # same-qty leaf literal is one node shared by all fragments
    assert c['"2"'] != c['"open"']


def test_literal_leaves_discriminate(spark):
    t = _df(spark, [("<a>", "<p>", '"x"'), ("<b>", "<p>", '"y"')])
    c = _colors(t, iterations=1)
    assert c["<a>"] != c["<b>"]
    c0 = _colors(t, iterations=0)
    assert c0["<a>"] == c0["<b>"] == "R"
    assert c0['"x"'] == 'L:"x"'


def test_signature_groups(spark, frag):
    groups = {r.signature: (r.n_nodes, r.example)
              for r in wl_signature_groups(frag, iterations=3).collect()}
    c = _colors(frag, iterations=3)
    assert groups[c["<o1>"]] == (2, "<o1>")
    assert groups[c["<i1>"]] == (2, "<i1>")
    assert groups[c["<o3>"]][0] == 1


def test_hub_cap(spark):
    rows = ([("<hub>", "<p>", f"<s{i}>") for i in range(10)]
            + [("<a>", "<q>", "<b>")])
    t = _df(spark, rows)
    exact = _colors(t, iterations=1)
    capped = _colors(t, iterations=1, hub_cap=5)
    # hub color switches to the degree form; below-cap nodes unchanged
    assert capped["<hub>"] != exact["<hub>"]
    assert capped["<hub>"] == hashlib.md5(b"R|HUB:10").hexdigest()
    assert capped["<a>"] == exact["<a>"]
    assert capped["<s3>"] == exact["<s3>"]
    # no node over the cap => identical to exact
    assert _colors(t, iterations=2, hub_cap=100) == _colors(t, iterations=2)


def test_python_replay(spark, frag):
    """Exact replay of the documented recurrence in plain Python."""
    triples = [(r.subj, r.pred, r.obj) for r in frag.collect()]
    nodes = {s for s, _, _ in triples} | {o for _, _, o in triples}
    color = {n: ("R" if n.startswith(("<", "_:")) else "L:" + n)
             for n in nodes}
    for _ in range(2):
        nxt = {}
        for n in nodes:
            msgs = sorted(
                [f"O|{p}|{color[o]}" for s, p, o in triples if s == n]
                + [f"I|{p}|{color[s]}" for s, p, o in triples if o == n])
            nxt[n] = hashlib.md5(
                (color[n] + "|" + ",".join(msgs)).encode()).hexdigest()
        color = nxt
    assert _colors(frag, iterations=2) == color
