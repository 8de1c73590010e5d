"""Entity-summarization tests (kgloom/ops/summarize.py): rarity
ranking, deterministic tie-breaks, k-truncation, and a naive Python
replay."""

import pytest
from pyspark.sql import functions as F

from kgloom.ops.summarize import entity_summary


@pytest.fixture(scope="module")
def kg(spark):
    """rdf:type is common (3 uses), name has 2, penName is unique —
    so penName > name > type in informativeness."""
    T = "<rdf:type>"
    rows = [
        ("<a>", T, "<Person>"),
        ("<a>", "<name>", '"Alice"'),
        ("<a>", "<penName>", '"A. Liddell"'),
        ("<b>", T, "<Person>"),
        ("<b>", "<name>", '"Bob"'),
        ("<c>", T, "<Person>"),
    ]
    return spark.createDataFrame(rows, "subj string, pred string, obj string")


def test_rarity_ranking_and_truncation(spark, kg):
    got = {(r.subj, r.rank): (r.pred, r.obj)
           for r in entity_summary(kg, k=2).collect()}
    assert got[("<a>", 1)] == ("<penName>", '"A. Liddell"')
    assert got[("<a>", 2)] == ("<name>", '"Alice"')
    assert ("<a>", 3) not in got            # type fact truncated at k=2
    assert got[("<b>", 1)] == ("<name>", '"Bob"')
    assert got[("<c>", 1)] == ("<rdf:type>", "<Person>")
    assert len(got) == 5


def test_tie_break_deterministic(spark):
    # two predicates with equal global counts: byte order of (pred, obj)
    rows = [("<s>", "<p1>", '"z"'), ("<s>", "<p2>", '"a"'),
            ("<t>", "<p1>", '"x"'), ("<t>", "<p2>", '"y"')]
    kg = spark.createDataFrame(rows, "subj string, pred string, obj string")
    got = {(r.subj, r.rank): r.pred for r in entity_summary(kg, k=1).collect()}
    assert got == {("<s>", 1): "<p1>", ("<t>", 1): "<p1>"}


def test_k_validation(spark, kg):
    with pytest.raises(ValueError):
        entity_summary(kg, k=0)


def test_python_replay(spark, kg):
    triples = [(r.subj, r.pred, r.obj) for r in kg.collect()]
    from collections import Counter
    pn = Counter(p for _, p, _ in triples)
    want = set()
    for s in {t[0] for t in triples}:
        facts = sorted(((pn[p], p, o) for x, p, o in triples if x == s))
        for i, (_, p, o) in enumerate(facts[:3], 1):
            want.add((s, p, o, i))
    got = {(r.subj, r.pred, r.obj, r.rank)
           for r in entity_summary(kg, k=3).collect()}
    assert got == want
