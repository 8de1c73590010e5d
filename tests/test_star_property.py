"""Property-based round-trip tests (hypothesis): serializer → N-Quads
text → distributed parser is the identity on arbitrary well-formed
terms, including RDF-star quoted triples."""

import re

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from kgloom.exec.binder import to_nquads_lines
from kgloom.exec.rdfsource import parse_nquads_lines
from kgloom.ops.star import quote_triple

# rendered-term strategies (the engine's lexical-form conventions)
_iri_chars = st.text(
    alphabet=st.characters(
        codec="ascii", min_codepoint=33, max_codepoint=126,
        exclude_characters='<>"{}|^`\\'),
    min_size=1, max_size=20)
iris = _iri_chars.map(lambda s: f"<http://ex.org/{s}>")
bnodes = st.from_regex(r"_:[A-Za-z][A-Za-z0-9]{0,8}", fullmatch=True)


def _escape(lex: str) -> str:
    return (lex.replace("\\", "\\\\").replace('"', '\\"')
            .replace("\n", "\\n").replace("\r", "\\r")
            .replace("\t", "\\t"))


_lex = st.text(
    alphabet=st.characters(codec="ascii", min_codepoint=32,
                           max_codepoint=126),
    min_size=0, max_size=25)
plain_lits = _lex.map(lambda s: f'"{_escape(s)}"')
lang_lits = st.tuples(_lex, st.from_regex(r"[a-z]{2,3}(-[A-Za-z0-9]{1,4})?",
                                          fullmatch=True)) \
    .map(lambda t: f'"{_escape(t[0])}"@{t[1]}')
typed_lits = st.tuples(_lex, iris) \
    .map(lambda t: f'"{_escape(t[0])}"^^{t[1]}')

subjects = st.one_of(iris, bnodes)
objects = st.one_of(iris, bnodes, plain_lits, lang_lits, typed_lits)
graphs = st.one_of(st.none(), iris, bnodes)


@pytest.mark.parametrize("quoted", [False, True])
@settings(max_examples=12, deadline=None)
@given(data=st.data())
def test_roundtrip_random_quads(spark, quoted, data):
    rows = data.draw(st.lists(
        st.tuples(subjects, iris, objects, graphs),
        min_size=1, max_size=8))
    df = spark.createDataFrame(
        rows, "subj string, pred string, obj string, graph string")
    if quoted:
        from pyspark.sql import functions as F
        df = df.select(
            quote_triple(F.col("subj"), F.col("pred"),
                         F.col("obj")).alias("subj"),
            F.lit("<http://ex.org/meta>").alias("pred"),
            F.col("obj"), F.col("graph"))
    want = sorted(map(tuple, df.collect()))
    got = sorted(map(tuple,
                     parse_nquads_lines(to_nquads_lines(df)).collect()))
    assert got == want
