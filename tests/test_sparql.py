"""SPARQL SELECT subset over quad DataFrames (kgloom/sparql.py) —
makes the reference's enum-only SPARQL formulation executable."""

import pytest
from pyspark.sql import functions as F

from kgloom.sparql import SparqlError, parse_sparql, sparql_select

EX = "http://ex.com/"


@pytest.fixture(scope="module")
def quads(spark):
    rows = [
        (f"<{EX}alice>", f"<{EX}knows>", f"<{EX}bob>", None),
        (f"<{EX}alice>", f"<{EX}age>", '"30"', None),
        (f"<{EX}alice>",
         "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>",
         f"<{EX}Person>", None),
        (f"<{EX}bob>", f"<{EX}age>", '"25"', None),
        (f"<{EX}bob>",
         "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>",
         f"<{EX}Person>", None),
        (f"<{EX}bob>", f"<{EX}name>", '"Bob"@en', None),
        (f"<{EX}carol>", f"<{EX}age>", '"41"', None),
    ]
    return spark.createDataFrame(
        rows, "subj string, pred string, obj string, graph string")


def test_basic_bgp_join(quads):
    rows = sparql_select(quads, f"""
        PREFIX ex: <{EX}>
        SELECT ?who ?age WHERE {{
          ?who a ex:Person ;
               ex:age ?age .
        }}
    """).collect()
    got = {(r.who, r.age) for r in rows}
    assert got == {(EX + "alice", "30"), (EX + "bob", "25")}  # carol untyped


def test_constant_object_and_lang_literal(quads):
    rows = sparql_select(quads, f"""
        PREFIX ex: <{EX}>
        SELECT ?s WHERE {{ ?s ex:name "Bob"@en . }}
    """).collect()
    assert [r.s for r in rows] == [EX + "bob"]


def test_numeric_filter_order_limit(quads):
    rows = sparql_select(quads, f"""
        PREFIX ex: <{EX}>
        SELECT ?s ?age WHERE {{
          ?s ex:age ?age .
          FILTER(?age > 26)
        }} ORDER BY DESC(?age) LIMIT 1
    """).collect()
    assert [(r.s, r.age) for r in rows] == [(EX + "carol", "41")]


def test_distinct_and_object_list(quads):
    rows = sparql_select(quads, f"""
        PREFIX ex: <{EX}>
        SELECT DISTINCT ?p WHERE {{ ex:alice ?p ?o . }}
    """).collect()
    assert len(rows) == 3  # knows, age, rdf:type


def test_raw_terms_mode(quads):
    rows = sparql_select(quads, f"""
        PREFIX ex: <{EX}>
        SELECT ?o WHERE {{ ex:bob ex:name ?o . }}
    """, raw_terms=True).collect()
    assert rows[0].o == '"Bob"@en'


def test_unsupported_features_raise():
    with pytest.raises(SparqlError):
        parse_sparql("SELECT ?s WHERE { ?s ?p ?o . "
                     "OPTIONAL { ?s ?q ?r } }")
    with pytest.raises(SparqlError):
        parse_sparql("ASK { ?s ?p ?o }")


def test_sparql_source_through_binder(spark, quads, tmp_path):
    """ReferenceFormulation.SPARQL end-to-end through the plan binder:
    a quads DataFrame source + SELECT query feeds a mapping branch."""
    from kgloom.algebra import (DataFormat, ExtendOp, Function, IOType,
                                ProjectOp, ReferenceFormulation,
                                SerializerOp, SourceIterator, SourceOp,
                                TargetOp)
    from kgloom.exec.binder import SparkBinder, write_sinks
    from kgloom.plan import Plan

    g = Plan()
    p = g.source(SourceOp.make(
        {"source": "kg"}, IOType.DATAFRAME,
        SourceIterator(
            reference=f"PREFIX ex: <{EX}> "
                      "SELECT ?who ?age WHERE { ?who ex:age ?age . }",
            reference_formulation=ReferenceFormulation.SPARQL)))
    p = p.apply(ProjectOp(projection_attributes=frozenset({"who", "age"})),
                "Projection")
    p = p.apply(ExtendOp.make({
        "sm": Function.iri(Function.reference("who")),
        "pm": Function.iri(Function.constant(EX + "hasAge")),
        "om": Function.literal(Function.reference("age")),
    }), "Extend")
    p = p.serialize(SerializerOp(template="?sm ?pm ?om ."))
    p = p.sink(TargetOp.make({}, IOType.DATAFRAME, DataFormat.NQUADS))
    binder = SparkBinder(spark, dataframes={"kg": quads})
    out = list(write_sinks(binder.execute(p.graph)).values())[0]
    got = {(r.subj, r.obj) for r in out.collect()}
    assert (f"<{EX}carol>", '"41"') in got
    assert len(got) == 3
