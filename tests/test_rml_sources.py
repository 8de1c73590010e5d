"""RML logical sources beyond CSV: JSONPath/XMLPath iterators, TABLE
scans, and FnO function maps."""

import pytest
from pyspark.sql import functions as F

from kgloom.engine import nquads, run_rml

RML_PREAMBLE = """
@prefix rr: <http://www.w3.org/ns/r2rml#> .
@prefix rml: <http://semweb.mmlab.be/ns/rml#> .
@prefix ql: <http://semweb.mmlab.be/ns/ql#> .
@prefix foaf: <http://xmlns.com/foaf/0.1/> .
@prefix fnml: <http://semweb.mmlab.be/ns/fnml#> .
@prefix fno: <https://w3id.org/function/ontology#> .
@prefix grel: <http://users.ugent.be/~bjdmeest/function/grel.ttl#> .
@base <http://example.com/base/> .
"""


def test_json_logical_source(spark, tmp_path):
    (tmp_path / "students.json").write_text(
        '{"students": [{"ID": "1", "Name": "Venus",'
        '  "addr": {"city": "Miami"}},'
        ' {"ID": "2", "Name": "Serena", "addr": {"city": "Palm Beach"}}]}')
    ttl = RML_PREAMBLE + """
<TM> a rr:TriplesMap;
  rml:logicalSource [ rml:source "students.json";
                      rml:referenceFormulation ql:JSONPath;
                      rml:iterator "$.students[*]" ];
  rr:subjectMap [ rr:template "http://ex.com/{ID}" ];
  rr:predicateObjectMap [ rr:predicate foaf:name;
                          rr:objectMap [ rml:reference "Name" ] ];
  rr:predicateObjectMap [ rr:predicate foaf:based_near;
                          rr:objectMap [ rml:reference "addr.city" ] ] .
"""
    lines = nquads(run_rml(spark, ttl, base_dir=str(tmp_path)))
    assert '<http://ex.com/1> <http://xmlns.com/foaf/0.1/name> "Venus" .' in lines
    assert ('<http://ex.com/2> <http://xmlns.com/foaf/0.1/based_near> '
            '"Palm Beach" .' in lines)


def test_xml_logical_source(spark, tmp_path):
    (tmp_path / "students.xml").write_text(
        "<students><student id='7'><Name>Coco</Name></student>"
        "<student id='8'><Name>Iga</Name></student></students>")
    ttl = RML_PREAMBLE + """
<TM> a rr:TriplesMap;
  rml:logicalSource [ rml:source "students.xml";
                      rml:referenceFormulation ql:XPath;
                      rml:iterator "//student" ];
  rr:subjectMap [ rr:template "http://ex.com/{@id}" ];
  rr:predicateObjectMap [ rr:predicate foaf:name;
                          rr:objectMap [ rml:reference "Name" ] ] .
"""
    lines = nquads(run_rml(spark, ttl, base_dir=str(tmp_path)))
    assert '<http://ex.com/7> <http://xmlns.com/foaf/0.1/name> "Coco" .' in lines
    assert len(lines) == 2


def test_fno_function_map(spark, tmp_path):
    (tmp_path / "s.csv").write_text("ID,Name\n1,venus\n")
    ttl = RML_PREAMBLE + """
<TM> a rr:TriplesMap;
  rml:logicalSource [ rml:source "s.csv"; rml:referenceFormulation ql:CSV ];
  rr:subjectMap [ rr:template "http://ex.com/{ID}" ];
  rr:predicateObjectMap [
    rr:predicate foaf:name;
    rr:objectMap [
      fnml:functionValue [
        rr:predicateObjectMap [ rr:predicate fno:executes;
                                rr:objectMap [ rr:constant grel:toUpperCase ] ];
        rr:predicateObjectMap [ rr:predicate grel:valueParameter;
                                rr:objectMap [ rml:reference "Name" ] ]
      ];
      rr:termType rr:Literal
    ]
  ] .
"""
    lines = nquads(run_rml(spark, ttl, base_dir=str(tmp_path)))
    assert '<http://ex.com/1> <http://xmlns.com/foaf/0.1/name> "VENUS" .' in lines


def test_sql_logical_source(spark):
    """RML SQLQuery logical source (rr:SQL2008 + rml:query) against the
    reference's films.sqlite fixture — reference IR formats.rs:5-12."""
    data = "/root/reference/translator/resources/test/shexml/data"
    ttl = RML_PREAMBLE + """
<TM> a rr:TriplesMap;
  rml:logicalSource [ rml:source "jdbc:sqlite:%s/films.sqlite";
                      rml:referenceFormulation rr:SQL2008;
                      rml:query "SELECT id, name FROM films" ];
  rr:subjectMap [ rr:template "http://ex.com/film/{id}" ];
  rr:predicateObjectMap [ rr:predicate foaf:name;
                          rr:objectMap [ rml:reference "name" ] ] .
""" % data
    from kgloom.engine import nquads as nq
    lines = nq(run_rml(spark, ttl))
    assert '<http://ex.com/film/8> <http://xmlns.com/foaf/0.1/name> "Tenet" .' \
        in lines
    assert len(lines) == 2


def test_document_size_guard(spark, tmp_path, monkeypatch):
    """The driver-side document parser refuses inputs above the size
    guard (kgloom/exec/docsource.py) — large data must come in as a
    TABLE scan, not a driver parse."""
    from kgloom.exec.docsource import DocumentTooLargeError
    big = tmp_path / "big.json"
    big.write_text('{"students": [%s]}' % ",".join(
        '{"ID": "%d", "Name": "n%d"}' % (i, i) for i in range(50)))
    monkeypatch.setenv("KGLOOM_MAX_DOCUMENT_BYTES", "64")
    ttl = RML_PREAMBLE + """
<TM> a rr:TriplesMap;
  rml:logicalSource [ rml:source "big.json";
                      rml:referenceFormulation ql:JSONPath;
                      rml:iterator "$.students[*]" ];
  rr:subjectMap [ rr:template "http://ex.com/{ID}" ];
  rr:predicateObjectMap [ rr:predicate foaf:name;
                          rr:objectMap [ rml:reference "Name" ] ] .
"""
    with pytest.raises(DocumentTooLargeError):
        run_rml(spark, ttl, base_dir=str(tmp_path))
    monkeypatch.delenv("KGLOOM_MAX_DOCUMENT_BYTES")
    assert len(nquads(run_rml(spark, ttl, base_dir=str(tmp_path)))) == 50


def test_table_logical_source(spark):
    """Spark-native TABLE formulation — the 100 TB scale path."""
    ttl = RML_PREAMBLE + """
<TM> a rr:TriplesMap;
  rml:logicalSource [ rml:source "nation";
                      rml:referenceFormulation <http://kgloom.dev/ql#Table> ];
  rr:subjectMap [ rr:template "http://ex.com/nation/{n_nationkey}" ];
  rr:predicateObjectMap [ rr:predicate foaf:name;
                          rr:objectMap [ rml:reference "n_name" ] ] .
"""
    nation = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
    lines = nquads(run_rml(spark, ttl, dataframes={"nation": nation}))
    assert len(lines) == nation.count() * 1
    assert any("NATION#0" in ln or "nation/0" in ln for ln in lines)
