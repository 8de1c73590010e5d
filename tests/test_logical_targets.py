"""rml:logicalTarget multi-target routing.

Parity target: the reference's per-term-map logical targets
(`/root/reference/rml-interpreter/src/rml_model/source_target.rs:48-123`,
`translator/src/rmlalgebra/util.rs:137-236`): a subject map's targets
receive every quad of the TriplesMap, a predicate/object map's targets
receive the quads that term map participates in, and untargeted term
maps land in the default target.
"""

import glob

from kgloom.engine import compile_rml, nquads, run_rml

PREAMBLE = """
@prefix rr: <http://www.w3.org/ns/r2rml#> .
@prefix rml: <http://semweb.mmlab.be/ns/rml#> .
@prefix rmlt: <http://semweb.mmlab.be/ns/rml-target#> .
@prefix void: <http://rdfs.org/ns/void#> .
@prefix formats: <http://www.w3.org/ns/formats/> .
@prefix ql: <http://semweb.mmlab.be/ns/ql#> .
@prefix foaf: <http://xmlns.com/foaf/0.1/> .
"""


def _mapping(tmp_path):
    return PREAMBLE + """
<#NamesTarget> a rmlt:LogicalTarget;
  rmlt:target [ void:dataDump <file://%(d)s/names_out> ];
  rmlt:serialization formats:N-Quads .
<#EmailsTarget> a rmlt:LogicalTarget;
  rmlt:target [ void:dataDump <file://%(d)s/emails_out> ];
  rmlt:serialization formats:N-Quads .
<TM> a rr:TriplesMap;
  rml:logicalSource [ rml:source "people.csv";
                      rml:referenceFormulation ql:CSV ];
  rr:subjectMap [ rr:template "http://ex.com/{ID}" ];
  rr:predicateObjectMap [
    rr:predicate foaf:name;
    rr:objectMap [ rml:reference "Name";
                   rml:logicalTarget <#NamesTarget> ] ];
  rr:predicateObjectMap [
    rr:predicate foaf:mbox;
    rr:objectMap [ rml:reference "Email";
                   rml:logicalTarget <#EmailsTarget> ] ] .
""" % {"d": tmp_path}


def _read_parts(path_glob: str) -> set[str]:
    out = set()
    for f in glob.glob(path_glob):
        out |= {ln for ln in open(f).read().splitlines() if ln.strip()}
    return out


def test_two_targets_receive_disjoint_quads(spark, tmp_path):
    (tmp_path / "people.csv").write_text(
        "ID,Name,Email\n1,Alice,a@x.org\n2,Bob,b@x.org\n")
    df = run_rml(spark, _mapping(tmp_path), base_dir=str(tmp_path))
    # default target still receives everything (the subject map is
    # untargeted → routes every quad to default)
    lines = nquads(df)
    assert '<http://ex.com/1> <http://xmlns.com/foaf/0.1/name> "Alice" .' \
        in lines
    assert '<http://ex.com/2> <http://xmlns.com/foaf/0.1/mbox> "b@x.org" .' \
        in lines

    names = _read_parts(f"{tmp_path}/names_out/part-*")
    emails = _read_parts(f"{tmp_path}/emails_out/part-*")
    assert len(names) == 2 and all("foaf/0.1/name" in ln for ln in names)
    assert len(emails) == 2 and all("foaf/0.1/mbox" in ln for ln in emails)
    assert not (names & emails)  # disjoint quad sets


def test_subject_map_target_receives_all_quads(spark, tmp_path):
    (tmp_path / "people.csv").write_text("ID,Name,Email\n1,Alice,a@x.org\n")
    ttl = PREAMBLE + """
<#AllTarget> a rmlt:LogicalTarget;
  rmlt:target [ void:dataDump <file://%(d)s/all_out> ];
  rmlt:serialization formats:N-Quads .
<TM> a rr:TriplesMap;
  rml:logicalSource [ rml:source "people.csv";
                      rml:referenceFormulation ql:CSV ];
  rr:subjectMap [ rr:template "http://ex.com/{ID}";
                  rml:logicalTarget <#AllTarget> ];
  rr:predicateObjectMap [ rr:predicate foaf:name;
                          rr:objectMap [ rml:reference "Name" ] ];
  rr:predicateObjectMap [ rr:predicate foaf:mbox;
                          rr:objectMap [ rml:reference "Email" ] ] .
""" % {"d": tmp_path}
    run_rml(spark, ttl, base_dir=str(tmp_path))
    all_lines = _read_parts(f"{tmp_path}/all_out/part-*")
    assert len(all_lines) == 2  # name + mbox quads both routed via the SM


def test_plan_shape_untargeted_mapping_unchanged(spark):
    """A mapping with no rml:logicalTarget compiles to exactly one
    serializer + one (default) target per TM branch — no fragment
    fan-out regression of the pre-logicalTarget plan shape."""
    ttl = PREAMBLE + """
<TM> a rr:TriplesMap;
  rml:logicalSource [ rml:source "people.csv";
                      rml:referenceFormulation ql:CSV ];
  rr:subjectMap [ rr:template "http://ex.com/{ID}" ];
  rr:predicateObjectMap [ rr:predicate foaf:name;
                          rr:objectMap [ rml:reference "Name" ] ] .
"""
    graph = compile_rml(ttl).graph
    kinds = [type(n.operator).__name__ for n in graph.nodes.values()]
    assert kinds.count("SerializerOp") == 1
    assert kinds.count("TargetOp") == 1
    assert kinds.count("FragmentOp") == 0
