"""Distributed N-Triples / N-Quads source.

The reference serializes to NTriples/NQuads but has no RDF *input*
(`/root/reference/operator/src/formats.rs:20-29` lists the output
formats; sources are CSV/JSON/XML/SQL only).  Reading RDF dumps back
is the missing half of the round trip — and at scale it is THE bulk
KG input format (public KG dumps ship as line-oriented N-Triples).

100-TB design: N-Quads is newline-delimited, so ``spark.read.text``
splits files at line boundaries across executors, and the whole parse
is two Catalyst ``regexp_extract`` passes — JVM-side, whole-stage
codegen, no Python anywhere (asserted by ``tests/test_rdfsource.py``).
Terms stay in their rendered lexical form (``<iri>``, ``_:b0``,
``"lit"@en``) — the same convention every quad-consuming operator in
this engine uses (SPARQL, reasoning, fusion), so a parsed dump plugs
into them directly.

Grammar handled (W3C N-Quads): IRI / blank-node subjects, IRI
predicates, IRI / blank-node / literal objects (with ``\\``-escapes,
``@lang`` tags and ``^^<datatype>``), optional IRI / blank-node graph
label, full-line comments, blank lines — plus RDF-star (N-Triples-
star) quoted triples ``<< s p o >>`` in subject and object position,
ONE level deep (nested quoting is malformed; see
:mod:`kgloom.ops.star` for the quoted-term constructors and
decomposition).  The object/graph split is unambiguous because each
object alternative is matched as a COMPLETE term (a lone trailing IRI
can never be half-object half-graph).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: literal with escape-aware quoting and optional @lang / ^^<datatype>
_LIT = (r'"(?:[^"\\]|\\.)*"'
        r'(?:\^\^<[^>]*>|@[A-Za-z][A-Za-z0-9\-]*)?')
#: RDF-star quoted triple ``<< s p o >>`` (N-Triples-star; ONE level —
#: nested quoting is rejected as malformed).  Structured term-by-term,
#: so ``>>`` inside an inner literal parses correctly.
_QT = (r'<<\s*(?:<[^>]*>|_:\S+)\s+<[^>]*>\s+'
       r'(?:<[^>]*>|_:\S+|' + _LIT + r')\s*>>')
# line → (subject, predicate, object-and-maybe-graph); the lazy middle
# group backtracks past "." characters inside literals because the
# terminating "." must be followed only by whitespace
_LINE_RE = (r'^\s*(' + _QT + r'|<[^>]*>|_:\S+)\s+(<[^>]*>)'
            r'\s+(.*?)\s*\.\s*$')
# object-and-maybe-graph → (object, graph); object = IRI | bnode |
# quoted triple | literal
_OBJ_RE = (r'^(' + _QT + r'|<[^>]*>|_:\S+|' + _LIT + r')'
           r'(?:\s+(<[^>]*>|_:\S+))?$')


def parse_nquads_lines(lines: DataFrame, mode: str = "failfast",
                       column: str = "value") -> DataFrame:
    """Parse a DataFrame of N-Quads text lines into
    ``(subj, pred, obj, graph)`` (graph null for triples).

    mode="failfast" (default): any malformed line raises at action
    time via ``raise_error`` INSIDE the scan — no second validation
    pass over the data.  mode="permissive": malformed lines are
    dropped (the Spark CSV/JSON convention for dirty dumps)."""
    if mode not in ("failfast", "permissive"):
        raise ValueError(f"unknown mode {mode!r}")
    v = F.trim(F.col(column))
    data = (lines.where((v != "") & ~v.startswith("#"))
            .select(v.alias("__line"),
                    F.regexp_extract(v, _LINE_RE, 1).alias("subj"),
                    F.regexp_extract(v, _LINE_RE, 2).alias("pred"),
                    F.regexp_extract(v, _LINE_RE, 3).alias("__rest")))
    data = data.select(
        "__line", "subj", "pred",
        F.regexp_extract("__rest", _OBJ_RE, 1).alias("obj"),
        F.nullif(F.regexp_extract("__rest", _OBJ_RE, 2), F.lit(""))
        .alias("graph"))
    ok = (F.col("subj") != "") & (F.col("obj") != "")
    if mode == "permissive":
        return data.where(ok).select("subj", "pred", "obj", "graph")
    return data.select(
        F.when(ok, F.col("subj")).otherwise(F.raise_error(F.concat(
            F.lit("malformed N-Quads line: "), F.col("__line"))))
        .alias("subj"),
        "pred", "obj", "graph")


def read_nquads(spark: SparkSession, path: str,
                mode: str = "failfast") -> DataFrame:
    """Scan N-Triples/N-Quads file(s) into a quad DataFrame.  Line
    splitting and both regex passes run distributed in codegen."""
    return parse_nquads_lines(spark.read.text(path), mode=mode)
