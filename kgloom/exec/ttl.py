"""Distributed deterministic Turtle serialization.

The reference enumerates a TTL serializer but leaves it
``unimplemented!`` (`/root/reference/operator/src/formats.rs:20-29`,
serializer/mod.rs) — this module implements it Spark-first, like the
ShExML features the reference skips.

Shape: one text line per SUBJECT — ``subj pred o1 , o2 ; pred2 o3 .``
— built entirely with Catalyst collection functions (collect_set /
array_sort / transform / array_join): the per-subject grouping is one
shuffle, string assembly is JVM-side codegen, no Python, no driver
materialization.  A 10^12-triple KG serializes at full parallelism
and each task holds only its subjects' predicate lists.

Determinism (what makes the output oracle-checkable text, not just
valid RDF): objects sort lexically within a predicate, predicates
sort with ``rdf:type`` (written ``a``) first then lexically, and
prefix compaction applies the longest matching namespace only when
the local part is a conservative PN_LOCAL (``[A-Za-z_][A-Za-z0-9_-]*``
— anything else keeps the full IRI, so compaction can never produce
invalid Turtle).  Literals and blank nodes pass through in their
rendered form.  Turtle has no graph slot: the quad's ``graph`` column
is ignored here — :func:`trig_document_lines` is the graph-aware
variant (TriG).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_RDF_TYPE = "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>"

#: conservative PN_LOCAL subset — a compacted name must match this or
#: the term keeps its full ``<iri>`` form (real PN_LOCAL allows dots
#: and percent escapes; the subset avoids every tokenizer edge case)
_SAFE_LOCAL = "[A-Za-z_][A-Za-z0-9_-]*"


def compact_term(col: Column, prefixes: dict[str, str]) -> Column:
    """Rendered term → prefixed name when a namespace matches and the
    remainder is a safe local name; otherwise unchanged.  Longest
    namespace wins (nested namespaces pick the most specific)."""
    out = None
    for p, ns in sorted(prefixes.items(), key=lambda kv: (-len(kv[1]),
                                                          kv[0])):
        pat = "^<" + re.escape(ns) + "(" + _SAFE_LOCAL + ")>$"
        local = F.regexp_extract(col, pat, 1)
        cond = col.rlike(pat)
        hit = F.concat(F.lit(p + ":"), local)
        out = F.when(cond, hit) if out is None else out.when(cond, hit)
    return col if out is None else out.otherwise(col)


def turtle_blocks(df: DataFrame,
                  prefixes: dict[str, str] | None = None) -> DataFrame:
    """(subj, pred, obj[, graph]) → ``(subj, ttl)``: one deterministic
    single-line Turtle block per subject (RDF set semantics — duplicate
    triples collapse)."""
    prefixes = dict(prefixes or {})
    s = compact_term(F.col("subj"), prefixes)
    p = F.when(F.col("pred") == _RDF_TYPE, F.lit("a")) \
         .otherwise(compact_term(F.col("pred"), prefixes))
    o = compact_term(F.col("obj"), prefixes)
    t = df.select(s.alias("s"), p.alias("p"), o.alias("o")).distinct()
    po = (t.groupBy("s", "p")
          .agg(F.array_join(F.array_sort(F.collect_set("o")),
                            " , ").alias("objs"))
          .withColumn("pk", F.when(F.col("p") == "a",
                                   F.lit(0)).otherwise(F.lit(1))))
    body = F.array_join(
        F.transform(F.array_sort(F.collect_list(
            F.struct("pk", "p", "objs"))),
            lambda x: F.concat(x["p"], F.lit(" "), x["objs"])),
        " ; ")
    return (po.groupBy("s").agg(body.alias("body"))
            .select(F.col("s").alias("subj"),
                    F.concat(F.col("s"), F.lit(" "), F.col("body"),
                             F.lit(" .")).alias("ttl")))


def turtle_document_lines(df: DataFrame,
                          prefixes: dict[str, str] | None = None
                          ) -> DataFrame:
    """Single-column (``value``) text lines of a complete Turtle
    document: sorted ``@prefix`` directives, then the subject blocks.
    Feed to ``.write.text`` for a distributed TTL sink (part files
    concatenate into one valid document — directives sort before
    blocks within the header partition written first by coalesced
    single-file writes; for strict ordering write the header
    separately or keep this DataFrame's order via a single partition
    at document-assembly time)."""
    prefixes = dict(prefixes or {})
    spark = df.sparkSession
    blocks = turtle_blocks(df, prefixes).select("ttl")
    if not prefixes:
        return blocks.select(F.col("ttl").alias("value"))
    header = spark.createDataFrame(
        [(f"@prefix {p}: <{ns}> .",)
         for p, ns in sorted(prefixes.items())], "value string")
    return header.unionByName(blocks.select(F.col("ttl").alias("value")))


def trig_document_lines(df: DataFrame,
                        prefixes: dict[str, str] | None = None
                        ) -> DataFrame:
    """TriG variant: quads with a non-null ``graph`` serialize as
    ``<g> {{ block }}`` lines, null-graph quads as plain Turtle blocks
    — same determinism guarantees as :func:`turtle_blocks`, one line
    per (graph, subject).  TriG is a superset of Turtle, so a
    graph-free input degrades to exactly the Turtle document."""
    prefixes = dict(prefixes or {})
    spark = df.sparkSession
    g = compact_term(F.col("graph"), prefixes)
    s = compact_term(F.col("subj"), prefixes)
    p = F.when(F.col("pred") == _RDF_TYPE, F.lit("a")) \
         .otherwise(compact_term(F.col("pred"), prefixes))
    o = compact_term(F.col("obj"), prefixes)
    t = df.select(g.alias("g"), s.alias("s"), p.alias("p"),
                  o.alias("o")).distinct()
    po = (t.groupBy("g", "s", "p")
          .agg(F.array_join(F.array_sort(F.collect_set("o")),
                            " , ").alias("objs"))
          .withColumn("pk", F.when(F.col("p") == "a",
                                   F.lit(0)).otherwise(F.lit(1))))
    body = F.array_join(
        F.transform(F.array_sort(F.collect_list(
            F.struct("pk", "p", "objs"))),
            lambda x: F.concat(x["p"], F.lit(" "), x["objs"])),
        " ; ")
    block = F.concat(F.col("s"), F.lit(" "), F.col("body"), F.lit(" ."))
    lines = (po.groupBy("g", "s").agg(body.alias("body"))
             .select(F.when(F.col("g").isNotNull(),
                            F.concat(F.col("g"), F.lit(" { "), block,
                                     F.lit(" }")))
                     .otherwise(block).alias("value")))
    if not prefixes:
        return lines
    header = spark.createDataFrame(
        [(f"@prefix {p}: <{ns}> .",)
         for p, ns in sorted(prefixes.items())], "value string")
    return header.unionByName(lines)
