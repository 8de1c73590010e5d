"""SPARQL SELECT over quad DataFrames — the SPARQL reference
formulation, executable.

The reference declares ``ReferenceFormulation::SPARQL`` and
``IOType::SPARQLEndpoint`` (`/root/reference/operator/src/formats.rs:11`,
`operator/src/lib.rs:369`) and ShExML fixtures carry endpoint SELECT
queries (``FilmsSparqlTest.shexml``), but nothing executes them.  Here
a SPARQL *subset* runs Spark-first over the engine's own structured
quad output ``(subj, pred, obj, graph)`` — so a constructed KG can be
queried (and can feed another mapping) without leaving Spark.

Supported subset (the mapping-source shape the fixtures use):
``PREFIX``, ``SELECT [DISTINCT] ?v ... | *``, basic graph patterns
with ``;`` predicate lists and ``,`` object lists, ``FILTER`` with
comparisons on variables (string or numeric), ``ORDER BY``/``DESC``,
``LIMIT``.  Unsupported syntax raises ``SparqlError`` (OPTIONAL,
UNION, SERVICE, aggregates, property paths).

Execution: each triple pattern is a constant-filtered scan of the quad
DataFrame projected to its variable columns; patterns natural-join on
shared variables (Catalyst picks hash/broadcast strategies; a
variable-free or disjoint pattern cross-joins).  Terms are matched in
their *rendered* lexical form (``<iri>`` / ``"lit"@lang``), exactly
what the serializer emits; SELECT output strips rendering back to
plain values so downstream mappings see endpoint-style bindings.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Optional, Union

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class SparqlError(Exception):
    pass


@dataclass(frozen=True)
class Var:
    name: str


Term = Union[Var, str]  # non-var terms are pre-rendered strings


@dataclass
class SelectQuery:
    variables: list[str]            # [] means SELECT *
    distinct: bool
    patterns: list[tuple[Term, Term, Term]]
    filters: list[tuple[str, str, str]]  # (var, op, raw value token)
    order_by: list[tuple[str, bool]]     # (var, descending)
    limit: Optional[int] = None
    prefixes: dict[str, str] = field(default_factory=dict)


_ESCAPES = {"\\": "\\\\", '"': '\\"', "\n": "\\n", "\r": "\\r", "\t": "\\t"}


def _render_literal(lex: str, lang: Optional[str], dtype: Optional[str]) -> str:
    for src, dst in _ESCAPES.items():
        lex = lex.replace(src, dst)
    out = f'"{lex}"'
    if lang:
        out += f"@{lang}"
    elif dtype:
        out += f"^^<{dtype}>"
    return out


_TOKEN = re.compile(r"""
    \s*(?:
      (?P<var>\?[A-Za-z_][A-Za-z0-9_]*)
    | (?P<iri><[^>]*>)
    | (?P<lit>"(?:[^"\\]|\\.)*"(?:@[A-Za-z0-9-]+|\^\^<[^>]*>|\^\^[A-Za-z_][\w-]*:[\w-]+)?)
    | (?P<num>[+-]?[0-9]+(?:\.[0-9]+)?)
    | (?P<pname>[A-Za-z_][\w-]*:[\w.-]*)
    | (?P<a>\ba\b)
    | (?P<punct>[;,.{}()])
    )""", re.VERBOSE)

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


def _tokenize(text: str) -> list[tuple[str, str]]:
    out, pos = [], 0
    while pos < len(text):
        if text[pos:].strip() == "":
            break
        m = _TOKEN.match(text, pos)
        if m is None:
            raise SparqlError(f"cannot tokenize at: {text[pos:pos + 30]!r}")
        pos = m.end()
        for kind, val in m.groupdict().items():
            if val is not None:
                out.append((kind, val))
                break
    return out


def _resolve_term(kind: str, val: str, prefixes: dict[str, str]) -> Term:
    if kind == "var":
        return Var(val[1:])
    if kind == "iri":
        return val  # already <...>
    if kind == "a":
        return f"<{RDF_TYPE}>"
    if kind == "pname":
        p, _, local = val.partition(":")
        if p not in prefixes:
            raise SparqlError(f"undefined prefix {p!r}")
        return f"<{prefixes[p]}{local}>"
    if kind == "num":
        return _render_literal(val, None, None)
    if kind == "lit":
        m = re.match(r'^"((?:[^"\\]|\\.)*)"(?:@([A-Za-z0-9-]+)'
                     r'|\^\^<([^>]*)>|\^\^([A-Za-z_][\w-]*:[\w-]+))?$', val)
        lex = m.group(1).replace('\\"', '"').replace("\\\\", "\\") \
               .replace("\\n", "\n").replace("\\r", "\r").replace("\\t", "\t")
        dtype = m.group(3)
        if m.group(4):
            p, _, local = m.group(4).partition(":")
            if p not in prefixes:
                raise SparqlError(f"undefined prefix {p!r}")
            dtype = prefixes[p] + local
        return _render_literal(lex, m.group(2), dtype)
    raise SparqlError(f"unexpected term {val!r}")


_UNSUPPORTED = re.compile(
    r"\b(OPTIONAL|UNION|SERVICE|GRAPH|MINUS|BIND|VALUES|GROUP\s+BY|HAVING|"
    r"CONSTRUCT|ASK|DESCRIBE|EXISTS)\b", re.IGNORECASE)


def parse_sparql(text: str) -> SelectQuery:
    text = re.sub(r"#[^\n]*", "", text)  # comments
    if _UNSUPPORTED.search(text):
        raise SparqlError(
            f"unsupported SPARQL feature: {_UNSUPPORTED.search(text).group(0)}")

    prefixes: dict[str, str] = {}
    for m in re.finditer(r"PREFIX\s+([A-Za-z_][\w-]*)?:\s*<([^>]*)>", text,
                         re.IGNORECASE):
        prefixes[m.group(1) or ""] = m.group(2)
    text = re.sub(r"PREFIX\s+[\w-]*:\s*<[^>]*>", "", text, flags=re.IGNORECASE)

    m = re.search(r"SELECT\s+(DISTINCT\s+)?(.*?)\s*WHERE\s*\{(.*)\}(.*)$",
                  text, re.IGNORECASE | re.DOTALL)
    if m is None:
        raise SparqlError("only SELECT ... WHERE { ... } queries supported")
    distinct = bool(m.group(1))
    proj_raw, body, tail = m.group(2), m.group(3), m.group(4)

    variables = [] if proj_raw.strip() == "*" else \
        [v[1:] for v in re.findall(r"\?[A-Za-z_][A-Za-z0-9_]*", proj_raw)]
    if proj_raw.strip() != "*" and not variables:
        raise SparqlError(f"bad projection {proj_raw!r}")

    # FILTER clauses out of the body
    filters: list[tuple[str, str, str]] = []
    def grab_filter(fm):
        inner = fm.group(1).strip()
        cm = re.match(r"^\?([A-Za-z_][A-Za-z0-9_]*)\s*"
                      r"(=|!=|<=|>=|<|>)\s*(.+)$", inner)
        if cm is None:
            raise SparqlError(f"unsupported FILTER {inner!r}")
        filters.append((cm.group(1), cm.group(2), cm.group(3).strip()))
        return " "
    body = re.sub(r"FILTER\s*\(([^()]*)\)", grab_filter, body,
                  flags=re.IGNORECASE)

    patterns: list[tuple[Term, Term, Term]] = []
    toks = _tokenize(body)
    i = 0
    while i < len(toks):
        kind, val = toks[i]
        if kind == "punct" and val == ".":
            i += 1
            continue
        subj = _resolve_term(kind, val, prefixes)
        i += 1
        while True:  # predicate lists (';')
            pk, pv = toks[i]
            pred = _resolve_term(pk, pv, prefixes)
            i += 1
            while True:  # object lists (',')
                ok_, ov = toks[i]
                obj = _resolve_term(ok_, ov, prefixes)
                patterns.append((subj, pred, obj))
                i += 1
                if i < len(toks) and toks[i] == ("punct", ","):
                    i += 1
                    continue
                break
            if i < len(toks) and toks[i] == ("punct", ";"):
                i += 1
                if i < len(toks) and toks[i] == ("punct", "."):
                    break  # trailing "; ."
                continue
            break

    order_by = []
    om = re.search(r"ORDER\s+BY\s+(.*?)(?:LIMIT|$)", tail,
                   re.IGNORECASE | re.DOTALL)
    if om:
        for dm in re.finditer(r"(DESC\s*\(\s*)?\?([A-Za-z_][A-Za-z0-9_]*)\)?",
                              om.group(1), re.IGNORECASE):
            order_by.append((dm.group(2), bool(dm.group(1))))
    lm = re.search(r"LIMIT\s+(\d+)", tail, re.IGNORECASE)
    limit = int(lm.group(1)) if lm else None

    if not patterns:
        raise SparqlError("empty basic graph pattern")
    return SelectQuery(variables=variables, distinct=distinct,
                       patterns=patterns, filters=filters,
                       order_by=order_by, limit=limit, prefixes=prefixes)


#: lexical form of a rendered term: IRIs lose <>, literals lose quotes
#: and @lang/^^dtype — the value an endpoint's JSON binding carries
def _lexical(col: F.Column) -> F.Column:
    return (F.when(col.startswith("<"),
                   F.regexp_extract(col, r"^<(.*)>$", 1))
            .when(col.startswith('"'),
                  F.regexp_extract(col, r'^"((?:[^"\\]|\\.)*)"', 1))
            .otherwise(col))


def _numeric(col: F.Column) -> F.Column:
    return _lexical(col).cast("double")


def sparql_select(quads: DataFrame, query: str,
                  raw_terms: bool = False) -> DataFrame:
    """Execute a SPARQL SELECT subset over a ``(subj, pred, obj[, graph])``
    DataFrame of rendered terms.  Returns one column per projected
    variable — plain lexical values by default (endpoint-binding
    style), rendered terms with ``raw_terms=True``."""
    q = parse_sparql(query)
    result: Optional[DataFrame] = None
    for (s, p, o) in q.patterns:
        df = quads
        positions = {"subj": s, "pred": p, "obj": o}
        bound: dict[str, str] = {}
        cols = []
        for pos, term in positions.items():
            if isinstance(term, Var):
                if term.name in bound:  # same var twice in one pattern
                    df = df.where(F.col(pos) == F.col(bound[term.name]))
                else:
                    bound[term.name] = pos
                    cols.append(F.col(pos).alias(term.name))
            else:
                df = df.where(F.col(pos) == F.lit(term))
        df = df.select(*cols) if cols else df.select(F.lit(1).alias("__one"))
        if result is None:
            result = df
        else:
            common = [c for c in result.columns if c in df.columns]
            result = result.join(df, on=common) if common \
                else result.crossJoin(df)
    assert result is not None

    for var, op, raw in q.filters:
        if var not in result.columns:
            raise SparqlError(f"FILTER references unbound variable ?{var}")
        c = F.col(var)
        if re.fullmatch(r"[+-]?[0-9]+(\.[0-9]+)?", raw):
            lhs, rhs = _numeric(c), F.lit(float(raw))
        else:
            toks = _tokenize(raw)
            if len(toks) != 1:
                raise SparqlError(f"unsupported FILTER value {raw!r}")
            term = _resolve_term(*toks[0], q.prefixes)
            lhs = c
            rhs = F.col(term.name) if isinstance(term, Var) else F.lit(term)
        ops = {"=": lhs == rhs, "!=": lhs != rhs, "<": lhs < rhs,
               "<=": lhs <= rhs, ">": lhs > rhs, ">=": lhs >= rhs}
        result = result.where(ops[op])

    out_vars = q.variables or [c for c in result.columns if c != "__one"]
    missing = [v for v in out_vars if v not in result.columns]
    if missing:
        raise SparqlError(f"projection references unbound variables {missing}")
    result = result.select(*out_vars)
    if not raw_terms:
        result = result.select(
            *[_lexical(F.col(v)).alias(v) for v in out_vars])
    if q.distinct:
        result = result.distinct()
    if q.order_by:
        result = result.orderBy(
            *[F.col(v).desc() if d else F.col(v).asc()
              for v, d in q.order_by])
    if q.limit is not None:
        result = result.limit(q.limit)
    return result
