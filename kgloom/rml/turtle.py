"""Minimal Turtle parser — just enough for RML/R2RML mapping documents.

The reference parses mappings with the sophia Turtle parser
(`/root/reference/rml-interpreter/src/extractors/io.rs:44-62`); rdflib is
not available in this environment, so this is a from-scratch
recursive-descent parser for the Turtle subset RML mappings use:

- ``@prefix`` / ``@base`` directives (and SPARQL-style PREFIX/BASE),
- IRIs ``<...>`` (resolved against @base when relative), prefixed names,
- the ``a`` keyword, ``;`` predicate lists, ``,`` object lists,
- anonymous blank nodes ``[ ... ]`` (nested) and labeled ``_:b`` nodes,
- RDF collections ``( ... )``,
- string literals (single/triple quoted) with ``\\``-escapes, ``@lang``
  tags and ``^^`` datatypes, plus bare numeric/boolean literals.

Output: a list of (subject, predicate, object) triples where each term is
a tagged tuple: ``('iri', iri)``, ``('bnode', label)``, or
``('literal', lexical, datatype_iri_or_None, lang_or_None)``.
"""

from __future__ import annotations

import re
from typing import Optional

RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
RDF_TYPE = ("iri", RDF + "type")
RDF_FIRST = ("iri", RDF + "first")
RDF_REST = ("iri", RDF + "rest")
RDF_NIL = ("iri", RDF + "nil")

Term = tuple  # tagged tuples as documented above


class TurtleParseError(Exception):
    pass


_TOKEN_RE = re.compile(
    r"""
      (?P<COMMENT>\#[^\n]*)
    | (?P<IRIREF><[^<>"{}|^`\\\x00-\x20]*>)
    | (?P<STRING3>\"\"\"(?:[^"\\]|\\.|\"(?!\"\"))*\"\"\"|'''(?:[^'\\]|\\.|'(?!''))*''')
    | (?P<STRING>\"(?:[^"\\\n]|\\.)*\"|'(?:[^'\\\n]|\\.)*')
    | (?P<PREFIX_DIRECTIVE>@prefix\b|@base\b|PREFIX\b|BASE\b)
    | (?P<LANGTAG>@[a-zA-Z]+(?:-[a-zA-Z0-9]+)*)
    | (?P<DOUBLE>[+-]?(?:\d+\.\d*[eE][+-]?\d+|\.?\d+[eE][+-]?\d+))
    | (?P<DECIMAL>[+-]?\d*\.\d+)
    | (?P<INTEGER>[+-]?\d+)
    | (?P<DTYPE>\^\^)
    | (?P<BNODE>_:[A-Za-z0-9_][A-Za-z0-9_.-]*)
    | (?P<PNAME>[A-Za-z0-9_][A-Za-z0-9_.-]*)?:(?:[A-Za-z0-9_:%]|[.-](?=[A-Za-z0-9_:%.-])|\\[-_~.!$&'()*+,;=/?\#@%])*
    | (?P<KEYWORD>\b(?:a|true|false)\b)
    | (?P<PUNCT>[;,.\[\]()])
    | (?P<WS>\s+)
    """,
    re.VERBOSE,
)

XSD = "http://www.w3.org/2001/XMLSchema#"

_ESCAPES = {
    "t": "\t", "b": "\b", "n": "\n", "r": "\r", "f": "\f",
    '"': '"', "'": "'", "\\": "\\",
}


def _unescape(s: str) -> str:
    out = []
    i = 0
    while i < len(s):
        c = s[i]
        if c == "\\" and i + 1 < len(s):
            n = s[i + 1]
            if n in _ESCAPES:
                out.append(_ESCAPES[n])
                i += 2
                continue
            if n == "u" and i + 6 <= len(s):
                out.append(chr(int(s[i + 2:i + 6], 16)))
                i += 6
                continue
            if n == "U" and i + 10 <= len(s):
                out.append(chr(int(s[i + 2:i + 10], 16)))
                i += 10
                continue
        out.append(c)
        i += 1
    return "".join(out)


_ABS_IRI_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.-]*:")


def is_absolute_iri(iri: str) -> bool:
    return bool(_ABS_IRI_RE.match(iri))


def resolve_iri(iri: str, base: Optional[str]) -> str:
    """Simple base resolution: absolute IRIs pass through, relative IRIs
    are appended to the base (sufficient for mapping documents, whose
    bases end in '/' or '#')."""
    if is_absolute_iri(iri) or not base:
        return iri
    if iri.startswith("#"):
        return base.split("#")[0] + iri
    return base + iri


class _Tokenizer:
    def __init__(self, text: str):
        self.tokens: list[tuple[str, str]] = []
        pos = 0
        while pos < len(text):
            m = _TOKEN_RE.match(text, pos)
            if not m or m.end() == pos:
                raise TurtleParseError(
                    f"unexpected character at offset {pos}: {text[pos:pos+30]!r}")
            kind = m.lastgroup
            if kind is None:  # PNAME alternative without named group
                kind = "PNAME_FULL"
            if kind not in ("WS", "COMMENT"):
                self.tokens.append((kind, m.group(0)))
            pos = m.end()
        self.i = 0

    def peek(self) -> Optional[tuple[str, str]]:
        return self.tokens[self.i] if self.i < len(self.tokens) else None

    def next(self) -> tuple[str, str]:
        tok = self.peek()
        if tok is None:
            raise TurtleParseError("unexpected end of input")
        self.i += 1
        return tok

    def expect(self, value: str) -> None:
        tok = self.next()
        if tok[1] != value:
            raise TurtleParseError(f"expected {value!r}, got {tok[1]!r}")


class _Parser:
    def __init__(self, text: str):
        self.tz = _Tokenizer(text)
        self.prefixes: dict[str, str] = {}
        self.base: Optional[str] = None
        self.triples: list[tuple[Term, Term, Term]] = []
        self._bnode_n = 0

    def fresh_bnode(self) -> Term:
        self._bnode_n += 1
        return ("bnode", f"__anon{self._bnode_n}")

    def parse(self) -> None:
        while self.tz.peek() is not None:
            kind, val = self.tz.peek()
            if kind == "PREFIX_DIRECTIVE":
                self._directive()
            else:
                self._triples_block()

    def _directive(self) -> None:
        _, val = self.tz.next()
        sparql_style = val in ("PREFIX", "BASE")
        if val in ("@prefix", "PREFIX"):
            _, pname = self.tz.next()
            if not pname.endswith(":"):
                raise TurtleParseError(f"bad prefix name {pname!r}")
            kind, iritok = self.tz.next()
            if kind != "IRIREF":
                raise TurtleParseError("prefix IRI expected")
            self.prefixes[pname[:-1]] = resolve_iri(iritok[1:-1], self.base)
        else:  # @base / BASE
            kind, iritok = self.tz.next()
            if kind != "IRIREF":
                raise TurtleParseError("base IRI expected")
            self.base = resolve_iri(iritok[1:-1], self.base)
        if not sparql_style:
            self.tz.expect(".")

    def _triples_block(self) -> None:
        subj = self._term(subject_position=True)
        self._predicate_object_list(subj)
        self.tz.expect(".")

    def _predicate_object_list(self, subj: Term) -> None:
        while True:
            pred = self._verb()
            self._object_list(subj, pred)
            tok = self.tz.peek()
            if tok and tok[1] == ";":
                self.tz.next()
                # allow trailing ';' before '.' or ']'
                nxt = self.tz.peek()
                if nxt and nxt[1] in (".", "]", ";"):
                    while self.tz.peek() and self.tz.peek()[1] == ";":
                        self.tz.next()
                    return
                continue
            return

    def _verb(self) -> Term:
        kind, val = self.tz.peek()
        if kind == "KEYWORD" and val == "a":
            self.tz.next()
            return RDF_TYPE
        return self._term()

    def _object_list(self, subj: Term, pred: Term) -> None:
        while True:
            obj = self._term()
            self.triples.append((subj, pred, obj))
            tok = self.tz.peek()
            if tok and tok[1] == ",":
                self.tz.next()
                continue
            return

    def _term(self, subject_position: bool = False) -> Term:
        kind, val = self.tz.next()
        if kind == "IRIREF":
            return ("iri", resolve_iri(_unescape(val[1:-1]), self.base))
        if kind in ("PNAME", "PNAME_FULL") or (kind is None and ":" in val):
            prefix, _, local = val.partition(":")
            if prefix not in self.prefixes:
                raise TurtleParseError(f"undefined prefix {prefix!r} in {val!r}")
            local = re.sub(r"\\(.)", r"\1", local)
            return ("iri", self.prefixes[prefix] + local)
        if kind == "BNODE":
            return ("bnode", val[2:])
        if kind == "PUNCT" and val == "[":
            node = self.fresh_bnode()
            if self.tz.peek() and self.tz.peek()[1] == "]":
                self.tz.next()
                return node
            self._predicate_object_list(node)
            self.tz.expect("]")
            return node
        if kind == "PUNCT" and val == "(":
            return self._collection()
        if kind in ("STRING", "STRING3"):
            q = 3 if kind == "STRING3" else 1
            lex = _unescape(val[q:-q])
            tok = self.tz.peek()
            if tok and tok[0] == "LANGTAG":
                self.tz.next()
                return ("literal", lex, None, tok[1][1:])
            if tok and tok[0] == "DTYPE":
                self.tz.next()
                dt = self._term()
                if dt[0] != "iri":
                    raise TurtleParseError("datatype must be an IRI")
                return ("literal", lex, dt[1], None)
            return ("literal", lex, None, None)
        if kind == "INTEGER":
            return ("literal", val, XSD + "integer", None)
        if kind == "DECIMAL":
            return ("literal", val, XSD + "decimal", None)
        if kind == "DOUBLE":
            return ("literal", val, XSD + "double", None)
        if kind == "KEYWORD" and val in ("true", "false"):
            return ("literal", val, XSD + "boolean", None)
        raise TurtleParseError(f"unexpected token {val!r}")

    def _collection(self) -> Term:
        items: list[Term] = []
        while True:
            tok = self.tz.peek()
            if tok is None:
                raise TurtleParseError("unterminated collection")
            if tok[1] == ")":
                self.tz.next()
                break
            items.append(self._term())
        if not items:
            return RDF_NIL
        head = self.fresh_bnode()
        cur = head
        for i, item in enumerate(items):
            self.triples.append((cur, RDF_FIRST, item))
            if i == len(items) - 1:
                self.triples.append((cur, RDF_REST, RDF_NIL))
            else:
                nxt = self.fresh_bnode()
                self.triples.append((cur, RDF_REST, nxt))
                cur = nxt
        return head


class Graph:
    """A tiny indexed triple store over parsed Turtle."""

    def __init__(self, triples: list[tuple[Term, Term, Term]],
                 base: Optional[str] = None,
                 prefixes: Optional[dict[str, str]] = None):
        self.triples = triples
        self.base = base
        self.prefixes = prefixes or {}
        self._spo: dict[Term, dict[str, list[Term]]] = {}
        for s, p, o in triples:
            self._spo.setdefault(s, {}).setdefault(p[1], []).append(o)

    def objects(self, subj: Term, pred_iri: str) -> list[Term]:
        return self._spo.get(subj, {}).get(pred_iri, [])

    def object(self, subj: Term, pred_iri: str) -> Optional[Term]:
        objs = self.objects(subj, pred_iri)
        return objs[0] if objs else None

    def subjects_with(self, pred_iri: str, obj: Optional[Term] = None) -> list[Term]:
        out = []
        for s, preds in self._spo.items():
            for o in preds.get(pred_iri, []):
                if obj is None or o == obj:
                    out.append(s)
                    break
        return out

    def predicates(self, subj: Term) -> list[str]:
        return list(self._spo.get(subj, {}).keys())


def parse_turtle(text: str) -> Graph:
    p = _Parser(text)
    p.parse()
    return Graph(p.triples, base=p.base, prefixes=p.prefixes)


def parse_turtle_file(path: str) -> Graph:
    with open(path, "r", encoding="utf-8") as f:
        return parse_turtle(f.read())
