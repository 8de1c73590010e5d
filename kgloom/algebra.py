"""Operator algebra IR — the 8-operator mapping algebra.

Parity target: the reference's ``operator`` crate
(`/root/reference/operator/src/lib.rs:20-29` — the full ``Operator``
enum: SourceOp, JoinOp, ProjectOp, ExtendOp, RenameOp, SerializerOp,
FragmentOp, TargetOp) and its scalar ``Function`` expression tree
(`operator/src/lib.rs:280-331`).  JSON (de)serialization follows the
reference's serde tagging (`operator/src/lib.rs:18-19`:
``#[serde(tag = "type")]`` → ``{"type": "SourceOp", "config": {...}}``)
so plans are diffable against reference-emitted plan JSON.

This file is pure IR — no Spark imports.  Execution binding lives in
``kgloom.exec``.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum
from typing import Any, Optional, Union


# ---------------------------------------------------------------------------
# Enums (operator/src/formats.rs:5-29, operator/src/lib.rs:139-154, 362-370)
# ---------------------------------------------------------------------------

class ReferenceFormulation(str, Enum):
    """operator/src/formats.rs:5-12 (default CSVRows, formats.rs:13-17)."""

    CSV_ROWS = "CSVRows"
    JSON_PATH = "JSONPath"
    XML_PATH = "XMLPath"
    XML_QUERY = "XMLQuery"
    SQL_QUERY = "SQLQuery"
    SPARQL = "SPARQL"
    # Spark-native extension: columnar table scans (parquet/iceberg).
    TABLE = "Table"


class DataFormat(str, Enum):
    """operator/src/formats.rs:20-29."""

    JSONLD = "JSONLD"
    JSON = "JSON"
    XML = "XML"
    CSV = "CSV"
    TTL = "TTL"
    NQUADS = "NQuads"
    NTRIPLES = "NTriples"
    SQL = "SQL"
    PARQUET = "Parquet"  # Spark-native extension


class IOType(str, Enum):
    """operator/src/lib.rs:362-370 (both Source and Target sides)."""

    STDOUT = "StdOut"
    FILE = "File"
    KAFKA = "Kafka"
    WEBSOCKET = "Websocket"
    MYSQL = "MySQL"
    POSTGRESQL = "PostgreSQL"
    SPARQL_ENDPOINT = "SPARQLEndpoint"
    # Spark-native extensions
    TABLE = "Table"        # managed table (iceberg when available, else parquet)
    DATAFRAME = "DataFrame"  # pre-bound DataFrame injected by the caller


class JoinType(str, Enum):
    """operator/src/lib.rs:139-145."""

    LEFT = "LeftJoin"
    RIGHT = "RightJoin"
    INNER = "InnerJoin"
    CROSS = "CrossJoin"
    NATURAL = "NaturalJoin"


class PredicateType(str, Enum):
    """operator/src/lib.rs:148-154 (theta-join comparators)."""

    GT = ">"
    GTE = ">="
    LT = "<"
    LTE = "<="
    EQ = "="


# ---------------------------------------------------------------------------
# Source iterator model (operator/src/lib.rs:85-113)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class IterField:
    """operator/src/lib.rs:85-90 — recursive nested-record field."""

    alias: str
    reference: str
    reference_formulation: ReferenceFormulation = ReferenceFormulation.CSV_ROWS
    inner_fields: tuple["IterField", ...] = ()

    def to_json(self) -> dict:
        return {
            "alias": self.alias,
            "reference": self.reference,
            "reference_formulation": self.reference_formulation.value,
            "fields": [f.to_json() for f in self.inner_fields],
        }


@dataclass(frozen=True)
class SourceIterator:
    """operator/src/lib.rs:93-98."""

    reference: Optional[str] = None
    reference_formulation: ReferenceFormulation = ReferenceFormulation.CSV_ROWS
    fields: tuple[IterField, ...] = ()
    alias: Optional[str] = None

    def to_json(self) -> dict:
        return {
            "reference": self.reference,
            "reference_formulation": self.reference_formulation.value,
            "fields": [f.to_json() for f in self.fields],
            "alias": self.alias,
        }


# ---------------------------------------------------------------------------
# Function tree (operator/src/lib.rs:280-331) — ExtendOp's scalar expressions
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class Function:
    """One node of the recursive scalar-expression tree.

    Variants and their payloads mirror operator/src/lib.rs:280-331:

    - Reference{value}                    lib.rs:286-288
    - Constant{value}                     lib.rs:289-291
    - TemplateString{value}               lib.rs:292-294
    - Concatenate{left,separator,right}   lib.rs:281-285
    - Replace{replace_map, inner}         lib.rs:296-299
    - TemplateFunctionValue{template, variable_function_pairs} lib.rs:301-304
    - UriEncode{inner}                    lib.rs:306-308
    - Iri{inner}                          lib.rs:309-311
    - Literal{inner, dtype, langtype}     lib.rs:312-316
    - BlankNode{inner}                    lib.rs:317-319
    - Upper{inner} / Lower{inner}         lib.rs:320-325
    - FnO{fno_identifier, param_func_pairs} lib.rs:326-330

    Beyond-reference variant:

    - Conditional{inner, if} — term generated only when the boolean
      condition Function (an FnO call, e.g. a ShExML
      ``expr IF helper.fn(args)``) holds; null otherwise, which
      suppresses the triple.  Beyond the reference, whose ShExML
      translator skips conditionals (README "Test cases").
    - AutoIncrement{start, end, step, prefix, suffix} — executable
      ShExML AUTOINCREMENT (the reference parses it into its ShExML IR,
      shexml-interpreter/src/parser/type.rs:285-292, but its translator
      never emits a plan operator for it).  Evaluates to
      ``prefix + (start + step·row_idx) + suffix`` over the consecutive
      0-based source row index in document order; values past ``end``
      (when set) are null, suppressing the term.
    """

    kind: str
    value: Optional[str] = None
    inner: Optional["Function"] = None
    left: Optional["Function"] = None
    right: Optional["Function"] = None
    separator: Optional[str] = None
    dtype: Optional["Function"] = None
    langtype: Optional["Function"] = None
    replace_map: tuple[tuple[str, tuple[str, ...]], ...] = ()
    pairs: tuple[tuple[str, "Function"], ...] = ()
    # Iri-only: base IRI for relative resolution (RMLTC0019a/0020a golden
    # semantics — relative results are resolved against the document @base).
    base: Optional[str] = None

    # -- constructors ------------------------------------------------------
    @staticmethod
    def reference(value: str) -> "Function":
        return Function(kind="Reference", value=value)

    @staticmethod
    def constant(value: str) -> "Function":
        return Function(kind="Constant", value=value)

    @staticmethod
    def template(value: str) -> "Function":
        return Function(kind="TemplateString", value=value)

    @staticmethod
    def concatenate(left: "Function", separator: str, right: "Function") -> "Function":
        return Function(kind="Concatenate", left=left, right=right, separator=separator)

    @staticmethod
    def replace(replace_map: dict[str, set[str]], inner: "Function") -> "Function":
        rm = tuple(sorted((k, tuple(sorted(v))) for k, v in replace_map.items()))
        return Function(kind="Replace", replace_map=rm, inner=inner)

    @staticmethod
    def template_function(template: str, pairs: dict[str, "Function"]) -> "Function":
        return Function(kind="TemplateFunctionValue", value=template,
                        pairs=tuple(sorted(pairs.items())))

    @staticmethod
    def uri_encode(inner: "Function") -> "Function":
        return Function(kind="UriEncode", inner=inner)

    @staticmethod
    def iri(inner: "Function", base: Optional[str] = None) -> "Function":
        return Function(kind="Iri", inner=inner, base=base)

    @staticmethod
    def literal(inner: "Function", dtype: Optional["Function"] = None,
                langtype: Optional["Function"] = None) -> "Function":
        return Function(kind="Literal", inner=inner, dtype=dtype, langtype=langtype)

    @staticmethod
    def blank_node(inner: "Function") -> "Function":
        return Function(kind="BlankNode", inner=inner)

    @staticmethod
    def upper(inner: "Function") -> "Function":
        return Function(kind="Upper", inner=inner)

    @staticmethod
    def lower(inner: "Function") -> "Function":
        return Function(kind="Lower", inner=inner)

    @staticmethod
    def fno(fno_identifier: str, params: dict[str, "Function"]) -> "Function":
        return Function(kind="FnO", value=fno_identifier,
                        pairs=tuple(sorted(params.items())))

    @staticmethod
    def conditional(inner: "Function", condition: "Function") -> "Function":
        """Term generated only when ``condition`` (boolean-valued, e.g.
        an FnO call) holds; null — i.e. triple suppressed — otherwise.
        The condition rides in ``pairs`` so plan-JSON round-trips with
        no new serializer cases (see class docstring)."""
        return Function(kind="Conditional", inner=inner,
                        pairs=(("if", condition),))

    @staticmethod
    def auto_increment(start: int = 0, end: Optional[int] = None,
                       step: int = 1, prefix: str = "",
                       suffix: str = "") -> "Function":
        """Executable ShExML AUTOINCREMENT (see class docstring).

        Parameters ride in ``pairs`` as Constant nodes so the plan-JSON
        round trip needs no new serializer cases."""
        params = {"start": Function.constant(str(int(start))),
                  "step": Function.constant(str(int(step))),
                  "prefix": Function.constant(prefix),
                  "suffix": Function.constant(suffix)}
        if end is not None:
            params["end"] = Function.constant(str(int(end)))
        return Function(kind="AutoIncrement",
                        pairs=tuple(sorted(params.items())))

    # -- analysis ----------------------------------------------------------
    def contains_kind(self, kind: str) -> bool:
        """True when this tree holds a node of ``kind`` anywhere (used by
        the binder to detect AutoIncrement extends needing a row index)."""
        if self.kind == kind:
            return True
        for child in (self.inner, self.left, self.right,
                      self.dtype, self.langtype):
            if child is not None and child.contains_kind(kind):
                return True
        return any(f.contains_kind(kind) for _, f in self.pairs)

    def references(self) -> set[str]:
        """All attribute names this expression reads (for projection pushdown)."""
        out: set[str] = set()
        if self.kind == "AutoIncrement":
            return out  # reads the synthetic row index only, no source attrs
        if self.kind == "Reference":
            out.add(self.value)
        elif self.kind == "TemplateString":
            out |= set(template_attributes(self.value))
        for child in (self.inner, self.left, self.right, self.dtype, self.langtype):
            if child is not None:
                out |= child.references()
        for _, f in self.pairs:
            out |= f.references()
        return out

    def to_json(self) -> dict:
        d: dict[str, Any] = {"type": self.kind}
        if self.value is not None:
            d["value"] = self.value
        if self.separator is not None:
            d["separator"] = self.separator
        for name, child in (("inner_function", self.inner), ("left_value", self.left),
                            ("right_value", self.right), ("dtype_function", self.dtype),
                            ("langtype_function", self.langtype)):
            if child is not None:
                d[name] = child.to_json()
        if self.replace_map:
            d["replace_map"] = {k: sorted(v) for k, v in self.replace_map}
        if self.pairs:
            d["pairs"] = [(k, f.to_json()) for k, f in self.pairs]
        if self.base is not None:
            d["base"] = self.base
        return d


_TEMPLATE_RE = None


def template_attributes(template: str) -> list[str]:
    r"""Extract ``{attr}`` names from an RML template.

    Mirrors the reference regex ``\{([^\{\}]+)\}`` with ``\{``/``\}``
    escape handling (rml-interpreter/src/rml_model/term_map.rs:13-30).
    """
    import re
    global _TEMPLATE_RE
    if _TEMPLATE_RE is None:
        _TEMPLATE_RE = re.compile(r"(?<!\\)\{([^{}]+)\}")
    cleaned = template.replace(r"\{", "\x00").replace(r"\}", "\x01")
    return [m.group(1) for m in _TEMPLATE_RE.finditer(cleaned)]


def template_split(template: str) -> list[tuple[str, str]]:
    """Split a template into [(kind, text)] parts, kind ∈ {'lit','attr'}.

    Escaped ``\\{``/``\\}`` become literal braces.
    """
    import re
    cleaned = template.replace(r"\{", "\x00").replace(r"\}", "\x01")
    parts: list[tuple[str, str]] = []
    pos = 0
    for m in re.finditer(r"\{([^{}]+)\}", cleaned):
        if m.start() > pos:
            parts.append(("lit", cleaned[pos:m.start()]))
        parts.append(("attr", m.group(1)))
        pos = m.end()
    if pos < len(cleaned):
        parts.append(("lit", cleaned[pos:]))
    return [(k, t.replace("\x00", "{").replace("\x01", "}")) for k, t in parts]


# ---------------------------------------------------------------------------
# The 8 operators (operator/src/lib.rs:20-29)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class SourceOp:
    """operator/src/lib.rs:108-134."""

    config: tuple[tuple[str, str], ...]  # sorted key/value config pairs
    source_type: IOType = IOType.FILE
    root_iterator: SourceIterator = field(default_factory=SourceIterator)

    @staticmethod
    def make(config: dict[str, str], source_type: IOType = IOType.FILE,
             root_iterator: Optional[SourceIterator] = None) -> "SourceOp":
        return SourceOp(config=tuple(sorted(config.items())),
                        source_type=source_type,
                        root_iterator=root_iterator or SourceIterator())

    @property
    def config_dict(self) -> dict[str, str]:
        return dict(self.config)

    def to_json(self) -> dict:
        return {"type": "SourceOp",
                "config": {"config": self.config_dict,
                           "source_type": self.source_type.value,
                           "root_iterator": self.root_iterator.to_json()}}


@dataclass(frozen=True)
class ProjectOp:
    """operator/src/lib.rs:198-219 — keep only these attributes."""

    projection_attributes: frozenset[str]

    def to_json(self) -> dict:
        return {"type": "ProjectOp",
                "config": {"projection_attributes":
                           sorted(self.projection_attributes)}}


@dataclass(frozen=True)
class RenameOp:
    """operator/src/lib.rs:222-244."""

    rename_pairs: tuple[tuple[str, str], ...]

    @staticmethod
    def make(pairs: dict[str, str]) -> "RenameOp":
        return RenameOp(rename_pairs=tuple(sorted(pairs.items())))

    def to_json(self) -> dict:
        return {"type": "RenameOp",
                "config": {"rename_pairs": dict(self.rename_pairs)}}


@dataclass(frozen=True)
class ExtendOp:
    """operator/src/lib.rs:247-331 — compute new columns from Functions."""

    extend_pairs: tuple[tuple[str, Function], ...]

    @staticmethod
    def make(pairs: dict[str, Function]) -> "ExtendOp":
        return ExtendOp(extend_pairs=tuple(sorted(pairs.items())))

    @property
    def pairs_dict(self) -> dict[str, Function]:
        return dict(self.extend_pairs)

    def extend_with(self, other: "ExtendOp") -> "ExtendOp":
        """Merge extend maps (operator/src/lib.rs:252-263 Extend::extend_with)."""
        merged = self.pairs_dict
        merged.update(other.pairs_dict)
        return ExtendOp.make(merged)

    def to_json(self) -> dict:
        return {"type": "ExtendOp",
                "config": {"extend_pairs":
                           {k: f.to_json() for k, f in self.extend_pairs}}}


@dataclass(frozen=True)
class JoinOp:
    """operator/src/lib.rs:138-195."""

    left_right_attr_pairs: tuple[tuple[str, str], ...]
    join_type: JoinType = JoinType.INNER
    predicate_type: PredicateType = PredicateType.EQ
    join_alias: str = ""

    def to_json(self) -> dict:
        return {"type": "JoinOp",
                "config": {"left_right_attr_pairs":
                           [list(p) for p in self.left_right_attr_pairs],
                           "join_type": self.join_type.value,
                           "predicate_type": self.predicate_type.value,
                           "join_alias": self.join_alias}}


@dataclass(frozen=True)
class FragmentOp:
    """operator/src/lib.rs:407-421 — split a stream into named fragments."""

    from_fragment: str
    to_fragments: tuple[str, ...]

    def to_json(self) -> dict:
        return {"type": "FragmentOp",
                "config": {"from": self.from_fragment,
                           "to": list(self.to_fragments)}}


@dataclass(frozen=True)
class SerializerOp:
    """operator/src/lib.rs:336-358 — instantiate an N-Quads template of
    variable-BGPs per row (template lines like ``?tm0_sm ?tm0_p0_0 ?tm0_o0_0 .``,
    see translator/src/rmlalgebra/operators/serializer/util.rs:7-64)."""

    template: str
    format: DataFormat = DataFormat.NQUADS
    options: tuple[tuple[str, str], ...] = ()

    def to_json(self) -> dict:
        return {"type": "SerializerOp",
                "config": {"template": self.template,
                           "options": dict(self.options) or None,
                           "format": self.format.value}}


@dataclass(frozen=True)
class TargetOp:
    """operator/src/lib.rs:379-405."""

    configuration: tuple[tuple[str, str], ...]
    target_type: IOType = IOType.STDOUT
    data_format: DataFormat = DataFormat.NQUADS

    @staticmethod
    def make(configuration: dict[str, str], target_type: IOType = IOType.STDOUT,
             data_format: DataFormat = DataFormat.NQUADS) -> "TargetOp":
        return TargetOp(configuration=tuple(sorted(configuration.items())),
                        target_type=target_type, data_format=data_format)

    @property
    def config_dict(self) -> dict[str, str]:
        return dict(self.configuration)

    def to_json(self) -> dict:
        return {"type": "TargetOp",
                "config": {"configuration": self.config_dict,
                           "target_type": self.target_type.value,
                           "data_format": self.data_format.value}}


Operator = Union[SourceOp, ProjectOp, RenameOp, ExtendOp, JoinOp,
                 FragmentOp, SerializerOp, TargetOp]

#: Operators that Plan.apply() rejects (plangenerator/src/plan.rs:249-257).
NON_APPLY_OPERATORS = (SourceOp, FragmentOp, TargetOp, SerializerOp)


# ---------------------------------------------------------------------------
# JSON deserialization — the reverse of every to_json above.  The
# reference derives serde Serialize AND Deserialize (serde tag
# operator/src/lib.rs:18-19), so plans are data in both directions; this
# closes the round trip: a plan JSON emitted by the CLI (or by the
# reference translator with compatible config) binds and executes.
# ---------------------------------------------------------------------------

def function_from_json(d: dict) -> Function:
    children = {name: function_from_json(d[name])
                for name in ("inner_function", "left_value", "right_value",
                             "dtype_function", "langtype_function")
                if d.get(name) is not None}
    return Function(
        kind=d["type"],
        value=d.get("value"),
        separator=d.get("separator"),
        inner=children.get("inner_function"),
        left=children.get("left_value"),
        right=children.get("right_value"),
        dtype=children.get("dtype_function"),
        langtype=children.get("langtype_function"),
        replace_map=tuple(sorted(
            (k, tuple(sorted(v)))
            for k, v in (d.get("replace_map") or {}).items())),
        pairs=tuple((k, function_from_json(f))
                    for k, f in (d.get("pairs") or [])),
        base=d.get("base"))


def _iter_field_from_json(d: dict) -> IterField:
    return IterField(
        alias=d["alias"], reference=d["reference"],
        reference_formulation=ReferenceFormulation(
            d.get("reference_formulation", "CSVRows")),
        inner_fields=tuple(_iter_field_from_json(f)
                           for f in d.get("fields", [])))


def _iterator_from_json(d: dict) -> SourceIterator:
    return SourceIterator(
        reference=d.get("reference"),
        reference_formulation=ReferenceFormulation(
            d.get("reference_formulation", "CSVRows")),
        fields=tuple(_iter_field_from_json(f) for f in d.get("fields", [])),
        alias=d.get("alias"))


def operator_from_json(d: dict) -> Operator:
    t, cfg = d["type"], d.get("config", {})
    if t == "SourceOp":
        return SourceOp.make(cfg.get("config", {}),
                             IOType(cfg.get("source_type", "File")),
                             _iterator_from_json(cfg.get("root_iterator", {})))
    if t == "ProjectOp":
        return ProjectOp(projection_attributes=frozenset(
            cfg.get("projection_attributes", [])))
    if t == "RenameOp":
        return RenameOp.make(cfg.get("rename_pairs", {}))
    if t == "ExtendOp":
        return ExtendOp.make({k: function_from_json(f)
                              for k, f in cfg.get("extend_pairs", {}).items()})
    if t == "JoinOp":
        return JoinOp(
            left_right_attr_pairs=tuple(
                tuple(p) for p in cfg.get("left_right_attr_pairs", [])),
            join_type=JoinType(cfg.get("join_type", "InnerJoin")),
            predicate_type=PredicateType(cfg.get("predicate_type", "=")),
            join_alias=cfg.get("join_alias", ""))
    if t == "FragmentOp":
        return FragmentOp(from_fragment=cfg.get("from", "default"),
                          to_fragments=tuple(cfg.get("to", [])))
    if t == "SerializerOp":
        return SerializerOp(template=cfg.get("template", ""),
                            format=DataFormat(cfg.get("format", "NQuads")),
                            options=tuple(sorted(
                                (cfg.get("options") or {}).items())))
    if t == "TargetOp":
        return TargetOp.make(cfg.get("configuration", {}),
                             IOType(cfg.get("target_type", "StdOut")),
                             DataFormat(cfg.get("data_format", "NQuads")))
    raise ValueError(f"unknown operator type {t!r}")
