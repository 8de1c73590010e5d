"""Function-tree → pyspark Column compiler.

Executes the reference's scalar ``Function`` surface
(`/root/reference/operator/src/lib.rs:280-331`) as Catalyst expressions.
Everything stays JVM-side (whole-stage codegen) except RFC-3986
percent-encoding, which is an Arrow-vectorized pandas UDF wrapping
``urllib.parse.quote(s, safe='')`` — exactly the Rust ``urlencoding``
crate the reference depends on (`/root/reference/Cargo.toml:44`:
encode everything outside ``[A-Za-z0-9_.~-]``).

Golden-corpus semantics implemented here:

- TemplateString: any null substitution value ⇒ null term (Spark
  ``concat`` null-propagation gives this for free);
- UriEncode over a TemplateString encodes the *substituted values only*,
  never the template's literal text (RMLTC0005a: the ``;`` in
  ``http://example.com/{fname};{lname}`` survives unencoded);
- Iri: relative results are resolved against the document ``@base``
  *after* encoding (RMLTC0020a: ``http%3A%2F%2F...`` is relative ⇒ base
  is prepended); reference-valued IRIs are not encoded (RMLTC0019a);
- Literal: N-Triples string escaping + optional ``@lang`` / ``^^<dtype>``
  (serializer/util.rs:31-37 — lang wins over dtype, never both).
"""

from __future__ import annotations

from typing import Callable, Optional

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..algebra import Function, template_split

_ABS_IRI_PATTERN = "^[A-Za-z][A-Za-z0-9+.-]*:"
_INVALID_IRI_CHARS = "[\\x00-\\x20<>\"{}|^`\\\\]"

#: Synthetic 0-based document-order row index the binder materializes on
#: a source whenever an ExtendOp function tree contains an AutoIncrement
#: node (ShExML AUTOINCREMENT — algebra.Function docstring).
AUTOINC_IDX = "__autoinc_idx__"


# --- RFC-3986 percent-encoding ------------------------------------------
#
# Two implementations, bit-identical on all inputs:
#
# 1. Catalyst (default, JVM whole-stage path): Spark's ``url_encode``
#    (Java URLEncoder, application/x-www-form-urlencoded) differs from
#    RFC-3986 ``quote(s, safe='')`` in exactly three tokens — space→'+'
#    (must be %20), '*' kept (must be %2A), '~'→%7E (must stay '~') —
#    fixed up with three replaces.  No Python worker in the hot path.
# 2. Arrow pandas UDF wrapping ``urllib.parse.quote`` — kept for parity
#    testing and as the documented fallback (matches the Rust
#    ``urlencoding`` crate the reference depends on, Cargo.toml:44).

_URI_ENCODE_UDF = None
USE_ARROW_URI_ENCODE = False


def _make_uri_encode_udf():
    from pyspark.sql.types import StringType

    def _encode(s: pd.Series) -> pd.Series:
        from urllib.parse import quote
        return s.map(lambda v: quote(v, safe="") if v is not None else None)

    return pandas_udf(_encode, StringType())


def uri_encode_arrow(col: Column) -> Column:
    global _URI_ENCODE_UDF
    if _URI_ENCODE_UDF is None:
        _URI_ENCODE_UDF = _make_uri_encode_udf()
    return _URI_ENCODE_UDF(col.cast("string"))


def uri_encode_catalyst(col: Column) -> Column:
    c = F.url_encode(col.cast("string"))
    c = F.replace(c, F.lit("+"), F.lit("%20"))
    c = F.replace(c, F.lit("*"), F.lit("%2A"))
    c = F.replace(c, F.lit("%7E"), F.lit("~"))
    return c


def uri_encode(col: Column) -> Column:
    if USE_ARROW_URI_ENCODE:
        return uri_encode_arrow(col)
    return uri_encode_catalyst(col)


# --- N-Triples literal escaping (pure Catalyst, codegen'd) ---------------

def escape_literal(col: Column) -> Column:
    c = F.replace(col.cast("string"), F.lit("\\"), F.lit("\\\\"))
    c = F.replace(c, F.lit('"'), F.lit('\\"'))
    c = F.replace(c, F.lit("\n"), F.lit("\\n"))
    c = F.replace(c, F.lit("\r"), F.lit("\\r"))
    c = F.replace(c, F.lit("\t"), F.lit("\\t"))
    return c


class FunctionCompileError(Exception):
    pass


#: FnO registry — IRI → callable(params: dict[str, Column]) -> Column.
#: GREL basics registered; extend via register_fno().
FNO_REGISTRY: dict[str, Callable[[dict[str, Column]], Column]] = {}


def register_fno(iri: str, fn: Callable[[dict[str, Column]], Column]) -> None:
    FNO_REGISTRY[iri] = fn


def _grel_param(params: dict[str, Column], *names: str) -> Column:
    for n in names:
        for k, v in params.items():
            if k.endswith(n):
                return v
    if params:
        return next(iter(params.values()))
    raise FunctionCompileError(f"FnO call missing parameter {names}")


def _grel_value(p: dict[str, Column]) -> Column:
    """The principal value parameter (grel:valueParameter /
    grel:param_string_s / ...); falls back to the first parameter for
    single-argument functions."""
    return _grel_param(p, "valueParameter", "valueParam", "string_s", "_s")


_GREL = "http://users.ugent.be/~bjdmeest/function/grel.ttl#"

#: GREL registry — every implementation is a pure Column expression
#: (whole-stage codegen, no Python workers).  Boolean-valued functions
#: (contains/startsWith/endsWith) render as "true"/"false" when used
#: as literal values, matching GREL's boolean→string coercion.
for _iri, _impl in {
    _GREL + "toUpperCase":
        lambda p: F.upper(_grel_value(p)),
    _GREL + "toLowerCase":
        lambda p: F.lower(_grel_value(p)),
    _GREL + "trim":
        lambda p: F.trim(_grel_value(p)),
    _GREL + "toTitleCase":
        lambda p: F.initcap(_grel_value(p)),
    _GREL + "string_length":
        lambda p: F.length(_grel_value(p)),
    _GREL + "string_contains":
        lambda p: _grel_value(p).contains(
            _grel_param(p, "string_sub", "sub")),
    _GREL + "string_startsWith":
        lambda p: _grel_value(p).startswith(
            _grel_param(p, "string_sub", "sub")),
    _GREL + "string_endsWith":
        lambda p: _grel_value(p).endswith(
            _grel_param(p, "string_sub", "sub")),
    # literal (non-regex) find/replace — GREL's replace(value, find,
    # replace) on plain strings
    _GREL + "string_replace":
        lambda p: F.replace(
            _grel_value(p).cast("string"),
            _grel_param(p, "string_find", "find").cast("string"),
            _grel_param(p, "string_replace", "replace").cast("string")),
    _GREL + "string_split":
        lambda p: F.split(
            _grel_value(p).cast("string"),
            # literal separator: regex metacharacters are escaped so
            # split("a.b", ".") splits on the dot, not on any-char
            F.regexp_replace(
                _grel_param(p, "string_sep", "sep").cast("string"),
                F.lit(r"([.*+?^${}()\[\]\\|])"), F.lit(r"\\$1"))),
    _GREL + "string_md5":
        lambda p: F.md5(_grel_value(p).cast("string")),
    _GREL + "string_sha1":
        lambda p: F.sha1(_grel_value(p).cast("string")),
    _GREL + "toNumber":
        lambda p: _grel_value(p).cast("double"),
    _GREL + "math_floor":
        lambda p: F.floor(_grel_value(p).cast("double")),
    _GREL + "math_ceil":
        lambda p: F.ceil(_grel_value(p).cast("double")),
    _GREL + "math_round":
        lambda p: F.round(_grel_value(p).cast("double"), 0).cast("long"),
    _GREL + "math_abs":
        lambda p: F.abs(_grel_value(p).cast("double")),
    _GREL + "math_max":
        lambda p: F.greatest(*[c.cast("double") for c in p.values()]),
    _GREL + "math_min":
        lambda p: F.least(*[c.cast("double") for c in p.values()]),
}.items():
    register_fno(_iri, _impl)


def compile_function(fn: Function, encode_values: bool = False) -> Column:
    """Compile one Function node to a Column producing the *rendered*
    RDF term lexical form (``<iri>`` / ``"literal"@lang`` / ``_:label``)
    for term-kind nodes, or the raw string for inner value nodes.

    ``encode_values`` is set when compiling under a UriEncode wrapper —
    for templates it encodes substituted values only.
    """
    k = fn.kind

    if k == "Reference":
        col = F.col("`" + fn.value.replace("`", "``") + "`")
        return uri_encode(col) if encode_values else col

    if k == "Constant":
        return uri_encode(F.lit(fn.value)) if encode_values else F.lit(fn.value)

    if k == "TemplateString":
        parts = template_split(fn.value)
        cols: list[Column] = []
        for kind, text in parts:
            if kind == "lit":
                cols.append(F.lit(text))
            else:
                c = F.col("`" + text.replace("`", "``") + "`")
                cols.append(uri_encode(c) if encode_values else c)
        if not cols:
            return F.lit("")
        # concat propagates null: any null substitution ⇒ null term
        return F.concat(*cols) if len(cols) > 1 else cols[0]

    if k == "Concatenate":
        return F.concat(compile_function(fn.left, encode_values),
                        F.lit(fn.separator or ""),
                        compile_function(fn.right, encode_values))

    if k == "Replace":
        inner = compile_function(fn.inner)
        out: Optional[Column] = None
        for key, values in fn.replace_map:
            cond = inner.isin(*values) if values else F.lit(False)
            out = F.when(cond, F.lit(key)) if out is None \
                else out.when(cond, F.lit(key))
        return inner if out is None else out.otherwise(inner)

    if k == "TemplateFunctionValue":
        pair_map = dict(fn.pairs)
        parts = template_split(fn.value or "")
        cols = []
        for kind, text in parts:
            if kind == "lit":
                cols.append(F.lit(text))
            elif text in pair_map:
                sub = compile_function(pair_map[text])
                cols.append(uri_encode(sub) if encode_values else sub)
            else:
                raise FunctionCompileError(
                    f"template variable {text!r} has no bound function")
        return F.concat(*cols) if len(cols) > 1 else (cols[0] if cols else F.lit(""))

    if k == "UriEncode":
        return compile_function(fn.inner, encode_values=True)

    if k == "Iri":
        value = compile_function(fn.inner, encode_values).cast("string")
        if fn.base:
            value = F.when(value.rlike(_ABS_IRI_PATTERN), value) \
                     .otherwise(F.concat(F.lit(fn.base), value))
        # IRI validity: values containing chars outlawed in IRIs (space,
        # control chars, <>"{}|^`\) yield NO term — golden RMLTC0019b /
        # 0020b drop the "Juan Daniel" / "Emily Smith" rows entirely.
        value = F.when(value.rlike(_INVALID_IRI_CHARS), F.lit(None)) \
                 .otherwise(value)
        return F.concat(F.lit("<"), value, F.lit(">"))

    if k == "Literal":
        body = F.concat(F.lit('"'),
                        escape_literal(compile_function(fn.inner)),
                        F.lit('"'))
        # lang wins; never both (serializer/util.rs:31-37)
        if fn.langtype is not None:
            return F.concat(body, F.lit("@"), compile_function(fn.langtype))
        if fn.dtype is not None:
            return F.concat(body, F.lit("^^<"),
                            compile_function(fn.dtype), F.lit(">"))
        return body

    if k == "BlankNode":
        return F.concat(F.lit("_:"), compile_function(fn.inner))

    if k == "Upper":
        return F.upper(compile_function(fn.inner, encode_values))

    if k == "Lower":
        return F.lower(compile_function(fn.inner, encode_values))

    if k == "Conditional":
        # inner when the condition holds, else null (triple suppressed)
        cond = compile_function(dict(fn.pairs)["if"]).cast("boolean")
        return F.when(cond, compile_function(fn.inner, encode_values))

    if k == "AutoIncrement":
        # prefix + (start + step·row_idx) + suffix; past `end` ⇒ null
        # (suppressing the term).  Pure Catalyst arithmetic over the
        # binder-provided AUTOINC_IDX column.
        params = {name: (c.value or "") for name, c in fn.pairs}
        start = int(params.get("start", "0") or 0)
        step = int(params.get("step", "1") or 1)
        val = F.lit(start) + F.lit(step) * F.col(AUTOINC_IDX).cast("long")
        if "end" in params:
            val = F.when(val <= int(params["end"]), val)
        out = F.concat(F.lit(params.get("prefix", "")),
                       val.cast("string"),
                       F.lit(params.get("suffix", "")))
        return uri_encode(out) if encode_values else out

    if k == "FnO":
        impl = FNO_REGISTRY.get(fn.value)
        if impl is None:
            raise FunctionCompileError(
                f"no FnO implementation registered for {fn.value!r}")
        params = {name: compile_function(f) for name, f in fn.pairs}
        return impl(params)

    raise FunctionCompileError(f"unknown Function kind {k!r}")
