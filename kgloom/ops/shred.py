"""Semi-structured (JSON) schema induction and typed shredding.

A 100-TB event/transcript lake always carries a JSON blob column
(tool arguments, client props); before it can join the relational
world it needs (1) a type census — which paths exist, with which JSON
types, how often — and (2) extraction into typed columns.  Both are
implemented JVM-side on Spark 4's VariantType: ``from_json(col,
"map<string, variant>")`` preserves true JSON types (a JSON string
``"69"`` stays a string — a plain string-map parse cannot tell it
from the number 69) and ``schema_of_variant`` reports them per value.

Types are normalized to the JSON vocabulary ``integer / number /
string / boolean / null / object / array`` — the same census DuckDB's
``json_type`` yields, which is what makes the induction
oracle-checkable.

Scale shape: induction is one parse + one explode + one grouped
count; shredding is a per-row ``variant_get`` projection — no
Python, no sampling, no driver-side schema merge.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Spark variant schema string prefix → JSON type vocabulary
_TYPE_MAP = [
    ("BIGINT", "integer"),
    ("DECIMAL", "number"),
    ("DOUBLE", "number"),
    ("FLOAT", "number"),
    ("STRING", "string"),
    ("BOOLEAN", "boolean"),
    ("VOID", "null"),
    ("OBJECT", "object"),
    ("ARRAY", "array"),
]


def _json_type(schema_col: Column) -> Column:
    out = F.lit("other")
    for prefix, name in _TYPE_MAP:
        out = F.when(schema_col.startswith(prefix), F.lit(name)) \
               .otherwise(out)
    return out


def induce_json_schema(df: DataFrame, col: str) -> DataFrame:
    """Top-level type census of a JSON object column: ``(path,
    json_type, n, frac)`` — one row per (key, observed JSON type),
    ``frac`` the share of parseable rows carrying that (key, type).

    Rows that are not JSON objects (malformed, scalars, arrays) parse
    to null maps and drop out of the census — count them separately
    if malformation matters.  Heterogeneous columns surface as the
    same path with several types, which is exactly the signal a
    shredding plan needs.
    """
    entries = (df.select(F.explode(
        F.from_json(F.col(col), "map<string, variant>")).alias("k", "v")))
    typed = entries.select(
        F.col("k").alias("path"),
        _json_type(F.schema_of_variant("v")).alias("json_type"))
    counts = typed.groupBy("path", "json_type").agg(
        F.count(F.lit(1)).alias("n"))
    total = df.where(
        F.from_json(F.col(col), "map<string, variant>").isNotNull()) \
        .count()
    return counts.withColumn(
        "frac", F.col("n") / F.lit(float(total or 1)))


def shred_json(df: DataFrame, col: str,
               fields: dict[str, tuple[str, str]]) -> DataFrame:
    """Extract typed columns from a JSON column: ``fields`` maps the
    new column name to ``(json_path, spark_type)`` — e.g.
    ``{"amount": ("$.amount", "double")}``.  Extraction is
    ``variant_get`` (type-aware: a JSON string "69" extracted as
    bigint yields null rather than 69 under ``try_variant_get``
    semantics used here) on one shared ``parse_json``; all existing
    columns ride along.
    """
    v = F.parse_json(F.col(col))
    return df.select(
        "*", *[F.try_variant_get(v, path, dtype).alias(name)
               for name, (path, dtype) in fields.items()])
