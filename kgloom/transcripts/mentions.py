"""Mention detection + entity-link scoring over transcript text.

Two interchangeable implementations of detection:

- ``detect_mentions(..., use_arrow=False)`` — pure Catalyst:
  ``regexp_extract_all`` + ``explode``; whole-stage-codegen'd JVM path,
  the default for the regex-pattern grammar.
- ``use_arrow=True`` — Arrow-vectorized pandas UDF (`mapInPandas`-style
  batched extraction).  Same output; this is the slot where a real NLP
  mention model (which can't be a regex) would plug in, per the
  north-star requirement of *batched* Arrow UDFs, never per-row Python.

Entity-link scoring is a vectorized pandas UDF producing a
deterministic confidence in [0,1] per (surface, candidate) pair.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DoubleType, StringType

#: one alternation covering every surface-form variant the generator
#: emits (kgloom/transcripts/generate.py VARIANT_FMTS)
MENTION_PATTERN = r"(?:Entity_[0-9]+|entity [0-9]+|E-[0-9]+|ENT:[0-9]+)"

_MENTION_RE = re.compile(MENTION_PATTERN)


def detect_mentions(turns: DataFrame, use_arrow: bool = False) -> DataFrame:
    """(conv_id, turn_idx, text, ...) → one row per mention occurrence:
    (conv_id, turn_idx, surface, norm_key)."""
    if use_arrow:
        extract = F.pandas_udf(
            lambda s: s.map(lambda v: _MENTION_RE.findall(v or "")),
            ArrayType(StringType()))
        surfaces = extract(F.col("text"))
    else:
        surfaces = F.regexp_extract_all("text", F.lit(MENTION_PATTERN), 0)
    out = (turns
           .select("conv_id", "turn_idx",
                   F.explode(surfaces).alias("surface"))
           .withColumn("norm_key", normalize_surface(F.col("surface"))))
    return out


def normalize_surface(col: F.Column) -> F.Column:
    """Blocking stage-1 key: strip everything but digits (every variant
    of entity k collapses to str(k))."""
    return F.regexp_replace(F.lower(col), "[^0-9]", "")


def link_score(surface: F.Column, candidate_key: F.Column) -> F.Column:
    """Entity-link confidence in [0,1] — pure Catalyst (codegen'd).

    Deterministic heuristic: digit-sequence agreement (hard requirement)
    weighted by a variant prior (canonical ``Entity_k`` form scores
    highest).  Stand-in for a learned scorer; when the scorer is a real
    model, swap in ``link_score_arrow`` (same contract, Arrow-batched).
    """
    digits = normalize_surface(surface)
    return (F.when(surface.isNull() | candidate_key.isNull(), 0.0)
            .when(digits != candidate_key, 0.0)
            .when(surface.startswith("Entity_"), 1.0)
            .when(surface.startswith("entity "), 0.95)
            .when(surface.startswith("E-"), 0.9)
            .otherwise(0.85))


_link_score_udf = None


def link_score_arrow(surface: F.Column, candidate_key: F.Column) -> F.Column:
    """The same scorer as an Arrow-vectorized pandas UDF — the slot a
    learned (model-based) scorer plugs into; batched, never per-row."""
    global _link_score_udf
    if _link_score_udf is None:
        def _score(surfaces: pd.Series, keys: pd.Series) -> pd.Series:
            def one(s, k):
                if s is None or k is None:
                    return 0.0
                digits = re.sub(r"[^0-9]", "", s)
                if digits != k:
                    return 0.0
                if s.startswith("Entity_"):
                    return 1.0
                if s.startswith("entity "):
                    return 0.95
                if s.startswith("E-"):
                    return 0.9
                return 0.85
            return pd.Series([one(s, k) for s, k in zip(surfaces, keys)])
        _link_score_udf = F.pandas_udf(_score, DoubleType())
    return _link_score_udf(surface, candidate_key)
