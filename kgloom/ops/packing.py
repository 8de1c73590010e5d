"""Sequence packing — assembling documents into fixed-token-budget
training sequences, the step between curation and batch construction
in an LLM pretraining pipeline.

Two packing disciplines, both deterministic pure functions of
``(key, salt, budget)`` so reruns, partial re-executions, and
different cluster sizes agree row for row (the same replayability
contract as :mod:`kgloom.ops.curate`):

- :func:`pack_concat_chunk` — the GPT-style scheme: documents are
  conceptually concatenated into one token stream per bucket and the
  stream is chunked every ``budget`` tokens; a document may straddle a
  chunk boundary (``straddles`` flags it).  Pure Catalyst: one window
  cumulative sum per bucket — a single hash-partition shuffle, no
  Python, no state.
- :func:`pack_greedy` — first-fit-in-order greedy: a document never
  splits; a new pack starts when the current one cannot fit the next
  document whole (a document alone larger than ``budget`` gets its own
  oversize pack).  Inherently sequential per stream, so it runs as an
  Arrow-batched ``applyInPandas`` over buckets — each bucket's scan is
  O(docs in bucket) driver-free work, and buckets are independent, so
  at 100 TB the parallelism knob is ``n_buckets`` (set it to a small
  multiple of the executor count; per-bucket data = corpus/n_buckets
  must fit an Arrow batch group, exactly the contract of every
  grouped-map op in this repo).

Bucketing uses the md5-prefix rank of the key (same convention as
``curate._hash_rank``), so any engine with md5 can replay the
assignment — the DuckDB oracles reproduce both disciplines exactly
(the greedy one via a recursive CTE walking each bucket in key order).

No counterpart in the reference (a mapping compiler); this belongs to
the training-data operator family (SURVEY §2 extensions).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _bucket(key_col, n_buckets: int, salt: str):
    """Deterministic bucket in [0, n_buckets): integer value of the
    first 8 md5 hex chars of (key || salt), mod n_buckets — replayable
    in any engine with md5/hex→int."""
    return (F.conv(F.substring(
        F.md5(F.concat(key_col.cast("string"), F.lit(salt))), 1, 8),
        16, 10).cast("long") % n_buckets).cast("int")


def pack_concat_chunk(df: DataFrame, key: str, tokens: str, budget: int,
                      n_buckets: int = 32, salt: str = "") -> DataFrame:
    """Concat-and-chunk packing: per bucket, documents ordered by
    ``key`` form one token stream chunked every ``budget`` tokens.

    Returns ``(key, bucket, pack, offset, <tokens>, straddles)`` where
    ``pack`` is the chunk the document STARTS in, ``offset`` its start
    position within that chunk, and ``straddles`` whether it crosses
    into the next chunk.  One window aggregate (a single shuffle on
    ``bucket``); scales with corpus size at constant per-task memory.
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    w = Window.partitionBy("bucket").orderBy(key)
    cum_before = (F.sum(tokens).over(w) - F.col(tokens)).cast("long")
    return (df
            .withColumn("bucket", _bucket(F.col(key), n_buckets, salt))
            .select(key,
                    "bucket",
                    F.floor(cum_before / budget).cast("int").alias("pack"),
                    (cum_before % budget).cast("int").alias("offset"),
                    F.col(tokens).cast("int").alias(tokens))
            .withColumn(
                "straddles",
                (F.col("offset") + F.col(tokens) > budget).cast("int")))


def pack_greedy(df: DataFrame, key: str, tokens: str, budget: int,
                n_buckets: int = 32, salt: str = "") -> DataFrame:
    """First-fit-in-order greedy packing: per bucket, documents in
    ``key`` order fill a pack until the next document would overflow
    ``budget``, then a new pack starts.  Documents never split; a
    document larger than ``budget`` occupies its own pack (its
    ``fill`` exceeds the budget — callers truncate or reject those
    upstream, e.g. with a ``where(col(tokens) <= budget)``).

    Returns ``(key, bucket, pack, fill, <tokens>)`` with ``fill`` the
    pack's running token count after this document.  Sequential per
    bucket (the discipline is stateful by definition), distributed
    across buckets via Arrow-batched ``applyInPandas``.
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    tagged = df.withColumn("bucket", _bucket(F.col(key), n_buckets, salt)) \
               .select(key, "bucket", F.col(tokens).cast("int").alias(tokens))
    schema = (f"{key} {dict(tagged.dtypes)[key]}, bucket int, "
              f"pack int, fill long, {tokens} int")

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(key, kind="mergesort").reset_index(drop=True)
        packs, fills = [], []
        pack, fill = 0, 0
        for t in pdf[tokens]:
            t = int(t)
            if fill > 0 and fill + t > budget:
                pack, fill = pack + 1, 0
            fill += t
            packs.append(pack)
            fills.append(fill)
        pdf["pack"] = pd.Series(packs, dtype="int32")
        pdf["fill"] = pd.Series(fills, dtype="int64")
        return pdf[[key, "bucket", "pack", "fill", tokens]]

    return tagged.groupBy("bucket").applyInPandas(_pack, schema=schema)


def fim_transform(df: DataFrame, key: str, text: str,
                  salt: str = "fim", min_len: int = 8) -> DataFrame:
    """Fill-in-the-middle (PSM) training transform: split each
    document's text at two deterministic cut points and re-order it as
    ``<PRE> prefix <SUF> suffix <MID> middle`` (Bavarian et al. 2022,
    "Efficient Training of Language Models to Fill in the Middle" —
    public method).  Character-level here; the token-level variant is
    the same arithmetic over ``text_subwords`` output.

    Cut points are a pure function of md5(key || salt) so any engine
    replays them: ``c1 = 1 + h1 % (len-2)``, ``c2 = c1 + 1 +
    h2 % (len-c1-1)`` — both cuts interior, so prefix/middle/suffix
    are all non-empty.  Documents shorter than ``min_len`` chars pass
    through unchanged with ``fim = false`` (the standard FIM-rate
    carve-out for degenerate docs).  Pure Catalyst — no Python, no
    shuffle at all (a map-only transform: at 100 TB this pipelines
    with the scan).
    """
    h = F.md5(F.concat(F.col(key).cast("string"), F.lit(salt)))
    h1 = F.conv(F.substring(h, 1, 8), 16, 10).cast("long")
    h2 = F.conv(F.substring(h, 9, 8), 16, 10).cast("long")
    n = F.length(F.col(text))
    c1 = (F.lit(1) + h1 % (n - F.lit(2))).cast("int")
    c2 = (c1 + F.lit(1) + h2 % (n - c1 - F.lit(1))).cast("int")
    psm = F.concat(
        F.lit("<PRE>"), F.substring(F.col(text), F.lit(1), c1),
        F.lit("<SUF>"), F.col(text).substr(c2 + F.lit(1), n - c2),
        F.lit("<MID>"), F.col(text).substr(c1 + F.lit(1), c2 - c1))
    eligible = n >= F.lit(max(min_len, 3))
    return df.select(
        F.col(key),
        F.when(eligible, psm).otherwise(F.col(text)).alias("fim_text"),
        eligible.alias("fim"),
        F.when(eligible, c1).otherwise(F.lit(None).cast("int"))
         .alias("cut1"),
        F.when(eligible, c2).otherwise(F.lit(None).cast("int"))
         .alias("cut2"))
