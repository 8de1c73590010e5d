"""Count-based n-gram language-model scoring: the perplexity-proxy
quality signal a training-data pipeline thresholds on (KenLM-style
filtering, "remove documents the corpus LM finds surprising"), with
the LM trained ON the corpus itself — one pass for counts, one join
back for scoring, no external model artifact.

Determinism is engineered end-to-end so a SQL oracle replays the
double bit-for-bit:

- add-k smoothing uses only count arithmetic and one ``ln`` per gram
  (``ln((c2 + k) / (c1 + k·V))``) — no divergent math functions;
- the per-document sum is an ORDERED fold (sort by gram position,
  then a sequential ``F.aggregate``), never a ``SUM`` aggregate whose
  partition-dependent addition order can drift in the last ulp.

100-TB shape: bigram/unigram counts are hash aggregates with map-side
partial combine; scoring is two shuffle joins on the gram keys (the
count tables are corpus-vocabulary-sized, far smaller than the
corpus); the per-document fold happens inside one groupBy whose state
is bounded by document length.  Nothing is collected, no Python row
path.

Tokenization matches the dedup/textstats family
(:func:`kgloom.ops.dedup.tokens`) so oracles replay it with
``string_split(lower(text), ' ')``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import tokens


def bigram_counts(docs: DataFrame) -> DataFrame:
    """(w1, w2, c2): corpus bigram counts over the standard tokenizer
    (documents shorter than 2 tokens contribute nothing)."""
    return (_doc_bigrams(docs)
            .groupBy("w1", "w2")
            .agg(F.count(F.lit(1)).alias("c2")))


def _doc_bigrams(docs: DataFrame) -> DataFrame:
    """(doc_id, pos, w1, w2): every adjacent token pair with its
    0-based position.  The sequence is guarded for short docs —
    Spark's ``sequence(1, 0)`` counts DOWN instead of yielding an
    empty array.

    The token array is MATERIALIZED as a column before the pair
    transform: referencing ``tokens()`` (a split expression) directly
    inside the lambda inlines one split per ``element_at`` call —
    O(doc_len²) re-tokenization per document (measured 7.4s → 0.6s
    for 5k docs at sf0.1); Spark does not common-subexpression-
    eliminate across higher-order-function lambdas (same pathology as
    the winnow hash array, kgloom/ops/textstats.py)."""
    t = F.col("__toks")
    pairs = F.when(
        F.size(t) >= 2,
        F.transform(F.sequence(F.lit(1), F.size(t) - 1),
                    lambda i: F.struct(
                        F.element_at(t, i).alias("w1"),
                        F.element_at(t, i + 1).alias("w2")))
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    return (docs.select("doc_id", tokens().alias("__toks"))
            .select("doc_id", F.posexplode(pairs))
            .select("doc_id", "pos",
                    F.col("col.w1").alias("w1"),
                    F.col("col.w2").alias("w2")))


def bigram_lm_scores(docs: DataFrame, k_smooth: float = 0.5) -> DataFrame:
    """(doc_id, n_grams, logprob, avg_logprob): add-k smoothed bigram
    log-likelihood of each document under the corpus's own bigram LM.

    Per gram: ``ln((c(w1,w2) + k) / (c(w1·) + k·V))`` where ``c(w1·)``
    is the unigram CONTEXT count (bigrams starting with w1) and ``V``
    the unigram vocabulary size.  Documents with fewer than 2 tokens
    have no grams and are absent from the result."""
    if k_smooth <= 0:
        raise ValueError("k_smooth must be > 0")
    bg = _doc_bigrams(docs)
    c2 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    c1 = bg.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    vocab = (docs.select(F.explode(tokens()).alias("w"))
             .agg(F.count_distinct("w").alias("v")))
    lp = F.log((F.col("c2") + F.lit(float(k_smooth)))
               / (F.col("c1") + F.lit(float(k_smooth)) * F.col("v")))
    scored = (bg.join(c2, ["w1", "w2"])
              .join(c1, "w1")
              .crossJoin(F.broadcast(vocab))
              .select("doc_id", "pos", lp.alias("lp")))
    # ORDERED fold: sort the per-doc gram log-probs by position and
    # add sequentially from 0.0 — reproducible in any engine with a
    # sequential list reduce, unlike a partition-order-dependent SUM
    arr = F.sort_array(F.collect_list(F.struct("pos", "lp")))
    folded = F.aggregate(arr, F.lit(0.0),
                         lambda acc, x: acc + x["lp"])
    return (scored.groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_grams"),
                 folded.alias("logprob"))
            .select("doc_id", "n_grams", "logprob",
                    (F.col("logprob") / F.col("n_grams"))
                    .alias("avg_logprob")))
