"""Keyword retrieval over a document table: TF-IDF statistics and BM25
scoring — the ranking/search family a training-data curation pipeline
uses for corpus exploration, query-based filtering, and contamination
triage (find the training docs that "answer" a benchmark query).

100-TB design: postings are filtered to the query's terms *before* any
aggregation (the term list is a tiny constant array, so the filter is
codegen'd into the explode and the surviving postings are a vanishing
fraction of the corpus); per-(doc, term) term frequencies and per-term
document frequencies are hash aggregates with map-side partial
combine; corpus-level scalars (N, avgdl) ride along as 1-row
DataFrames cross-joined into the scoring expression, so the whole
score is ONE lazy plan — no driver collects, no Python row path.
Everything is `pyspark.sql.functions`; the only floats are the final
idf/score doubles.

Tokenization matches the dedup/textstats family (:func:`kgloom.ops.
dedup.tokens`: lowercase, split on single spaces) so oracles can
replay it with ``string_split(lower(text), ' ')``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import tokens


def term_postings(docs: DataFrame,
                  terms: list[str] | None = None) -> DataFrame:
    """(doc_id, term, tf) — one row per document × distinct token,
    optionally restricted to ``terms`` (the inverted-index slice a
    query touches).  The restriction happens inside the explode, so
    only matching postings survive into the aggregate."""
    t = tokens()
    if terms is not None:
        allow = F.array(*[F.lit(w) for w in sorted(set(terms))])
        t = F.filter(t, lambda x: F.array_contains(allow, x))
    return (docs.select("doc_id", F.explode(t).alias("term"))
            .groupBy("doc_id", "term")
            .agg(F.count(F.lit(1)).alias("tf")))


def tf_idf(docs: DataFrame, terms: list[str] | None = None) -> DataFrame:
    """(doc_id, term, tf, df, n_docs, tfidf) with the classic
    ``tf · ln(N/df)`` weight.  ``df``/``N`` count *all* documents (the
    optional ``terms`` restriction narrows the postings, not the
    corpus statistics)."""
    postings = term_postings(docs, terms)
    dfreq = (postings.groupBy("term")
             .agg(F.count(F.lit(1)).alias("df")))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    return (postings.join(dfreq, "term")
            .crossJoin(F.broadcast(n_docs))
            .select("doc_id", "term", "tf", "df", "n_docs",
                    (F.col("tf").cast("double")
                     * F.log(F.col("n_docs").cast("double")
                             / F.col("df").cast("double"))).alias("tfidf")))


def bm25_scores(docs: DataFrame, query: str,
                k1: float = 1.2, b: float = 0.75) -> DataFrame:
    """(doc_id, n_hit_terms, score): Okapi BM25 (the Lucene
    ``ln(1 + (N - df + 0.5)/(df + 0.5))`` idf variant, which is always
    positive) of every document matching at least one query term.

    The query string is tokenized with the same rule as the corpus;
    duplicate query terms count once (standard bag-of-words BM25 over
    the distinct query vocabulary).
    """
    terms = sorted({w for w in query.lower().split(" ") if w})
    if not terms:
        raise ValueError("query has no tokens")
    postings = term_postings(docs, terms)
    dfreq = postings.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    stats = docs.select(F.size(tokens()).alias("dl")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg(F.col("dl").cast("double")).alias("avgdl"))
    dl = docs.select("doc_id", F.size(tokens()).alias("dl"))

    idf = F.log(F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5)))
    tf = F.col("tf").cast("double")
    norm = F.lit(k1) * (F.lit(1.0 - b)
                        + F.lit(b) * F.col("dl") / F.col("avgdl"))
    per_term = idf * tf * F.lit(k1 + 1.0) / (tf + norm)

    return (postings
            .join(F.broadcast(dfreq), "term")
            .join(dl, "doc_id")
            .crossJoin(F.broadcast(stats))
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_hit_terms"),
                 F.sum(per_term).alias("score")))


def bm25_topk(docs: DataFrame, query: str, k: int,
              k1: float = 1.2, b: float = 0.75) -> DataFrame:
    """Top-``k`` BM25 hits, deterministically tie-broken by doc_id.
    ``orderBy().limit()`` compiles to TakeOrderedAndProject — a
    per-partition top-k plus a k-row driver merge, never a full sort."""
    return (bm25_scores(docs, query, k1=k1, b=b)
            .orderBy(F.col("score").desc(), F.col("doc_id").asc())
            .limit(k))
