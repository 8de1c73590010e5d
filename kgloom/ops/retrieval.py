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


def rrf_fuse(rankings: list[DataFrame], rrf_k: int = 60,
             id_col: str = "doc_id") -> DataFrame:
    """(id_col, rrf_score, rank): reciprocal-rank fusion of N ranked
    lists — ``score(d) = Σᵢ 1/(rrf_k + rankᵢ(d))``, the standard
    parameter-free hybrid-retrieval combiner (Cormack et al., SIGIR
    2009; rrf_k=60 is the canonical constant).

    Each input must carry ``(id_col, rank)``; documents absent from a
    list contribute 0 from it.  The fold is a fixed left-to-right
    chain of full outer joins + one coalesced sum in list order, so
    the double is reproducible in any engine that adds in the same
    order.  100-TB shape: inputs are top-N lists (bounded by
    construction — TakeOrderedAndProject / windowed top-k), so the
    fusion joins touch at most N×len(rankings) rows regardless of
    corpus size; the final rank is a window over that bounded set."""
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    from pyspark.sql.window import Window
    fused = None
    contribs = []
    for i, r in enumerate(rankings):
        c = f"__c{i}"
        contribs.append(c)
        ri = r.select(F.col(id_col),
                      (F.lit(1.0) / (F.lit(rrf_k) + F.col("rank")))
                      .alias(c))
        fused = ri if fused is None else fused.join(ri, id_col, "outer")
    score = F.coalesce(F.col(contribs[0]), F.lit(0.0))
    for c in contribs[1:]:
        score = score + F.coalesce(F.col(c), F.lit(0.0))
    w = Window.orderBy(F.desc("rrf_score"), id_col)
    return (fused.select(id_col, score.alias("rrf_score"))
            .withColumn("rank", F.row_number().over(w)))


def hybrid_rrf(docs: DataFrame, emb: DataFrame, query_text: str,
               query_vec_id: int, k_each: int = 50,
               rrf_k: int = 60) -> DataFrame:
    """(doc_id, rrf_score, rank): hybrid retrieval — BM25 keyword
    ranks fused with embedding-cosine ranks (query = the embedding of
    ``query_vec_id``) by :func:`rrf_fuse`.  ``vec_id`` is the
    embedding table's key for the same documents (the synthetic
    corpus aligns them 1:1).

    Both retrievers produce bounded top-``k_each`` lists before any
    fusion work: BM25 via TakeOrderedAndProject, cosine via the
    broadcast-query scored scan — so fusion cost is O(k_each), not
    O(corpus)."""
    from pyspark.sql.window import Window
    from .similarity import cosine_topk
    bm = bm25_topk(docs, query_text, k_each)
    bm_ranked = bm.withColumn("rank", F.row_number().over(
        Window.orderBy(F.desc("score"), F.asc("doc_id")))) \
        .select("doc_id", "rank")
    cos = cosine_topk(emb, k=k_each, query_ids=[query_vec_id])
    cos_ranked = cos.select(F.col("neighbor_id").alias("doc_id"), "rank")
    return rrf_fuse([bm_ranked, cos_ranked], rrf_k=rrf_k)
