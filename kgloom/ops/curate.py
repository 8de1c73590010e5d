"""Composed training-data curation pipeline over a document table.

The individual operators (exact dedup, n-gram near-dup, token/quality
stats, language ID) compose into the standard corpus-curation chain:

    exact dedup → near dedup → quality filter → language filter

Everything stays one lazy DataFrame plan (Catalyst fuses the stat
filters into the scan; the dedup joins are the only shuffles), and the
whole chain is deterministic, so a relational oracle can replay it
step for step.

Dedup-pair resolution is the standard greedy "keep the smaller doc_id
of every near-dup pair": not a transitive-closure clustering (a→b,
b→c keeps a and may keep c), but deterministic, one-pass, and the
common production choice; the connected-components machinery in
``kgloom.transcripts.er`` is available when closure semantics matter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .cache import tracked_persist
from .dedup import exact_dedup, ngram_jaccard_pairs
from .textstats import language_id, token_stats


def curate(docs: DataFrame, jaccard_threshold: float = 0.4, n: int = 3,
           min_tokens: int = 3, langs: tuple[str, ...] = ("en",),
           max_shingle_df: int | None = 1000) -> DataFrame:
    """(doc_id, n_tokens, pred_lang) for documents surviving the chain:

    1. exact dedup — keep each distinct text's min-doc_id representative
    2. near dedup — drop the larger doc_id of every n-gram-Jaccard pair
       at/above ``jaccard_threshold`` (computed over survivors of 1)
    3. quality — keep docs with ≥ ``min_tokens`` tokens
    4. language — keep docs whose stopword-vote language is in ``langs``
    """
    reps = exact_dedup(docs).select(
        F.col("rep_doc_id").alias("doc_id"))
    # the exact-dedup survivor set fans out to the shingle index (via
    # ngram_jaccard_pairs), the loser anti-join, and — through kept2 —
    # the stat/language branches; persist so the scan + dedup join run
    # once instead of once per branch (tracked: release via
    # kgloom.ops.cache.unpersist_tracked())
    kept = tracked_persist(docs.join(reps, "doc_id"))

    near = ngram_jaccard_pairs(kept, n=n, threshold=jaccard_threshold,
                               max_shingle_df=max_shingle_df)
    losers = near.select(F.col("doc_b").alias("doc_id")).distinct()
    # near-dedup survivors feed THREE branches (token stats, language
    # id, the id spine) — same reasoning
    kept = tracked_persist(kept.join(losers, "doc_id", "left_anti"))

    stats = token_stats(kept).select("doc_id", "n_tokens")
    lang = language_id(kept)
    return (kept.select("doc_id")
            .join(stats, "doc_id")
            .where(F.col("n_tokens") >= min_tokens)
            .join(lang, "doc_id")
            .where(F.col("pred_lang").isin(list(langs)))
            .select("doc_id", "n_tokens", "pred_lang"))
