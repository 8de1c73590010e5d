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


# ---------------------------------------------------------------------------
# Deterministic sampling / splitting (training-data mixing)
# ---------------------------------------------------------------------------
#
# Both operators key every decision on the first 8 hex digits of
# md5(key || salt): a uniform, engine-portable, reproducible rank in
# [0, 16^8).  A rate r keeps rows whose rank-prefix sorts below the
# 8-digit hex threshold floor(r·16^8) (lowercase hex of equal width
# compares lexicographically = numerically, so the predicate is a plain
# string comparison any engine evaluates identically).  The plan is a
# narrow per-row filter — no shuffle, no sort, no sampling state — which
# is the only shape that survives 100 TB: rerunning any subset of
# partitions reproduces the same decisions, and adding executors never
# changes the sample.

def _hex_threshold(rate: float) -> str:
    """rate ∈ [0,1] → 8-hex-digit cutoff; ≥1 keeps all (see above)."""
    if rate >= 1.0:
        return "g"  # sorts after every hex digit → always true
    return format(max(int(rate * 16**8), 0), "08x")


def _hash_rank(key_col, salt: str):
    return F.substring(F.md5(F.concat(key_col.cast("string"),
                                      F.lit(salt))), 1, 8)


def stratified_sample(df: DataFrame, key: str, strata: str,
                      rates: dict[str, float], default_rate: float = 0.0,
                      salt: str = "") -> DataFrame:
    """Deterministic per-stratum downsampling (training-data mixing).

    Keeps each row iff its md5 rank falls under its stratum's rate:
    ``rates`` maps stratum values (e.g. languages or sources) to keep
    fractions, ``default_rate`` covers unlisted strata, and ``salt``
    decorrelates independent sampling passes over the same keys.
    Expected kept fraction per stratum is exact up to md5 uniformity
    (±2^-32); membership is a pure function of (key, salt), so resumed
    or partially re-run jobs agree row for row.
    """
    pairs = []
    for value, rate in sorted(rates.items()):
        pairs += [F.lit(value), F.lit(_hex_threshold(rate))]
    thr = F.coalesce(
        F.create_map(*pairs)[F.col(strata)] if pairs else F.lit(None),
        F.lit(_hex_threshold(default_rate)))
    return df.where(_hash_rank(F.col(key), salt) < thr)


def hash_split(df: DataFrame, key: str,
               fractions: dict[str, float] | None = None,
               salt: str = "") -> DataFrame:
    """Deterministic dataset split: adds a ``split`` column assigning
    each row to one named range of the md5 rank space (default
    train/val/test = 0.98/0.01/0.01).  Ranges are half-open and
    consecutive in the listed order; fractions must sum to ≤ 1 and any
    remainder falls in the last split.  Same scale properties as
    ``stratified_sample`` — a narrow, shuffle-free, rerun-stable map.
    """
    fractions = fractions or {"train": 0.98, "val": 0.01, "test": 0.01}
    rank = _hash_rank(F.col(key), salt)
    expr = None
    cum = 0.0
    names = list(fractions)
    for name in names[:-1]:
        cum += fractions[name]
        clause = rank < F.lit(_hex_threshold(cum))
        expr = F.when(clause, name) if expr is None else \
            expr.when(clause, name)
    last = F.lit(names[-1])
    return df.withColumn("split",
                         last if expr is None else expr.otherwise(last))


def temperature_mixture(df: DataFrame, key: str, strata: str,
                        alpha: float = 0.5, salt: str = "") -> DataFrame:
    """α-temperature mixture sampling — the multilingual/multi-source
    smoothing of LLM corpus mixing (sampled stratum mass ∝ p_s^α;
    Conneau et al., "Unsupervised Cross-lingual Representation
    Learning at Scale", ACL 2020 — public literature), realized as
    deterministic per-stratum downsampling with keep rate
    ``r_s = (n_min / n_s)^(1-α)``: the smallest stratum keeps
    everything, dominant strata shrink toward the tempered share
    (α=1 keeps all rows, α=0 equalizes stratum sizes in expectation).

    Unlike :func:`stratified_sample` the rates come FROM the data: one
    stratum-cardinality-sized aggregate rides the row filter as a
    broadcast (plus a broadcast 1-row minimum) — still a narrow,
    shuffle-free, rerun-stable map over the corpus.

    The keep decision is the same md5 rank gate as
    ``stratified_sample`` compared NUMERICALLY with the rate inlined
    as exact integers through exact-rounded IEEE ops::

        rank · (n_s)^(1-α)  <  2^32 · (n_min)^(1-α)

    For the default α=0.5 the only irrational op is sqrt, which IEEE
    754 rounds exactly — the gate replays bit-identically on any
    engine.  Other α go through pow, correctly rounded on common
    libm implementations but not guaranteed by the standard; a rank
    landing exactly on the threshold could then differ cross-engine
    with probability ~n/2^32.
    """
    if not 0.0 <= alpha <= 1.0:
        raise ValueError("alpha must be in [0, 1]")
    counts = df.groupBy(strata).agg(F.count(F.lit(1)).alias("__n"))
    nmin = counts.agg(F.min("__n").alias("__nmin"))
    if alpha == 0.5:
        def w(c):
            return F.sqrt(c.cast("double"))
    else:
        def w(c):
            return F.pow(c.cast("double"), F.lit(1.0 - alpha))
    rank = F.conv(_hash_rank(F.col(key), salt), 16, 10).cast("long")
    return (df.join(F.broadcast(counts), strata)
            .crossJoin(F.broadcast(nmin))
            .where(rank.cast("double") * w(F.col("__n"))
                   < F.lit(float(16 ** 8)) * w(F.col("__nmin")))
            .drop("__n", "__nmin"))
