"""Text-analysis operators: token counting, quality scoring,
language-ID, document fingerprinting.  Pure Catalyst (whole-stage
codegen); integer/string outputs so cross-engine oracles compare
exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import tokens

#: tiny per-language stop/marker word sets for n-gram-free language ID
LANG_MARKERS = {
    "en": ["the", "of", "and", "to", "in"],
    "es": ["el", "de", "la", "los", "que"],
    "fr": ["le", "la", "les", "des", "et"],
    "de": ["der", "die", "das", "und", "ist"],
}


def token_stats(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, n_uniq_tokens, n_chars, max_token_len)."""
    t = tokens()
    return docs.select(
        "doc_id",
        F.size(t).alias("n_tokens"),
        F.size(F.array_distinct(t)).alias("n_uniq_tokens"),
        F.length("text").alias("n_chars"),
        F.array_max(F.transform(t, lambda x: F.length(x)))
         .alias("max_token_len"))


def _ngrams(t, n: int):
    """Word n-gram array over a token-array column.  sequence(1,
    size-n+1) of starting offsets; sequence() DESCENDS when start >
    stop, so short docs need the explicit empty guard."""
    if n == 1:
        return t
    return F.when(
        F.size(t) < n, F.array().cast("array<string>")
    ).otherwise(
        F.transform(F.sequence(F.lit(1), F.size(t) - (n - 1)),
                    lambda i: F.concat_ws(" ", F.slice(t, i, n))))


def repetition_stats(docs: DataFrame, n: int = 2) -> DataFrame:
    """(doc_id, n_tokens, n_ngrams, n_distinct_ngrams, top_ngram_count)
    — the Gopher-style repetition signals: how much of a document is
    the same word n-gram over and over (machine-generated boilerplate,
    SEO spam, decoding loops).  Consumers threshold ratios like
    ``n_distinct_ngrams / n_ngrams`` (duplicate-n-gram fraction) and
    ``top_ngram_count * n / n_tokens`` (top-n-gram coverage); integer
    outputs keep the cross-engine oracle exact, like
    :func:`quality_score`.

    Pure Catalyst per-document array work — no shuffle, no Python; at
    100 TB the cost is map-side and bounded per document.  The
    top-count pass is O(unique·total) per document (array_distinct ×
    filter); fine for web-document sizes — for pathological
    multi-megabyte documents, cap upstream on ``n_tokens`` first.
    """
    if n < 1:
        raise ValueError("n must be >= 1")
    t = tokens()
    g = docs.select("doc_id", F.size(t).alias("n_tokens"),
                    _ngrams(t, n).alias("__g"))
    return g.select(
        "doc_id", "n_tokens",
        F.size("__g").alias("n_ngrams"),
        F.size(F.array_distinct("__g")).alias("n_distinct_ngrams"),
        F.coalesce(
            F.array_max(F.transform(
                F.array_distinct("__g"),
                lambda x: F.size(F.filter(F.col("__g"),
                                          lambda y: y == x)))),
            F.lit(0)).alias("top_ngram_count"))


def ngram_commonness(docs: DataFrame, n: int = 2,
                     min_df: int = 2) -> DataFrame:
    """(doc_id, n_distinct_ngrams, n_common_ngrams) — how much of each
    document's n-gram vocabulary is CORPUS-common (appears in at least
    ``min_df`` documents).  ``1 - n_common/n_distinct`` is a novelty
    fraction: high for fresh content, low for boilerplate assembled
    from corpus-wide stock phrases — the integer-signal counterpart of
    a CCNet-style LM commonness score, engine-replayable without
    float drift.

    Shape at scale: explode distinct n-grams (each gram once per doc),
    one hash aggregate for document frequency, one shuffle join back,
    one per-doc count — the same inverted-index skeleton as the
    n-gram-Jaccard dedup path, so it scales the same way (the gram
    table shards by gram hash; no driver state, no Python).
    """
    if min_df < 1:
        raise ValueError("min_df must be >= 1")
    from .cache import tracked_persist
    t = tokens()
    # tokenize ONCE into a compact per-doc distinct-gram array and
    # persist it: the exploded gram table feeds both the DF aggregate
    # and the join-back, and Catalyst does not CSE across join arms —
    # unpersisted, the regexp tokenization pass would run three times
    # (tracked — release via kgloom.ops.cache.unpersist_tracked)
    grams = tracked_persist(docs.select(
        "doc_id", F.array_distinct(_ngrams(t, n)).alias("__gs")))
    # explode_outer keeps zero-gram docs (null gram row) so one
    # aggregate recovers every doc; n_distinct rides along the explode
    per_doc = grams.select(
        "doc_id", F.size("__gs").alias("__nd"),
        F.explode_outer("__gs").alias("__g"))
    # each (doc, gram) appears once, so count(*) per gram = document
    # frequency; partial (map-side) aggregation applies before the
    # shuffle on gram
    common = (per_doc.where(F.col("__g").isNotNull())
              .groupBy("__g")
              .agg(F.count(F.lit(1)).alias("__df"))
              .where(F.col("__df") >= min_df)
              .select("__g", F.lit(1).alias("__c")))
    return (per_doc.join(common, "__g", "left")
            .groupBy("doc_id")
            .agg(F.first("__nd").alias("n_distinct_ngrams"),
                 F.sum(F.coalesce("__c", F.lit(0)))
                  .cast("long").alias("n_common_ngrams")))


def quality_score(docs: DataFrame,
                  stopwords: list[str] | None = None) -> DataFrame:
    """(doc_id, n_tokens, n_stopwords, n_digits, n_punct) — the integer
    signals a quality classifier thresholds on (ratios are left to the
    consumer to avoid float drift across engines)."""
    sw = stopwords or LANG_MARKERS["en"]
    t = tokens()
    sw_arr = F.array(*[F.lit(w) for w in sw])
    return docs.select(
        "doc_id",
        F.size(t).alias("n_tokens"),
        F.size(F.filter(t, lambda x: F.array_contains(sw_arr, x)))
         .alias("n_stopwords"),
        F.length(F.regexp_replace("text", "[^0-9]", "")).alias("n_digits"),
        F.length(F.regexp_replace("text", "[^.,;:!?]", "")).alias("n_punct"))


def language_id(docs: DataFrame) -> DataFrame:
    """(doc_id, pred_lang): stopword-vote language identification.

    Votes = count of language marker words among the tokens; prediction
    = language with the most votes (deterministic tie-break by language
    code), 'und' when no marker hits.
    """
    t = tokens()
    df = docs.select("doc_id", t.alias("toks"))

    def _vote(markers):
        arr = F.array(*[F.lit(w) for w in markers])
        return F.size(F.filter(F.col("toks"),
                               lambda x: F.array_contains(arr, x)))

    for lang, markers in sorted(LANG_MARKERS.items()):
        df = df.withColumn(f"v_{lang}", _vote(markers))
    langs = sorted(LANG_MARKERS)
    best = F.greatest(*[F.col(f"v_{lg}") for lg in langs])
    pred = F.lit("und")
    for lg in reversed(langs):  # earlier langs win ties
        pred = F.when((F.col(f"v_{lg}") == best) & (best > 0), F.lit(lg)) \
                .otherwise(pred)
    return df.select("doc_id", pred.alias("pred_lang"))


#: PII patterns — kept to regex constructs with identical Java-regex /
#: RE2 semantics so a cross-engine oracle matches byte-for-byte.  At
#: 100 TB these run inside whole-stage codegen (chained
#: regexp_replace), no Python in the row path.
PII_PATTERNS = (
    # order matters: emails before bare domains, long digit runs last
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"),
    ("phone", r"\+?[0-9][0-9 ()-]{7,}[0-9]"),
)


def redact_pii(docs: DataFrame, patterns=PII_PATTERNS,
               text_col: str = "text") -> DataFrame:
    """(doc_id, text, n_redactions): email/IPv4/phone spans replaced by
    ``[TYPE]`` tokens, plus the total count of redacted spans (counted
    per pattern BEFORE that pattern's replacement, on the text as left
    by the previous pattern — the oracle replays the same order)."""
    cur = F.col(text_col)
    n = F.lit(0)
    for name, pat in patterns:
        n = n + F.size(F.regexp_extract_all(cur, F.lit(pat), 0))
        cur = F.regexp_replace(cur, pat, f"[{name.upper()}]")
    return docs.select("doc_id", cur.alias("text"),
                       n.cast("int").alias("n_redactions"))


#: BPE-ish pre-tokenization: letter runs, single digits (GPT-2 style),
#: single punctuation marks.  Kept to constructs with identical
#: semantics in Java regex and RE2 so oracles match exactly.
SUBWORD_PATTERN = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"


def subword_stats(docs: DataFrame, max_piece: int = 4) -> DataFrame:
    """(doc_id, n_pieces, n_subwords): BPE-ish token estimate.

    ``n_pieces`` counts pre-tokenizer pieces (SUBWORD_PATTERN matches);
    ``n_subwords`` charges each letter run ceil(len/max_piece) subword
    units (a crude but deterministic BPE-merge estimate) and every
    other piece 1 — all integer Catalyst arithmetic, no Python.
    """
    pieces = F.regexp_extract_all("text", F.lit(SUBWORD_PATTERN), 0)
    is_word = lambda p: p.rlike("^[A-Za-z]+$")  # noqa: E731
    units = lambda p: F.when(  # noqa: E731
        is_word(p),
        ((F.length(p) + F.lit(max_piece - 1)) / F.lit(max_piece))
        .cast("int")).otherwise(F.lit(1))
    return docs.select(
        "doc_id",
        F.size(pieces).alias("n_pieces"),
        F.aggregate(pieces, F.lit(0), lambda acc, p: acc + units(p))
         .alias("n_subwords"))


def fingerprint(docs: DataFrame) -> DataFrame:
    """(doc_id, fingerprint): md5 of the sorted distinct token set —
    word-order/duplication-insensitive near-dup key."""
    t = tokens()
    return docs.select(
        "doc_id",
        F.md5(F.array_join(F.array_sort(F.array_distinct(t)), " "))
         .alias("fingerprint"))


def winnow_fingerprints(docs: DataFrame, k: int = 5,
                        window: int = 4) -> DataFrame:
    """(doc_id, fp): MOSS-style winnowing fingerprints — rolling
    character k-gram hashes, minimum per sliding window of ``window``
    hashes, distinct per document.

    Robust to edits the way token-set fingerprints are not: a local
    change perturbs only the windows covering it, so two documents
    sharing long runs share most fingerprints (overlap = containment
    signal).  All array built-ins (substr/md5/min/slice) inside one
    narrow projection — no shuffle until the caller aggregates; the
    hash is the same 15-hex-chars-of-md5 → int64 parse the simhash
    oracle reproduces digit-for-digit in SQL.
    """
    s = F.lower(F.col("text"))
    n_grams = F.greatest(F.length(s) - k + 1, F.lit(0))
    hashes = F.transform(
        F.sequence(F.lit(1), n_grams),
        lambda i: F.conv(F.substring(F.md5(s.substr(i, F.lit(k))), 1, 15),
                         16, 10).cast("decimal(20,0)").cast("long"))
    hashes = F.when(n_grams >= 1, hashes) \
        .otherwise(F.array().cast("array<long>"))
    # MATERIALIZE the hash array as a column before windowing: Spark
    # does not common-subexpression-eliminate across higher-order-
    # function lambdas, so slicing the hash EXPRESSION would recompute
    # every gram's md5 once per window (O(n²) md5 calls per row —
    # measured 250s for 500 docs; with the column reference: ~1s)
    staged = docs.select("doc_id", hashes.alias("__hs"))
    hs = F.col("__hs")
    n_windows = F.size(hs) - window + 1
    mins = F.transform(F.sequence(F.lit(1), F.greatest(n_windows, F.lit(0))),
                       lambda j: F.array_min(F.slice(hs, j, window)))
    mins = F.when(n_windows >= 1, mins) \
        .otherwise(F.array().cast("array<long>"))
    return staged.select(
        "doc_id", F.explode(F.array_distinct(mins)).alias("fp"))


def chunk_text(docs: DataFrame, chunk_tokens: int = 256,
               overlap_tokens: int = 32) -> DataFrame:
    """Sliding-window chunking with overlap — the RAG / context-window
    splitter: ``(doc_id, chunk_idx, chunk, n_tokens)`` where chunk
    ``i`` covers tokens ``[i·stride, i·stride + chunk_tokens)`` of the
    whitespace tokenization, ``stride = chunk_tokens - overlap_tokens``
    (the standard HF sliding window; the final chunk is the truncated
    remainder, and a document no longer than one chunk yields exactly
    one).

    Pure Catalyst — one tokenize, one ``sequence`` explode, one
    ``slice`` + ``array_join`` per chunk; no shuffle at all (chunking
    is per-row), so at 100 TB it pipelines inside the scan stage and
    parallelism is whatever the input partitioning gives."""
    if not 0 <= overlap_tokens < chunk_tokens:
        raise ValueError("need 0 <= overlap_tokens < chunk_tokens")
    stride = chunk_tokens - overlap_tokens
    t = tokens()
    n = F.size(t)
    n_chunks = F.when(n <= chunk_tokens, F.lit(1)).otherwise(
        F.lit(1) + F.ceil((n - F.lit(chunk_tokens))
                          / F.lit(float(stride))).cast("int"))
    exploded = (docs.select("doc_id", t.alias("__t"),
                            n_chunks.alias("__nc"))
                .select("doc_id", "__t",
                        F.explode(F.sequence(F.lit(0), F.col("__nc") - 1))
                        .alias("chunk_idx")))
    sliced = F.slice("__t", F.col("chunk_idx") * stride + 1, chunk_tokens)
    return exploded.select(
        "doc_id", "chunk_idx",
        F.array_join(sliced, " ").alias("chunk"),
        F.size(sliced).alias("n_tokens"))


#: public default weights for quality_logit — a fastText-style linear
#: proxy over the integer quality signals (positive weight on stopword
#: density and length, negative on digit/punctuation load), chosen so
#: natural prose scores above 0 and digit/symbol soup below
QUALITY_WEIGHTS = {"n_tokens": 0.01, "n_stopwords": 0.05,
                   "n_digits": -0.02, "n_punct": -0.01}


def quality_logit(docs: DataFrame,
                  weights: dict[str, float] | None = None,
                  bias: float = -0.1) -> DataFrame:
    """(doc_id, logit, keep): a deterministic linear quality classifier
    over the :func:`quality_score` integer signals — the model-shaped
    quality filter slot (swap the public default weights for trained
    ones; the plumbing is the point).

    Drift-free by construction: the logit folds ``bias + Σ wᵢ·xᵢ`` in
    SORTED feature order with plain double multiply/add — IEEE ops
    with a fixed association, so any engine reproduces the value
    bit-for-bit (no exp/sigmoid in the gate; ``keep`` is ``logit >
    0``, and P(keep) is monotone in the logit anyway)."""
    w = dict(QUALITY_WEIGHTS if weights is None else weights)
    feats = quality_score(docs)
    missing = set(w) - set(feats.columns)
    if missing:
        raise ValueError(f"unknown quality features: {sorted(missing)}")
    logit = F.lit(float(bias))
    for name in sorted(w):
        logit = logit + F.col(name) * F.lit(float(w[name]))
    return feats.select("doc_id", logit.alias("logit")) \
        .withColumn("keep", F.col("logit") > 0)


def normalize_text(docs: DataFrame, text_col: str = "text",
                   lowercase: bool = False) -> DataFrame:
    """Corpus text normalization — the standard pre-tokenization
    cleanup pass, entirely in Catalyst (no Python, map-side):

    1. strip C0/C1 control characters (except \\t \\n, which become
       spaces with all other whitespace in step 3)
    2. strip zero-width / BOM code points (ZWSP ZWNJ ZWJ BOM)
    3. collapse every whitespace run to a single space
    4. trim; optional lowercase

    Returns the input with ``text_col`` replaced.  Idempotent
    (normalize ∘ normalize = normalize, pinned by test), so re-running
    a resumed pipeline stage cannot change data.  Unicode NFC is
    deliberately out of scope for the JVM path (no Catalyst builtin);
    layer an Arrow UDF upstream when canonical composition matters.
    """
    c = F.col(text_col)
    c = F.regexp_replace(c, r"[\x00-\x08\x0B-\x1F\x7F-\x9F]", "")
    c = F.regexp_replace(c, r"[​‌‍﻿]", "")
    c = F.regexp_replace(c, r"\s+", " ")
    c = F.trim(c)
    if lowercase:
        c = F.lower(c)
    return docs.withColumn(text_col, c)
