"""Large-scale training-data pipeline operators, beyond the reference's
mapping algebra: deduplication (exact / n-gram Jaccard / MinHash-LSH /
SimHash), similarity search over embeddings, text analysis
(language-ID, quality scoring, token counting, fingerprinting), and
multimodal column plumbing.

All operators are Catalyst-first (built-in functions, inverted-index
joins, no per-row Python); Arrow pandas UDFs appear only where Spark
built-ins genuinely can't express the computation (embedding math at
width, multimodal decode).
"""
