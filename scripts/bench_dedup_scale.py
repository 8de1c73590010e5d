"""Linearity evidence for the dedup family: sf0.1 vs a synthetic
10× corpus ("sf1").

The banding/bucketing claims (capped LSH buckets, capped shingle DF,
pigeonhole simhash blocks) predict near-linear wall time in corpus
size.  This script measures dedup_minhash_lsh / dedup_clusters /
text_winnow at sf0.1 and at a deterministic 10× corpus, and reports
the time ratios (target: ≤ ~12× for 10× data — linear plus shuffle
overhead; the pre-fix simhash blowup of round 1 would have shown a
~100× ratio here).

The 10× corpus is synthesized from sf0.1's documents with no external
data: each of 10 replicas namespaces every token with a replica prefix
(``rK‹token›``), so replicas are textually disjoint — the corpus
behaves like 10 independent sf0.1-shaped corpora (shingle DF
distribution preserved, near-dup structure preserved per replica, no
artificial cross-replica duplicates that would change the pair
distribution's shape).

Usage: python scripts/bench_dedup_scale.py [--repeats 2] [--update-md]
Prints one JSON line; --update-md appends a table to BENCH/BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def build_session(cpus: int = 32):
    from pyspark.sql import SparkSession
    return (SparkSession.builder.master(f"local[{cpus}]")
            .appName("kgloom-dedup-scale")
            .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
            .config("spark.sql.adaptive.enabled", "true")
            .config("spark.driver.memory",
                    os.environ.get("KGLOOM_DRIVER_MEM", "48g"))
            .config("spark.ui.enabled", "false")
            .config("spark.sql.execution.arrow.pyspark.enabled", "true")
            .getOrCreate())


def synth_10x(spark, src_path: str, out_path: str) -> int:
    """Write the deterministic 10× corpus: replica k prefixes every
    token with ``rk`` and offsets doc_id by k * 10_000_000."""
    from pyspark.sql import functions as F
    docs = spark.read.parquet(src_path)
    replicas = []
    for k in range(10):
        toks = F.split(F.col("text"), " ")
        namespaced = F.array_join(
            F.transform(toks, lambda t: F.concat(F.lit(f"r{k}"), t)), " ")
        replicas.append(docs.select(
            (F.col("doc_id") + k * 10_000_000).alias("doc_id"),
            namespaced.alias("text")))
    big = replicas[0]
    for r in replicas[1:]:
        big = big.unionByName(r)
    big.repartition(64).write.mode("overwrite").parquet(out_path)
    return spark.read.parquet(out_path).count()


def run_queries(spark, sf_dir: str, repeats: int) -> dict[str, float]:
    import __spark_entry__ as entry_mod
    qs = entry_mod.queries()
    names = ["dedup_minhash_lsh", "dedup_clusters", "text_winnow"]
    times = {}
    for name in names:
        best = None
        for _ in range(repeats):
            spark.catalog.clearCache()
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop") \
                .mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        times[name] = round(best, 2)
    return times


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--update-md", action="store_true")
    args = ap.parse_args()

    spark = build_session()
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="kgloom_dedup_scale_")
    try:
        big_dir = os.path.join(work, "sf1")
        # the entry queries read {dir}/documents.parquet
        n_docs = synth_10x(spark, f"{args.sf_dir}/documents.parquet",
                           f"{big_dir}/documents.parquet")
        # warm-up: full codegen/JIT of each query once at the small SF
        run_queries(spark, args.sf_dir, 1)

        small = run_queries(spark, args.sf_dir, args.repeats)
        big = run_queries(spark, big_dir, args.repeats)
        ratios = {k: round(big[k] / max(small[k], 1e-9), 2) for k in small}
        result = {"sf0.1": small, "sf1_10x": big, "time_ratio_10x": ratios,
                  "sf1_docs": n_docs, "repeats": args.repeats}
        print(json.dumps(result))
        if args.update_md:
            stamp = subprocess.run(["date", "-u", "+%Y-%m-%dT%H:%M:%SZ"],
                                   capture_output=True,
                                   text=True).stdout.strip()
            lines = [f"\n## Dedup-family 10× linearity run {stamp}\n\n",
                     f"- corpus: sf0.1 documents vs deterministic 10× "
                     f"({n_docs:,} docs, token-namespaced replicas); "
                     f"min-of-{args.repeats} wall per point\n",
                     "| query | sf0.1 (s) | 10× (s) | time ratio |\n",
                     "|---|---|---|---|\n"]
            for k in small:
                lines.append(f"| {k} | {small[k]} | {big[k]} "
                             f"| **{ratios[k]}×** |\n")
            with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
                f.writelines(lines)
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
