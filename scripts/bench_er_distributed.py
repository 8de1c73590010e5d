"""Repeatable above-gate ER benchmark: the distributed blocking +
iterative hash-join CC path, forced (``driver_max_surfaces=0``) at the
size-gate boundary the 10^12-turn design point crosses.

Round-2 measured this once by hand (BENCH/BASELINE.md "Above-gate ER
measurement"); this script makes it a recorded, repeatable entry so
regressions in the distributed CC path surface automatically.

Input: N entities × the generator's 4 surface-form variants
(kgloom/transcripts/generate.py VARIANT_FMTS) = 4N distinct surfaces,
synthesized deterministically — no transcripts needed, since
``canonical_map`` consumes only (surface, norm_key).

Correctness at scale is asserted, not sampled: 0 splits (every
norm_key maps to exactly one canonical) and 0 merges (no canonical
spans two norm_keys) against the variant-grammar ground truth.

Usage: python scripts/bench_er_distributed.py [--entities 500000]
       [--repeats 1] [--update-md]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def build_session(cpus: int = 32):
    from pyspark.sql import SparkSession
    return (SparkSession.builder.master(f"local[{cpus}]")
            .appName("kgloom-er-distributed")
            .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
            .config("spark.sql.adaptive.enabled", "true")
            .config("spark.driver.memory",
                    os.environ.get("KGLOOM_DRIVER_MEM", "48g"))
            .config("spark.ui.enabled", "false")
            .config("spark.sql.execution.arrow.pyspark.enabled", "true")
            .getOrCreate())


def synth_mentions(spark, n_entities: int):
    """4 variant surfaces per entity, one mention row per surface."""
    from pyspark.sql import functions as F

    from kgloom.transcripts.generate import VARIANT_FMTS
    ents = spark.range(n_entities).select(
        F.col("id").cast("string").alias("k"))
    parts = []
    for fmt in VARIANT_FMTS:
        pre, post = fmt.split("%s")
        parts.append(ents.select(
            F.concat(F.lit(pre), F.col("k"), F.lit(post)).alias("surface"),
            F.col("k").alias("norm_key")))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--entities", type=int, default=500_000)
    ap.add_argument("--repeats", type=int, default=1)
    ap.add_argument("--update-md", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from kgloom.transcripts.er import canonical_map

    spark = build_session()
    spark.sparkContext.setLogLevel("ERROR")
    mentions = synth_mentions(spark, args.entities)
    mentions = mentions.repartition(64).localCheckpoint()  # input pre-built
    n_surfaces = mentions.count()

    # warm-up at 1/50 scale: JIT/codegen + shuffle machinery hot
    canonical_map(synth_mentions(spark, max(args.entities // 50, 1000)),
                  driver_max_surfaces=0).write.format("noop") \
        .mode("overwrite").save()

    best = None
    for _ in range(args.repeats):
        t0 = time.time()
        cmap = canonical_map(mentions, driver_max_surfaces=0)
        cmap.write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)

    # ground-truth check on the last run's mapping
    cmap = canonical_map(mentions, driver_max_surfaces=0) \
        .withColumn("norm_key",
                    F.regexp_replace(F.lower("surface"), "[^0-9]", ""))
    splits = (cmap.groupBy("norm_key")
              .agg(F.countDistinct("canonical").alias("n"))
              .where("n > 1").count())
    merges = (cmap.groupBy("canonical")
              .agg(F.countDistinct("norm_key").alias("n"))
              .where("n > 1").count())

    result = {"entities": args.entities, "surfaces": n_surfaces,
              "wall_sec": round(best, 1), "splits": splits,
              "merges": merges, "repeats": args.repeats}
    print(json.dumps(result))
    if args.update_md:
        stamp = subprocess.run(["date", "-u", "+%Y-%m-%dT%H:%M:%SZ"],
                               capture_output=True, text=True).stdout.strip()
        with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
            f.write(
                f"\n## Above-gate ER run {stamp} "
                f"(scripts/bench_er_distributed.py)\n\n"
                f"- {args.entities:,} entities × 4 variants = "
                f"{n_surfaces:,} distinct surfaces, forced distributed "
                f"(driver_max_surfaces=0), local[32], "
                f"min-of-{args.repeats}\n"
                f"- wall: **{result['wall_sec']} s** (scoring, two-stage "
                f"blocking, label propagation, canonical join)\n"
                f"- correctness: {splits} splits / {merges} merges vs the "
                f"variant-grammar ground truth\n")
    spark.stop()


if __name__ == "__main__":
    main()
