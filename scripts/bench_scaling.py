"""Scaling-efficiency evidence for the north rule (N vs 4N parallelism).

The rule's two-cluster-size criterion can't use a real cluster in this
sandbox; per BASELINE.md the evidence is the same job at two parallelism
levels (local[8] vs local[32], 32 physical cores) over the SAME
pre-written input, timing only the pipeline (input synthesis excluded).

Usage: python scripts/bench_scaling.py [--turns 4000000] [--update-md]
Prints one JSON line; --update-md appends the numbers to
BENCH/BASELINE.md.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUN_ONE = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession
from kgloom.transcripts.pipeline import TranscriptPipeline

cores = int(sys.argv[1]); input_path = sys.argv[2]; store = sys.argv[3]
# Task granularity: event-log task accounting (2026-08-18, 24M turns)
# showed the 4-way level at only 80% core-utilization with ZERO
# per-task slowdown (sum task CPU within 6% of the 1-way run) — the
# 600MB input packs into just 7 splits at the 128MB default, i.e. two
# uneven task waves on 4 cores.  32MB splits and 8 shuffle partitions
# per core keep >=4 waves in flight per core — the same tasks-per-core
# ratio a 100TB/1000-core deployment gets for free from its ~800k
# splits.  Identical config at every parallelism level.
spark = (SparkSession.builder.master(f"local[{{cores}}]")
         .appName(f"kgloom-scale-{{cores}}")
         .config("spark.sql.shuffle.partitions", str(max(cores * 8, 16)))
         .config("spark.sql.files.maxPartitionBytes", str(32 * 1024 * 1024))
         .config("spark.driver.memory", "20g")
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.ui.enabled", "false")
         .config("spark.sql.execution.arrow.pyspark.enabled", "true")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
# JVM warm-up before the timed window: run the ENTIRE pipeline once on
# a small slice of the input so every codegen'd expression tree (the
# serializer's term-construction concat chain JIT-compiles in ~14s —
# measured: triples stage 20.6s cold vs 6.6s warm at local[8]), the
# parquet/zstd writer, the shuffle and the committer are all hot.
# Steady-state throughput is what the scaling criterion compares;
# identical warm-up at both parallelism levels.
warm_in = store + "_warm_in"
spark.read.parquet(input_path).limit(200_000) \
    .repartition(max(cores, 2)) \
    .write.mode("overwrite").parquet(warm_in)
TranscriptPipeline(spark, store + "_warm").run(transcripts=warm_in)
pipe = TranscriptPipeline(spark, store)
t0 = time.time()
res = pipe.run(transcripts=input_path)
wall = time.time() - t0
print(json.dumps({{"cores": cores, "wall": round(wall, 2),
                   "turns": res.metrics["turns"],
                   "triples": res.metrics["triples"],
                   "turns_per_sec": round(res.metrics["turns"] / wall, 1)}}))
spark.stop()
"""


RUN_ONE_CLUSTER = r"""
import glob, json, os, sys, time, zipfile
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession
from kgloom.transcripts.pipeline import TranscriptPipeline

n_exec = int(sys.argv[1]); input_path = sys.argv[2]; store = sys.argv[3]
mem_mb = int(sys.argv[4])
# one executor JVM per "node", one core each: the closest one-box
# analogue of adding cluster nodes — separate heaps, separate GC,
# separate shuffle fetch paths; only the physical disk and memory bus
# stay shared (at 1-4 active cores of 32, neither is contended)
spark = (SparkSession.builder
         .master(f"local-cluster[{{n_exec}},1,{{mem_mb}}]")
         .appName(f"kgloom-scale-cluster-{{n_exec}}")
         # 32MB splits + 8 shuffle partitions/core: >=4 task waves per
         # core (see the granularity note in the local[] runner — the
         # 128MB default gave 7 splits for the 600MB input, one
         # straggler-exposed 3-task second wave on 4 executors)
         .config("spark.sql.shuffle.partitions", str(max(n_exec * 8, 16)))
         .config("spark.sql.files.maxPartitionBytes", str(32 * 1024 * 1024))
         .config("spark.driver.memory", "8g")
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.ui.enabled", "false")
         .config("spark.sql.execution.arrow.pyspark.enabled", "true")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
# ship the package to the executors the spark-submit --py-files way:
# a zip added via addPyFile lands on every python worker's sys.path
# (the driver env is NOT inherited by the workers' python processes)
zip_path = store + "_kgloom.zip"
with zipfile.ZipFile(zip_path, "w") as zf:
    for f in glob.glob(os.path.join({repo!r}, "kgloom", "**", "*.py"),
                       recursive=True):
        zf.write(f, os.path.relpath(f, {repo!r}))
spark.sparkContext.addPyFile(zip_path)
warm_in = store + "_warm_in"
spark.read.parquet(input_path).limit(200_000) \
    .repartition(max(n_exec, 2)) \
    .write.mode("overwrite").parquet(warm_in)
compute_only = bool(int(sys.argv[5]))
if compute_only:
    # noop sink: excludes the box's single shared disk from the timed
    # window (a real N->4N scale-out brings per-node disks)
    from kgloom.transcripts.pipeline import construct_triples
    warm = spark.read.parquet(warm_in)
    construct_triples(spark, warm).write.format("noop") \
        .mode("overwrite").save()
    turns = spark.read.parquet(input_path)
    n_turns = turns.count()
    t0 = time.time()
    construct_triples(spark, turns).write.format("noop") \
        .mode("overwrite").save()
    wall = time.time() - t0
    print(json.dumps({{"cores": n_exec, "wall": round(wall, 2),
                       "turns": n_turns,
                       "turns_per_sec": round(n_turns / wall, 1)}}))
else:
    TranscriptPipeline(spark, store + "_warm").run(transcripts=warm_in)
    pipe = TranscriptPipeline(spark, store)
    t0 = time.time()
    res = pipe.run(transcripts=input_path)
    wall = time.time() - t0
    print(json.dumps({{"cores": n_exec, "wall": round(wall, 2),
                       "turns": res.metrics["turns"],
                       "triples": res.metrics["triples"],
                       "turns_per_sec":
                           round(res.metrics["turns"] / wall, 1)}}))
spark.stop()
"""


RUN_ONE_COMPUTE = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession
from kgloom.transcripts.pipeline import construct_triples

cores = int(sys.argv[1]); input_path = sys.argv[2]
spark = (SparkSession.builder.master(f"local[{{cores}}]")
         .appName(f"kgloom-scale-compute-{{cores}}")
         # >=4 task waves per core; see granularity note in RUN_ONE
         .config("spark.sql.shuffle.partitions", str(max(cores * 8, 16)))
         .config("spark.sql.files.maxPartitionBytes", str(32 * 1024 * 1024))
         .config("spark.driver.memory", "20g")
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.ui.enabled", "false")
         .config("spark.sql.execution.arrow.pyspark.enabled", "true")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
# identical warm-up policy to the full-pipeline runner: the whole
# dataflow once over a 200k-turn slice so codegen/shuffle are hot
warm = spark.read.parquet(input_path).limit(200_000)
construct_triples(spark, warm).write.format("noop").mode("overwrite").save()
turns = spark.read.parquet(input_path)
n_turns = turns.count()
t0 = time.time()
construct_triples(spark, turns).write.format("noop") \
    .mode("overwrite").save()
wall = time.time() - t0
print(json.dumps({{"cores": cores, "wall": round(wall, 2),
                   "turns": n_turns,
                   "turns_per_sec": round(n_turns / wall, 1)}}))
spark.stop()
"""


def generate_input(path: str, n_turns: int) -> None:
    code = f"""
import sys; sys.path.insert(0, {REPO!r})
from pyspark.sql import SparkSession
from kgloom.transcripts.generate import write_transcripts
spark = (SparkSession.builder.master("local[32]")
         .config("spark.driver.memory", "20g")
         .config("spark.sql.shuffle.partitions", "64")
         .config("spark.ui.enabled", "false")
         .config("spark.sql.execution.arrow.pyspark.enabled", "true")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
write_transcripts(spark, {path!r}, {n_turns},
                  n_convs=max(1000, {n_turns} // 200))
spark.stop()
"""
    subprocess.run([sys.executable, "-c", code], check=True)


def run_level(cores: int, input_path: str, store: str,
              compute_only: bool = False, isolated: bool = False,
              exec_mem_mb: int = 8192) -> dict:
    if isolated:
        script = RUN_ONE_CLUSTER
    elif compute_only:
        script = RUN_ONE_COMPUTE
    else:
        script = RUN_ONE
    argv = [sys.executable, "-c", script.format(repo=REPO), str(cores),
            input_path]
    if isolated:
        argv += [store, str(exec_mem_mb), str(int(compute_only))]
    elif not compute_only:
        argv.append(store)
    # the worker JVMs of local-cluster inherit this process's env;
    # keep PYTHONPATH out of it so the addPyFile zip is what the
    # python workers actually import from (the --py-files pathway)
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    out = subprocess.run(argv, check=True, capture_output=True, text=True,
                         env=env)
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    # drop this repeat's snapshot stores immediately: accumulating
    # multi-GB stores across repeats shrinks the page cache and slows
    # later repeats (observed: monotonically rising walls)
    for leftover in glob.glob(store + "*"):
        if os.path.isdir(leftover):
            shutil.rmtree(leftover, ignore_errors=True)
        else:
            os.remove(leftover)
    return json.loads(line)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--turns", type=int, default=4_000_000)
    ap.add_argument("--low", type=int, default=8)
    ap.add_argument("--high", type=int, default=32)
    ap.add_argument("--repeats", type=int, default=3,
                    help="interleaved repeats per level; min wall is used "
                         "(this VM shows sporadic kernel-side stalls — "
                         "min-of-N measures capability, not interference)")
    ap.add_argument("--update-md", action="store_true")
    ap.add_argument("--input", default=None,
                    help="reuse an existing transcripts parquet dir "
                         "instead of regenerating (must match --turns)")
    ap.add_argument("--isolated", action="store_true",
                    help="run each level as local-cluster[N,1,mem] — one "
                         "single-core executor JVM per 'node' (separate "
                         "heaps/GC, package shipped to python workers via "
                         "addPyFile, the spark-submit --py-files pathway); "
                         "--low/--high are EXECUTOR counts here")
    ap.add_argument("--exec-mem-mb", type=int, default=8192)
    ap.add_argument("--compute-only", action="store_true",
                    help="time the triple-construction dataflow with a "
                         "noop sink instead of the checkpointing pipeline: "
                         "on this single box every parallelism level shares "
                         "ONE disk, so snapshot-write bandwidth is a fixed "
                         "serial term that a real cluster (per-executor "
                         "disks) does not have — this mode measures the "
                         "compute scaling the cluster deployment would see")
    args = ap.parse_args()

    work = tempfile.mkdtemp(prefix="kgloom_scaling_")
    try:
        if args.input:
            input_path = args.input
        else:
            input_path = os.path.join(work, "input")
            generate_input(input_path, args.turns)
        lo_runs, hi_runs = [], []
        for r in range(args.repeats):
            lo_runs.append(run_level(args.low, input_path,
                                     os.path.join(work, f"s_lo_{r}"),
                                     compute_only=args.compute_only,
                                     isolated=args.isolated,
                                     exec_mem_mb=args.exec_mem_mb))
            hi_runs.append(run_level(args.high, input_path,
                                     os.path.join(work, f"s_hi_{r}"),
                                     compute_only=args.compute_only,
                                     isolated=args.isolated,
                                     exec_mem_mb=args.exec_mem_mb))
            print(json.dumps({"repeat": r, "low": lo_runs[-1],
                              "high": hi_runs[-1]}), file=sys.stderr)
        lo = min(lo_runs, key=lambda d: d["wall"])
        hi = min(hi_runs, key=lambda d: d["wall"])
        ratio = args.high / args.low
        eff = (hi["turns_per_sec"] / lo["turns_per_sec"]) / ratio
        if args.input and lo["turns"] != args.turns:
            print(json.dumps({"warning": "--turns does not match the reused "
                              "input; recording the measured row count",
                              "arg_turns": args.turns,
                              "measured_turns": lo["turns"]}),
                  file=sys.stderr)
        result = {
            # provenance: the MEASURED row count of the input actually
            # benchmarked (with --input a stale --turns would otherwise
            # silently misstate the run in BENCH/BASELINE.md)
            "turns": lo["turns"],
            "low": lo, "high": hi,
            "low_walls": [d["wall"] for d in lo_runs],
            "high_walls": [d["wall"] for d in hi_runs],
            "speedup": round(hi["turns_per_sec"] / lo["turns_per_sec"], 3),
            "scaling_efficiency": round(eff, 3),
        }
        print(json.dumps(result))
        if args.update_md:
            stamp = subprocess.run(["date", "-u", "+%Y-%m-%dT%H:%M:%SZ"],
                                   capture_output=True, text=True).stdout.strip()
            label = "local-cluster" if args.isolated else "local"
            suffix = f",1,{args.exec_mem_mb}" if args.isolated else ""
            if args.isolated:
                extra = (", compute-only noop sink"
                         if args.compute_only else "")
                mode = (f" (isolated: local-cluster[N,1,"
                        f"{args.exec_mem_mb}] — one single-core executor "
                        f"JVM per node, package shipped via "
                        f"addPyFile{extra})")
            elif args.compute_only:
                mode = (" (compute-only: noop sink, no snapshot writes — "
                        "single shared disk excluded)")
            else:
                mode = ""
            with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
                f.write(
                    f"\n## Scaling run {stamp}{mode}\n\n"
                    f"- input: {result['turns']:,} synthetic transcript turns "
                    f"(same parquet input for both levels; synthesis excluded "
                    f"from timing)\n"
                    f"- {label}[{args.low}{suffix}]: {lo['wall']}s → "
                    f"{lo['turns_per_sec']:,} turns/s\n"
                    f"- {label}[{args.high}{suffix}]: {hi['wall']}s → "
                    f"{hi['turns_per_sec']:,} turns/s\n"
                    f"- speedup {result['speedup']}× over {ratio:.0f}× cores → "
                    f"scaling efficiency **{result['scaling_efficiency']}**\n")
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
