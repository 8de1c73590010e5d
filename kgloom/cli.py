"""Command-line interface — the reference translator's surface.

Parity target: `/root/reference/src/bin/translator/main.rs:23-84`:
``translator file <doc>`` and ``translator folder <dir>`` dispatch on
extension (.ttl → RML, .shexml → ShExML), emit ``<stem>.json``,
``<stem>.dot`` and ``<stem>_pretty.dot`` plan files next to the mapping
(serialize_and_log_msg, src/bin/translator/util.rs) — plus what the
reference cannot do: ``--execute`` runs the plan on Spark and writes
``<stem>.out.nq``.

Usage::

    python -m kgloom file mapping.ttl [--execute] [--master local[4]]
    python -m kgloom folder resources/csv-testcases [--execute]
"""

from __future__ import annotations

import argparse
import os
import sys


def _emit_plan(graph, stem: str) -> None:
    with open(stem + ".json", "w") as f:
        f.write(graph.to_json_string())
    with open(stem + ".dot", "w") as f:
        f.write(graph.to_dot())
    # reference parity: <stem>_pretty.dot for visualization
    # (serialize_and_log_msg, src/bin/translator/util.rs:15-19)
    with open(stem + "_pretty.dot", "w") as f:
        f.write(graph.to_dot(pretty=True))
    print(f"wrote {stem}.json, {stem}.dot, {stem}_pretty.dot")


def process_file(path: str, execute: bool, spark=None) -> bool:
    stem, ext = os.path.splitext(path)
    base_dir = os.path.dirname(os.path.abspath(path))
    if ext == ".ttl":
        from .engine import compile_rml
        from .rml.extract import RmlValidationError
        try:
            compiled = compile_rml(open(path).read())
        except RmlValidationError as e:
            print(f"{path}: invalid mapping: {e}", file=sys.stderr)
            return False
        _emit_plan(compiled.graph, stem)
        if execute:
            from .engine import run_rml_file
            _write_nquads(run_rml_file(spark, path, base_dir=base_dir), stem)
        return True
    if ext == ".json":
        # plans are data: execute an emitted plan JSON directly
        if execute:
            from .engine import run_plan_file
            _write_nquads(run_plan_file(spark, path, base_dir=base_dir),
                          stem + ".plan")
            return True
        from .plan import PlanGraph
        PlanGraph.from_json_string(open(path).read())  # validate
        print(f"{path}: valid plan JSON (pass --execute to run it)")
        return True
    if ext == ".shexml":
        from .shexml import parse_shexml, shexml_to_plan
        graph = shexml_to_plan(parse_shexml(open(path).read()))
        _emit_plan(graph, stem)
        if execute:
            from .engine import run_shexml
            # ShExML source URIs are relative to the document
            doc = parse_shexml(open(path).read())
            overrides = {n: os.path.join(base_dir, s.uri.lstrip("./"))
                         for n, s in doc.sources.items()
                         if not s.uri.startswith(("http://", "https://", "/"))}
            _write_nquads(run_shexml(spark, open(path).read(),
                                     base_dir=base_dir,
                                     source_overrides=overrides), stem)
        return True
    print(f"{path}: unsupported extension {ext}", file=sys.stderr)
    return False


def _write_nquads(df, stem: str) -> None:
    from .engine import nquads
    out = stem + ".out.nq"
    with open(out, "w") as f:
        for line in nquads(df):
            f.write(line + "\n")
    print(f"wrote {out}")


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="kgloom", description=__doc__)
    p.add_argument("mode", choices=["file", "folder"])
    p.add_argument("path")
    p.add_argument("--execute", action="store_true",
                   help="run the plan on Spark and write <stem>.out.nq")
    p.add_argument("--master", default="local[4]")
    args = p.parse_args(argv)

    spark = None
    if args.execute:
        from pyspark.sql import SparkSession
        spark = (SparkSession.builder.master(args.master)
                 .appName("kgloom-cli")
                 .config("spark.sql.shuffle.partitions", "8")
                 .config("spark.ui.enabled", "false")
                 .config("spark.sql.execution.arrow.pyspark.enabled", "true")
                 .getOrCreate())
        spark.sparkContext.setLogLevel("ERROR")

    ok = True
    if args.mode == "file":
        ok = process_file(args.path, args.execute, spark)
    else:
        # WalkDir depth ≤ 4 (main.rs:46-80)
        for root, _dirs, files in os.walk(args.path):
            depth = root[len(args.path):].count(os.sep)
            if depth > 4:
                continue
            for name in sorted(files):
                if name.endswith((".ttl", ".shexml")):
                    ok = process_file(os.path.join(root, name),
                                      args.execute, spark) and ok
    if spark is not None:
        spark.stop()
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
