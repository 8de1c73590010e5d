"""spark-submit entry point for the transcript KG pipeline.

The north rule requires the job to run "via spark-submit --py-files on
multi-executor clusters".  Package the library and submit::

    cd /root/repo && zip -qr /tmp/kgloom.zip kgloom
    $SPARK_HOME/bin/spark-submit \
        --master 'local-cluster[2,4,4096]' \
        --conf spark.executor.memory=3g \
        --py-files /tmp/kgloom.zip \
        scripts/submit_pipeline.py --turns 1000000 --store /tmp/kg_out

``local-cluster[N,cores,MB]`` starts N separate executor JVMs (real
worker processes with the zip shipped to each — the same code path a
YARN/K8s cluster uses); on a real cluster only ``--master`` changes.
Prints one JSON line of pipeline metrics.
"""

import argparse
import json
import sys
import tempfile


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--turns", type=int, default=100_000)
    p.add_argument("--convs", type=int, default=0,
                   help="0 = turns // 200")
    p.add_argument("--input", default=None,
                   help="existing transcripts parquet dir (skips synthesis)")
    p.add_argument("--store", default=None)
    p.add_argument("--shuffle-partitions", type=int, default=16)
    args = p.parse_args()

    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.appName("kgloom-submit")
             .config("spark.sql.shuffle.partitions",
                     str(args.shuffle_partitions))
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.execution.arrow.pyspark.enabled", "true")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    # imports resolve from the --py-files zip on every executor
    from kgloom.transcripts.generate import generate_transcripts
    from kgloom.transcripts.pipeline import TranscriptPipeline

    store = args.store or tempfile.mkdtemp(prefix="kgloom_submit_")
    pipe = TranscriptPipeline(spark, store)
    if args.input:
        res = pipe.run(transcripts=args.input)
    else:
        turns = generate_transcripts(
            spark, args.turns,
            n_convs=args.convs or max(100, args.turns // 200))
        res = pipe.run(transcripts=turns)
    out = dict(res.metrics)
    out["executors"] = spark.sparkContext.getConf().get("spark.master")
    print(json.dumps(out))
    spark.stop()
    sys.exit(0)


if __name__ == "__main__":
    main()
