"""Vertically partitioned quad store: IRI-predicate round trip,
partition pruning reaching the scan (the 100-TB point of the layout),
and skew-spreading bucket writes."""

import glob

from pyspark.sql import functions as F

from kgloom.ops.store import read_quads_store, write_quads_store

QUADS = [
    ("<http://ex.com/a>", "<http://ex.com/p?x=1&y=2>", '"v 1"', None),
    ("<http://ex.com/b>", "<http://ex.com/p?x=1&y=2>", "<http://ex.com/c>",
     "<http://ex.com/g>"),
    ("_:b0", "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>",
     "<http://ex.com/T>", None),
]
DDL = "subj string, pred string, obj string, graph string"


def explain_str(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


def test_store_roundtrip_iri_partitions(spark, tmp_path):
    path = str(tmp_path / "store")
    df = spark.createDataFrame(QUADS, DDL)
    write_quads_store(df, path)
    back = read_quads_store(spark, path)
    assert back.columns == ["subj", "pred", "obj", "graph"]
    assert sorted(map(tuple, back.collect())) == sorted(QUADS)
    # one directory per predicate, values escaped by Spark
    assert len(glob.glob(f"{path}/pred=*")) == 2


def test_constant_predicate_prunes_partitions(spark, tmp_path):
    path = str(tmp_path / "store")
    write_quads_store(spark.createDataFrame(QUADS, DDL), path)
    q = read_quads_store(spark, path).where(
        F.col("pred") ==
        "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>")
    plan = explain_str(q)
    # the predicate filter lands in PartitionFilters (metadata-level
    # pruning), not in the post-scan data filters
    part = plan.split("Partition Filters")[1].split("\n")[0] \
        if "Partition Filters" in plan else \
        plan.split("PartitionFilters")[1].split("\n")[0]
    assert "pred" in part
    assert q.count() == 1
    # SPARQL over the store inherits the pruning: constant-predicate
    # BGPs compile to the same where()
    from kgloom.sparql import sparql_select
    res = sparql_select(
        read_quads_store(spark, path).select("subj", "pred", "obj"),
        "SELECT ?s WHERE { ?s <http://ex.com/p?x=1&y=2> ?o }")
    assert res.count() == 2


def test_bucketed_write_spreads_skewed_predicate(spark, tmp_path):
    path = str(tmp_path / "store")
    big = spark.range(2000).select(
        F.concat(F.lit("<http://ex.com/s/"), F.col("id"), F.lit(">"))
        .alias("subj"),
        F.lit("<http://ex.com/hot>").alias("pred"),
        F.lit("<http://ex.com/o>").alias("obj"),
        F.lit(None).cast("string").alias("graph"))
    write_quads_store(big, path, n_buckets=4)
    files = [f for f in glob.glob(f"{path}/pred=*/part-*") ]
    assert len(files) >= 4  # the hot predicate wrote in parallel
    assert read_quads_store(spark, path).count() == 2000


def test_bucketed_store_join_without_exchange(spark, tmp_path):
    """The 100-TB point of the bucketed layout: a subj=subj star
    self-join over two slices of the bucketed table plans with ZERO
    Exchange and zero explicit Sort (bucket + sortBy co-location)."""
    from kgloom.ops.store import read_bucketed_store, write_bucketed_store
    path = str(tmp_path / "bucketed")
    df = spark.range(500).select(
        F.concat(F.lit("<http://ex.com/s/"), (F.col("id") % 100),
                 F.lit(">")).alias("subj"),
        F.when(F.col("id") < 250, "<http://ex.com/p1>")
         .otherwise("<http://ex.com/p2>").alias("pred"),
        F.concat(F.lit('"v'), F.col("id"), F.lit('"')).alias("obj"))
    write_bucketed_store(df, "kgloom_test_bucketed", path, n_buckets=4)
    t = read_bucketed_store(spark, "kgloom_test_bucketed")
    a = t.where(F.col("pred") == "<http://ex.com/p1>") \
         .select("subj", F.col("obj").alias("o1"))
    b = t.where(F.col("pred") == "<http://ex.com/p2>") \
         .select("subj", F.col("obj").alias("o2"))
    with_smj = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = a.join(b, "subj")
        plan = explain_str(j)
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan
        # correctness: same result as the pre-bucketing dataframe join
        a0 = df.where(F.col("pred") == "<http://ex.com/p1>") \
               .select("subj", F.col("obj").alias("o1"))
        b0 = df.where(F.col("pred") == "<http://ex.com/p2>") \
               .select("subj", F.col("obj").alias("o2"))
        want = sorted(map(tuple, a0.join(b0, "subj").collect()))
        assert sorted(map(tuple, j.collect())) == want
        assert len(want) == 600  # 100 subjects x (3x2 or 2x3) pairs
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", with_smj)


def test_bucketed_store_one_file_per_bucket(spark, tmp_path):
    """repartition-before-bucketBy: exactly one file per bucket, not
    tasks x buckets small files."""
    import glob as g
    from kgloom.ops.store import write_bucketed_store
    path = str(tmp_path / "bucketed2")
    df = spark.range(1000).select(
        F.concat(F.lit("s"), F.col("id")).alias("subj"),
        F.lit("<p>").alias("pred"), F.lit('"o"').alias("obj"))
    write_bucketed_store(df, "kgloom_test_bucketed2", path, n_buckets=8)
    files = g.glob(f"{path}/part-*")
    assert len(files) == 8, files


def test_sparql_star_bgp_over_bucketed_store(spark, tmp_path):
    """Integration: a star-shaped SPARQL BGP executed over the
    bucketed table inherits the co-location — the subject join plans
    without Exchange, straight from the SPARQL frontend."""
    from kgloom.ops.store import read_bucketed_store, write_bucketed_store
    from kgloom.sparql import sparql_select
    path = str(tmp_path / "bsparql")
    df = spark.range(300).select(
        F.concat(F.lit("<http://ex.com/s/"), (F.col("id") % 60),
                 F.lit(">")).alias("subj"),
        F.when(F.col("id") < 150, "<http://ex.com/name>")
         .otherwise("<http://ex.com/age>").alias("pred"),
        F.concat(F.lit('"v'), F.col("id"), F.lit('"')).alias("obj"))
    write_bucketed_store(df, "kgloom_test_bsparql", path, n_buckets=4)
    t = read_bucketed_store(spark, "kgloom_test_bsparql")
    thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        res = sparql_select(
            t, "SELECT ?s ?n ?a WHERE { ?s <http://ex.com/name> ?n . "
               "?s <http://ex.com/age> ?a }")
        plan = explain_str(res)
        assert "Exchange" not in plan, plan
        n = res.count()
        assert n > 0
        # correctness vs plain dataframe join on the raw frame
        a = df.where(F.col("pred") == "<http://ex.com/name>")
        b = df.where(F.col("pred") == "<http://ex.com/age>")
        assert n == a.join(b, "subj").count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
