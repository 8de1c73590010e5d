"""SnapshotStore: parquet-snapshot mode invariants + the gated real
Iceberg code path (runs only when an Iceberg runtime jar is present —
this sandbox has none, so the Iceberg test documents-and-skips)."""

import pytest

from kgloom.tables import SnapshotStore


def _has_iceberg(spark) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def test_parquet_snapshot_commit_and_read(spark, tmp_path):
    store = SnapshotStore(spark, str(tmp_path))
    df = spark.range(10).selectExpr("id", "id * 2 AS v")
    snap = store.write("t", df, parents=["p1"], extra_metrics={"k": 1})
    assert snap.manifest["row_count"] == 10
    assert snap.manifest["parents"] == ["p1"]
    assert snap.manifest["partition_row_counts"]  # per-file lineage
    assert store.read("t").count() == 10
    # second commit flips the pointer; both snapshots remain on disk
    store.write("t", spark.range(3).selectExpr("id", "id AS v"))
    assert store.read("t").count() == 3
    assert len(store.snapshots("t")) == 2


def test_iceberg_write_path(spark, tmp_path):
    """Real writeTo(...).createOrReplace() commit — executable on any
    cluster with the Iceberg runtime; skipped here (no jar baked in)."""
    if not _has_iceberg(spark):
        pytest.skip("no Iceberg runtime jar on the classpath")
    cat = "kgloom_it"
    spark.conf.set(f"spark.sql.catalog.{cat}",
                   "org.apache.iceberg.spark.SparkCatalog")
    spark.conf.set(f"spark.sql.catalog.{cat}.type", "hadoop")
    spark.conf.set(f"spark.sql.catalog.{cat}.warehouse",
                   str(tmp_path / "warehouse"))
    store = SnapshotStore(spark, str(tmp_path / "store"),
                          iceberg_catalog=cat)
    df = spark.range(5).selectExpr("id", "id * 3 AS v")
    snap = store.write("t", df)
    assert snap.manifest["iceberg_table"] == f"{cat}.kgloom.t"
    assert snap.manifest["row_count"] == 5
    assert store.read("t").count() == 5


def test_read_at_time_travel(spark, tmp_path):
    """read_at: any committed snapshot stays readable after the
    pointer moves on (VERSION AS OF semantics), and composes with
    SPARQL for point-in-time KG queries."""
    from kgloom.sparql import sparql_select
    store = SnapshotStore(spark, str(tmp_path))
    t1 = spark.createDataFrame(
        [("<a>", "<p>", '"v1"')], "subj string, pred string, obj string")
    s1 = store.write("kg", t1)
    t2 = spark.createDataFrame(
        [("<a>", "<p>", '"v1"'), ("<b>", "<p>", '"v2"')],
        "subj string, pred string, obj string")
    store.write("kg", t2)
    assert store.read("kg").count() == 2          # latest
    old = store.read_at("kg", s1.snapshot_id)
    assert sorted(map(tuple, old.collect())) == [("<a>", "<p>", '"v1"')]
    res = sparql_select(old, 'SELECT ?s WHERE { ?s <p> ?o }')
    assert [r.s for r in res.collect()] == ["a"]  # lexical form
    with pytest.raises(FileNotFoundError):
        store.read_at("kg", "snap-nope")


def test_merge_upsert_insert_delete(spark, tmp_path):
    from kgloom.tables import SnapshotStore
    store = SnapshotStore(spark, str(tmp_path / "store"))
    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k int, v string")
    s0 = store.write("t", base)
    updates = spark.createDataFrame(
        [(2, "B", False),        # matched -> update
         (4, "d", False),        # not matched -> insert
         (3, None, True)],       # matched + delete marker -> delete
        "k int, v string, del boolean")
    s1 = store.merge("t", updates, keys=["k"], delete_col="del")
    got = sorted(map(tuple, store.read("t").collect()))
    assert got == [(1, "a"), (2, "B"), (4, "d")]
    assert s1.manifest["parents"] == [s0.snapshot_id]
    assert s1.manifest["metrics"]["merge"] is True
    # parent snapshot still time-travelable
    old = sorted(map(tuple, store.read_at("t", s0.snapshot_id).collect()))
    assert old == [(1, "a"), (2, "b"), (3, "c")]


def test_merge_without_delete_col(spark, tmp_path):
    from kgloom.tables import SnapshotStore
    store = SnapshotStore(spark, str(tmp_path / "store"))
    store.write("t", spark.createDataFrame([(1, "a")], "k int, v string"))
    store.merge("t", spark.createDataFrame(
        [(1, "A"), (2, "b")], "k int, v string"), keys=["k"])
    got = sorted(map(tuple, store.read("t").collect()))
    assert got == [(1, "A"), (2, "b")]


def test_compact_rewrites_layout_not_content(spark, tmp_path):
    from kgloom.tables import SnapshotStore
    store = SnapshotStore(spark, str(tmp_path / "store"))
    df = spark.range(1000).selectExpr("id AS k", "id % 7 AS v") \
        .repartition(8)
    s0 = store.write("t", df)
    assert len(s0.manifest["partition_row_counts"]) > 1
    s1 = store.compact("t", 1)
    assert len(s1.manifest["partition_row_counts"]) == 1
    assert s1.manifest["row_count"] == 1000
    assert s1.manifest["parents"] == [s0.snapshot_id]
    a = sorted(map(tuple, store.read_at("t", s0.snapshot_id).collect()))
    b = sorted(map(tuple, store.read("t").collect()))
    assert a == b


def test_expire_snapshots_keeps_latest(spark, tmp_path):
    from kgloom.tables import SnapshotStore
    store = SnapshotStore(spark, str(tmp_path / "store"))
    ids = [store.write("t", spark.createDataFrame([(i,)], "k int"))
           .snapshot_id for i in range(4)]
    expired = store.expire_snapshots("t", keep_last=2)
    assert expired == ids[:2]
    assert store.snapshots("t") == ids[2:]
    assert store.read("t").count() == 1  # latest unharmed
