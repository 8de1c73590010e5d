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
