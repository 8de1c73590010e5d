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
