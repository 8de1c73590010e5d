"""Vertically partitioned triple/quad store.

The classic columnar-RDF layout (SW-Store / vertical partitioning,
Abadi et al., VLDB'07): quads land in one parquet partition directory
per predicate, so a BGP with a constant predicate — the overwhelmingly
common shape; every query in this repo's SPARQL family has one — reads
ONLY its predicate's files.  At 100 TB that is the difference between
scanning the store and scanning one relation: partition pruning
happens in the driver from directory metadata, before any file is
opened (plan-gated by ``tests/test_store.py`` — ``PartitionFilters``
on the scan, data filters empty).

Spark handles the awkward part natively: partition directory values
are escaped on write and restored on read (``pred=%3Chttp%3A...%3E``),
so IRI predicates round-trip exactly.

Predicate skew (rdf:type-sized partitions) is handled below the
partition level: files within a partition split at
``maxPartitionBytes``, and ``n_buckets`` optionally spreads each
predicate's rows across writer tasks by subject hash so one giant
predicate still writes in parallel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_quads_store(df: DataFrame, path: str, *,
                      partition_by: str = "pred",
                      n_buckets: int = 0,
                      mode: str = "overwrite") -> None:
    """Write quads partitioned by ``partition_by`` (default: the
    vertical-partitioning predicate layout).  ``n_buckets > 0``
    hash-repartitions by subject into exactly that many writer tasks
    (an explicit count, which AQE does not coalesce away) — a skewed
    predicate's rows then write in parallel from every task instead of
    funneling into one."""
    out = df
    if n_buckets > 0:
        out = out.repartition(n_buckets, "subj")
    out.write.mode(mode).partitionBy(partition_by).parquet(path)


def read_quads_store(spark: SparkSession, path: str) -> DataFrame:
    """Scan the store; the partition column is restored into standard
    column order.  Constant-predicate filters applied downstream (by
    SPARQL BGP binding or plain ``where``) prune to the matching
    partition directories."""
    df = spark.read.parquet(path)
    order = [c for c in ("subj", "pred", "obj", "graph")
             if c in df.columns]
    rest = [c for c in df.columns if c not in order]
    return df.select(*order, *rest)


def write_bucketed_store(df: DataFrame, table: str, path: str, *,
                         n_buckets: int = 32,
                         mode: str = "overwrite") -> None:
    """Subject-bucketed, subject-sorted parquet table registered in
    the session catalog — the co-located layout for star-shaped BGP
    self-joins (``?s p1 ?a . ?s p2 ?b``) and subject-keyed entity
    assembly: both sides of a ``subj = subj`` join read the SAME
    bucket files, so the join plans with ZERO Exchange and (because
    of ``sortBy``) zero Sort — plan-gated in tests/test_store.py.
    At 100 TB this turns every entity-assembly pipeline stage from a
    full shuffle of the store into a bucket-local merge.

    The ``repartition(n_buckets, "subj")`` BEFORE the bucketed write
    matters: Spark buckets rows per writer task, so T tasks × B
    buckets would otherwise emit T·B small files; pre-partitioning by
    the SAME hash (both are Murmur3 on the bucket column) lands each
    bucket's rows in exactly one task → exactly one file per bucket.

    Bucketing metadata lives in the catalog (``spark.table(table)``),
    not the parquet footers — reading the path directly loses it.
    """
    (df.repartition(n_buckets, "subj")
       .write.mode(mode).format("parquet")
       .bucketBy(n_buckets, "subj").sortBy("subj")
       .option("path", path)
       .saveAsTable(table))


def read_bucketed_store(spark: SparkSession, table: str) -> DataFrame:
    """Catalog read of a :func:`write_bucketed_store` table; scans
    report the bucket hash partitioning, so subject-keyed joins and
    aggregations over it skip their Exchange."""
    return spark.table(table)
