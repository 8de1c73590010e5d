"""SQLQuery logical sources: SQLite files and JDBC databases.

Parity target: the reference IR's ``ReferenceFormulation::SQLQuery``
(`/root/reference/operator/src/formats.rs:5-12`) and ShExML's
first-class JDBC sources (`/root/reference/shexml-interpreter/src/
parser/type.rs:134-139,158-164`; fixture
``translator/resources/test/shexml/data/films.sqlite``).

Two execution paths:

- **SQLite** (``jdbc:sqlite:<path>`` / ``*.sqlite`` / ``*.db``): read
  on the driver via the stdlib ``sqlite3`` module, read-only URI mode,
  values stringified (matching the all-strings CSV ingest so golden
  lexical forms survive).  Like the document loader this is for
  mapping-sized fixtures — the same size guard applies; big relational
  data belongs on the JDBC path or (best) a columnar TABLE scan.
- **JDBC** (``jdbc:mysql:``/``jdbc:postgresql:``/...): delegated to
  Spark's distributed JDBC source (``spark.read.format("jdbc")``),
  which predicate-pushes the query to the database.  ``options`` may
  carry ``partitionColumn``/``lowerBound``/``upperBound``/
  ``numPartitions`` for a parallel partitioned read at scale — without
  them a JDBC read is a single task.  Requires the vendor driver jar
  on the Spark classpath (not bundled in this sandbox; exercised via
  the sqlite path in tests).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession

from .docsource import _check_document_size

SQLITE_SUFFIXES = (".sqlite", ".sqlite3", ".db", ".db3")


def sqlite_path(url: str) -> Optional[str]:
    """The filesystem path of a SQLite source URL, or None."""
    if url.startswith("jdbc:sqlite:"):
        return url[len("jdbc:sqlite:"):]
    if url.lower().endswith(SQLITE_SUFFIXES):
        return url
    return None


def load_sql_source(spark: SparkSession, url: str, query: str,
                    base_dir: Optional[str] = None,
                    options: Optional[dict] = None) -> DataFrame:
    """Execute ``query`` against the database at ``url`` → string-typed
    DataFrame (column names = result-set names)."""
    if not query:
        raise ValueError(f"SQL source {url!r} without a query")
    path = sqlite_path(url)
    if path is not None:
        if base_dir and not path.startswith("/"):
            path = f"{base_dir}/{path}"
        return _load_sqlite(spark, path, query)
    reader = (spark.read.format("jdbc")
              .option("url", url)
              .option("query", query.rstrip().rstrip(";")))
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    return reader.load()


def _load_sqlite(spark: SparkSession, path: str, query: str) -> DataFrame:
    import os
    import sqlite3

    if not os.path.exists(path):
        from .binder import BindError
        raise BindError(f"sqlite source file not found: {path}")
    _check_document_size(path)
    # read-only open: reference fixtures must never be mutated
    con = sqlite3.connect(f"file:{os.path.abspath(path)}?mode=ro", uri=True)
    try:
        cur = con.execute(query)
        cols = [d[0] for d in cur.description]
        rows = [tuple(None if v is None else str(v) for v in r)
                for r in cur.fetchall()]
    finally:
        con.close()
    schema = ", ".join(f"`{c}` string" for c in cols)
    return spark.createDataFrame(rows, schema)
