"""Corpus/table reference resolution: parquet paths OR catalog tables
(Iceberg at cluster scale).

The north rule's input is "an Iceberg table of source-code
repositories (repo, path, commit, lang, content)". Iceberg is a
CATALOG-LEVEL concern in Spark — once the session is configured with
an Iceberg catalog, reading is just ``spark.read.table("cat.db.tbl")``
and every downstream plan (predicate pushdown, partition pruning,
snapshot isolation) works unchanged, so the whole engine is
format-agnostic through this one resolver:

* ``/path/to/dir`` or ``*.parquet``  -> ``spark.read.parquet`` (what
  this container can exercise — no Iceberg runtime jar is installed);
* anything else                      -> ``spark.read.table`` (temp
  views, hive tables, and Iceberg catalog tables all resolve here).

Cluster session config for Iceberg (public Spark/Iceberg docs), passed
to spark-submit alongside ``--py-files dist/engine.zip``::

    --packages org.apache.iceberg:iceberg-spark-runtime-3.5_2.12:<ver>
    --conf spark.sql.extensions=org.apache.iceberg.spark.extensions.\
IcebergSparkSessionExtensions
    --conf spark.sql.catalog.lake=org.apache.iceberg.spark.SparkCatalog
    --conf spark.sql.catalog.lake.type=hadoop   # or hive/rest
    --conf spark.sql.catalog.lake.warehouse=<warehouse-uri>

then ``--input lake.db.code_files``. The north-rule row invariant
(content sha256 equality against the serving snapshot) is enforced at
materialization time by ``SearchEngine.materialize``/``assert_sha_ok``
regardless of source format.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def is_path_ref(ref: str) -> bool:
    """Heuristic: filesystem-ish references are parquet paths; dotted /
    bare identifiers are catalog tables."""
    return (
        ref.startswith(("/", "./", "../", "file:", "hdfs:", "s3:", "s3a:"))
        or ref.endswith(".parquet")
        or os.path.exists(ref)
    )


def read_corpus(spark: SparkSession, ref: str) -> DataFrame:
    """Resolve a corpus reference to a DataFrame (see module doc)."""
    if is_path_ref(ref):
        return spark.read.parquet(ref)
    return spark.read.table(ref)
