"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship reference-analyzer pipeline end-to-end on
sf0.001; ``queries``/``oracle_sql`` are the sf0.01 DuckDB-checked gate
(implementations in ``cs_search_engine_architecture_spark/gate.py``).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from cs_search_engine_architecture_spark import gate  # noqa: E402
from cs_search_engine_architecture_spark.engine import SearchEngine  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: build the reference-analyzer inverted index over the
    sf0.001 documents corpus, run a boolean+phrase BM25 query through the
    full compile path, and materialize the top-10 back against the corpus."""
    sf_dir = "/root/testdata/sf0.001"
    eng: SearchEngine = gate.gate_engine(spark, sf_dir, analyzer="reference")
    top = eng.search('spark and (shuffle or "hash join")', top_k=10)
    corpus = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return eng.materialize(top, corpus).select(
        "doc_id", "score", "text", "lang", "source"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return gate.queries()


def oracle_sql() -> dict[str, str]:
    return gate.oracle_sql()
