"""SearchEngine facade: build + query a persisted index.

Spark-first equivalent of ``sea/engine.pyx``'s ``Engine``: queries are
parsed on the driver (cheap, one string — ``sea/engine.pyx:584-610``),
compiled to a DataFrame plan over the block table, and executed as
``orderBy(score desc, doc_id asc).limit(k)`` (TakeOrderedAndProject, the
distributed analog of the reference's top-k sort at ``sea/engine.pyx:599``
under the documented tie-break contract)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cs_search_engine_architecture_spark.operators import indexer
from cs_search_engine_architecture_spark.plans.compiler import QueryCompiler
from cs_search_engine_architecture_spark.plans.query_parser import parse_query


class SearchEngine:
    def __init__(self, spark: SparkSession, index_path: str, cache: bool = True):
        self.spark = spark
        self.index_path = index_path
        self.meta = indexer.load_meta(index_path)
        self.blocks = indexer.load_blocks(spark, index_path)
        if cache:
            # analog of the reference's postings cache (sea/engine.pyx:314-324)
            self.blocks = self.blocks.persist()
        self.compiler = QueryCompiler(
            spark, self.blocks, self.meta["num_buckets"]
        )

    def search_df(self, query: str) -> DataFrame:
        """Full (unlimited) scored result set for ``query``."""
        ast = parse_query(query, analyzer=self.meta.get("analyzer", "reference"))
        return self.compiler.compile(ast)

    def search(self, query: str, top_k: int = 10) -> DataFrame:
        return (
            self.search_df(query)
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(top_k)
        )

    def search_collect(self, query: str, top_k: int = 10) -> list[tuple[int, float]]:
        import numpy as np

        return [
            (r["doc_id"], float(np.float32(r["score"])))
            for r in self.search(query, top_k).collect()
        ]

    def materialize(
        self, results: DataFrame, corpus: DataFrame, doc_id_col: str = "doc_id"
    ) -> DataFrame:
        """Join top-k doc_ids back to the source table (broadcast the small
        result side; ``sea/engine.pyx:400-422`` analog) and carry the
        per-row ``content_sha256`` invariant if present."""
        return corpus.join(F.broadcast(results), corpus[doc_id_col] == results["doc_id"]).drop(
            results["doc_id"]
        )
