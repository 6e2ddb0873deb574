"""Streaming percolation: saved-search alerting over a live document
stream. Each micro-batch of incoming docs is matched against the
registered queries (``operators/percolate.py`` — one tokenize pass, no
index read) and the (query_id, doc_id, batch_id) matches are appended
to a parquet alert log, partitioned by batch for idempotent replay
(Structured Streaming's foreachBatch is at-least-once; a replayed
batch OVERWRITES its own partition instead of double-appending).

This is the push half of the serving story: ``LiveStreamingIndexer``
makes new docs searchable (pull), ``PercolateStream`` fires standing
queries at them as they arrive (push) — both can share one source
stream. 100 TB shape: per batch the only distributed work is the
row-local tokenize of that batch plus one broadcast join against the
compiled query map; the alert log is append-only and never rewritten.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from cs_search_engine_architecture_spark.operators.percolate import (
    compile_percolator,
    percolate,
)


class PercolateStream:
    """Drives ``percolate`` per micro-batch and appends matches to
    ``alerts_path`` (parquet, partitioned by ``batch``). Queries are
    validated once at construction (driver-side compile) so a bad
    registration fails fast, not in batch 37."""

    def __init__(
        self,
        spark: SparkSession,
        queries: dict[str, str],
        alerts_path: str,
        fields=("text",),
        doc_id_col: str = "doc_id",
        analyzer: str = "reference",
        filters: dict[str, str] | None = None,
    ):
        compile_percolator(queries, analyzer)  # fail fast
        if filters:
            unknown = sorted(set(filters) - set(queries))
            if unknown:  # same fail-fast discipline as the queries
                raise ValueError(
                    f"filters for unregistered query ids {unknown}"
                )
        self.spark = spark
        self.queries = dict(queries)
        self.alerts_path = alerts_path
        self.fields = list(fields)
        self.doc_id_col = doc_id_col
        self.analyzer = analyzer
        self.filters = dict(filters) if filters else None
        self.checkpoint_dir = os.path.join(alerts_path, "_checkpoint")

    def _process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.take(1):
            return
        matches = percolate(
            self.spark,
            self.queries,
            batch_df,
            fields=self.fields,
            doc_id_col=self.doc_id_col,
            analyzer=self.analyzer,
            filters=self.filters,
        )
        # the batch id rides the hive-style dir name (partition
        # discovery restores it on read); writing it into the files too
        # would collide with the inferred partition column
        matches.write.mode("overwrite").parquet(
            os.path.join(self.alerts_path, f"batch={batch_id}")
        )

    def start(
        self, stream_df: DataFrame, available_now: bool = False
    ) -> StreamingQuery:
        writer = (
            stream_df.writeStream.foreachBatch(self._process_batch)
            .option("checkpointLocation", self.checkpoint_dir)
            .outputMode("append")
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()

    def ingest_available(self, stream_df: DataFrame) -> None:
        """Match everything currently in the source, then stop
        (resumes from the streaming checkpoint on the next call)."""
        q = self.start(stream_df, available_now=True)
        q.awaitTermination()

    def alerts(self) -> DataFrame:
        """(query_id, doc_id, batch) — every match fired so far.
        Before any non-empty batch has fired the log holds only the
        underscore-hidden checkpoint dir (no data files), which
        ``read.parquet`` refuses to infer a schema from — return the
        empty typed frame instead of crashing the caller."""
        if not any(
            e.startswith("batch=") for e in (
                os.listdir(self.alerts_path)
                if os.path.isdir(self.alerts_path) else ()
            )
        ):
            return self.spark.createDataFrame(
                [], "query_id string, doc_id long, batch int"
            )
        return self.spark.read.parquet(self.alerts_path)
