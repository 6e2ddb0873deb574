"""Event-time streaming analytics: watermark + windowed aggregation
(stream == batch == DuckDB) and applyInPandasWithState sessionization
(closed sessions across REAL micro-batch boundaries == single-process
reference)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from cs_search_engine_architecture_spark.streaming import analytics as SA

EVENTS = "/root/testdata/sf0.001/events.parquet"
GAP = "60 minutes"
GAP_S = 3600.0


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(EVENTS)


def test_batch_window_counts_vs_duckdb(spark, events):
    got = {
        (r["window_start"], r["event_type"]): (
            r["n_events"],
            float(r["sum_value"]),
        )
        for r in SA.event_window_counts(events, "10 minutes").collect()
    }
    con = duckdb.connect()
    want = {
        (r[0], r[1]): (r[2], float(r[3]))
        for r in con.execute(
            f"""
            SELECT time_bucket(INTERVAL '10 minutes', ts) AS w, event_type,
                   count(*) AS n,
                   SUM(CAST(value AS DECIMAL(18,2))) AS sv
            FROM read_parquet('{EVENTS}') GROUP BY w, event_type
            """
        ).fetchall()
    }
    assert got == want and len(got) > 10


def test_streaming_window_counts_match_batch(spark, events, tmp_path):
    # the file stream source requires a DIRECTORY
    src = str(tmp_path / "events_dir")
    events.write.mode("overwrite").parquet(src)
    ckpt = str(tmp_path / "ckpt_win")
    out = SA.windowed_event_counts(
        spark, src, window="10 minutes", watermark="30 minutes"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["window_start"], r["event_type"]): (
            r["n_events"],
            float(r["sum_value"]),
        )
        for r in spark.sql("SELECT * FROM win_counts").collect()
    }
    want = {
        (r["window_start"], r["event_type"]): (
            r["n_events"],
            float(r["sum_value"]),
        )
        for r in SA.event_window_counts(events, "10 minutes").collect()
    }
    assert got == want


def test_sessionize_across_microbatches(spark, events, tmp_path):
    """Split the events into 4 time-ordered files and stream them with
    maxFilesPerTrigger=1: open-session state MUST survive micro-batch
    boundaries for the closed sessions to match the reference."""
    src = str(tmp_path / "events_split")
    # 4 time-ordered files (the operator's documented cross-batch
    # ordering contract)
    pdf_all = events.orderBy("ts").toPandas()
    ts_sorted = pdf_all["ts"]
    cuts = [0, len(pdf_all) // 4, len(pdf_all) // 2, 3 * len(pdf_all) // 4,
            len(pdf_all)]
    for i in range(4):
        part = pdf_all.iloc[cuts[i]:cuts[i + 1]]
        spark.createDataFrame(part).coalesce(1).write.mode(
            "overwrite" if i == 0 else "append"
        ).parquet(src)
    assert ts_sorted.is_monotonic_increasing

    ckpt = str(tmp_path / "ckpt_sess")
    q = (
        SA.sessionize_stream(spark, src, gap=GAP, max_files_per_trigger=1)
        .writeStream.format("memory")
        .queryName("sessions")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    n_batches = len(
        [p for p in q.recentProgress if p["numInputRows"] > 0]
    )
    got = sorted(
        (
            r["user_id"],
            round(r["session_start"].timestamp(), 3),
            round(r["session_end"].timestamp(), 3),
            r["n_events"],
            round(r["total_value"], 6),
        )
        for r in spark.sql("SELECT * FROM sessions").collect()
    )
    want = SA.sessionize_reference(
        pdf_all[["user_id", "ts", "value"]], GAP_S
    )
    want = sorted(
        (u, round(s, 3), round(e, 3), n, round(t, 6))
        for u, s, e, n, t in want
    )
    assert len(got) > 0
    assert got == want
    assert n_batches >= 4, f"expected >=4 micro-batches, saw {n_batches}"


def test_sessionizer_sorts_across_arrow_chunks():
    """One key's micro-batch events arrive as MULTIPLE Arrow chunks
    when the group exceeds maxRecordsPerBatch; disorder across a chunk
    boundary must still sessionize like one globally-sorted stream
    (per-chunk sorting let `last` move backwards: a negative gap never
    closes a session, silently corrupting boundaries)."""
    import pandas as pd

    from cs_search_engine_architecture_spark.streaming.analytics import (
        _sessionize_fn,
    )

    class FakeState:
        exists = False

        def update(self, v):
            self.val = v

    fn = _sessionize_fn(gap_seconds=10.0)
    # chunk 2 holds events EARLIER than chunk 1's tail
    chunk1 = pd.DataFrame({
        "ts": pd.to_datetime([100, 200], unit="s"),
        "value": [1.0, 1.0],
    })
    chunk2 = pd.DataFrame({
        "ts": pd.to_datetime([50, 150], unit="s"),
        "value": [1.0, 1.0],
    })
    state = FakeState()
    out = list(fn((1,), iter([chunk1, chunk2]), state))
    closed = [
        (int(r["session_start"].timestamp()), int(r["n_events"]))
        for pdf in out
        for r in pdf.to_dict("records")
    ]
    # global order 50,100,150,200 with gap 10 -> three closed
    # single-event sessions; the open one (200) stays in state
    assert closed == [(50, 1), (100, 1), (150, 1)]
    start, last, n, total = state.val
    assert (start, last, n, total) == (200.0, 200.0, 1, 1.0)
