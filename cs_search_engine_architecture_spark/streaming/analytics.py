"""Event-time streaming analytics over the ``events`` table
(event_id, ts, user_id, event_type, value, props).

The brief's Structured-Streaming surface beyond corpus ingest
(``streaming/ingest.py``): ``readStream`` → event-time transformations →
``writeStream``, with

* **watermark + windowed aggregation** — ``windowed_event_counts``
  (stream) and ``event_window_counts`` (batch) are built from ONE
  aggregation expression, so ``stream == batch == DuckDB oracle``
  chains: the driver gate value-checks the batch form against DuckDB's
  ``time_bucket``, and the streaming test pins the streaming result to
  the batch form. Aggregated values use DECIMAL sums — decimal addition
  is exact and associative, so the result is bit-stable under Spark's
  nondeterministic aggregation order (the same reason the BM25 gates
  restrict float sums to two addends).
* **custom stateful operator** — ``sessionize_stream`` groups each
  user's events into gap-based sessions with
  ``applyInPandasWithState`` (bounded per-user state carried across
  micro-batches: the open session's start/last/count/sum). Closed
  sessions are emitted as soon as the closing event arrives; the final
  open session per user remains in state (flushed by timeout in a
  continuous deployment — the test asserts closed sessions against a
  pandas reference implementation).

Scale shape: the windowed agg is a standard streaming shuffle on
(window, event_type) with partial aggregation; sessionization shuffles
by user_id once per micro-batch and holds O(1) state per user — both
are the canonical Structured Streaming patterns for 100 TB event
streams. Ordering contract for sessionization: events for a user
arrive time-ordered ACROSS micro-batches (in-batch disorder is sorted
inside the function); out-of-watermark stragglers would need an
event-time-timeout buffer, intentionally out of scope here.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)

SESSION_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events int, total_value double"
)

_STATE_SCHEMA = "start double, last double, n int, total double"


def _window_agg(df: DataFrame, window: str) -> DataFrame:
    """The shared aggregation expression (batch and stream)."""
    return (
        df.groupBy(
            F.window("ts", window).getField("start").alias("window_start"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("decimal(28,2)")
            .alias("sum_value"),
        )
    )


def event_window_counts(events: DataFrame, window: str = "10 minutes") -> DataFrame:
    """Batch form: per (tumbling window start, event_type) counts and
    exact decimal value sums."""
    return _window_agg(events, window)


def windowed_event_counts(
    spark: SparkSession,
    events_dir: str,
    window: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Streaming form: file-source readStream + event-time watermark +
    the SAME windowed aggregation. Write with
    ``.writeStream.outputMode("complete")`` (or append once the
    watermark passes a window's end in a continuous deployment)."""
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA).parquet(events_dir)
        .withWatermark("ts", watermark)
    )
    return _window_agg(stream, window)


def _sessionize_fn(gap_seconds: float):
    import numpy as np  # noqa: F401 — pandas ops only

    def fn(key, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            start, last, n, total = state.get
        else:
            start = last = None
            n, total = 0, 0.0
        out_rows = []
        # one global sort over the WHOLE batch for this key: the group
        # arrives as multiple Arrow chunks when it exceeds
        # maxRecordsPerBatch, and sorting each chunk independently
        # would let disorder across a chunk boundary move `last`
        # backwards and corrupt session boundaries silently
        chunks = [pdf for pdf in pdfs if len(pdf)]
        batch = (
            pd.concat(chunks).sort_values("ts") if chunks else None
        )
        if batch is not None:
            for ts, value in zip(batch["ts"], batch["value"]):
                t = ts.timestamp()
                if last is not None and t - last > gap_seconds:
                    out_rows.append((user_id, start, last, n, total))
                    start, n, total = t, 0, 0.0
                if start is None:
                    start = t
                last = t
                n += 1
                total += float(value)
        # epoch floats: integer truncation here would drift cross-batch
        # gap comparisons by up to a second
        state.update((float(start), float(last), int(n), float(total)))
        if out_rows:
            import numpy as np

            def _us(vals):
                # microsecond-aligned timestamps (Spark timestamps are
                # us; raw float->ns values fail the lossless cast)
                return pd.to_datetime(
                    np.round(np.asarray(vals) * 1e6).astype("int64"),
                    unit="us",
                )

            yield pd.DataFrame(
                {
                    "user_id": pd.Series(
                        [r[0] for r in out_rows], dtype="int64"
                    ),
                    "session_start": _us([r[1] for r in out_rows]),
                    "session_end": _us([r[2] for r in out_rows]),
                    "n_events": pd.Series(
                        [r[3] for r in out_rows], dtype="int32"
                    ),
                    "total_value": pd.Series(
                        [r[4] for r in out_rows], dtype="float64"
                    ),
                }
            )

    return fn


def sessionize_stream(
    spark: SparkSession,
    events_dir: str,
    gap: str = "30 minutes",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Gap-based sessionization as a CUSTOM STATEFUL streaming operator
    (``applyInPandasWithState``): per-user open-session state
    (start, last, count, sum) carries across micro-batches; a closed
    session row is emitted when the first event beyond the gap
    arrives (state stores epoch seconds as doubles — sub-second
    precision survives micro-batch boundaries)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    gap_seconds = _parse_gap_seconds(gap)
    reader = spark.readStream.schema(EVENTS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(events_dir)
    return (
        stream.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_fn(gap_seconds),
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def _parse_gap_seconds(gap: str) -> float:
    qty, unit = gap.split()
    mult = {
        "second": 1, "seconds": 1, "minute": 60, "minutes": 60,
        "hour": 3600, "hours": 3600,
    }[unit]
    return float(qty) * mult


def sessionize_reference(pdf: pd.DataFrame, gap_seconds: float):
    """Single-process reference: closed sessions only (the streaming
    operator's contract), as (user_id, start_epoch, end_epoch, n, total)."""
    out = []
    for uid, g in pdf.sort_values(["user_id", "ts"]).groupby("user_id"):
        start = last = None
        n, total = 0, 0.0
        for ts, value in zip(g["ts"], g["value"]):
            t = ts.timestamp()
            if last is not None and t - last > gap_seconds:
                out.append(
                    (uid, round(start, 6), round(last, 6), n, round(total, 6))
                )
                start, n, total = t, 0, 0.0
            if start is None:
                start = t
            last = t
            n += 1
            total += float(value)
    return sorted(out)
