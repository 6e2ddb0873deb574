"""Input fan-out for row-local heavy operators.

A single-file parquet scan's parallelism is capped by the file's
row-group count — the sf fixtures are ONE row group, so before r6 the
whole tokenize/gram/hash pipeline of every corpus operator ran on <=2
of 32 cores (measured: most docs-fixture bench stages showed "(1+1)/2"
tasks). ``widen_input`` fans such narrow inputs out to the session's
shuffle width before per-row-expensive compute; the exchange moves only
the narrow input bytes (MBs) and unlocks every core for compute that
costs orders of magnitude more.

At scale this is a NO-OP: an input already at (or reasonably near) the
session's parallelism is returned untouched, so no new exchange appears
in big-data plans (guide §2.5 — fix input skew by repartitioning right
after the read, and only then). The 4x guard keeps a moderately-wide
heavy input (say 100 x 1 GB partitions under a 128-partition session)
from being pointlessly shuffled for a <2x parallelism gain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def widen_input(df: DataFrame) -> DataFrame:
    """Round-robin repartition ``df`` up to the session's shuffle width
    iff it is much narrower than the session (cur * 4 <= target).
    Output-identical for every caller: all consumers are row-local
    projections, aggregations, or equi-joins whose results do not
    depend on physical row placement."""
    try:
        target = int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions")
        )
        cur = df.rdd.getNumPartitions()
    except Exception:  # pragma: no cover - defensive (streaming frames)
        return df
    if cur * 4 > target:
        return df
    return df.repartition(target)
