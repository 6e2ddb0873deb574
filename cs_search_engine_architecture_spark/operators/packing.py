"""Sequence packing: assign documents to fixed-length training
sequences by global token offset — the "pack the corpus into 2048-token
rows" step that precedes LLM training.

The core is a DISTRIBUTED PREFIX SUM over the corpus in doc_id order:
``start_offset(doc) = Σ n_tokens(doc') for doc' < doc``. A naive Spark
window (``sum().over(Window.orderBy("doc_id"))`` with no partitionBy)
collapses the whole corpus into ONE task — the canonical window-function
scale trap. Instead:

1. ``repartitionByRange(doc_id)`` + in-partition sort — each partition
   owns a contiguous doc_id range, ranges ordered by partition id;
2. one ``mapInPandas`` pass emits each doc's EXCLUSIVE local cumsum and
   its partition id (running state carries across the partition's Arrow
   batches — they arrive in order);
3. the per-partition totals (one tiny row each) come to the driver,
   their exclusive prefix sum becomes a broadcast (pid → base offset)
   map — bytes, not a shuffle;
4. ``start_offset = base(pid) + local_start``; sequence ids are then
   row-local integer division.

The output is independent of the (sampled) range boundaries: any
contiguous-range partitioning yields the same global offsets, so the
result is deterministic run-to-run even though repartitionByRange
samples. Everything is integer arithmetic — exact, fold-order-free.

A doc spans sequences [seq_first, seq_last] (documents cross sequence
boundaries, GPT-style packing); zero-token docs pin both to the
sequence at their offset.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_LOCAL_SCHEMA = "doc_id long, n long, local_start long, pid int"


def _local_cumsum(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    from pyspark import TaskContext

    pid = TaskContext.get().partitionId()
    total = 0
    for pdf in it:
        n = pdf["n"].astype("int64")
        starts = total + n.cumsum() - n
        total += int(n.sum())
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n": n,
                "local_start": starts,
                "pid": pid,
            }
        )


def pack_sequences(
    df: DataFrame,
    seq_len: int,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    num_partitions: int | None = None,
    order_col: str | None = None,
) -> DataFrame:
    """(doc_id, n_tokens, start_offset, seq_first, seq_last) — each
    doc's global token offset (prefix sum in doc_id order) and the
    range of ``seq_len``-token training sequences it lands in.

    ``order_col`` packs in a caller-chosen total order instead of
    doc_id (ties broken by id) — pass an epoch shuffle key
    (`curation.epoch_shuffle`) to pack sequences in the trainer's
    shuffled read order, the production shuffle-then-pack flow. Same
    two-phase prefix sum either way."""
    spark = df.sparkSession
    n_parts = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "32")
    )
    cols = [
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(tokens_col).cast("long").alias("n"),
    ]
    if order_col is not None:
        cols.append(F.col(order_col).cast("long").alias("_ord"))
    base = df.select(*cols)
    order = (["_ord", "doc_id"] if order_col is not None else ["doc_id"])
    ranged = base.repartitionByRange(n_parts, *order).sortWithinPartitions(
        *order
    )
    # PINNED via localCheckpoint: `local` is read twice (partition totals,
    # then the final join) and repartitionByRange SAMPLES its boundaries —
    # two independent executions can partition differently, desyncing the
    # broadcast bases from the second run's pids (observed: offsets drift
    # mid-corpus). One materialization = one set of boundaries.
    local = ranged.mapInPandas(_local_cumsum, _LOCAL_SCHEMA).localCheckpoint()
    # tiny: one row per partition; order by pid = global doc_id order
    totals = sorted(
        (r["pid"], r["t"])
        for r in local.groupBy("pid").agg(F.sum("n").alias("t")).collect()
    )
    offs, acc = [], 0
    for pid, t in totals:
        offs.append((pid, acc))
        acc += int(t or 0)
    off_df = spark.createDataFrame(offs or [(0, 0)], "pid int, base long")
    start = F.col("base") + F.col("local_start")
    return (
        local.join(F.broadcast(off_df), "pid")
        .select(
            "doc_id",
            F.col("n").alias("n_tokens"),
            start.alias("start_offset"),
            F.expr(f"(base + local_start) DIV {seq_len}").alias("seq_first"),
            F.expr(
                f"(base + local_start + greatest(n, 1L) - 1) DIV {seq_len}"
            ).alias("seq_last"),
        )
    )
