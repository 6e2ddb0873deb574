"""Similarity search over an embedding column (``array<float>``):
brute-force cosine top-k (the exactness baseline, reference R3 —
``sea/engine.pyx:555-565`` does the same brute-force matmul) and a
random-hyperplane LSH-bucketed variant (the 100 TB scale path).

Scale shape:

* **brute force** — one scan, row-local double-precision dot product
  (whole-stage codegen via ``aggregate``/``zip_with``; no UDF, no
  shuffle), then ``orderBy(desc).limit(k)`` = TakeOrderedAndProject:
  per-partition top-k heaps, only k rows per partition reach the driver.
* **LSH** — bucket ids are row-local sign-bit math from deterministic
  md5-derived hyperplanes; the probe prunes to ``bucket = q_bucket``
  before any scoring, so the scored row count drops by ~2^planes. The
  bucket column is write-time partitionable (``partitionBy(bucket)``)
  for partition pruning on a persisted embedding table.

Both paths share ``functions.dialect`` fragments with the DuckDB gate
oracles, so results are bit-identical after the float32 cast policy.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cs_search_engine_architecture_spark.functions import dialect as D
from cs_search_engine_architecture_spark.operators.partitioning import (
    widen_input,
)

NUM_PLANES = 8
DIMS = 64


def _qvec_lit(qvec: Sequence[float]):
    return F.array(*[F.lit(float(x)) for x in qvec])


def cosine_scores(
    emb: DataFrame,
    qvec: Sequence[float],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cos) for every row: double-precision fold, float32-cast."""
    qn = sum(float(x) * float(x) for x in qvec) ** 0.5
    df = widen_input(emb).select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        _qvec_lit(qvec).alias("q"),
    )
    cos = (
        F.expr(D.dot_product(D.SPARK, "v", "q"))
        / (F.expr(D.l2_norm(D.SPARK, "v")) * F.lit(qn))
    )
    return df.select("id", cos.cast("float").cast("double").alias("cos"))


def brute_force_topk(
    emb: DataFrame,
    qvec: Sequence[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    predicate=None,
) -> DataFrame:
    """Exact cosine top-k (deterministic tie-break: cos desc, id asc).

    ``predicate`` (SQL string or Column over the embedding table's
    columns) is PRE-filter semantics — rows are filtered before any
    scoring, so the result is the exact top-k of the admitted set
    (never fewer than k admitted hits because k were spent on filtered
    rows, the failure mode of post-filtering an ANN result). The
    filter runs on the scan, so parquet pushdown prunes first."""
    if predicate is not None:
        emb = emb.where(predicate)
    return (
        cosine_scores(emb, qvec, id_col, vec_col)
        .orderBy(F.desc("cos"), F.asc("id"))
        .limit(k)
    )


def lsh_buckets(
    emb: DataFrame,
    num_planes: int = NUM_PLANES,
    dims: int = DIMS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, bucket, v) — random-hyperplane sign-bit bucket per row.
    Hyperplane coefficients are ±1 values derived from md5(plane, dim),
    so driver, executors, and the DuckDB oracle all agree without
    shipping a plane matrix."""
    return emb.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        F.expr(D.lsh_bucket(D.SPARK, vec_col, num_planes, dims))
        .cast("int")
        .alias("bucket"),
    )


def _plane_dots(qvec: Sequence[float], num_planes: int) -> list:
    """Driver-side per-plane signed dot products over THE coefficient
    rows the SQL bucketing embeds (``dialect.hyperplane_coefs`` is the
    single source — a re-derived copy here could silently diverge and
    probe the wrong partition with no error)."""
    dots = []
    for p in range(num_planes):
        coefs = D.hyperplane_coefs(p, len(qvec))
        dot = 0.0
        for x, coef in zip(qvec, coefs):
            dot += float(x) * coef
        dots.append(dot)
    return dots


def bucket_of(qvec: Sequence[float], num_planes: int = NUM_PLANES) -> int:
    """Driver-side bucket of a query vector (same md5 hyperplanes)."""
    bucket = 0
    for p, dot in enumerate(_plane_dots(qvec, num_planes)):
        if dot > 0:
            bucket |= 1 << p
    return bucket


def multiprobe_buckets(
    qvec: Sequence[float], n_buckets: int, num_planes: int = NUM_PLANES
) -> list[int]:
    """Standard multi-probe LSH probe sequence (Lv et al., VLDB'07
    shape): the exact bucket first, then neighbor buckets in ascending
    flip cost, where flipping a plane costs |dot| (the margin by which
    the query cleared that hyperplane — small margin means near
    neighbors plausibly landed on the other side). Flip sets are
    enumerated cheapest-first over subsets of the planes; driver-side
    only (2^planes is small), the probe itself stays a partition-pruned
    ``bucket IN (...)`` scan."""
    import heapq

    dots = _plane_dots(qvec, num_planes)
    base = 0
    for p, dot in enumerate(dots):
        if dot > 0:
            base |= 1 << p
    order = sorted(range(num_planes), key=lambda p: abs(dots[p]))
    # heap of (cost, last-flipped rank, frozenset of ranks): expand by
    # extending or shifting the last rank — the classic generator that
    # yields subsets in nondecreasing total cost without enumerating 2^n.
    heap = [(abs(dots[order[0]]), 0, (0,))]
    out = [base]
    while heap and len(out) < n_buckets:
        cost, last, ranks = heapq.heappop(heap)
        mask = 0
        for r in ranks:
            mask |= 1 << order[r]
        out.append(base ^ mask)
        if last + 1 < num_planes:
            nxt = abs(dots[order[last + 1]])
            heapq.heappush(heap, (cost + nxt, last + 1, ranks + (last + 1,)))
            heapq.heappush(
                heap,
                (cost - abs(dots[order[last]]) + nxt, last + 1, ranks[:-1] + (last + 1,)),
            )
    return out[:n_buckets]


def build_ann_index(
    emb: DataFrame,
    out_path: str,
    num_planes: int = NUM_PLANES,
    dims: int = DIMS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    meta_cols: Sequence[str] | None = None,
) -> None:
    """Persist the embeddings bucketed by LSH bucket: one directory per
    bucket (``partitionBy``), so a probe's ``bucket = q`` predicate is
    pure partition pruning — the scan reads 1/2^planes of the table.
    This is the write-time form of ``lsh_topk`` (which recomputes
    buckets per query and exists for ad-hoc frames).

    ``meta_cols`` bakes filterable attribute columns (lang, source,
    timestamps, ...) into the index rows — the standard filtered-ANN
    layout (attrs travel WITH the vectors so a probe's ``predicate``
    evaluates on the pruned scan, no join back to the corpus at query
    time). One equi-join on the id at build time; query cost unchanged
    when unused.

    The frame is repartitioned ON the partition key before the write:
    without it every input partition opens a writer per bucket
    (32 tasks x 2^planes buckets = thousands of tiny files and a
    driver-side commit storm — measured 196s for a 3k-row build); with
    it each bucket lands in exactly one task, so the file count is
    O(buckets) regardless of input parallelism. At 100 TB this is the
    difference between a usable index layout and a small-files
    incident."""
    rows = lsh_buckets(emb, num_planes, dims, id_col, vec_col)
    if meta_cols:
        rows = rows.join(
            emb.select(F.col(id_col).alias("id"), *meta_cols), "id"
        )
    rows.withColumnRenamed(
        "id", id_col
    ).withColumnRenamed("v", vec_col).repartition(F.col("bucket")).write.mode(
        "overwrite"
    ).partitionBy(
        "bucket"
    ).parquet(out_path)


def ann_search(
    spark,
    index_path: str,
    qvec: Sequence[float],
    k: int = 10,
    num_planes: int = NUM_PLANES,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_probe_buckets: int = 1,
    predicate=None,
) -> DataFrame:
    """Probe a persisted ANN index: partition-pruned bucket scan +
    exact cosine over the candidates. ``n_probe_buckets > 1`` probes
    the multi-probe sequence (exact bucket + cheapest-flip neighbors,
    see ``multiprobe_buckets``) — still pure partition pruning via
    ``bucket IN (...)``, scanning n/2^planes of the table. Default 1
    keeps the original single-bucket semantics (and the gate oracle).

    ``predicate`` filters on columns baked into the index
    (``build_ann_index(meta_cols=...)``) BEFORE scoring — exact top-k
    of the admitted candidates within the probed buckets, evaluated on
    the pruned scan (parquet pushdown, no corpus join)."""
    probe = multiprobe_buckets(list(qvec), n_probe_buckets, num_planes)
    qn = sum(float(x) * float(x) for x in qvec) ** 0.5
    cand = spark.read.parquet(index_path).where(F.col("bucket").isin(probe))
    if predicate is not None:
        cand = cand.where(predicate)
    cand = cand.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v")
    ).withColumn("q", _qvec_lit(qvec))
    cos = (
        F.expr(D.dot_product(D.SPARK, "v", "q"))
        / (F.expr(D.l2_norm(D.SPARK, "v")) * F.lit(qn))
    )
    return (
        cand.select("id", cos.cast("float").cast("double").alias("cos"))
        .orderBy(F.desc("cos"), F.asc("id"))
        .limit(k)
    )


def kmeans_centroids(
    emb: DataFrame,
    num_centroids: int = 16,
    iters: int = 10,
    sample: int = 10_000,
    seed: int = 13,
    vec_col: str = "embedding",
):
    """Deterministic coarse quantizer for IVF: numpy Lloyd's k-means on a
    driver-side sample (the quantizer is tiny and global — training it on
    a bounded sample is the standard IVF recipe; assignment of the full
    table stays distributed). Returns a (C, dims) float64 array.

    The sample is a seeded hash-order top-N, NOT ``limit(sample)``:
    ``limit`` takes the head of the first partitions, so on any
    cluster-correlated layout (embeddings written in doc order, topic ~
    position) the quantizer would train on one region of the space and
    recall degrades silently. Hash-ordering is layout-independent and
    deterministic for a fixed seed, and the plan is TakeOrdered (per-
    partition top-N + driver merge of N rows), not a full sort."""
    import numpy as np

    rows = (
        emb.select(vec_col)
        .orderBy(F.xxhash64(F.col(vec_col), F.lit(int(seed))))
        .limit(sample)
        .collect()
    )
    x = np.array([r[0] for r in rows], dtype=np.float64)
    rng = np.random.default_rng(seed)
    cents = x[rng.choice(len(x), size=min(num_centroids, len(x)), replace=False)]
    # Training distances use the GEMM expansion |x|^2 - 2x.c^T + |c|^2
    # (one matmul per iteration), NOT the strict left-fold: the broadcast
    # form ((x[:,None,:]-cents)^2).sum(2) materializes a sample x C x dims
    # temp (~330 MB at 10k x 64 x 64) and measured ~9 s/iteration on this
    # box — 95 s of a 112 s index build. Only SERVING cell assignment
    # (ivf_assign -> _l2_d2_leftfold) must match the oracle bitwise; the
    # trained quantizer is just geometry, and GEMM is still deterministic
    # for fixed inputs.
    x2 = (x * x).sum(axis=1)[:, None]
    for _ in range(iters):
        d2 = x2 - 2.0 * (x @ cents.T) + (cents * cents).sum(axis=1)[None, :]
        assign = d2.argmin(axis=1)
        for c in range(len(cents)):
            m = assign == c
            if m.any():
                cents[c] = x[m].mean(axis=0)
    return cents


def _l2_d2_leftfold(x, cents):
    """(rows, C) squared distances with STRICT LEFT-FOLD accumulation
    over dimensions — the same IEEE addition order as the
    ``dialect.l2_dist_sq`` SQL fragment, so cell assignments agree
    bitwise with the DuckDB gate oracle (the expanded
    ``|x|²-2x·c+|c|²`` form differs in the last ulps and can flip
    argmin on near-equidistant centroids). C·dims vectorized ops over
    the batch — still Arrow-batched numpy, negligible next to I/O."""
    import numpy as np

    n, c = len(x), len(cents)
    d2 = np.zeros((n, c), dtype=np.float64)
    for ci in range(c):
        acc = np.zeros(n, dtype=np.float64)
        for d in range(cents.shape[1]):
            diff = x[:, d] - cents[ci, d]
            acc = acc + diff * diff
        d2[:, ci] = acc
    return d2


def ivf_assign(
    emb: DataFrame,
    centroids,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, v, cell) — nearest-centroid assignment via an Arrow-batched
    numpy kernel (the centroid matrix broadcasts in the task closure).
    Ties break to the LOWEST cell index (np.argmin first-match = the
    oracle's ORDER BY d2, cell)."""
    import numpy as np
    import pandas as pd
    from collections.abc import Iterator

    cents = np.asarray(centroids, dtype=np.float64).copy()

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            x = np.array(list(pdf[vec_col]), dtype=np.float64)
            if len(x) == 0:
                yield pd.DataFrame({"id": [], "v": [], "cell": []})
                continue
            d2 = _l2_d2_leftfold(x, cents)
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].astype("int64"),
                    "v": pdf[vec_col],
                    "cell": d2.argmin(axis=1).astype("int32"),
                }
            )

    return emb.select(id_col, vec_col).mapInPandas(
        batches, "id long, v array<float>, cell int"
    )


def fixed_vec_centroids(emb: DataFrame, num_centroids: int = 16,
                        id_col: str = "vec_id", vec_col: str = "embedding"):
    """Deterministic coarse quantizer: the embeddings of ids
    1..num_centroids as centroids (cell c = vector of id c+1). Crude
    next to k-means but fully data-derived, reproducible, and
    SQL-expressible — what the DuckDB correctness oracle needs.
    Production builds pass ``kmeans_centroids`` output instead; the
    index/search machinery is identical."""
    import numpy as np

    rows = (
        emb.where(
            (F.col(id_col) >= 1) & (F.col(id_col) <= num_centroids)
        )
        .orderBy(id_col)
        .select(vec_col)
        .collect()
    )
    return np.array([r[0] for r in rows], dtype=np.float64)


def build_ivf_index(
    emb: DataFrame,
    out_path: str,
    centroids,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    meta_cols: Sequence[str] | None = None,
) -> None:
    """Persist the IVF index: row→cell assignment written
    ``partitionBy("cell")`` (one directory per inverted list, so a
    probe's ``cell IN (...)`` predicate is pure partition pruning — the
    scan reads n_probe/C of the table) + the centroid matrix as JSON.
    The write-time mirror of ``build_ann_index`` for the quantized
    path; fixes the anti-pattern of re-assigning the full table per
    query (``ivf_topk`` is now test/ad-hoc only). ``meta_cols`` bakes
    filterable attribute columns into the cell rows (the filtered-ANN
    layout — see ``build_ann_index``); ``ivf_add`` carries them
    automatically on append."""
    import json
    import os

    import numpy as np

    cents = np.asarray(centroids, dtype=np.float64)
    assigned = ivf_assign(emb, cents, id_col, vec_col)
    if meta_cols:
        assigned = assigned.join(
            emb.select(F.col(id_col).alias("id"), *meta_cols), "id"
        )
    # Repartition on the partition key: one task per cell group, file
    # count O(cells) instead of O(tasks x cells) (see build_ann_index).
    assigned.withColumnRenamed("id", id_col).withColumnRenamed(
        "v", vec_col
    ).repartition(F.col("cell")).write.mode("overwrite").partitionBy(
        "cell"
    ).parquet(
        os.path.join(out_path, "cells")
    )
    with open(os.path.join(out_path, "centroids.json"), "w") as fh:
        json.dump(cents.tolist(), fh)


def ivf_add(
    spark,
    index_path: str,
    new_emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    quantized: bool = False,
) -> None:
    """FROZEN-CENTROID append — the vector-tier analog of the text
    index's frozen-stats ``add_docs``: new vectors are assigned to the
    centroids baked at build time and appended to the existing cell
    directories, so the very next probe picks them up through the same
    ``cell IN (...)`` partition pruning with no rebuild. Centroid
    geometry is a statistic frozen at build (recall for the new vectors
    degrades only if their distribution drifts off the trained
    centroids); rebuilding via ``build_ivf_index`` with fresh k-means
    is the compaction. ``quantized=True`` appends int8 codes to a
    ``build_ivf_index_quantized`` index — assignment still runs on the
    full-precision vectors, exactly like the build."""
    import json
    import os

    import numpy as np

    with open(os.path.join(index_path, "centroids.json")) as fh:
        cents = np.asarray(json.load(fh), dtype=np.float64)
    # tier guard: appending the wrong payload shape would not fail loudly
    # (probes read with an enforced schema and would silently null the
    # missing columns) — check the existing cells' schema up front
    existing = spark.read.parquet(os.path.join(index_path, "cells"))
    is_quantized_index = "qvec" in existing.columns
    if is_quantized_index != quantized:
        raise ValueError(
            f"ivf_add: index at {index_path} is "
            f"{'quantized' if is_quantized_index else 'full-precision'} "
            f"but quantized={quantized} was passed — the appended rows "
            "would be unreadable by its probes"
        )
    # meta-bearing index (build_ivf_index(meta_cols=...)): the appended
    # rows must carry the SAME attribute columns or probes with a
    # predicate would silently null-filter every appended vector —
    # derive the meta set from the existing schema and join it from the
    # incoming frame (raise loudly if the caller's frame lacks one)
    base_cols = {id_col, "cell", "qvec", "qnorm", vec_col}
    meta = [c for c in existing.columns if c not in base_cols]
    missing = [c for c in meta if c not in new_emb.columns]
    if missing:
        raise ValueError(
            f"ivf_add: index at {index_path} carries filterable meta "
            f"columns {meta} but the incoming frame lacks {missing}"
        )
    assigned = ivf_assign(new_emb, cents, id_col, vec_col)
    if quantized:
        out = quantize_embeddings(
            assigned, id_col="id", vec_col="v", keep=["cell"]
        ).withColumnRenamed("id", id_col)
    else:
        out = assigned.withColumnRenamed("id", id_col).withColumnRenamed(
            "v", vec_col
        )
    if meta:
        out = out.join(new_emb.select(id_col, *meta), id_col)
    out.write.mode("append").partitionBy("cell").parquet(
        os.path.join(index_path, "cells")
    )


def ivf_delete(spark, index_path: str, ids) -> int:
    """Tombstone vectors out of a persisted IVF index (append-only,
    deduped at read — the same mask discipline as the text tier's
    ``delete_docs``). Probes anti-join the mask broadcast-side; the
    cell files are untouched until a rebuild."""
    import os

    if isinstance(ids, DataFrame):
        df = ids.select(F.col(ids.columns[0]).cast("long").alias("id"))
    else:
        df = spark.createDataFrame([(int(i),) for i in ids], "id long")
    n = df.count()
    df.coalesce(1).write.mode("append").parquet(
        os.path.join(index_path, "tombstones")
    )
    return n


def _ivf_tombstones(spark, index_path: str) -> DataFrame | None:
    import os

    path = os.path.join(index_path, "tombstones")
    if not os.path.exists(path):
        return None
    return spark.read.schema("id long").parquet(path).distinct()


def probe_cells(centroids, qvec, n_probe: int) -> list[int]:
    """The n_probe cells nearest the query (d2 asc, cell asc — same
    left-fold metric and tie-break as assignment)."""
    import numpy as np

    cents = np.asarray(centroids, dtype=np.float64)
    q = np.asarray(list(qvec), dtype=np.float64).reshape(1, -1)
    d2 = _l2_d2_leftfold(q, cents)[0]
    order = np.lexsort((np.arange(len(cents)), d2))
    return [int(c) for c in order[:n_probe]]


def ivf_search(
    spark,
    index_path: str,
    qvec: Sequence[float],
    k: int = 10,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    predicate=None,
) -> DataFrame:
    """Probe a persisted IVF index: partition-pruned scan of the
    ``n_probe`` nearest cells + exact cosine over the candidates
    (recall→1 as n_probe→C). No full-table work at query time.
    ``predicate`` filters on columns baked into the index
    (``build_ivf_index(meta_cols=...)``) before scoring — exact top-k
    of the admitted candidates within the probed cells."""
    import json
    import os

    with open(os.path.join(index_path, "centroids.json")) as fh:
        centroids = json.load(fh)
    probe = probe_cells(centroids, qvec, n_probe)
    qn = sum(float(x) * float(x) for x in qvec) ** 0.5
    cand = spark.read.parquet(os.path.join(index_path, "cells")).where(
        F.col("cell").isin(probe)
    )
    if predicate is not None:
        cand = cand.where(predicate)
    cand = cand.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v")
    )
    tomb = _ivf_tombstones(spark, index_path)
    if tomb is not None:
        cand = cand.join(F.broadcast(tomb), "id", "left_anti")
    cand = cand.withColumn("q", _qvec_lit(qvec))
    cos = (
        F.expr(D.dot_product(D.SPARK, "v", "q"))
        / (F.expr(D.l2_norm(D.SPARK, "v")) * F.lit(qn))
    )
    return (
        cand.select("id", cos.cast("float").cast("double").alias("cos"))
        .orderBy(F.desc("cos"), F.asc("id"))
        .limit(k)
    )


def ivf_topk(
    emb: DataFrame,
    qvec: Sequence[float],
    centroids,
    k: int = 10,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """AD-HOC/TEST-ONLY IVF probe over an unpersisted frame: re-assigns
    the whole table per query. Production queries use
    ``build_ivf_index`` + ``ivf_search`` (partition-pruned persisted
    cells — no full-table work at query time)."""
    import numpy as np

    q = np.asarray(list(qvec), dtype=np.float64)
    d2 = ((centroids - q[None, :]) ** 2).sum(axis=1)
    probe = [int(c) for c in np.argsort(d2)[:n_probe]]
    qn = float(np.sqrt((q**2).sum()))
    cand = ivf_assign(emb, centroids, id_col, vec_col).where(
        F.col("cell").isin(probe)
    )
    cand = cand.withColumn("q", _qvec_lit([float(x) for x in qvec]))
    cos = (
        F.expr(D.dot_product(D.SPARK, "v", "q"))
        / (F.expr(D.l2_norm(D.SPARK, "v")) * F.lit(qn))
    )
    return (
        cand.select("id", cos.cast("float").cast("double").alias("cos"))
        .orderBy(F.desc("cos"), F.asc("id"))
        .limit(k)
    )


def lsh_topk(
    emb: DataFrame,
    qvec: Sequence[float],
    k: int = 10,
    num_planes: int = NUM_PLANES,
    dims: int = DIMS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    predicate=None,
) -> DataFrame:
    """Approximate top-k: score only rows in the query's LSH bucket.
    The bucket predicate folds to a literal comparison, so it pushes
    into the scan (partition pruning when the table is bucket-
    partitioned). ``predicate`` (over the embedding table's columns)
    is pre-filter semantics applied before bucketing — exact top-k of
    the admitted set within the probed bucket."""
    if predicate is not None:
        emb = emb.where(predicate)
    qb = bucket_of(list(qvec), num_planes)
    qn = sum(float(x) * float(x) for x in qvec) ** 0.5
    cand = lsh_buckets(emb, num_planes, dims, id_col, vec_col).where(
        F.col("bucket") == F.lit(qb)
    )
    cand = cand.withColumn("q", _qvec_lit(qvec))
    cos = (
        F.expr(D.dot_product(D.SPARK, "v", "q"))
        / (F.expr(D.l2_norm(D.SPARK, "v")) * F.lit(qn))
    )
    return (
        cand.select("id", cos.cast("float").cast("double").alias("cos"))
        .orderBy(F.desc("cos"), F.asc("id"))
        .limit(k)
    )


def quantize_embeddings(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep: Sequence[str] = (),
) -> DataFrame:
    """(id, qvec array<int>, qnorm double [, *keep]) — symmetric
    per-vector int8 quantization (q_i = round(x_i/s), s = max|x|/127);
    ``keep`` columns pass through untouched (lets callers quantize
    in-pipeline without a re-join).

    The 100 TB lever for the ANN path: int8 codes cut the embedding
    table's memory/shuffle/scan footprint ~4x versus float32 while
    keeping cosine recall high (scales cancel in cosine, so ranking
    differs from full precision only by rounding). A further parity
    property: quantized similarity is INTEGER arithmetic — dot products
    are exact bigint sums, immune to the float fold-order issues every
    other scored path has to engineer around."""
    # staged so the row scale is computed ONCE (the single-expression
    # dialect form re-evaluates max|x| inside the per-element lambda —
    # O(d²) per row, measured ~10x slower at d=64 — and the norm would
    # re-quantize the whole vector); arithmetic is bit-identical to
    # dialect.quantize_vec, which the oracle keeps using
    keep = [c for c in keep]
    return (
        widen_input(emb).select(
            *keep,
            F.col(id_col).alias("id"),
            F.col(vec_col).alias("_v"),
            F.expr(D.array_max_abs(D.SPARK, vec_col)).alias("_mx"),
        )
        .select(
            *keep,
            "id",
            F.expr(
                "transform(_v, x -> CAST(round(CAST(x AS DOUBLE) / "
                f"(greatest(_mx, {D.QUANT_EPS}) / {D.QUANT_LEVELS})) AS INT))"
            ).alias("qvec"),
        )
        .select(
            *keep,
            "id",
            "qvec",
            F.expr(D.int_l2_norm(D.SPARK, "qvec")).alias("qnorm"),
        )
    )


def quantized_cosine_topk(
    qemb: DataFrame,
    q_qvec: Sequence[int],
    q_qnorm: float,
    k: int = 10,
) -> DataFrame:
    """Exact top-k over QUANTIZED codes: cos ≈ int_dot(qa, qb) /
    (|qa|·|qb|) — the per-vector scales cancel. Zero vectors score -1
    (below any real cosine) so they never fake a match."""
    lit = F.array(*[F.lit(int(x)) for x in q_qvec])
    dot = F.expr(
        D.int_dot(D.SPARK, "qvec", "__q")
    )
    scored = (
        qemb.withColumn("__q", lit)
        .withColumn(
            "cos",
            F.when(
                (F.col("qnorm") == 0.0) | (F.lit(float(q_qnorm)) == 0.0),
                F.lit(-1.0),
            ).otherwise(
                dot.cast("double") / (F.col("qnorm") * F.lit(float(q_qnorm)))
            ),
        )
        .select("id", "cos")
    )
    return scored.orderBy(F.desc("cos"), F.asc("id")).limit(k)


def quantize_query(vec: Sequence[float]) -> tuple[list[int], float]:
    """Driver-side mirror of ``dialect.quantize_vec`` for a query vector:
    same double arithmetic, same half-AWAY-FROM-ZERO rounding (numpy's
    ``np.round`` is banker's — do not substitute it)."""
    import math

    mx = max((abs(float(x)) for x in vec), default=0.0)
    s = max(mx, 1e-30) / 127
    q = [
        int(math.floor(abs(float(x)) / s + 0.5)) * (1 if x >= 0 else -1)
        for x in vec
    ]
    qnorm = math.sqrt(float(sum(v * v for v in q)))
    return q, qnorm


def build_ivf_index_quantized(
    emb: DataFrame,
    out_path: str,
    centroids,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    meta_cols: Sequence[str] | None = None,
) -> None:
    """IVF × int8: cell assignment runs on the FULL-PRECISION vectors
    (centroid geometry shouldn't inherit quantization error), but the
    inverted lists persist only the int8 codes + int norm — the stored
    index is ~4x smaller than ``build_ivf_index``'s, and a probe scans
    n_probe/C of an already-4x-smaller table. Composition of the two
    proven pieces: same cell directories / partition pruning, same
    integer-exact scoring as ``quantized_cosine_topk``. ``meta_cols``
    bakes filterable attribute columns into the cell rows (see
    ``build_ann_index``)."""
    import json
    import os

    import numpy as np

    cents = np.asarray(centroids, dtype=np.float64)
    # One pass: quantize in the same pipeline as the assignment (``keep``
    # threads the cell through) — the earlier self-join form executed the
    # full-table mapInPandas assignment twice per build.
    assigned = ivf_assign(emb, cents, id_col, vec_col)
    rows = quantize_embeddings(
        assigned, id_col="id", vec_col="v", keep=["cell"]
    )
    if meta_cols:
        rows = rows.join(
            emb.select(F.col(id_col).alias("id"), *meta_cols), "id"
        )
    (
        rows.withColumnRenamed("id", id_col)
        .repartition(F.col("cell"))
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(os.path.join(out_path, "cells"))
    )
    with open(os.path.join(out_path, "centroids.json"), "w") as fh:
        json.dump(cents.tolist(), fh)


def ivf_search_quantized(
    spark,
    index_path: str,
    qvec: Sequence[float],
    k: int = 10,
    n_probe: int = 4,
    id_col: str = "vec_id",
    predicate=None,
) -> DataFrame:
    """Probe the quantized IVF index: partition-pruned scan of n_probe
    cells, integer-dot cosine over the stored codes. The query vector
    quantizes driver-side via the same formula (``quantize_query``).
    ``predicate`` filters on meta columns baked at build time
    (``build_ivf_index_quantized(meta_cols=...)``) before scoring; the
    meta-bearing read infers the schema (the fixed-schema read would
    drop the attribute columns the predicate needs)."""
    import json
    import os

    with open(os.path.join(index_path, "centroids.json")) as fh:
        centroids = json.load(fh)
    probe = probe_cells(centroids, qvec, n_probe)
    q8, qn = quantize_query(qvec)
    if predicate is None:
        cand = spark.read.schema(
            f"{id_col} long, qvec array<int>, qnorm double, cell int"
        ).parquet(os.path.join(index_path, "cells"))
    else:
        cand = spark.read.parquet(os.path.join(index_path, "cells")).where(
            predicate
        )
    cand = cand.where(F.col("cell").isin(probe)).select(
        F.col(id_col).alias("id"), "qvec", "qnorm"
    )
    tomb = _ivf_tombstones(spark, index_path)
    if tomb is not None:
        cand = cand.join(F.broadcast(tomb), "id", "left_anti")
    return quantized_cosine_topk(cand, q8, qn, k)


def mmr_rerank(
    emb: DataFrame,
    qvec: Sequence[float],
    k: int = 10,
    candidate_k: int = 50,
    lam: float = 0.7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    candidates: DataFrame | None = None,
    predicate=None,
) -> DataFrame:
    """Maximal Marginal Relevance diversified top-k (Carbonell &
    Goldstein, SIGIR'98): greedily select k results maximizing
    ``lam * cos(q, d) - (1 - lam) * max_{s in selected} cos(d, s)`` —
    relevance traded against redundancy, the serving-time complement of
    the corpus-level ``curation.diversity_cap``. ``lam = 1.0`` reduces
    exactly to the cosine top-k order.

    Scale shape: candidate generation is distributed (exact
    ``brute_force_topk`` by default; pass ``candidates`` — any
    (id, cos) frame, e.g. an ANN probe — to swap it). The greedy
    selection is inherently sequential over k picks, so it runs
    driver-side in numpy over the ``candidate_k`` collected vectors —
    a serving-sized O(candidate_k) collect (the same bounded-driver
    discipline as top-k / block-metadata collects), NEVER the corpus.
    Ties break deterministically: higher MMR score, then lower id; the
    first pick is the (cos desc, id asc) top-1. Returns
    (id, cos, mmr, rank) with rank = 1-based selection order.
    Extension beyond the reference (no diversification surface)."""
    import numpy as np

    spark = emb.sparkSession
    out_schema = "id long, cos double, mmr double, rank int"
    if candidates is None:
        candidates = brute_force_topk(
            emb, qvec, candidate_k, id_col, vec_col, predicate
        )
    elif predicate is not None:
        # predicate= parameterizes the DEFAULT candidate generator only;
        # silently ignoring it with a caller-supplied frame would serve
        # unfiltered picks — fail loudly instead
        raise ValueError(
            "mmr_rerank: predicate= applies to the default candidate "
            "generation only; pre-filter the supplied candidates frame"
        )
    rows = (
        candidates.select("id", "cos")
        .join(
            emb.select(
                F.col(id_col).cast("long").alias("id"),
                F.col(vec_col).alias("_v"),
            ),
            "id",
        )
        .collect()
    )
    if not rows:
        return spark.createDataFrame([], out_schema)
    # deterministic candidate order regardless of collect order
    rows.sort(key=lambda r: (-r["cos"], r["id"]))
    ids = np.array([r["id"] for r in rows], dtype=np.int64)
    rel = np.array([r["cos"] for r in rows], dtype=np.float64)
    vecs = np.array([list(r["_v"]) for r in rows], dtype=np.float64)
    norms = np.sqrt((vecs**2).sum(axis=1))
    norms[norms == 0.0] = 1.0  # zero vectors: similarity 0 to everything
    unit = vecs / norms[:, None]
    n = len(ids)
    selected: list[tuple[int, float]] = []  # (candidate idx, mmr score)
    max_sim = np.full(n, -np.inf)  # max cos to any selected doc
    taken = np.zeros(n, dtype=bool)
    for _ in range(min(k, n)):
        if not selected:
            mmr = rel.copy()  # first pick: pure relevance
        else:
            mmr = lam * rel - (1.0 - lam) * max_sim
        mmr[taken] = -np.inf
        # argmax with (mmr desc, id asc) tie-break
        best = np.lexsort((ids, -mmr))[0]
        selected.append((int(best), float(mmr[best])))
        taken[best] = True
        max_sim = np.maximum(max_sim, unit @ unit[best])
    return spark.createDataFrame(
        [
            (int(ids[i]), float(rel[i]), score, rank + 1)
            for rank, (i, score) in enumerate(selected)
        ],
        out_schema,
    )
