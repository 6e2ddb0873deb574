"""ANN recall evaluation: measure recall@k of every approximate
similarity path against the exact brute-force baseline, on a synthetic
clustered embedding set large enough for the pruning to matter.

The correctness gates prove each ANN variant is DETERMINISTIC and
bit-faithful to its DuckDB oracle; this job answers the different
question a user of the 100 TB path actually has — *how much recall does
each pruning strategy give up, for how much of the table it avoids
scanning*. Published to ``BENCH/ann_recall.json``; the summary table
lives in ``BENCH/BASELINE.md``.

Dataset: a seeded mixture of Gaussians (``--n`` vectors, 64 dims,
``--clusters`` true clusters, unit-ish norms) — clustered data is the
honest regime for IVF (uniform data makes every cell equidistant and
n_probe/C IS the recall), and it is synthesized deterministically
per the build brief (no external data). Queries are held-out samples
from the same mixture.

Variants evaluated (all production paths — persisted, partition-pruned):

* ``lsh``        — ``build_ann_index`` + ``ann_search`` (single-bucket
                   probe, 2^8 hyperplane buckets)
* ``lsh_mp{n}``  — same index, multi-probe at n buckets (exact bucket +
                   cheapest-flip Hamming neighbors)
* ``ivf_p{n}``   — ``build_ivf_index`` (k-means centroids) +
                   ``ivf_search`` at n_probe = 1/4/16 of C=64 cells
* ``int8``       — ``quantize_embeddings`` + ``quantized_cosine_topk``
                   (full scan of 4x-smaller codes; isolates pure
                   quantization loss)
* ``ivfq_p4``    — ``build_ivf_index_quantized`` + ``ivf_search_quantized``
                   (both prunings composed)

Usage::

    python jobs/ann_eval.py [--n 50000] [--queries 24] [--k 10]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cs_search_engine_architecture_spark.operators import similarity as sim
from cs_search_engine_architecture_spark.session import get_spark


def synth_embeddings(n: int, dims: int, clusters: int, seed: int,
                     sigma: float = 0.08):
    """(n, dims) float32 mixture-of-Gaussians + held-out query pool.

    Cluster centers on the unit sphere; per-dim sigma 0.08 puts the
    expected within-cluster pair distance (~sqrt(2*dims)*sigma = 0.9)
    at ~2/3 of the between-center distance (~sqrt(2) for random unit
    centers), so clusters are real but overlap — nearest-neighbor sets
    straddle cluster boundaries, the regime where n_probe=1 visibly
    loses recall. (A larger sigma drowns the centers in noise and the
    "true" neighbors become noise-alignment pairs no partitioning can
    find; recall then measures nothing.)
    """
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((clusters, dims))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    assign = rng.integers(0, clusters, size=n)
    x = centers[assign] + sigma * rng.standard_normal((n, dims))
    return x.astype(np.float32), centers


def synth_queries(centers, q: int, dims: int, seed: int,
                  sigma: float = 0.08):
    rng = np.random.default_rng(seed + 1)
    assign = rng.integers(0, len(centers), size=q)
    return (centers[assign] + sigma * rng.standard_normal((q, dims))).astype(
        np.float32
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=50_000)
    ap.add_argument("--dims", type=int, default=sim.DIMS)
    ap.add_argument("--clusters", type=int, default=32)
    ap.add_argument("--queries", type=int, default=24)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--ivf-cells", type=int, default=64)
    ap.add_argument("--seed", type=int, default=17)
    ap.add_argument("--sigma", type=float, default=0.08)
    ap.add_argument(
        "--out",
        default=os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "BENCH",
            "ann_recall.json",
        ),
    )
    args = ap.parse_args()

    spark = get_spark("ann-eval")
    x, centers = synth_embeddings(
        args.n, args.dims, args.clusters, args.seed, args.sigma
    )
    queries = synth_queries(
        centers, args.queries, args.dims, args.seed, args.sigma
    )

    emb = spark.createDataFrame(
        [(int(i), [float(v) for v in row]) for i, row in enumerate(x)],
        "vec_id long, embedding array<float>",
    ).persist()
    emb.count()

    work = tempfile.mkdtemp(prefix="ann_eval_")
    lsh_path = os.path.join(work, "lsh")
    ivf_path = os.path.join(work, "ivf")
    ivfq_path = os.path.join(work, "ivfq")

    t0 = time.time()
    sim.build_ann_index(emb, lsh_path)
    t_lsh_build = time.time() - t0

    t0 = time.time()
    cents = sim.kmeans_centroids(
        emb, num_centroids=args.ivf_cells, iters=10, sample=10_000
    )
    sim.build_ivf_index(emb, ivf_path, cents)
    t_ivf_build = time.time() - t0

    t0 = time.time()
    sim.build_ivf_index_quantized(emb, ivfq_path, cents)
    t_ivfq_build = time.time() - t0

    qemb = sim.quantize_embeddings(emb).persist()
    qemb.count()

    # candidate-fraction denominators: bucket/cell histograms (one job each)
    lsh_sizes = {
        r["bucket"]: r["c"]
        for r in spark.read.parquet(lsh_path)
        .groupBy("bucket")
        .count()
        .withColumnRenamed("count", "c")
        .collect()
    }
    ivf_sizes = {
        r["cell"]: r["c"]
        for r in spark.read.parquet(os.path.join(ivf_path, "cells"))
        .groupBy("cell")
        .count()
        .withColumnRenamed("count", "c")
        .collect()
    }

    variants = [
        "lsh",
        "lsh_mp8",
        "lsh_mp32",
        "ivf_p1",
        "ivf_p4",
        "ivf_p16",
        "int8",
        "ivfq_p4",
    ]
    hits = {v: 0 for v in variants}
    frac = {v: 0.0 for v in variants}
    wall = {v: 0.0 for v in variants}
    total = 0

    for qi, qv in enumerate(queries):
        qlist = [float(v) for v in qv]
        truth = set(
            r["id"] for r in sim.brute_force_topk(emb, qlist, k=args.k).collect()
        )
        total += len(truth)

        def run(name, df):
            t0 = time.time()
            got = set(r["id"] for r in df.collect())
            wall[name] += time.time() - t0
            hits[name] += len(got & truth)

        run("lsh", sim.ann_search(spark, lsh_path, qlist, k=args.k))
        frac["lsh"] += lsh_sizes.get(sim.bucket_of(qlist), 0) / args.n
        for mp in (8, 32):
            name = f"lsh_mp{mp}"
            run(
                name,
                sim.ann_search(
                    spark, lsh_path, qlist, k=args.k, n_probe_buckets=mp
                ),
            )
            frac[name] += sum(
                lsh_sizes.get(b, 0)
                for b in sim.multiprobe_buckets(qlist, mp)
            ) / args.n
        for np_ in (1, 4, 16):
            name = f"ivf_p{np_}"
            run(name, sim.ivf_search(spark, ivf_path, qlist, k=args.k, n_probe=np_))
            probed = sim.probe_cells(cents, qlist, np_)
            frac[name] += sum(ivf_sizes.get(c, 0) for c in probed) / args.n
        q8, qn = sim.quantize_query(qlist)
        run("int8", sim.quantized_cosine_topk(qemb, q8, qn, k=args.k))
        frac["int8"] += 1.0
        run("ivfq_p4", sim.ivf_search_quantized(spark, ivfq_path, qlist, k=args.k, n_probe=4))
        frac["ivfq_p4"] += sum(
            ivf_sizes.get(c, 0) for c in sim.probe_cells(cents, qlist, 4)
        ) / args.n

    out = {
        "n": args.n,
        "dims": args.dims,
        "true_clusters": args.clusters,
        "ivf_cells": args.ivf_cells,
        "queries": args.queries,
        "k": args.k,
        "seed": args.seed,
        "sigma": args.sigma,
        "build_sec": {
            "lsh": round(t_lsh_build, 2),
            "ivf": round(t_ivf_build, 2),
            "ivf_quantized": round(t_ivfq_build, 2),
        },
        "variants": {
            v: {
                "recall_at_k": round(hits[v] / total, 4),
                "mean_scanned_fraction": round(frac[v] / args.queries, 4),
                "mean_query_sec": round(wall[v] / args.queries, 3),
            }
            for v in variants
        },
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
