"""jobs/train_prep.py — the composed LLM training-data prep pipeline
(exact dedup -> near-dup collapse -> quality/lang filter ->
decontaminate -> chunk -> pack) driven end-to-end as a subprocess on a
crafted corpus with KNOWN expected drops at every stage."""

from __future__ import annotations

import json
import os
import subprocess
import sys

LONG = (
    "the quick brown fox jumps over the lazy dog and then runs along "
    "the river bank toward the old mill where the miller waits with "
    "his patient dog watching the water turn the heavy wheel slowly"
)


def test_train_prep_pipeline(spark, tmp_path):
    rows = [
        (0, LONG),
        (1, LONG),  # exact dup of 0 -> dropped at exact_dedup
        (2, LONG + " extra trailing words here"),  # near dup -> near_dedup
        (3, "x9 z8 q7 w6 0x1f 0x2e 9z8y7 33 44 55 66 77 88 99 00 11 22"),
        # ^ digit-heavy, no stopwords -> dropped by quality filter
        (4, "this benchmark sentence about the seven wonders of the "
            "ancient world appears verbatim in the evaluation suite and "
            "therefore must be removed from the training corpus"),
        (5, "a perfectly ordinary training document with the usual mix "
            "of common words and a little substance about spark engines "
            "and the data they process every single day of the week"),
    ]
    corpus = str(tmp_path / "corpus.parquet")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        corpus
    )
    bench = str(tmp_path / "bench.parquet")
    spark.createDataFrame(
        [(0, rows[4][1])], "doc_id long, text string"
    ).write.parquet(bench)

    out = str(tmp_path / "prep")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [
            sys.executable, os.path.join(repo, "jobs", "train_prep.py"),
            "--input", corpus, "--output", out, "--benchmark", bench,
            "--min-quality", "0.3", "--min-jaccard", "0.5",
            "--token-budget", "10000",  # ample: cut must drop nothing
            "--chunk-size", "16", "--stride", "12", "--seq-len", "32",
            "--shuffle-seed", "3", "--num-shards", "2",
            "--cores", "2",
        ],
        capture_output=True, text=True, timeout=480, cwd=repo,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    metrics = json.load(open(os.path.join(out, "metrics.json")))
    by = {s["stage"]: s for s in metrics["stages"]}
    assert by["read"]["in"] == 6
    assert by["exact_dedup"]["dropped"] == 1  # doc 1
    assert by["near_dedup"]["dropped"] == 1  # doc 2
    assert by["quality_filter"]["dropped"] == 1  # doc 3
    assert by["decontaminate"]["dropped"] == 1  # doc 4
    assert by["decontaminate"]["out"] == 2  # docs 0 and 5 survive
    assert by["token_budget"]["dropped"] == 0  # budget ample

    surv = {
        r["doc_id"]
        for r in spark.read.parquet(os.path.join(out, "corpus")).collect()
    }
    assert surv == {0, 5}
    chunks = spark.read.parquet(os.path.join(out, "chunks"))
    assert by["chunk"]["out"] == chunks.count() > 2  # windows overlap
    packed = spark.read.parquet(os.path.join(out, "packed"))
    assert packed.count() == chunks.count()
    assert by["pack"]["num_sequences"] >= 1
    # with --shuffle-seed, packing follows the EPOCH order (the shard
    # read order): offsets form one contiguous prefix sum — walk rows
    # by offset and check each starts where the previous ended
    ordered = packed.orderBy("start_offset", "doc_id").collect()
    off = 0
    for r in ordered:
        assert r["start_offset"] == off
        off += r["n_tokens"]
    # shards/: every chunk present exactly once, shard dirs key-sorted
    shards = spark.read.parquet(os.path.join(out, "shards"))
    assert shards.count() == chunks.count()
    assert shards.select("chunk_id").distinct().count() == chunks.count()
    assert {r["shard"] for r in shards.select("shard").distinct().collect()} \
        <= {0, 1}


def test_train_prep_span_dedup_stage(spark, tmp_path):
    """--span-dedup-w cuts duplicated W-gram spans keep-first: the
    canonical doc survives untouched, the copying doc keeps only its
    unique prefix, and a fully-duplicated doc is dropped."""
    rows = [
        (0, LONG),
        (1, "prefix words here now " + LONG),  # shares the LONG run
        (2, LONG + " " + LONG),  # self-periodic + duplicated -> emptied
        (3, "!!! *** ???"),  # zero normalized tokens, NO dups -> kept
    ]
    corpus = str(tmp_path / "corpus.parquet")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        corpus
    )
    out = str(tmp_path / "prep")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [
            sys.executable, os.path.join(repo, "jobs", "train_prep.py"),
            "--input", corpus, "--output", out,
            "--min-jaccard", "1.01",  # keep near-dups: span stage's job
            "--span-dedup-w", "8",
            "--chunk-size", "16", "--stride", "12", "--seq-len", "32",
            "--cores", "2",
        ],
        capture_output=True, text=True, timeout=480, cwd=repo,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    metrics = json.load(open(os.path.join(out, "metrics.json")))
    by = {s["stage"]: s for s in metrics["stages"]}
    assert by["span_dedup"]["in"] == 4
    texts = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(os.path.join(out, "corpus")).collect()
    }
    assert texts[0] == LONG  # canonical first occurrence untouched
    assert texts[1] == "prefix words here now"
    assert 2 not in texts  # both halves duplicated doc 0 -> emptied
    assert texts[3] == ""  # token-free doc passes through, not dropped
    assert by["span_dedup"]["dropped"] == 1


def test_train_prep_diversity_cap_stage(spark, tmp_path):
    """--diversity-cap keeps at most N docs per hyperplane-LSH
    embedding bucket (quality desc, doc_id asc). Texts are word
    permutations (equal quality, distinct strings — survive exact and
    span-free near dedup is disabled), embeddings put docs 0-3 in one
    bucket and 4-5 in the antipodal one, so cap=2 keeps {0,1,4,5}."""
    words = LONG.split()
    import random

    rng = random.Random(5)

    def perm(i):
        w = words[:]
        rng.shuffle(w)
        return " ".join(w)

    rows = [(i, perm(i)) for i in range(6)] + [
        (9, "an embedding free document that must pass the cap stage "
            "untouched because its neighborhood is unknown")
    ]
    corpus = str(tmp_path / "corpus.parquet")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        corpus
    )
    v = [1.0] * 8
    emb_rows = [(i, v) for i in range(4)] + [
        (i, [-x for x in v]) for i in (4, 5)
    ]
    embp = str(tmp_path / "emb.parquet")
    spark.createDataFrame(
        emb_rows, "vec_id long, embedding array<float>"
    ).write.parquet(embp)

    out = str(tmp_path / "prep")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [
            sys.executable, os.path.join(repo, "jobs", "train_prep.py"),
            "--input", corpus, "--output", out,
            "--min-jaccard", "1.01",  # permutations ARE jaccard-1 dups
            "--diversity-cap", "2", "--embeddings", embp,
            "--diversity-planes", "4", "--diversity-dims", "8",
            "--chunk-size", "16", "--stride", "12", "--seq-len", "32",
            "--cores", "2",
        ],
        capture_output=True, text=True, timeout=480, cwd=repo,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    metrics = json.load(open(os.path.join(out, "metrics.json")))
    by = {s["stage"]: s for s in metrics["stages"]}
    assert by["diversity_cap"]["in"] == 7
    assert by["diversity_cap"]["out"] == 5
    surv = {
        r["doc_id"]
        for r in spark.read.parquet(os.path.join(out, "corpus")).collect()
    }
    assert surv == {0, 1, 4, 5, 9}  # 9 has no embedding: passes through


def test_train_prep_leakage_safe_splits(spark, tmp_path):
    """--split-seed writes a leakage-safe split column: near-dup pairs
    at the (looser) --split-jaccard threshold land in ONE split, and
    chunking consumes the train split only."""
    words = LONG.split()
    rows = [(i, " ".join(words[i:] + words[:i])) for i in range(8)]
    # rotations share ALL tokens (jaccard 1.0 on shingle sets is not
    # guaranteed, but token overlap is high); add distinct docs too
    rows += [
        (10, "completely different text about gardens and rivers and "
             "mountains flowing slowly under the bright morning sun"),
        (11, "another unrelated document describing compilers parsers "
             "and the virtual machines that execute the generated code"),
    ]
    corpus = str(tmp_path / "corpus.parquet")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        corpus
    )
    out = str(tmp_path / "prep")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [
            sys.executable, os.path.join(repo, "jobs", "train_prep.py"),
            "--input", corpus, "--output", out,
            "--min-jaccard", "1.01",  # keep near-dups in the corpus
            "--split-seed", "s9", "--split-jaccard", "0.5",
            "--chunk-size", "16", "--stride", "12", "--seq-len", "32",
            "--cores", "2",
        ],
        capture_output=True, text=True, timeout=480, cwd=repo,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    corp = spark.read.parquet(os.path.join(out, "corpus"))
    got = {r["doc_id"]: r["split"] for r in corp.collect()}
    assert set(got.values()) <= {"train", "val", "test"}
    rot_splits = {got[i] for i in range(8) if i in got}
    assert len(rot_splits) == 1  # the near-dup cluster never straddles
    metrics = json.load(open(os.path.join(out, "metrics.json")))
    by = {s["stage"]: s for s in metrics["stages"]}
    n_train = sum(1 for s in got.values() if s == "train")
    assert by["split_train_filter"]["out"] == n_train
    # chunks come from train docs only
    chunk_docs = {
        r["doc_id"]
        for r in spark.read.parquet(os.path.join(out, "chunks"))
        .select("doc_id").distinct().collect()
    }
    assert chunk_docs <= {d for d, s in got.items() if s == "train"}
