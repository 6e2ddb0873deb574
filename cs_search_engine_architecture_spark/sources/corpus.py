"""Corpus sources: the BASELINE.json ``input_hint`` source-code table.

* :func:`synth_source_files` — deterministic synthetic corpus of the exact
  input_hint shape ``(repo, path, commit, lang, content)`` plus ``doc_id``
  and the per-row ``content_sha256`` invariant. Content is a pure function
  of ``(seed, doc_id)`` so the corpus is identical at any parallelism.
  Term distribution is Zipfian with deliberately hot terms (>=30% of docs)
  to exercise salting, and includes every tokenizer-quirk class
  (FIXTURES.md §1).
* :func:`assign_doc_ids` — scalable deterministic dense id minting:
  ``row_number() over (order by repo, path, commit)`` semantics WITHOUT a
  single-partition global sort: range-repartition on the sort key, count
  per partition, broadcast prefix-sum offsets, add partition-local ranks
  (SURVEY.md §7 "deterministic doc_ids at scale"; the reference's ids are
  ingestion order, ``sea/corpus.pyx:281,292``).
* :func:`documents_corpus` — adapter for the driver-provided
  ``documents.parquet`` fixture (single body field).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SOURCE_SCHEMA = (
    "doc_id long, repo string, path string, commit string, lang string, "
    "content string, content_sha256 string"
)

LANGS = ["py", "java", "c", "md"]

# deliberately hot terms (Zipf head; >=30% of docs) + code-like vocabulary
HOT_TERMS = ["index", "spark", "data"]
_KEYWORDS = (
    "def class return import for while if else elif lambda yield raise try "
    "except static void public private int float double char struct union "
    "include define sizeof template typename namespace const auto match "
    "partition shuffle broadcast executor driver tokenize posting merge "
    "compress varint delta block score query boolean phrase search rank "
    "running tested tokenizer characters mapping repeated happy early"
).split()


def _vocab(seed: int) -> list[str]:
    rng = np.random.default_rng(seed)
    vocab = list(_KEYWORDS)
    consonants = list("bcdfghjklmnprstvwz")
    vowels = list("aeiou")
    for _ in range(4000):
        n = rng.integers(2, 5)
        word = "".join(
            rng.choice(consonants) + rng.choice(vowels) for _ in range(n)
        )
        vocab.append(word)
    return vocab


_QUIRK_TOKENS = [
    "utf8str",  # mixed alnum -> dropped unless text-final
    "x" * 51,  # overlong identifier -> dropped unless text-final
    "2024",  # numeric len<=4 -> kept
    "20244",  # numeric len 5 -> dropped unless text-final
    "the",  # stopword
    "with",  # stopword
]


def synth_source_files(
    spark: SparkSession, num_docs: int, seed: int = 42, parallelism: int | None = None
) -> DataFrame:
    """Deterministic synthetic source-code corpus (input_hint schema)."""
    vocab = np.array(_vocab(seed))
    v = len(vocab)
    # Zipf ranks over the vocab
    ranks = np.arange(1, v + 1, dtype=np.float64)
    zipf_p = (1.0 / ranks) / np.sum(1.0 / ranks)

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = pdf["id"].to_numpy()
            rows = {k: [] for k in (
                "doc_id", "repo", "path", "commit", "lang", "content",
                "content_sha256",
            )}
            for did in ids:
                did = int(did)
                rng = np.random.default_rng((seed << 34) ^ did)
                lang = LANGS[did % len(LANGS)]
                n_tokens = int(rng.lognormal(4.3, 0.6)) + 5
                words = list(rng.choice(vocab, size=n_tokens, p=zipf_p))
                for hot_i, hot in enumerate(HOT_TERMS):
                    # hot term in >=30% of docs, multiple occurrences
                    if (did + hot_i) % 3 != 0:
                        reps = int(rng.integers(1, 4))
                        pos = rng.integers(0, len(words), size=reps)
                        for p in pos:
                            words[int(p)] = hot
                if did % 7 == 0:
                    words.insert(
                        int(rng.integers(0, len(words))),
                        _QUIRK_TOKENS[did % len(_QUIRK_TOKENS)],
                    )
                # code-like punctuation structure
                sep = rng.choice([" ", " ", "(", ")_", ".", " = ", ", "], size=len(words))
                content = "".join(w + s for w, s in zip(words, sep))
                repo = f"org{did % 7}/repo{(did // 7) % 23}"
                path = f"src/m{(did // 11) % 50}/f{did}.{lang}"
                commit = hashlib.sha1(f"{seed}:{did}".encode()).hexdigest()
                rows["doc_id"].append(did)
                rows["repo"].append(repo)
                rows["path"].append(path)
                rows["commit"].append(commit)
                rows["lang"].append(lang)
                rows["content"].append(content)
                rows["content_sha256"].append(
                    hashlib.sha256(content.encode()).hexdigest()
                )
            yield pd.DataFrame(rows)

    rng_df = spark.range(0, num_docs, 1, parallelism or spark.sparkContext.defaultParallelism)
    return rng_df.mapInPandas(gen, SOURCE_SCHEMA)


def assign_doc_ids(
    df: DataFrame, order_cols: list[str], num_partitions: int | None = None
) -> DataFrame:
    """Dense deterministic ids by total order WITHOUT a global 1-partition
    sort: range partition -> per-partition counts -> broadcast prefix sums
    -> partition-local rank add. O(1) driver state, arbitrarily wide."""
    num_partitions = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    part = (
        df.repartitionByRange(num_partitions, *[F.col(c) for c in order_cols])
        .sortWithinPartitions(*order_cols)
        .withColumn("_pid", F.spark_partition_id())
    )
    part = part.persist()
    counts = {r["_pid"]: r["cnt"] for r in
              part.groupBy("_pid").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    offsets = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]

    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in part.schema.fields
        if f.name != "_pid"
    ) + ", doc_id long"

    def add_ids(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        seen = 0
        for pdf in it:
            if len(pdf) == 0:
                continue
            pid = int(pdf["_pid"].iloc[0])
            start = offsets[pid] + seen
            pdf = pdf.drop(columns=["_pid"])
            pdf["doc_id"] = np.arange(start, start + len(pdf), dtype=np.int64)
            seen += len(pdf)
            yield pdf

    return part.mapInPandas(add_ids, out_schema)


def documents_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The driver fixture ``documents.parquet`` as a single-field corpus."""
    return spark.read.parquet(f"{sf_dir}/documents.parquet")
