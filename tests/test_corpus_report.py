"""jobs/corpus_report.py — the one-command corpus audit, driven as a
subprocess on a crafted corpus with planted signals."""

from __future__ import annotations

import json
import os
import subprocess
import sys

BODY = (
    "the quick brown fox jumps over the lazy dog and runs along the "
    "river bank toward the old mill where the miller waits patiently"
)


def test_corpus_report(spark, tmp_path):
    rows = [
        (0, BODY, "en"),
        (1, BODY, "en"),  # exact dup of 0
        (2, "contact me at alice@example.com about the offer", "en"),
        (3, "le chat noir dort sur le tapis rouge pres de la fenetre "
            "ouverte et la lune brille sur le jardin calme ce soir", "fr"),
        (4, "this benchmark sentence appears verbatim in the eval suite "
            "and the report must flag the training copy of it", "en"),
    ]
    corpus = str(tmp_path / "c.parquet")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string"
    ).write.parquet(corpus)
    bench = str(tmp_path / "b.parquet")
    spark.createDataFrame(
        [(0, rows[4][1])], "doc_id long, text string"
    ).write.parquet(bench)
    # embeddings: docs 0-2 share one vector (one semantic bucket),
    # 3-4 its negation -> 2 occupied buckets; cap 1 keeps 2
    v = [1.0] * 8
    emb = str(tmp_path / "e.parquet")
    spark.createDataFrame(
        [(i, v) for i in range(3)] + [(i, [-x for x in v]) for i in (3, 4)],
        "vec_id long, embedding array<float>",
    ).write.parquet(emb)

    out = str(tmp_path / "report.json")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [
            sys.executable, os.path.join(repo, "jobs", "corpus_report.py"),
            "--input", corpus, "--benchmark", bench, "--output", out,
            "--decontaminate-n", "5", "--cores", "2",
            "--embeddings", emb, "--diversity-planes", "4",
            "--diversity-dims", "8", "--diversity-cap", "1",
        ],
        capture_output=True, text=True, timeout=480, cwd=repo,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    rep = json.load(open(out))
    assert rep["volume"]["n_docs"] == 5
    assert rep["volume"]["bpe_tokens"] > 0
    assert rep["language_source"] == "column:lang"
    assert rep["languages"]["en"]["docs"] == 4
    assert rep["languages"]["fr"]["docs"] == 1
    assert rep["duplication"]["docs_in_exact_dup_groups"] == 2
    assert rep["duplication"]["minhash_lsh_candidate_pairs"] >= 1
    assert 0.0 <= rep["duplication"]["dup_gram_mass_est"] <= 1.0
    assert rep["pii"]["docs_with_pii"] == 1  # the email doc
    assert rep["contamination"]["contaminated_docs"] == 1  # doc 4
    assert 0 <= rep["quality"]["p10"] <= rep["quality"]["p50"] \
        <= rep["quality"]["p90"] <= 1
    sem = rep["semantic_redundancy"]
    assert sem["occupied_buckets"] == 2
    assert sem["vectors"] == 5
    assert sem["largest_bucket"] == 3
    assert sem["kept_at_cap_1"] == 2
    assert abs(sem["redundant_share"] - 0.6) < 1e-9
