"""`spark-submit --py-files dist/engine.zip` — the north rule's launch
mode, driven as REAL subprocesses: build an index and query it with the
job scripts copied OUTSIDE the repo (their ``sys.path`` bootstrap then
points at a directory with no package), ``PYTHONPATH`` scrubbed and cwd
outside the repo, so the ONLY way ``cs_search_engine_architecture_spark``
resolves — on the driver and on executors — is the ``--py-files`` zip.
A plain-python guard subprocess asserts that isolation holds before any
JVM is paid for."""

from __future__ import annotations

import json
import os
import re
import shutil
import subprocess
import sys

import pytest

PKG = "cs_search_engine_architecture_spark"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _spark_submit() -> str | None:
    found = shutil.which("spark-submit")
    if found:
        return found
    import pyspark

    cand = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    return cand if os.path.exists(cand) else None


def _scrubbed_env() -> dict:
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be the only package source
    return env


def test_spark_submit_py_files_build_and_search(spark, tmp_path):
    submit = _spark_submit()
    if submit is None:
        pytest.skip("spark-submit launcher not on PATH")

    # Package the engine exactly as a user would (tools/make_dist.py).
    sys.path.insert(0, os.path.join(REPO, "tools"))
    try:
        import make_dist

        zip_path = make_dist.main()
    finally:
        sys.path.pop(0)
    assert os.path.exists(zip_path)

    # Stage the UNMODIFIED job scripts outside the repo: their
    # `sys.path.insert(0, <parent of jobs/>)` bootstrap then points at a
    # directory with no package, so only the zip can satisfy the import.
    stage = tmp_path / "submit"
    (stage / "jobs").mkdir(parents=True)
    for job in ("build_index.py", "search.py"):
        shutil.copy(os.path.join(REPO, "jobs", job), stage / "jobs" / job)

    corpus = str(tmp_path / "corpus.parquet")
    rows = [
        (0, "def hash_join(left, right): return merge(left, right)"),
        (1, "class ShuffleManager: pass  # spark shuffle service"),
        (2, "spark sql adaptive execution enabled"),
        (3, "hash partitioning for the shuffle stage in spark"),
        (4, "binary search over sorted postings"),
        (5, "def tokenize(text): return text.split()"),
    ]
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(corpus)

    env = _scrubbed_env()

    # Guard: with this env and cwd, plain python must NOT see the package
    # (it is not pip-installed and nothing on sys.path provides it) — if
    # this fails the two JVM legs below would prove nothing about the zip.
    guard = subprocess.run(
        [sys.executable, "-c", f"import {PKG}"],
        capture_output=True, text=True, cwd=str(stage), env=env, timeout=60,
    )
    assert guard.returncode != 0, (
        "package importable without the zip — isolation broken: "
        + guard.stdout[-500:]
    )

    index = str(tmp_path / "idx")
    build = subprocess.run(
        [
            submit, "--master", "local[2]",
            "--py-files", zip_path,
            str(stage / "jobs" / "build_index.py"),
            "--input", corpus, "--output", index, "--fields", "text",
        ],
        capture_output=True, text=True, cwd=str(stage), env=env, timeout=300,
    )
    assert build.returncode == 0, build.stderr[-3000:]
    meta = json.load(open(os.path.join(index, "meta.json")))
    assert meta["num_documents"] == 6

    search = subprocess.run(
        [
            submit, "--master", "local[2]",
            "--py-files", zip_path,
            str(stage / "jobs" / "search.py"),
            "--index", index, "--query", "spark and shuffle", "--top-k", "5",
        ],
        capture_output=True, text=True, cwd=str(stage), env=env, timeout=300,
    )
    assert search.returncode == 0, search.stderr[-3000:]
    # show() table rows: conjunction matches docs 3 and 1 only.
    hits = re.findall(r"\|(\d+)\s*\|\d+\.\d+", search.stdout)
    assert hits == ["3", "1"], search.stdout[-2000:]
