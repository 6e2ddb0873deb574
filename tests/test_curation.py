"""Training-set curation tail (`operators/curation.py`):
token-budget selection and deterministic epoch shuffle/shards."""

import random

import pytest
from pyspark.sql import functions as F

from cs_search_engine_architecture_spark.operators import curation as CU


def _brute_budget(rows, budget):
    """Reference keep-set: inclusive cumsum in (score desc, id asc)."""
    order = sorted(rows, key=lambda r: (-r[2], r[0]))
    kept, cum = {}, 0
    for doc_id, n, _score in order:
        cum += n
        if cum > budget:
            break
        kept[doc_id] = cum
    return kept


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_budget_matches_bruteforce(spark, seed):
    rng = random.Random(seed)
    rows = [
        (i, rng.randrange(0, 40), rng.choice([0.1, 0.25, 0.5, 0.9]))
        for i in range(300)
    ]
    budget = sum(n for _, n, _ in rows) // 3
    df = spark.createDataFrame(
        rows, "doc_id long, n_tokens long, quality_score double"
    )
    got = {
        r["doc_id"]: r["cum_tokens"]
        for r in CU.select_token_budget(df, budget).collect()
    }
    assert got == _brute_budget(rows, budget)


def test_budget_edges(spark):
    rows = [(1, 10, 0.9), (2, 5, 0.5), (3, 7, 0.5)]
    df = spark.createDataFrame(
        rows, "doc_id long, n_tokens long, quality_score double"
    )
    # budget >= total keeps everything
    assert CU.select_token_budget(df, 22).count() == 3
    # budget below the best doc keeps nothing
    assert CU.select_token_budget(df, 9).count() == 0
    # score tie broken by doc_id asc: 2 admitted before 3
    kept = {r["doc_id"] for r in CU.select_token_budget(df, 15).collect()}
    assert kept == {1, 2}
    # zero-token docs at the boundary still admit (cum unchanged)
    df0 = spark.createDataFrame(
        [(1, 10, 0.9), (2, 0, 0.5)],
        "doc_id long, n_tokens long, quality_score double",
    )
    assert CU.select_token_budget(df0, 10).count() == 2


def test_budget_histogram_prune_sound_and_effective(spark):
    """The histogram pre-prune never changes the kept set (differential
    vs brute force at a tight 5% budget) and actually cuts most of the
    corpus out of the sort-shuffle."""
    rng = random.Random(3)
    rows = [(i, rng.randrange(1, 50), rng.random()) for i in range(2000)]
    df = spark.createDataFrame(
        rows, "doc_id long, n_tokens long, quality_score double"
    )
    budget = sum(n for _, n, _ in rows) // 20
    got = {
        r["doc_id"]: r["cum_tokens"]
        for r in CU.select_token_budget(df, budget).collect()
    }
    assert got == _brute_budget(rows, budget)
    base = df.selectExpr(
        "doc_id", "n_tokens as n", "quality_score as score"
    )
    pred = CU._histogram_prune_predicate(base, budget)
    assert pred is not None
    surv = base.where(pred).count()
    assert len(got) <= surv < len(rows) // 2


def test_budget_deterministic_across_runs(spark):
    rng = random.Random(7)
    rows = [(i, rng.randrange(0, 30), rng.random()) for i in range(500)]
    df = spark.createDataFrame(
        rows, "doc_id long, n_tokens long, quality_score double"
    )
    a = sorted(CU.select_token_budget(df, 2000, num_partitions=7).collect())
    b = sorted(CU.select_token_budget(df, 2000, num_partitions=3).collect())
    assert a == b  # independent of partition count / sampled boundaries


@pytest.mark.parametrize("seed", [0, 1])
def test_stratified_budget_matches_bruteforce(spark, seed):
    rng = random.Random(seed)
    strata = ["en", "fr", "de", "zh"]
    rows = [
        (
            i,
            rng.randrange(0, 40),
            rng.choice([0.1, 0.25, 0.5, 0.9]),
            rng.choice(strata),
        )
        for i in range(400)
    ]
    budgets = {"en": 800, "fr": 400, "de": 150}  # zh dropped
    df = spark.createDataFrame(
        rows,
        "doc_id long, n_tokens long, quality_score double, lang string",
    )
    out = CU.select_token_budget_stratified(df, budgets).collect()
    # keep rule: inclusive per-stratum cumsum over the full stratum
    # order ≤ budget (cumsum is monotone — the kept set is a prefix)
    order = sorted(
        (r for r in rows if r[3] in budgets),
        key=lambda r: (r[3], -r[2], r[0]),
    )
    expect, cum = {}, {}
    for doc_id, n, _s, st in order:
        cum[st] = cum.get(st, 0) + n
        if cum[st] <= budgets[st]:
            expect[doc_id] = cum[st]
    got = {r["doc_id"]: r["cum_tokens"] for r in out}
    assert got == expect
    # every kept row reports its stratum and respects its budget
    for r in out:
        assert r["cum_tokens"] <= budgets[r["lang"]]


def test_epoch_shuffle_key_and_shard(spark):
    df = spark.range(200).withColumnRenamed("id", "doc_id")
    out = CU.epoch_shuffle(df, seed=7, num_shards=8).collect()
    assert len(out) == 200
    for r in out:
        assert 0 <= r["shuffle_key"] < 2**60
        assert r["shard"] == r["shuffle_key"] % 8
    # deterministic: same seed == same keys; different seed reorders
    again = CU.epoch_shuffle(df, seed=7, num_shards=8).collect()
    assert sorted(out) == sorted(again)
    other = {
        r["doc_id"]: r["shuffle_key"]
        for r in CU.epoch_shuffle(df, seed=8, num_shards=8).collect()
    }
    base = {r["doc_id"]: r["shuffle_key"] for r in out}
    assert base != other


def test_write_training_shards_sorted_and_complete(spark, tmp_path):
    df = spark.range(500).withColumnRenamed("id", "doc_id").withColumn(
        "payload", F.concat(F.lit("p"), F.col("doc_id").cast("string"))
    )
    path = str(tmp_path / "shards")
    CU.write_training_shards(df, path, seed=3, num_shards=4)
    back = spark.read.parquet(path)
    assert back.count() == 500
    assert {r["doc_id"] for r in back.select("doc_id").collect()} == set(
        range(500)
    )
    # every shard's file order IS shuffle_key order (the epoch contract)
    import pyarrow.dataset as ds

    for shard in range(4):
        tbl = ds.dataset(f"{path}/shard={shard}").to_table()
        keys = tbl.column("shuffle_key").to_pylist()
        assert keys == sorted(keys)
        assert all(k % 4 == shard for k in keys)


def test_diversity_cap_matches_bruteforce(spark):
    """SemDeDup-style capping: per hyperplane-LSH bucket keep the cap
    best (quality desc, doc_id asc) — verified against a pure-python
    mirror (similarity.bucket_of shares the md5 plane source with the
    SQL fragment), and the plan must carry WindowGroupLimit (the
    map-side partial per-group limit that bounds hot buckets)."""
    import random

    from cs_search_engine_architecture_spark.operators import (
        similarity as SIM,
    )

    rng = random.Random(11)
    dims, planes, cap = 8, 3, 2
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(dims)], rng.choice(
            [0.2, 0.4, 0.6, 0.8]))
        for i in range(120)
    ]
    emb = spark.createDataFrame(
        [(i, v) for i, v, _ in rows], "vec_id long, embedding array<double>"
    )
    qual = spark.createDataFrame(
        [(i, q) for i, _, q in rows], "doc_id long, quality_score double"
    )
    got = CU.diversity_cap(
        qual, emb, cap, num_planes=planes, dims=dims
    )
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan
    res = {(r["doc_id"], r["bucket"], r["rank"]) for r in got.collect()}
    # python mirror
    by_bucket = {}
    for i, v, q in rows:
        by_bucket.setdefault(SIM.bucket_of(v, planes), []).append((i, q))
    want = set()
    for b, members in by_bucket.items():
        members.sort(key=lambda t: (-t[1], t[0]))
        for rank, (i, _q) in enumerate(members[:cap], start=1):
            want.add((i, b, rank))
    assert res == want


def test_diversity_cap_with_supplied_buckets(spark):
    """`buckets=` substitutes any (doc_id, bucket) neighborhood frame
    (e.g. IVF cells) for the LSH signature — same keep rule."""
    qual = spark.createDataFrame(
        [(i, float(i % 5) / 10) for i in range(40)],
        "doc_id long, quality_score double",
    )
    cells = spark.createDataFrame(
        [(i, i % 4) for i in range(40)], "doc_id long, bucket int"
    )
    got = CU.diversity_cap(qual, None, 2, buckets=cells).collect()
    assert len(got) == 8  # 4 buckets x cap 2
    for r in got:
        assert r["rank"] <= 2
        # best quality in bucket b is 0.4 (doc_id % 5 == 4)
    by_bucket = {}
    for r in got:
        by_bucket.setdefault(r["bucket"], []).append(r["doc_id"])
    rows = {r["doc_id"]: r for r in qual.collect()}
    for b, members in by_bucket.items():
        cand = [i for i in range(40) if i % 4 == b]
        cand.sort(key=lambda i: (-rows[i]["quality_score"], i))
        assert sorted(members) == sorted(cand[:2])


def test_stratified_budget_accepts_non_string_strata(spark):
    """budgets keyed by ints over a numeric stratum column: the
    stratum value is cast to string internally, so every driver-side
    lookup must use normalized keys (this used to KeyError once the
    histogram prune or the exclusive-base fold ran)."""
    from cs_search_engine_architecture_spark.operators import curation

    rows = [
        (i, 10, float(100 - i), i % 2) for i in range(40)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, n_tokens long, quality_score double, dom int"
    )
    kept = curation.select_token_budget_stratified(
        df, {0: 50, 1: 30}, stratum_col="dom"
    ).collect()
    by_dom = {}
    for r in kept:
        by_dom.setdefault(str(r["dom"]), []).append(r)
    # inclusive cumsum <= budget: dom 0 keeps 5 docs (50 tokens),
    # dom 1 keeps 3 (30) — best scores first
    assert len(by_dom["0"]) == 5 and len(by_dom["1"]) == 3
    assert all(r["cum_tokens"] <= 50 for r in by_dom["0"])
    assert all(r["cum_tokens"] <= 30 for r in by_dom["1"])
