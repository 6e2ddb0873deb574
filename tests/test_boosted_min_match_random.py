"""Randomized differential for ``boosted_search`` + ``minimum_should_match``.

The gate's boosted arm keeps <=2 distinct terms (order-insensitive double
sums — see CLAUDE.md); nothing randomized exercised wider boosted
disjunctions or the ``matched >= required`` min_match filter across
arbitrary thresholds. Contract checked here: for any boost map B and
min_match m,

    boosted_search(B, m) == { d: sum_t B[t] * bm25_t(d)
                              for d matching >= m distinct terms of B }

where each bm25_t comes from the engine's own single-term search (that
path is differentially pinned against the reference oracle by
test_search_e2e and the soak battery), so this is the pure composition
algebra of the shared-scan batcher: weights ride the broadcast query
map, the hit filter counts distinct matched terms. Scores compare at
1e-9 (double sums over f32-valued stored scores; only summation order
differs between the Spark aggregate and the Python model)."""

import random

import pytest

from cs_search_engine_architecture_spark.engine import SearchEngine
from cs_search_engine_architecture_spark.operators import indexer

WORDS = [
    "spark", "join", "merge", "hash", "shuffle", "planner", "delta",
    "varint", "tokenizer", "sorted",
]
BOOSTS = [0.25, 0.5, 1.0, 1.5, 2.0, 3.0]


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    rng = random.Random(27644437)
    docs = [
        (i, " ".join(rng.choice(WORDS) for _ in range(rng.randint(4, 25))))
        for i in range(100)
    ]
    out = str(tmp_path_factory.mktemp("boosted_idx"))
    corpus = spark.createDataFrame(docs, "doc_id long, text string")
    indexer.build_index(
        spark, corpus, out, fields=["text"], block_size=8, num_buckets=4,
    )
    eng = SearchEngine(spark, out)
    # boosted_search takes POST-analysis terms (as stored in the
    # dictionary): map each surface word through the analyzer and key
    # everything by the stored stem ("tokenizer" -> "token").
    from cs_search_engine_architecture_spark.functions.tokenizer import (
        tokenize,
    )
    stored = {w: tokenize(w)[0][0] for w in WORDS}
    vocab = sorted(set(stored.values()))
    # stems must be analyzer fixed points or search_df(stem) would
    # re-stem to a different dictionary entry than boosted_search hits
    assert all(tokenize(t)[0] == [t] for t in vocab)
    per_term = {
        t: {r["doc_id"]: r["score"] for r in eng.search_df(t).collect()}
        for t in vocab
    }
    assert sum(bool(v) for v in per_term.values()) >= 8
    return eng, per_term, vocab


def test_boosted_min_match_matches_composition(built):
    eng, per_term, vocab = built
    rng = random.Random(1729)
    nontrivial_cuts = 0
    for _trial in range(25):
        terms = rng.sample(vocab, rng.randint(2, 5))
        boosts = {t: rng.choice(BOOSTS) for t in terms}
        min_match = rng.randint(0, len(terms))

        expected = {}
        for d in {d for t in terms for d in per_term[t]}:
            matched = [t for t in terms if d in per_term[t]]
            if len(matched) >= min_match:
                expected[d] = sum(boosts[t] * per_term[t][d] for t in matched)
        # a cut is nontrivial only when min_match dropped docs from the
        # posting UNION (counting with multiplicity overstated: any term
        # overlap registered as a "cut" even when nothing was filtered)
        if 0 < min_match and len(expected) < len(
            {d for t in terms for d in per_term[t]}
        ):
            nontrivial_cuts += 1

        got = {
            r["doc_id"]: r["score"]
            for r in eng.boosted_search(boosts, top_k=1000,
                                        min_match=min_match).collect()
        }
        assert set(got) == set(expected), (terms, min_match)
        for d, s in expected.items():
            assert got[d] == pytest.approx(s, abs=1e-9), (terms, d)
    assert nontrivial_cuts >= 5  # min_match actually filtered something


def test_boosted_all_terms_required_equals_and_set(built):
    """min_match == len(terms) admits exactly the conjunction's doc set
    (scores stay the weighted disjunction sum — filter, not rescore)."""
    eng, per_term, vocab = built
    terms = ["spark", "join", "hash"]
    assert all(t in per_term for t in terms)
    want = set(per_term[terms[0]])
    for t in terms[1:]:
        want &= set(per_term[t])
    got = {
        r["doc_id"]
        for r in eng.boosted_search({t: 1.0 for t in terms}, top_k=1000,
                                    min_match=len(terms)).collect()
    }
    assert got == want
