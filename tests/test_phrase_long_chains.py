"""4-6-term phrase chains: no other test or soak exercises phrase slot
chains longer than 3 terms (the fixture set stops at '"delta gap
varint"' and the soak generator draws 2-3 words). Differential vs the
pure-Python reference oracle on a seeded random corpus: doc sets
identical everywhere, scores bit-identical at the float32 comparison
boundary (the repo-wide float policy — the oracle casts its final
total_score, ``search_collect`` casts the engine's), across the
compiled chain, the batched msearch phrase arm, and the percolate
phrase arm — on BOTH phrase-window forms (single-field any-pair and
multi-field reference scan; ``dialect.phrase_window`` plan-time
switch)."""

import random

import pytest

from cs_search_engine_architecture_spark.engine import SearchEngine
from cs_search_engine_architecture_spark.operators import indexer
from cs_search_engine_architecture_spark.oracle.reference import OracleIndex

WORDS = [
    "spark", "join", "merge", "hash", "shuffle", "planner", "delta",
    "varint", "tokenizer", "sorted",
]


def _mk_docs(rng, n, two_field):
    docs = []
    for i in range(n):
        body = " ".join(rng.choice(WORDS) for _ in range(rng.randint(6, 30)))
        if two_field:
            title = " ".join(
                rng.choice(WORDS) for _ in range(rng.randint(0, 4))
            )
            docs.append((i, [title, body]))
        else:
            docs.append((i, [body]))
    return docs


def _phrases(rng, docs, n_queries):
    """4-6-word phrases; 60% sampled as contiguous body windows so real
    matches (including repeated-term chains) are guaranteed."""
    qs = []
    while len(qs) < n_queries:
        ln = rng.choice([4, 5, 6])
        if rng.random() < 0.6:
            toks = rng.choice(docs)[1][-1].split()
            if len(toks) < ln:
                continue
            s = rng.randrange(0, len(toks) - ln + 1)
            words = toks[s:s + ln]
        else:
            words = [rng.choice(WORDS) for _ in range(ln)]
        qs.append('"' + " ".join(words) + '"')
    return qs


@pytest.fixture(
    scope="module", params=[False, True], ids=["single_field", "two_field"]
)
def built(request, spark, tmp_path_factory):
    two_field = request.param
    rng = random.Random(61803 + int(two_field))
    docs = _mk_docs(rng, 120, two_field)
    out = str(tmp_path_factory.mktemp(f"p46_{int(two_field)}"))
    if two_field:
        corpus = spark.createDataFrame(
            [(d, f[0], f[1]) for d, f in docs],
            "doc_id long, title string, body string",
        )
        indexer.build_index(
            spark, corpus, out, fields=["title", "body"], block_size=8,
            num_buckets=4,
        )
    else:
        corpus = spark.createDataFrame(
            [(d, f[0]) for d, f in docs], "doc_id long, text string"
        )
        indexer.build_index(
            spark, corpus, out, fields=["text"], block_size=8, num_buckets=4,
        )
    engine = SearchEngine(spark, out)
    assert engine.compiler.single_field is (not two_field)
    qs = _phrases(rng, docs, 14)
    return engine, OracleIndex(docs), corpus, qs


def test_long_phrase_chain_matches_oracle(built):
    engine, oracle, _, qs = built
    hits = 0
    for q in qs:
        got = engine.search_collect(q, top_k=1 << 30)
        want = oracle.search_all(q)
        assert dict(got) == dict(want), q  # exact f32-boundary equality
        assert [d for d, _ in got] == [d for d, _ in want], q
        hits += bool(want)
    assert hits >= 5  # sampled-window phrases guarantee real matches


def test_long_phrase_msearch_matches_compiled(built):
    """Batched-phrase scores are bit-identical DOUBLES to the compiled
    chain's slot-ordered left fold (repo invariant) — compare the raw
    doubles strictly, no float32 cast (a last-ulp regression in the
    batched fold must fail here; test_msearch_mixed_matches_compiled
    style)."""
    engine, _, _, qs = built
    batch = {f"q{i}": q for i, q in enumerate(qs)}
    by: dict[str, dict] = {}
    for r in engine.msearch(batch, top_k=200).collect():
        by.setdefault(r["query_id"], {})[r["doc_id"]] = r["score"]
    for i, q in enumerate(qs):
        want = {
            r["doc_id"]: r["score"]
            for r in engine.search(q, top_k=200).collect()
        }
        got = by.get(f"q{i}", {})
        assert got == want, q


def test_long_phrase_percolate_matches_search(built):
    engine, oracle, corpus, qs = built
    batch = {f"q{i}": q for i, q in enumerate(qs)}
    by: dict[str, set] = {}
    for r in engine.percolate(batch, corpus).collect():
        by.setdefault(r["query_id"], set()).add(r["doc_id"])
    for i, q in enumerate(qs):
        want = {d for d, _ in oracle.search_all(q)}
        assert by.get(f"q{i}", set()) == want, q
