"""End-to-end rank identity: Spark engine vs oracle on the reference-style
query set (FIXTURES.md §3) over a corpus that exercises tokenizer quirks,
every boolean branch, phrases, and degenerate queries. Contract: identical
doc_ids AND scores under the tie-break (score desc, doc_id asc)."""

import pytest

from cs_search_engine_architecture_spark.engine import SearchEngine
from cs_search_engine_architecture_spark.operators import indexer
from cs_search_engine_architecture_spark.oracle.reference import OracleIndex

DOCS = [
    (0, ["spark shuffle", "spark makes the shuffle fast and wide."]),
    (1, ["hash join", "the hash join beats merge join on small tables."]),
    (2, ["merge join", "sorted merge join shines for big sorted runs."]),
    (3, ["query planner", "the planner picks hash join or merge join."]),
    (4, ["spark planner", "spark planner prefers broadcast hash join."]),
    (5, ["", "a shuffle heavy query with skewed keys and salt."]),
    (6, ["tokenizer", "running tests on the tokenizer with utf8str 2024."]),
    (7, ["phrase docs", "delta gap varint blocks compress posting lists."]),
    (8, ["delta", "delta encoding then gap then varint in order."]),
    (9, ["spark spark", "spark spark spark repeated for term frequency."]),
]

QUERIES = [
    "spark",
    "join",
    "spark and shuffle",
    "hash join",  # implicit AND
    "spark or planner",
    "join and not merge",
    "not spark",  # top-level NOT quirk: returns spark's postings
    "not spark and join",
    "spark and not (hash or merge)",
    "not hash and not merge",  # De Morgan union
    '"hash join"',
    '"merge join" and sorted',
    '"delta gap varint"',  # 3-term phrase chain
    '"gap delta"',  # wrong order phrase
    "spark and planner or shuffle",  # precedence
    "spark or planner and shuffle",
    "(spark or hash) and join",
    "nonexistentterm",
    "spark and nonexistentterm",
    "spark or nonexistentterm",
    "and",
    '""',
    "the and of",  # stopwords only -> but and/or kept in query mode
    "running",  # stem: run
    "2024",
]


@pytest.fixture(scope="module")
def eng_oracle(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("e2e_index"))
    corpus = spark.createDataFrame(
        [(d, f[0], f[1]) for d, f in DOCS], "doc_id long, title string, body string"
    )
    indexer.build_index(
        spark, corpus, out, fields=["title", "body"], block_size=3, num_buckets=4
    )
    return SearchEngine(spark, out), OracleIndex(DOCS)


@pytest.mark.parametrize("query", QUERIES)
def test_rank_identical(eng_oracle, query):
    engine, oracle = eng_oracle
    got = engine.search_collect(query, top_k=10)
    want = oracle.search(query, top_k=10)
    assert [d for d, _ in got] == [d for d, _ in want], (
        f"{query!r}: got {got}, want {want}"
    )
    for (gd, gs), (wd, ws) in zip(got, want):
        assert gs == pytest.approx(ws, abs=1e-4), f"{query!r} doc {gd}"


def test_msearch_matches_per_query(eng_oracle):
    """Batched multi-query execution is a pure execution-strategy change:
    every query's (doc_id, score) top-k must equal its individual
    ``search`` result — covering the join-batched modes (single token,
    flat OR, flat AND, repeated terms, unknown terms) AND the compiled
    fallbacks (phrase, NOT, mixed precedence) in one batch."""
    import numpy as np

    engine, _ = eng_oracle
    batch = {
        "q_tok": "spark",
        "q_or": "spark or planner",
        "q_and": "spark and shuffle",
        "q_and3": "(spark and planner) and join",
        "q_rep": "spark or spark",
        "q_missing_or": "spark or nonexistentterm",
        "q_missing_and": "spark and nonexistentterm",
        "q_phrase": '"hash join"',
        # 3-term phrase pins the batched path's slot-ordered left-fold
        # score ((s1+s2)+s3) against the compiled chain bit-for-bit
        "q_phrase3": '"delta gap varint"',
        "q_not": "join and not merge",
        # flat AND-NOT family — now served by the shared-scan batcher
        # (negated terms as weight-0 presence rows), not a fallback
        "q_not2": "spark and join and not merge",
        "q_not_or": "spark and not (merge or shuffle)",
        "q_prec": "spark or planner and shuffle",
    }
    rows = engine.msearch(batch, top_k=5).collect()
    by_qid: dict[str, list] = {}
    for r in rows:
        by_qid.setdefault(r["query_id"], []).append(r)
    for qid, qstr in batch.items():
        got = sorted(
            ((r["doc_id"], r["score"]) for r in by_qid.get(qid, [])),
            key=lambda t: (-np.float32(t[1]), t[0]),
        )
        want = engine.search_collect(qstr, top_k=5)
        assert [d for d, _ in got] == [d for d, _ in want], f"{qid}: {got} != {want}"
        for (gd, gs), (_, ws) in zip(got, want):
            assert float(np.float32(gs)) == pytest.approx(ws, abs=1e-5), f"{qid}/{gd}"
    assert len(rows) <= 5 * len(batch)


def test_topk_limits(eng_oracle):
    engine, oracle = eng_oracle
    got = engine.search_collect("spark or join or shuffle", top_k=3)
    want = oracle.search("spark or join or shuffle", top_k=3)
    assert len(got) == 3
    assert [d for d, _ in got] == [d for d, _ in want]


def test_materialize_invariant(eng_oracle, spark):
    engine, _ = eng_oracle
    corpus = spark.createDataFrame(
        [(d, f[0], f[1]) for d, f in DOCS], "doc_id long, title string, body string"
    )
    res = engine.search("spark and shuffle", top_k=5)
    mat = engine.materialize(res, corpus).collect()
    assert {r["doc_id"] for r in mat} <= {d for d, _ in DOCS}
    assert all(r["body"] for r in mat)


def test_msearch_property_random_batches(eng_oracle):
    """Randomized batches of queries built from the corpus vocabulary
    (tokens, flat AND/OR chains of random arity, NOT/phrase fallbacks):
    msearch must equal per-query search for every member. Deterministic
    seed — hypothesis' engine is overkill for a fixed engine fixture,
    but the generator covers shapes the hand-written cases don't
    (arity-4 chains, repeated terms, all-unknown batches)."""
    import random

    import numpy as np

    engine, _ = eng_oracle
    rng = random.Random(20260816)
    vocab = ["spark", "join", "merge", "hash", "shuffle", "planner",
             "delta", "varint", "tokenizer", "zzzmissing"]

    def gen_query():
        kind = rng.randrange(5)
        if kind == 0:
            return rng.choice(vocab)
        if kind in (1, 2):
            op = " or " if kind == 1 else " and "
            n = rng.randint(2, 4)
            return op.join(rng.choice(vocab) for _ in range(n))
        if kind == 3:
            a, b = rng.sample(vocab, 2)
            return f"{a} and not {b}"
        return f'"{rng.choice(vocab)} {rng.choice(vocab)}"'

    for _round in range(4):
        batch = {f"q{i}": gen_query() for i in range(6)}
        rows = engine.msearch(batch, top_k=5).collect()
        by_qid: dict[str, list] = {}
        for r in rows:
            by_qid.setdefault(r["query_id"], []).append(r)
        for qid, qstr in batch.items():
            got = sorted(
                ((r["doc_id"], r["score"]) for r in by_qid.get(qid, [])),
                key=lambda t: (-np.float32(t[1]), t[0]),
            )
            want = engine.search_collect(qstr, top_k=5)
            assert [d for d, _ in got] == [d for d, _ in want], (qid, qstr)
            for (gd, gs), (_, ws) in zip(got, want):
                assert float(np.float32(gs)) == pytest.approx(ws, abs=1e-5), (
                    qid, qstr, gd,
                )


def test_percolate_property_random_trees(eng_oracle, spark):
    """Randomized THREE-WAY differential for percolation: generated
    nested boolean trees (depth ≤3, parenthesized mixed precedence,
    unary NOT wrappers, AND NOT, repeated terms, unknown terms) plus
    standalone phrases. For every query, (a) the Spark engine's scored
    search and the pure-Python oracle must select the same doc set,
    and (b) percolating the whole corpus must select exactly that set
    — covering percolate's batchable arm, phrase arm, and mixed-tree
    lazy-algebra arm (including NOTs that survive to the top level,
    where the complement flag is discarded) with shapes the
    fixed-query tests don't reach."""
    import random

    engine, oracle = eng_oracle
    docs_df = spark.createDataFrame(
        [(d, f[0], f[1]) for d, f in DOCS],
        "doc_id long, title string, body string",
    )
    rng = random.Random(20260817)
    vocab = ["spark", "join", "merge", "hash", "shuffle", "planner",
             "delta", "varint", "tokenizer", "sorted", "zzzmissing"]

    def gen_expr(depth: int) -> str:
        if depth == 0 or rng.random() < 0.3:
            return rng.choice(vocab)
        op = rng.choice([" and ", " or ", " and not "])
        e = f"({gen_expr(depth - 1)}{op}{gen_expr(depth - 1)})"
        if rng.random() < 0.15:
            e = f"not {e}"
        return e

    def gen_query() -> str:
        if rng.random() < 0.2:
            n = rng.randint(2, 3)
            return '"' + " ".join(
                rng.choice(vocab[:-1]) for _ in range(n)
            ) + '"'
        return gen_expr(rng.randint(1, 3))

    for _round in range(2):
        batch = {f"q{i}": gen_query() for i in range(10)}
        by_q: dict[str, set] = {}
        for r in engine.percolate(batch, docs_df).collect():
            by_q.setdefault(r["query_id"], set()).add(r["doc_id"])
        # fourth leg: the same random batch through engine.msearch
        # (batched arms + compiled fallbacks for mixed trees) — with
        # top_k covering the whole corpus its per-query rows must be
        # the full scored match set. Scores compare with an ulp
        # tolerance: wide batched ORs sum in aggregation order, the
        # compiled chain in tree order (CLAUDE.md: exact equality is
        # only pinned for <=2-term batches).
        ms_sets: dict[str, set] = {}
        ms_scores: dict[tuple, float] = {}
        for r in engine.msearch(batch, top_k=20).collect():
            ms_sets.setdefault(r["query_id"], set()).add(r["doc_id"])
            ms_scores[(r["query_id"], r["doc_id"])] = r["score"]
        for qid, qstr in batch.items():
            eng_rows = {
                r["doc_id"]: r["score"]
                for r in engine.search_df(qstr).collect()
            }
            eng_set = set(eng_rows)
            ora_set = {d for d, _ in oracle.search_all(qstr)}
            assert eng_set == ora_set, (qid, qstr)
            assert by_q.get(qid, set()) == eng_set, (qid, qstr)
            assert ms_sets.get(qid, set()) == eng_set, (qid, qstr)
            for d in eng_set:
                assert abs(ms_scores[(qid, d)] - eng_rows[d]) < 1e-9, (
                    qid, qstr, d,
                )


def test_msearch_mixed_matches_compiled(eng_oracle):
    """Mixed-precedence term-only trees in msearch ride ONE shared
    term->score map aggregation whose 8-case lazy-NOT score arithmetic
    mirrors the compiled joins bit-for-bit — scores must be EXACTLY
    equal (==, no tolerance), unlike wide batched ORs where only the
    addition order differs."""
    engine, _ = eng_oracle
    queries = {
        "m1": "spark and (join or shuffle)",
        "m2": "spark or not join",  # OR(+,-): join-docs minus spark
        "m3": "(spark or join) and not (merge or hash)",
        "m4": "not spark and not join",  # AND(-,-): De Morgan union
        "m5": "spark and (spark or join)",  # duplicate leaf: summed twice
        "m6": "not (spark and (join or not merge))",  # top-level NOT
    }
    got = {}
    for r in engine.msearch(queries, top_k=20).collect():
        got.setdefault(r["query_id"], {})[r["doc_id"]] = r["score"]
    for qid, qstr in queries.items():
        want = {
            r["doc_id"]: r["score"]
            for r in engine.search_df(qstr).collect()
        }
        assert got.get(qid, {}) == want, (qid, qstr)  # exact, floats too


def test_top_level_not_rides_fast_paths(eng_oracle):
    """"not X" is identity at the root (complement flag discarded):
    it must return X's exact rows AND take X's fast routing path
    instead of the join fallback."""
    engine, oracle = eng_oracle

    plain = engine.search_collect("spark", top_k=5)
    assert engine.last_strategy == "single_term_blockmax"
    wrapped = engine.search_collect("not spark", top_k=5)
    assert engine.last_strategy == "single_term_blockmax"
    assert wrapped == plain
    assert [d for d, _ in plain] == [
        d for d, _ in oracle.search("not spark", top_k=5)
    ]

    a = engine.search_collect("not (spark or shuffle)", top_k=5)
    s1 = engine.last_strategy
    b = engine.search_collect("spark or shuffle", top_k=5)
    assert (a, s1) == (b, engine.last_strategy)


def test_phrase_scan_blind_spots_multi_field(spark, tmp_path):
    """The reference phrase constraint is a two-cursor forward SCAN
    over the as-stored position lists (sea/posting_list.pyx:23-44), not
    an any-pair ∃ test. Positions are field-concatenated and
    field-relative (sea/corpus.pyx:117-197), so a term in BOTH fields
    has a non-monotonic list and the scan has blind spots — parity
    includes them (round-5 soak find: the engine's old nested-exists
    predicate over-matched). Pins both directions on a multi-field
    index, engine vs the pure-Python oracle:

    * doc 59: "query" stores [7, 0] (title@7, body@0), "sorted" [0] —
      the scan starts at x=7, sees d=-7, advances past y and never
      examines the (0, 0) pair: '"query sorted"' must NOT match;
    * cross-field matches the scan DOES reach (sorted lists) and the
      same-occurrence quirk for repeated terms must keep matching.
    """
    docs = [
        (59, ["sorted query salt", "query merge merge hash join the"]),
        (1, ["hash join", "the hash join beats merge join"]),
        (2, ["title only sorted", "query starts the body here"]),
    ]
    out = str(tmp_path / "blindspot_idx")
    corpus = spark.createDataFrame(
        [(d, f[0], f[1]) for d, f in docs],
        "doc_id long, title string, body string",
    )
    indexer.build_index(
        spark, corpus, out, fields=["title", "body"], block_size=8,
        num_buckets=4,
    )
    engine, oracle = SearchEngine(spark, out), OracleIndex(docs)

    cases = {
        '"query sorted"': [],         # blind spot: scan skips (0, 0)
        '"query sorted sorted"': [],  # same, behind the repeat quirk
        '"sorted query"': [59],       # in-field adjacency
        '"sorted sorted"': [2, 59],   # same-occurrence quirk (d = 0)
        '"the query"': [2, 59],       # cross-field match the scan reaches
        '"query starts"': [2],        # plain body adjacency
    }
    for q, want in cases.items():
        got = sorted(r["doc_id"] for r in engine.search_df(q).collect())
        assert got == want, f"{q}: engine {got} != {want}"
        assert want == sorted(d for d, _ in oracle.search_all(q)), q
    # the batched phrase arm (slot_chain_window_ok) shares the scan
    ms = engine.msearch(
        {f"q{i}": q for i, q in enumerate(cases)}, top_k=10
    ).collect()
    by_q = {}
    for r in ms:
        by_q.setdefault(r["query_id"], []).append(r["doc_id"])
    for i, (q, want) in enumerate(cases.items()):
        assert sorted(by_q.get(f"q{i}", [])) == want, f"msearch {q}"
