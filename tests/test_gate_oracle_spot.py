"""Gate-vs-oracle drift guard.

Round-5 lesson: the percolate mixed-tree arm's semantics changed (the
lazy-NOT algebra commit) but the pc7 DuckDB oracle in ``gate.py`` kept
encoding the old true-boolean negation reach — the composite gate row
was silently row-count-red at HEAD for several commits because nothing
in the suite executes the oracle SQL strings.  ``tools/check_gate.py``
catches it, but only when someone remembers to run it.

This test replays the driver's exact comparison (row count, schema,
order-insensitive value tuples, floats exact) for the most drift-prone
serving composites — the gates whose oracle SQL re-encodes engine
ALGEBRA (boolean precedence, the batched msearch arms, percolate's
8-case lazy-NOT evaluation) rather than a plain aggregate — at sf0.001
so engine-semantics changes that miss the oracle fail the suite, not a
round-end artifact.  The full 50-query sweep stays in
``tools/check_gate.py``; this is the in-suite tripwire.
"""

import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

# Serving composites whose oracle SQL mirrors engine algebra op-for-op:
# the class of gate most likely to drift when search semantics evolve.
SPOT = ["msearch_batched", "bool_queries"]


def _norm(rows, cols):
    out = []
    for r in rows:
        d = dict(zip(cols, r)) if not hasattr(r, "asDict") else r.asDict()
        out.append(tuple(d[c] for c in sorted(d)))
    return sorted(out, key=lambda t: tuple(str(x) for x in t))


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )
    yield con
    con.close()


@pytest.mark.parametrize("name", SPOT)
def test_gate_matches_oracle(spark, duck, name):
    sdf = entry_mod.queries()[name](spark, SF_DIR)
    srows, scols = sdf.collect(), sdf.columns
    rel = duck.execute(entry_mod.oracle_sql()[name])
    drows = rel.fetchall()
    dcols = [d[0] for d in rel.description]
    assert sorted(scols) == sorted(dcols)
    a, b = _norm(srows, scols), _norm(drows, dcols)
    assert len(a) == len(b), f"{name}: {len(a)} spark rows vs {len(b)} oracle"
    assert a == b
