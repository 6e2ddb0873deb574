"""Physical-plan hygiene across the ENTIRE gate surface: no operator we
ship may plan a cartesian product or a broadcast nested-loop join at any
scale — the two shapes that silently turn into O(n²) work on a cluster.
Builds every `__spark_entry__.queries()` frame at sf0.001 and inspects
the executed plan string (plans only — the frames are not collected,
though gate index builds are triggered and /tmp-cached).

This is a tripwire, not a perf test: a Catalyst size misestimate that
flips an LSH self-join to broadcast (the exact regression the
`hint("shuffle_hash")` invariants guard) shows up here as a plan-shape
diff before it shows up as a cluster incident.
"""

from __future__ import annotations

import pytest

SF_DIR = "/root/testdata/sf0.001"

FORBIDDEN = ("CartesianProduct", "BroadcastNestedLoopJoin")


def _query_names():
    import __spark_entry__ as entry

    return sorted(entry.queries().keys())


@pytest.mark.parametrize("name", _query_names())
def test_no_quadratic_join_shapes(spark, name):
    import __spark_entry__ as entry

    df = entry.queries()[name](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    for bad in FORBIDDEN:
        assert bad not in plan, f"{name} plans a {bad}:\n{plan[:2000]}"
