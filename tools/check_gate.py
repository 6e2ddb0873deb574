"""Driver-mimic: run every __spark_entry__ query on Spark AND its DuckDB
oracle at sf0.01, compare row count, schema width, and order-insensitive
values (floats exactly — the gate's float32-cast policy should make them
bit-equal). Usage: python tools/check_gate.py [sf_dir] [--only n1,n2,...]"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402
from cs_search_engine_architecture_spark.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm(rows, cols):
    out = []
    for r in rows:
        d = dict(zip(cols, r)) if not hasattr(r, "asDict") else r.asDict()
        out.append(tuple(d[c] for c in sorted(d)))
    return sorted(out, key=lambda t: tuple(str(x) for x in t))


def main() -> int:
    args = sys.argv[1:]
    only: set[str] | None = None
    if "--only" in args:
        i = args.index("--only")
        only = set(args[i + 1].split(","))
        args = args[:i] + args[i + 2:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    spark = get_spark(master="local[8]", shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only is not None and name not in only:
            continue
        sdf = fn(spark, sf_dir)
        srows = sdf.collect()
        scols = sdf.columns
        if name not in oracles:
            print(f"[rows-only] {name}: {len(srows)} rows")
            continue
        drel = con.execute(oracles[name])
        drows = drel.fetchall()
        dcols = [d[0] for d in drel.description]
        a, b = norm(srows, scols), norm(drows, dcols)
        status = "OK"
        if sorted(scols) != sorted(dcols):
            status = f"SCHEMA MISMATCH {sorted(scols)} vs {sorted(dcols)}"
        elif len(a) != len(b):
            status = f"ROWCOUNT {len(a)} vs {len(b)}"
        elif a != b:
            diffs = [(x, y) for x, y in zip(a, b) if x != y][:5]
            status = f"VALUES differ, first: {diffs}"
        if status != "OK":
            failures += 1
        print(f"[{status}] {name}: {len(a)} rows")
    spark.stop()
    return failures


if __name__ == "__main__":
    sys.exit(main())
