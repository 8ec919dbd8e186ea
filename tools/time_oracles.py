"""Time oracle_sql() entries on DuckDB at a given sf dir (BASELINE.md
DuckDB column; same min-of-N method as bench.py).

Usage: python tools/time_oracles.py [--sf DIR] [--runs 2] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    import duckdb

    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    runs = 2
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        del args[i:i + 2]
    if "--runs" in args:
        i = args.index("--runs")
        runs = int(args[i + 1])
        del args[i:i + 2]

    from photon_spark import queries as q

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    names = args or list(q.ORACLES)
    total = 0.0
    for name in names:
        sql = q.ORACLES.get(name)
        if sql is None:
            print(f"# {name}: no oracle")
            continue
        best = None
        for _ in range(runs):
            t0 = time.monotonic()
            n = len(con.execute(sql).fetchall())
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
        total += best
        print(f"# {name}: {best:.3f}s ({n} rows)")
    print(f"# total: {total:.2f}s over {len(names)} oracles")


if __name__ == "__main__":
    main()
