"""Time oracle_sql() entries on DuckDB at a given sf dir (BASELINE.md
DuckDB column).

Each oracle runs ``--runs`` times in one connection; the FIRST run is
recorded as ``cold`` and the best of the remaining runs as ``warm``.
Ratio adjudications must cite the WARM column: identical SQL on
identical data has shown a 20x cold-cache spread on a shared host
(0.28 s vs 6.15 s across recorded windows), which can flip a 2x
weak/not-weak call that the warm time decides stably. The suite total
is the warm sum.

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
        times = []
        for _ in range(runs):
            t0 = time.monotonic()
            n = len(con.execute(sql).fetchall())
            times.append(time.monotonic() - t0)
        cold = times[0]
        # warm = best run AFTER the first; with --runs 1 there is no
        # warm run, so fall back to the cold one rather than lie
        warm = min(times[1:]) if len(times) > 1 else cold
        total += warm
        print(f"# {name}: warm={warm:.3f}s cold={cold:.3f}s ({n} rows)")
    print(f"# total(warm): {total:.2f}s over {len(names)} oracles")


if __name__ == "__main__":
    main()
