"""Local mimic of the driver's t2 correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB at the
same sf, compare row count, sorted column names, and an
order-insensitive value hash.

Usage: python tools/check_correctness.py [--json PATH] [sf_dir] [query ...]

``--json PATH`` additionally writes the per-query results in the driver's
CORRECTNESS_r{N}.json shape, so a stale round artifact can be regenerated
from HEAD.
"""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(val):
    import datetime
    import math
    if val is None:
        return "∅"
    if isinstance(val, float):
        if math.isnan(val):
            return "nan"
        # normalize -0.0 / int-valued floats
        if val == int(val) and abs(val) < 1e15:
            return str(int(val))
        return f"{val:.9g}"
    if isinstance(val, (datetime.datetime, datetime.date)):
        return val.isoformat()
    if isinstance(val, (list, tuple)):
        return "[" + ",".join(canon(v) for v in val) + "]"
    return str(val)


def value_hash(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main():
    args = sys.argv[1:]
    json_path = None
    if args and args[0] == "--json":
        json_path = args[1]
        args = args[2:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    import duckdb
    import __spark_entry__ as entry_mod
    from photon_spark.session import get_spark

    spark = get_spark("correctness-check")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    failures = 0
    results = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            srows = [tuple(r) for r in sdf.collect()]
            scols = [c.lower() for c in sdf.columns]
            sql = oracles.get(name)
            if sql is None:
                print(f"  ~ {name}: rows-only check, {len(srows)} rows")
                results[name] = {
                    "rows_match": None, "schema_match": None,
                    "hash_match": None, "spark_rows": len(srows),
                    "oracle_rows": None, "err": "no_oracle"}
                continue
            ddf = con.sql(sql)
            drows = ddf.fetchall()
            dcols = [c.lower() for c in ddf.columns]
            ok_cols = sorted(scols) == sorted(dcols)
            ok_n = len(srows) == len(drows)
            sh = value_hash(srows, scols)
            dh = value_hash(drows, dcols)
            ok = ok_cols and ok_n and sh == dh
            mark = "PASS" if ok else "FAIL"
            print(f"  {mark} {name}: rows {len(srows)}/{len(drows)} "
                  f"cols={'ok' if ok_cols else f'{sorted(scols)} vs {sorted(dcols)}'} "
                  f"hash {sh}/{dh}")
            results[name] = {
                "rows_match": ok_n, "schema_match": ok_cols,
                "hash_match": sh == dh, "spark_rows": len(srows),
                "oracle_rows": len(drows), "err": None}
            if not ok:
                failures += 1
                if not ok_cols or sh != dh:
                    sset = {tuple(canon(v) for v in r) for r in srows}
                    dset = {tuple(canon(v) for v in r) for r in drows}
                    for r in list(sset - dset)[:3]:
                        print(f"      spark-only: {r}")
                    for r in list(dset - sset)[:3]:
                        print(f"      duck-only:  {r}")
        except Exception as exc:
            failures += 1
            print(f"  ERROR {name}: {exc}")
            results[name] = {
                "rows_match": False, "schema_match": False,
                "hash_match": False, "spark_rows": None,
                "oracle_rows": None, "err": str(exc)[:500]}
    if json_path:
        import json
        with open(json_path, "w") as f:
            json.dump(results, f, indent=2)
        print(f"wrote {json_path}")
    print(f"{'ALL PASS' if failures == 0 else f'{failures} FAILURES'}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
