"""Hash every registry query's output at a given sf (Spark only, no
oracle) — one JSON line {name: value_hash} to stdout.

Run TWICE in separate processes and diff to certify determinism: same
data + same code must produce identical order-insensitive value hashes
under fresh JVMs, fresh shuffle layouts, and fresh Python workers.

Usage: python tools/hash_registry.py [sf_dir] > hashes.json
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.check_correctness import value_hash  # noqa: E402


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    import __spark_entry__ as entry_mod
    from photon_spark.session import get_spark

    spark = get_spark("determinism-check")
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    for name, fn in entry_mod.queries().items():
        try:
            sdf = fn(spark, sf_dir)
            rows = [tuple(r) for r in sdf.collect()]
            out[name] = value_hash(rows, [c.lower() for c in sdf.columns])
        except Exception as exc:  # pragma: no cover - diagnostic path
            out[name] = f"ERROR:{exc}"[:120]
    json.dump(out, sys.stdout, indent=0, sort_keys=True)
    print()


if __name__ == "__main__":
    main()
