"""Materialize a PERSISTENT N× replica of an sf dir for the second
bench tier (VERDICT r12 #1: at sf0.1 the suite is fixed-cost bound —
8-core total ≈ 32-core total — so parallelism/shuffle wins are invisible
to the default bench; a 10× dir read through the existing
$SPARK_GRAFT_SF_DIR contract makes them visible again).

Usage: python tools/build_scaled_dir.py OUT_DIR [--n 10] [--sf DIR]

The replica is scale_probe.build_replica's exact shape (events/docs/
embeddings offset-keyed per replica, TPC-H facts offset, dims fixed) so
per-query growth semantics match the r12 probes. Deterministic: same
inputs → same rows (file split layout may differ; no query result
depends on it).

Name OUT_DIR with an `sf…` component (e.g. /root/testdata_sf1/sf1.0)
so bench.py's sf regex and BENCH_HEAD.sf<sf>.runs<r>.json suffix work.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.scale_probe import build_replica  # noqa: E402


def main():
    args = sys.argv[1:]
    out_dir, n, sf_dir = None, 10, "/root/testdata/sf0.1"
    it = iter(args)
    for a in it:
        if a == "--n":
            n = int(next(it))
        elif a == "--sf":
            sf_dir = next(it)
        else:
            out_dir = a
    if not out_dir:
        sys.exit("usage: build_scaled_dir.py OUT_DIR [--n N] [--sf DIR]")

    from photon_spark.session import get_spark
    spark = get_spark("build-scaled-dir")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(out_dir, exist_ok=True)
    t0 = time.perf_counter()
    build_replica(spark, sf_dir, out_dir, n)
    print(f"# built {n}x replica of {sf_dir} at {out_dir} "
          f"in {time.perf_counter() - t0:.1f}s")


if __name__ == "__main__":
    main()
