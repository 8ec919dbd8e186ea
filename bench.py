"""Benchmark harness: runs every driver-contract query at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is materialized with .collect() (result sets are small by
design); timings exclude session startup but include full plan execution.

Methodology: each query runs twice and the MINIMUM is reported (recorded in
the "runs" field). Run-to-run variance on this VM is 2-3× (shared-host CPU
jitter + first-touch page cache + JIT), so a single cold sample measures the
environment, not the plan; min-of-2 is the steady-state cost of the query.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([\d.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    from photon_spark.session import get_spark
    from photon_spark import queries as q

    spark = get_spark("photon_spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM/codegen paths and the Python UDF worker pool so query 1
    # doesn't absorb one-time process-spawn cost.
    spark.range(1000).count()
    from pyspark.sql import functions as F

    @F.pandas_udf("long")
    def _warm(s: pd.Series) -> pd.Series:
        return s
    warm_df = spark.range(10000).repartition(int(os.environ.get(
        "SPARK_GRAFT_CPUS", "32")))
    warm_df.select(_warm("id")).count()
    warm_df.mapInPandas(lambda it: it, schema="id long").count()

    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))
    timings: dict[str, float] = {}
    for name, fn in q.QUERIES.items():
        best, nrows = -1.0, 0
        # Queries are independent: drop persisted blocks left by the
        # previous query so block-manager churn doesn't bleed across
        # timings (run 2 of the SAME query still reuses its own persists).
        spark.catalog.clearCache()
        try:
            for _ in range(runs):
                t0 = time.perf_counter()
                rows = fn(spark, sf_dir).collect()
                dt = time.perf_counter() - t0
                best = dt if best < 0 else min(best, dt)
                nrows = len(rows)
            timings[name] = round(best, 3)
            print(f"# {name}: {best:.3f}s ({nrows} rows)", file=sys.stderr)
        except Exception as exc:
            timings[name] = -1.0
            print(f"# {name}: FAILED {exc}", file=sys.stderr)

    total = round(sum(v for v in timings.values() if v >= 0), 3)
    payload = {
        "metric": "photon_spark_total_query_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "runs": runs,
        "sf": sf,
    }
    line = json.dumps(payload)
    print(line)
    # The driver captures only the stdout tail, which has truncated the
    # per-query map in past rounds — persist the full result next to the
    # repo so round-over-round regression diffs are always computable.
    # BENCH_HEAD.json is the canonical round artifact and only ever holds
    # the default contract (sf0.1, runs=2); ad-hoc runs with overridden
    # SPARK_GRAFT_SF_DIR / SPARK_GRAFT_BENCH_RUNS land in a
    # config-suffixed file instead so a smoke run can't silently replace
    # the regression baseline.
    default_contract = (
        os.path.realpath(sf_dir) == os.path.realpath("/root/testdata/sf0.1")
        and runs == 2)
    fname = ("BENCH_HEAD.json" if default_contract
             else f"BENCH_HEAD.sf{sf}.runs{runs}.json")
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            fname)
    with open(out_path, "w") as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
