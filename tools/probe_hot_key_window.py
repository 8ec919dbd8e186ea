"""Hot-key window probe: demonstrate that the salted two-pass kernel
(functions/skew.bucketed_key_window) removes the one-task-per-key
ceiling of per-key ordered windows.

Builds the scale_probe N x replica with --skew HOT_PCT (HOT_PCT% of all
events on ONE user_id), then for scd2_history (plain window) vs
scd2_history_salted (bucketed kernel) reports:

- wall time (min of 2) at 1x and Nx,
- the LARGEST SINGLE-TASK SORT each form performs: for the plain window
  that is the hot key's full (user_id, event_type) history (one window
  partition == one task's sort); for the salted form it is the largest
  (user_id, event_type, time-bucket) group. This is the structural
  number wall time hides at probe scale: a 4M-row sequential sort costs
  ~2-3 s under a 60 s output-bound job, but at a key whose history
  exceeds an executor's sort budget the plain form stalls the stage
  regardless of cluster size, while the salted form's per-task sort is
  capped at ~1/B of it.

Usage: python tools/probe_hot_key_window.py [--n 100] [--skew 40]
           [--sf /root/testdata/sf0.1]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    args = sys.argv[1:]
    n, skew_pct, sf_dir = 100, 40, "/root/testdata/sf0.1"
    it = iter(args)
    for a in it:
        if a == "--n":
            n = int(next(it))
        elif a == "--skew":
            skew_pct = int(next(it))
        elif a == "--sf":
            sf_dir = next(it)

    from pyspark.sql import functions as F

    from photon_spark import queries_pipeline as qp
    from photon_spark.session import get_spark
    from tools.scale_probe import build_replica

    spark = get_spark("hot-key-window-probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).count()

    out_dir = tempfile.mkdtemp(prefix="photon_spark_hotkey_")
    try:
        t0 = time.perf_counter()
        build_replica(spark, sf_dir, out_dir, n, skew_pct=skew_pct)
        print(f"# {n}x replica, skew={skew_pct}% on one user_id, "
              f"built in {time.perf_counter()-t0:.1f}s", file=sys.stderr)

        ev = qp._events(spark, out_dir)
        total = ev.count()
        # largest single-task sort, plain form: the max per
        # (user_id, event_type) history — one window partition
        plain_max = (ev.groupBy("user_id", "event_type").count()
                       .agg(F.max("count")).first()[0])
        # salted form: max per (key, bucket) group, same bucketing as
        # bucketed_key_window with the gated SCD2_SALT_BUCKETS
        bounds = ev.agg(F.min("ts").alias("lo"),
                        F.max("ts").alias("hi")).first()
        width = max(1, (int(bounds["hi"]) - int(bounds["lo"]))
                    // qp.SCD2_SALT_BUCKETS + 1)
        salted_max = (ev.withColumn(
                          "_bkt", F.expr(f"(ts - {int(bounds['lo'])}L) "
                                         f"DIV {width}L"))
                        .groupBy("user_id", "event_type", "_bkt").count()
                        .agg(F.max("count")).first()[0])
        print(f"| rows | {total} |")
        print(f"| max single-task sort, plain window | {plain_max} "
              f"| {100.0 * plain_max / total:.1f}% of table |")
        print(f"| max single-task sort, salted B={qp.SCD2_SALT_BUCKETS} "
              f"| {salted_max} | {100.0 * salted_max / total:.1f}% "
              f"of table |")
        print(f"| ceiling reduction | {plain_max / max(salted_max,1):.1f}x |")

        for name, fn in (("scd2_history [plain]", qp.q_scd2_history),
                         ("scd2_history_salted [two-pass]",
                          qp.q_scd2_history_salted),
                         ("session_window_stats [native]",
                          qp.q_session_window_stats),
                         ("session_window_stats_salted [islands]",
                          qp.q_session_window_stats_salted)):
            res = {}
            for label, d in (("1x", sf_dir), (f"{n}x", out_dir)):
                spark.catalog.clearCache()
                best, rows = -1.0, 0
                for _ in range(2):
                    t0 = time.perf_counter()
                    rows = len(fn(spark, d).collect())
                    dt = time.perf_counter() - t0
                    best = dt if best < 0 else min(best, dt)
                res[label] = (best, rows)
            g = res[f"{n}x"][0] / max(res["1x"][0], 1e-9)
            print(f"| {name} | {res['1x'][0]:.2f}s | "
                  f"{res[f'{n}x'][0]:.2f}s | {g:.1f}x | rows "
                  f"{res['1x'][1]} -> {res[f'{n}x'][1]} |")
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
