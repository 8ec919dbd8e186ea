"""Governance operators: naive recomputes for the constraint audit,
cohort retention, and dup-graph clustering stats."""

from pyspark.sql import functions as F

from photon_spark import queries_governance as qg


def test_constraint_audit_matches_naive(spark, sf_dir):
    got = {r["check_name"]: (r["violations"], r["checked"])
           for r in qg.q_constraint_audit(spark, sf_dir).collect()}
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").collect()
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").collect()
    cust = {r["c_custkey"]
            for r in spark.read.parquet(f"{sf_dir}/customer.parquet")
                              .collect()}
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()

    pk: dict = {}
    for r in li:
        pk[(r["l_orderkey"], r["l_linenumber"])] = \
            pk.get((r["l_orderkey"], r["l_linenumber"]), 0) + 1
    assert got["lineitem_pk_unique"] == (
        sum(n - 1 for n in pk.values() if n > 1), len(pk))
    okeys = {r["o_orderkey"] for r in orders}
    assert got["orders_custkey_fk"] == (
        sum(1 for r in orders if r["o_custkey"] not in cust), len(orders))
    assert got["lineitem_orderkey_fk"] == (
        sum(1 for r in li if r["l_orderkey"] not in okeys), len(li))
    assert got["events_props_not_null"] == (
        sum(1 for r in ev if r["props"] is None), len(ev))
    assert got["lineitem_discount_0_1"] == (
        sum(1 for r in li if not (0 <= r["l_discount"] <= 1)), len(li))
    assert got["lineitem_quantity_positive"] == (
        sum(1 for r in li if r["l_quantity"] <= 0), len(li))


def test_cohort_retention_matches_naive(spark, sf_dir):
    from photon_spark.queries import _t
    rows = qg.q_cohort_retention(spark, sf_dir).collect()
    ev = _t(spark, sf_dir, "events").select("user_id", "ts").collect()
    weeks: dict = {}
    for r in ev:
        w = (r["ts"] - qg._T0_NS) // qg._WEEK_NS
        weeks.setdefault(r["user_id"], set()).add(w)
    want: dict = {}
    for u, ws in weeks.items():
        c = min(ws)
        for w in ws:
            want[(c, w - c)] = want.get((c, w - c), 0) + 1
    got = {(r["cohort_week"], r["week_offset"]): r["n_users"]
           for r in rows}
    assert got == want
    # offset 0 row contains every user of the cohort (first week counts)
    cohort_sizes: dict = {}
    for u, ws in weeks.items():
        cohort_sizes[min(ws)] = cohort_sizes.get(min(ws), 0) + 1
    for c, size in cohort_sizes.items():
        assert got[(c, 0)] == size


def test_dup_graph_clustering_matches_naive(spark, sf_dir):
    from photon_spark.functions import dedup
    r = qg.q_dup_graph_clustering(spark, sf_dir).collect()[0]
    pairs = dedup.minhash_near_duplicates(
        spark.read.parquet(f"{sf_dir}/documents.parquet"))
    edges = {(p["lo_id"], p["hi_id"])
             for p in pairs.select("lo_id", "hi_id").collect()}
    dedup.release_cache(pairs)
    adj: dict = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    tri = 0
    for a, b in edges:
        for c in adj[a] & adj[b]:
            if c > b:
                tri += 1
    wedges = sum(len(v) * (len(v) - 1) // 2 for v in adj.values())
    assert r["n_nodes"] == len(adj)
    assert r["n_edges"] == len(edges)
    assert r["n_wedges"] == wedges
    assert r["n_triangles"] == tri
    if wedges:
        assert r["clustering_coeff"] == round(3.0 * tri / wedges, 6)


def test_copurchase_matches_naive(spark, sf_dir):
    rows = qg.q_copurchase_pairs(spark, sf_dir).collect()
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet") \
              .select("l_orderkey", "l_partkey").distinct().collect()
    n_orders = spark.read.parquet(f"{sf_dir}/orders.parquet").count()
    baskets: dict = {}
    for r in li:
        baskets.setdefault(r["l_orderkey"], set()).add(r["l_partkey"])
    sup: dict = {}
    psup: dict = {}
    for parts in baskets.values():
        for p in parts:
            psup[p] = psup.get(p, 0) + 1
        ps = sorted(parts)
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                sup[(ps[i], ps[j])] = sup.get((ps[i], ps[j]), 0) + 1
    freq = {k: v for k, v in sup.items() if v >= qg.MIN_SUPPORT}
    want = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))
    want = want[:qg.COPURCHASE_TOPK]
    assert [(r["p1"], r["p2"]) for r in rows] == [k for k, _ in want]
    for r in rows:
        assert r["support"] == freq[(r["p1"], r["p2"])]
        assert r["s1"] == psup[r["p1"]] and r["s2"] == psup[r["p2"]]
        assert r["lift"] == round(r["support"] * float(n_orders)
                                  / (r["s1"] * float(r["s2"])), 6)


def test_source_diversity_matches_naive(spark, sf_dir):
    rows = {r["source"]: r
            for r in qg.q_source_diversity(spark, sf_dir).collect()}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
                     .select("source", "text").collect()
    counts: dict = {}
    for r in docs:
        t = (r["text"] or "").strip(" ")
        for tok in ([x.lower() for x in t.split()] if t else []):
            counts.setdefault(r["source"], {})
            counts[r["source"]][tok] = counts[r["source"]].get(tok, 0) + 1
    assert set(rows) == set(counts)
    for src, cs in counts.items():
        mass = sum(cs.values())
        c2 = sum(c * c for c in cs.values())
        r = rows[src]
        assert r["n_distinct_tokens"] == len(cs)
        assert r["token_mass"] == mass
        assert r["simpson"] == round(c2 / (mass * mass), 9)
        assert r["effective_vocab"] == round(mass * mass / c2, 6)
        assert r["top_token_share"] == round(max(cs.values()) / mass, 6)
        # effective vocab can never exceed the distinct count
        assert r["effective_vocab"] <= r["n_distinct_tokens"] + 1e-9


def test_value_mad_outliers_matches_naive(spark, sf_dir):
    from photon_spark.queries import _t
    rows = {r["event_type"]: r
            for r in qg.q_value_mad_outliers(spark, sf_dir).collect()}
    ev = _t(spark, sf_dir, "events") \
        .select("event_type", "event_id", "value").collect()
    by_type: dict = {}
    for r in ev:
        by_type.setdefault(r["event_type"], []).append(
            (round(r["value"] * 100), r["event_id"]))

    def disc_median(vals):
        vals = sorted(vals)
        n = len(vals)
        return vals[(n * 50 + 99) // 100 - 1]

    for t, pts in by_type.items():
        vs = [v for v, _ in pts]
        med = disc_median(vs)
        devs = [abs(v - med) for v in vs]
        mad = disc_median(devs)
        n_out = sum(1 for d in devs if d > 3 * mad)
        r = rows[t]
        assert r["n_events"] == len(pts)
        assert r["median_cents"] == med
        assert r["mad_cents"] == mad
        assert r["n_outliers"] == n_out
        assert r["outlier_rate"] == round(n_out / len(pts), 6)


def test_embedding_coverage_audit_flags_injected_defects(spark, tmp_path):
    """Inject one dangling vec_id, one zero-norm vector, and one
    wrong-dim vector; the audit must count each in its label row."""
    from photon_spark.queries_governance import (EMB_DIM,
                                                 q_embedding_coverage_audit)

    docs = spark.createDataFrame(
        [(i, f"text {i}", "en", "s", 6) for i in range(4)],
        "doc_id long, text string, lang string, source string, n_chars long")
    good = [0.5] * EMB_DIM
    rows = [
        (0, good, 0),            # healthy
        (1, [0.0] * EMB_DIM, 0),  # zero norm
        (2, [0.5] * (EMB_DIM - 1), 1),  # wrong dim
        (99, good, 2),           # dangling: no doc 99
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label long")
    sf = str(tmp_path / "sf")
    docs.coalesce(1).write.parquet(f"{sf}/documents.parquet")
    emb.coalesce(1).write.parquet(f"{sf}/embeddings.parquet")

    audit = {r["label"]: r for r in
             q_embedding_coverage_audit(spark, sf).collect()}
    assert audit[0]["n_vecs"] == 2
    assert audit[0]["n_zero_norm"] == 1
    assert audit[0]["n_dim_bad"] == 0 and audit[0]["n_missing_doc"] == 0
    assert audit[1]["n_dim_bad"] == 1
    assert audit[2]["n_missing_doc"] == 1
    # healthy + dangling share the same vector: avg_norm2 = 64 * 0.25
    assert audit[2]["avg_norm2"] == round(EMB_DIM * 0.25, 6)


def test_corpus_version_diff_matches_naive(spark, sf_dir):
    """The FULL OUTER fingerprint diff equals a row-by-row Python
    recompute of the same version rule, per (source, status) — and the
    status classifier sees only join-side nulls + hashes (flipping any
    doc's text must flip it to 'changed')."""
    import hashlib

    from photon_spark.queries_governance import q_corpus_version_diff
    docs = {r["doc_id"]: r for r in
            spark.read.parquet(f"{sf_dir}/documents.parquet")
                 .select("doc_id", "source", "text").collect()}
    exp = {}
    for did, r in docs.items():
        h2 = hashlib.md5(f"ver:{did}".encode()).hexdigest()[:2]
        in1, in2 = h2 >= "0d", h2 < "0d" or h2 >= "1a"
        t2 = r["text"] + " [rev]" if "1a" <= h2 < "40" else r["text"]
        if not in1 and not in2:
            continue
        status = ("added" if not in1 else "removed" if not in2
                  else "changed" if t2 != r["text"] else "unchanged")
        delta = (len(t2) if not in1 else -len(r["text"]) if not in2
                 else len(t2) - len(r["text"]))
        k = (r["source"], status)
        n, d = exp.get(k, (0, 0))
        exp[k] = (n + 1, d + delta)
    got = {(r["source"], r["status"]): (r["n_docs"], r["chars_delta"])
           for r in q_corpus_version_diff(spark, sf_dir).collect()}
    assert got == exp
    assert {s for _, s in got} == {"added", "removed", "changed",
                                   "unchanged"}


def test_fuzzy_name_pairs_matches_naive_blocked_recompute(spark, sf_dir):
    """The blocked Levenshtein join equals a naive Python recompute of
    the same two blocking passes, and the blocking contract holds: a
    pair within edit distance 3 that agrees on NEITHER word is absent
    by design (recall trade), never present."""
    from photon_spark.queries_governance import q_fuzzy_name_pairs

    def lev(s, t):
        prev = list(range(len(t) + 1))
        for i, cs in enumerate(s, 1):
            cur = [i]
            for j, ct in enumerate(t, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                               prev[j - 1] + (cs != ct)))
            prev = cur
        return prev[-1]

    rows = (spark.read.parquet(f"{sf_dir}/part.parquet")
            .groupBy("p_name").count().collect())
    names = {r["p_name"]: r["count"] for r in rows}
    exp = set()
    ns = sorted(names)
    for i, x in enumerate(ns):
        for y in ns[i + 1:]:
            wx, wy = x.split(" "), y.split(" ")
            if (wx[0] == wy[0] or wx[1] == wy[1]) and lev(x, y) <= 3:
                exp.add((x, y, lev(x, y), names[x], names[y]))
    got = {tuple(r) for r in q_fuzzy_name_pairs(spark, sf_dir).collect()}
    assert got == exp


def test_fuzzy_name_pairs_blocking_is_band_limited(spark, tmp_path):
    """Constructed vocabulary proving the join is band-limited, not
    all-pairs: 'cat dog' / 'bat hog' are edit distance 2 but agree on
    NEITHER word, so blocking must exclude them; the same-word pairs
    around them must survive. (The shipped testdata has no such pair at
    any sf, so this property needs constructed rows.)"""
    from photon_spark.queries_governance import q_fuzzy_name_pairs
    names = ["cat dog", "bat hog", "cat log", "rat hog"]
    df = spark.createDataFrame([(n,) for n in names for _ in range(2)],
                               "p_name string")
    d = str(tmp_path / "sf")
    df.write.parquet(f"{d}/part.parquet")
    got = {(r["name_a"], r["name_b"]): r["lev_dist"]
           for r in q_fuzzy_name_pairs(spark, d).collect()}
    assert ("bat hog", "cat dog") not in got  # lev 2, blocked out
    assert got[("cat dog", "cat log")] == 1   # same first word
    assert got[("bat hog", "rat hog")] == 1   # same second word
    assert all(n_a != n_b for n_a, n_b in got)


def test_k_anonymity_audit_matches_naive(spark, sf_dir):
    # Recompute the full report from a pandas-free naive pass over the
    # customer table: class sizes by (segment, nation, floor(bal/1000)),
    # then bands, min-k and the at-risk share per segment.
    from collections import Counter
    import math
    rows = spark.read.parquet(f"{sf_dir}/customer.parquet") \
        .select("c_mktsegment", "c_nationkey", "c_acctbal").collect()
    cls = Counter((r["c_mktsegment"], r["c_nationkey"],
                   math.floor(r["c_acctbal"] / 1000)) for r in rows)
    def band(k):
        return ("k=1" if k == 1 else "k=2-4" if k <= 4
                else "k=5-9" if k <= 9 else "k>=10")
    per, seg_tot, seg_risk, seg_min = {}, Counter(), Counter(), {}
    for (segm, _n, _b), k in cls.items():
        g, n = per.setdefault((segm, band(k)), [0, 0]), None
        g[0] += 1
        g[1] += k
        seg_tot[segm] += k
        if k < 5:
            seg_risk[segm] += k
        seg_min[segm] = min(seg_min.get(segm, k), k)
    got = qg.q_k_anonymity_audit(spark, sf_dir).collect()
    assert len(got) == len(per)
    for r in got:
        key = (r["c_mktsegment"], r["band"])
        assert [r["n_classes"], r["n_customers"]] == per[key]
        assert r["min_k"] == seg_min[r["c_mktsegment"]]
        assert r["seg_risk_share"] == round(
            seg_risk[r["c_mktsegment"]] / seg_tot[r["c_mktsegment"]], 6)


def test_erasure_propagation_audit_matches_naive(spark, sf_dir):
    from photon_spark.queries_governance import (
        q_erasure_propagation_audit, ERASE_MOD, ERASE_RESIDUE)
    from photon_spark.queries import _t

    ev = _t(spark, sf_dir, "events") \
        .select("user_id", "event_type", "ts").collect()
    def tallies(rows):
        n = len(rows)
        er = [r for r in rows if r[0] % ERASE_MOD == ERASE_RESIDUE]
        return (n, len(er), len({r[0] for r in er}), n - len(er))
    log = tallies([(r["user_id"],) for r in ev])
    state = tallies(list({(r["user_id"], r["event_type"]) for r in ev}))
    daily = tallies(list({(r["user_id"],
                           r["ts"] - r["ts"] % 86_400_000_000_000)
                          for r in ev}))
    got = {r["relation"]: (r["n_rows"], r["n_rows_erased"],
                           r["n_subjects"], r["n_rows_after_purge"])
           for r in q_erasure_propagation_audit(spark, sf_dir).collect()}
    assert got == {"event_log": log, "latest_state": state,
                   "daily_activity": daily}


# ----------------------------------------------- differential privacy

def test_dp_threshold_table_matches_distribution():
    """The baked (noise, hex-threshold) literals ARE the truncated
    discrete-Laplace CDF they claim: P(k) ∝ exp(-|k|) on [-K, K] at
    eps=1, cumulative probabilities quantized to the 48-bit md5-prefix
    grid, thresholds strictly increasing and ending at the full mass."""
    import math

    from photon_spark.queries_governance import DP_K, DP_THRESHOLDS

    ks = list(range(-DP_K, DP_K + 1))
    w = [math.exp(-abs(k)) for k in ks]
    z = sum(w)
    cum = 0.0
    expect = []
    for k, p in zip(ks, w):
        cum += p / z
        expect.append((k, cum))
    assert [k for k, _ in DP_THRESHOLDS] == ks
    grid = 1 << 48
    for (k, hexthr), (k2, c) in zip(DP_THRESHOLDS[:-1], expect[:-1]):
        got = int(hexthr, 16)
        want = c * grid
        # one grid cell of quantization slack
        assert abs(got - want) <= 1.5, (k, got, want)
    assert DP_THRESHOLDS[-1] == (DP_K, "f" * 12)
    hexes = [t for _, t in DP_THRESHOLDS]
    assert hexes == sorted(hexes)


def _py_noise(key: str, seed: str):
    import hashlib

    from photon_spark.queries_governance import DP_THRESHOLDS
    h = hashlib.md5(f"{key}:{seed}".encode()).hexdigest()[:12]
    for k, t in DP_THRESHOLDS:
        if h <= t:
            return k
    return DP_THRESHOLDS[-1][0]


def test_dp_noisy_counts_match_python_draw(spark, sf_dir):
    from photon_spark.queries_governance import (
        DP_K, DP_SEED, q_dp_noisy_event_counts)

    rows = q_dp_noisy_event_counts(spark, sf_dir).collect()
    assert rows
    for r in rows:
        n = _py_noise(r["event_type"], DP_SEED)
        assert -DP_K <= r["noise"] <= DP_K
        assert r["noise"] == n
        assert r["n_noisy"] == max(r["n_true"] + n, 0)


def test_dp_noisy_max_matches_python_argmax(spark, sf_dir):
    from photon_spark.queries_governance import (
        DP_RNM_SEED, q_dp_noisy_max_event_type)
    from photon_spark.queries import _t
    from pyspark.sql import functions as F

    [winner] = q_dp_noisy_max_event_type(spark, sf_dir).collect()
    truth = {r["event_type"]: r["n"]
             for r in _t(spark, sf_dir, "events")
             .groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
             .collect()}
    scored = sorted(((t, n + _py_noise(t, DP_RNM_SEED))
                     for t, n in truth.items()),
                    key=lambda kv: (-kv[1], kv[0]))
    assert (winner["event_type"], winner["noisy_score"]) == scored[0]


def test_dp_user_bounded_counts_match_python(spark, sf_dir):
    """User-level DP release: the bounded counts equal a naive
    first-CAP-per-user recompute, the noise matches the Python draw at
    the user seed, and the release metadata reflects the sensitivity
    (eps = CAP) and the widened clamp tail (delta grows with CAP)."""
    from photon_spark.queries import _t
    from photon_spark.queries_governance import (
        DP_DELTA, DP_K, DP_USER_CAP, DP_USER_DELTA, DP_USER_SEED,
        q_dp_user_bounded_counts)
    from pyspark.sql import functions as F

    ev = sorted(
        _t(spark, sf_dir, "events")
        .select("user_id", "event_type", "event_id").collect(),
        key=lambda r: (r["user_id"], r["event_id"]))
    seen: dict = {}
    bounded: dict = {}
    true_n: dict = {}
    for r in ev:
        true_n[r["event_type"]] = true_n.get(r["event_type"], 0) + 1
        k = seen.get(r["user_id"], 0)
        if k < DP_USER_CAP:
            seen[r["user_id"]] = k + 1
            bounded[r["event_type"]] = bounded.get(r["event_type"], 0) + 1

    rows = q_dp_user_bounded_counts(spark, sf_dir).collect()
    assert {r["event_type"] for r in rows} == set(true_n)
    for r in rows:
        t = r["event_type"]
        assert r["n_true"] == true_n[t]
        assert r["n_bounded"] == bounded.get(t, 0)
        n = _py_noise(t, DP_USER_SEED)
        assert -DP_K <= r["noise"] <= DP_K and r["noise"] == n
        assert r["n_noisy"] == max(r["n_bounded"] + n, 0)
        assert r["release_epsilon"] == float(DP_USER_CAP)
        assert r["release_delta"] == DP_USER_DELTA
    # the widened clamp tail: delta_C > delta_1, both < 1e-2
    assert DP_USER_DELTA > DP_DELTA
    assert DP_USER_DELTA < 1e-2


def test_dp_user_bounded_sum_match_python(spark, sf_dir):
    """User-level DP bounded sum: clamp/bound/quantize equal a naive
    per-row Python recompute, the unit release uses the Python draw at
    the sum seed, and the floored unit total moves by at most 1 when
    any single user is removed (the sensitivity the eps=1 label
    needs)."""
    from photon_spark.queries import _t
    from photon_spark.queries_governance import (
        DP_DELTA, DP_K, DP_SUM_GRAIN_CENTS, DP_USER_CAP,
        DP_USER_SUM_DELTA, DP_USER_SUM_SEED, DP_VALUE_CAP_CENTS,
        q_dp_user_bounded_sum)

    ev = sorted(
        _t(spark, sf_dir, "events")
        .select("user_id", "event_type", "event_id", "value").collect(),
        key=lambda r: (r["user_id"], r["event_id"]))

    def cents(v):
        x = min(max(float(v), 0.0), DP_VALUE_CAP_CENTS / 100.0) * 100
        # Spark HALF_UP == round-half-away for non-negative values
        return int(x + 0.5) if x - int(x) >= 0.5 else round(x)

    seen: dict = {}
    clamped: dict = {}
    bounded: dict = {}
    per_user_type: dict = {}
    for r in ev:
        c = cents(r["value"])
        t = r["event_type"]
        clamped[t] = clamped.get(t, 0) + c
        k = seen.get(r["user_id"], 0)
        if k < DP_USER_CAP:
            seen[r["user_id"]] = k + 1
            bounded[t] = bounded.get(t, 0) + c
            u = per_user_type.setdefault(r["user_id"], {})
            u[t] = u.get(t, 0) + c

    rows = q_dp_user_bounded_sum(spark, sf_dir).collect()
    assert {r["event_type"] for r in rows} == set(clamped)
    for r in rows:
        t = r["event_type"]
        assert r["sum_clamped_cents"] == clamped[t]
        assert r["sum_bounded_cents"] == bounded.get(t, 0)
        units = bounded.get(t, 0) // DP_SUM_GRAIN_CENTS
        assert r["units"] == units
        n = _py_noise(t, DP_USER_SUM_SEED)
        assert -DP_K <= r["noise"] <= DP_K and r["noise"] == n
        assert r["release_units"] == max(units + n, 0)
        assert r["release_sum"] == round(
            max(units + n, 0) * DP_SUM_GRAIN_CENTS / 100.0, 2)
        assert r["release_epsilon"] == float(DP_USER_CAP)
        assert r["release_delta"] == DP_USER_SUM_DELTA
    # sensitivity check on the RELEASED VECTOR (what the eps=CAP label
    # prices): removing any one user changes each type's floored unit
    # count by at most 1 (per-type contribution <= GRAIN) and the L1
    # across the per-type vector by at most CAP (<= CAP types spanned)
    assert per_user_type
    assert max(sum(tc.values()) for tc in per_user_type.values()) \
        <= DP_SUM_GRAIN_CENTS
    spanning = 0
    for u, tc in per_user_type.items():
        l1 = 0
        for t, c in tc.items():
            assert c <= DP_SUM_GRAIN_CENTS
            before = bounded[t] // DP_SUM_GRAIN_CENTS
            after = (bounded[t] - c) // DP_SUM_GRAIN_CENTS
            d = before - after
            assert 0 <= d <= 1
            l1 += d
        assert l1 <= DP_USER_CAP
        if len(tc) > 1:
            spanning += 1
    # the composition case is REAL in this data: some user's bounded
    # events span >1 type, which is exactly why eps = CAP, not 1
    assert spanning > 0
    assert DP_USER_SUM_DELTA == round(DP_USER_CAP * DP_DELTA, 9)


def test_dp_user_bounded_mean_is_postprocessing(spark, sf_dir):
    """The mean row is pure post-processing of the two component
    releases: identical n_noisy / release_sum values (same seeds, same
    draws), one division, and the basic-composition budget labels."""
    from photon_spark.queries_governance import (
        DP_USER_MEAN_DELTA, DP_USER_MEAN_EPS, DP_USER_SUM_DELTA,
        DP_USER_DELTA, q_dp_user_bounded_counts, q_dp_user_bounded_mean,
        q_dp_user_bounded_sum)

    counts = {r["event_type"]: r["n_noisy"]
              for r in q_dp_user_bounded_counts(spark, sf_dir).collect()}
    sums = {r["event_type"]: r["release_sum"]
            for r in q_dp_user_bounded_sum(spark, sf_dir).collect()}
    rows = q_dp_user_bounded_mean(spark, sf_dir).collect()
    assert {r["event_type"] for r in rows} == set(counts) == set(sums)
    for r in rows:
        t = r["event_type"]
        assert r["n_noisy"] == counts[t]
        assert r["release_sum"] == sums[t]
        want = (round(sums[t] / counts[t], 6) if counts[t] else None)
        assert r["release_mean"] == want
        assert r["release_epsilon"] == DP_USER_MEAN_EPS
        assert r["release_delta"] == DP_USER_MEAN_DELTA
    assert DP_USER_MEAN_DELTA == round(DP_USER_DELTA
                                       + DP_USER_SUM_DELTA, 9)


def test_dp_user_bounded_quantiles_match_python(spark, sf_dir):
    """The histogram-quantile release equals a full Python recompute:
    clamp/bound/bucket per event, per-cell draw at the quant seed over
    the FULL (type x bucket) grid (absent cells included), CDF walk
    with the exact integer rule — and every statistic shares the ONE
    (eps=CAP, DP_USER_DELTA) budget."""
    from photon_spark.queries import _t
    from photon_spark.queries_governance import (
        DP_HIST_BUCKET_CENTS, DP_HIST_NB, DP_USER_CAP, DP_USER_DELTA,
        DP_USER_QUANT_SEED, DP_VALUE_CAP_CENTS,
        q_dp_user_bounded_quantiles)

    ev = sorted(
        _t(spark, sf_dir, "events")
        .select("user_id", "event_type", "event_id", "value").collect(),
        key=lambda r: (r["user_id"], r["event_id"]))

    def cents(v):
        x = min(max(float(v), 0.0), DP_VALUE_CAP_CENTS / 100.0) * 100
        return int(x + 0.5) if x - int(x) >= 0.5 else round(x)

    seen: dict = {}
    hist: dict = {}
    types = set()
    for r in ev:
        types.add(r["event_type"])
        k = seen.get(r["user_id"], 0)
        if k < DP_USER_CAP:
            seen[r["user_id"]] = k + 1
            b = min(cents(r["value"]) // DP_HIST_BUCKET_CENTS,
                    DP_HIST_NB - 1)
            hist[(r["event_type"], b)] = hist.get(
                (r["event_type"], b), 0) + 1

    want = {}
    for t in types:
        noisy = [max(hist.get((t, b), 0)
                     + _py_noise(f"{t}:{b}", DP_USER_QUANT_SEED), 0)
                 for b in range(DP_HIST_NB)]
        total = sum(noisy)
        qs = {}
        for q4, name in ((1, "q25_value"), (2, "q50_value"),
                         (3, "q75_value")):
            cum = 0
            qs[name] = None
            for b, n in enumerate(noisy):
                cum += n
                if total > 0 and cum * 4 >= total * q4:
                    qs[name] = round(
                        (b + 1) * DP_HIST_BUCKET_CENTS / 100.0, 2)
                    break
        want[t] = (total, qs)

    rows = q_dp_user_bounded_quantiles(spark, sf_dir).collect()
    assert {r["event_type"] for r in rows} == types
    for r in rows:
        total, qs = want[r["event_type"]]
        assert r["total_noisy"] == total
        for name in ("q25_value", "q50_value", "q75_value"):
            assert r[name] == qs[name], (r["event_type"], name)
        assert r["release_epsilon"] == float(DP_USER_CAP)
        assert r["release_delta"] == DP_USER_DELTA
    # quantiles are monotone wherever defined
    for r in rows:
        vals = [r["q25_value"], r["q50_value"], r["q75_value"]]
        defined = [v for v in vals if v is not None]
        assert defined == sorted(defined)
