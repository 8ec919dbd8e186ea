"""Pipeline-analytics operator tests: sessionize semantics, window-key
exactness, sampling determinism, top-k tie-breaks. Oracle parity is covered
by tools/check_correctness.py; these pin behaviors and plan shapes."""

import pytest
from pyspark.sql import functions as F

from photon_spark.functions.sessions import session_bounds, sessionize

NS = 1_000_000_000


@pytest.fixture(scope="module")
def clicks(spark):
    # user 1: events at t=0s, 10s, 1000s (gap 990s splits at gap_ns=100s)
    # user 2: single event
    rows = [(1, 0 * NS, 1), (1, 10 * NS, 2), (1, 1000 * NS, 3),
            (2, 5 * NS, 4)]
    return spark.createDataFrame(rows, "user_id long, ts long, event_id long")


def test_sessionize_splits_on_gap(clicks):
    s = sessionize(clicks, ["user_id"], ts_col="ts", tiebreak_col="event_id",
                   gap_ns=100 * NS)
    got = {r["event_id"]: r["session_idx"] for r in s.collect()}
    assert got == {1: 1, 2: 1, 3: 2, 4: 1}


def test_session_bounds(clicks):
    b = session_bounds(clicks, ["user_id"], ts_col="ts",
                       tiebreak_col="event_id", gap_ns=100 * NS)
    got = {(r["user_id"], r["session_idx"]): (r["n_events"], r["start_ts"],
                                              r["end_ts"])
           for r in b.collect()}
    assert got == {(1, 1): (2, 0, 10 * NS), (1, 2): (1, 1000 * NS, 1000 * NS),
                   (2, 1): (1, 5 * NS, 5 * NS)}


def test_sessionize_one_shuffle_one_sort(clicks):
    # lag + running sum share partitioning and ordering → the two Window
    # operators run over ONE Exchange + ONE Sort (no re-shuffle/re-sort).
    plan = sessionize(clicks, ["user_id"], ts_col="ts",
                      tiebreak_col="event_id")._jdf.queryExecution() \
        .executedPlan().toString()
    assert plan.count("Exchange") == 1
    assert plan.count("+- Sort ") == 1


def test_tumbling_bucket_is_integer_exact(spark):
    # epoch-ns of 2024+ exceeds 2^53: double math would mis-bucket edges.
    from photon_spark.queries_pipeline import HOUR_NS
    ts = 1_704_067_200_000_000_000 + HOUR_NS - 1  # last ns of an hour
    df = spark.createDataFrame([(ts,), (ts + 1,)], "ts long")
    got = sorted(r[0] for r in df.select(
        (F.col("ts") - F.col("ts") % F.lit(HOUR_NS)).alias("w")).collect())
    assert got == [1_704_067_200_000_000_000,
                   1_704_067_200_000_000_000 + HOUR_NS]


def test_stratified_sample_deterministic(spark, sf_dir):
    from photon_spark.queries_pipeline import q_stratified_sample
    a = sorted(map(tuple, q_stratified_sample(spark, sf_dir).collect()))
    b = sorted(map(tuple, q_stratified_sample(spark, sf_dir).collect()))
    assert a == b
    # rate is near the 26/256 design point in every stratum
    for row in a:
        assert 0.02 <= row[3] <= 0.25


def test_training_pipeline_end_to_end(spark, sf_dir):
    """The composed curation pipeline a real corpus runs: profile → quality
    floor → exact dedup → near-dup clustering (keep cluster keepers) →
    stratified sample. Pins that the stages compose, survivors shrink
    monotonically, and the whole chain is deterministic run-over-run."""
    from photon_spark.functions import dedup, text

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    def run():
        prof = text.text_profile(docs).select("doc_id", "quality")
        floor = prof.agg(F.expr("percentile(quality, 0.25)")).first()[0]
        kept = docs.join(prof.where(F.col("quality") >= floor), "doc_id")
        exact = dedup.dedup_exact(kept)
        pairs = dedup.minhash_near_duplicates(exact, threshold=0.7)
        losers = (dedup.dup_clusters(pairs)
                  .where(F.col("id") != F.col("cluster_id"))
                  .select(F.col("id").alias("doc_id")))
        uniq = exact.join(losers, "doc_id", "left_anti")
        sample = uniq.where(
            F.md5(F.concat(F.lit("strat:"),
                           F.col("doc_id").cast("string"))) < "80")
        return (docs.count(), kept.count(), exact.count(), uniq.count(),
                sorted(r["doc_id"] for r in sample.select("doc_id").collect()))

    n_docs, n_kept, n_exact, n_uniq, sample_ids = run()
    assert n_docs >= n_kept >= n_exact >= n_uniq > 0
    assert n_uniq < n_docs  # the corpus has planted dups, so curation bites
    assert 0 < len(sample_ids) < n_uniq
    assert run() == (n_docs, n_kept, n_exact, n_uniq, sample_ids)


def test_token_topk_ties_deterministic(spark):
    df = spark.createDataFrame(
        [("en", "b b a a c"), ("en", "d")], "lang string, text string")
    toks = df.select("lang", F.explode(F.split("text", " ")).alias("tok"))
    counts = toks.groupBy("lang", "tok").agg(
        F.count(F.lit(1)).alias("n_occurrences"))
    from pyspark.sql import Window
    w = Window.partitionBy("lang").orderBy(F.desc("n_occurrences"),
                                           F.asc("tok"))
    top = (counts.withColumn("rank", F.row_number().over(w))
                 .where(F.col("rank") <= 3).collect())
    got = [(r["tok"], r["rank"]) for r in sorted(top, key=lambda r: r["rank"])]
    assert got == [("a", 1), ("b", 2), ("c", 3)]  # count desc, token asc


def test_approx_distinct_sketch_error_bound(spark, sf_dir):
    # Sketch tier for cardinality at scale: HLL++ (approx_count_distinct)
    # per stream vs the exact distinct — relative error within 3x the
    # requested rsd. The sketch is the 100 TB path (fixed-size state,
    # mergeable partials); the exact form is the oracle-gated default.
    from photon_spark.queries import _t
    e = _t(spark, sf_dir, "events")
    rows = (e.groupBy("event_type")
            .agg(F.count_distinct("user_id").alias("exact"),
                 F.approx_count_distinct("user_id", rsd=0.02).alias("approx"))
            .collect())
    assert rows
    for r in rows:
        assert abs(r["approx"] - r["exact"]) <= max(1, 0.06 * r["exact"])


def test_event_transition_matrix_matches_naive(spark, sf_dir):
    from photon_spark.queries import _t
    from photon_spark.queries_pipeline import q_event_transition_matrix
    rows = q_event_transition_matrix(spark, sf_dir).collect()
    ev = sorted(_t(spark, sf_dir, "events")
                .select("user_id", "ts", "event_id", "event_type").collect(),
                key=lambda r: (r["user_id"], r["ts"], r["event_id"]))
    pairs: dict = {}
    for a, b in zip(ev, ev[1:]):
        if a["user_id"] == b["user_id"]:
            k = (a["event_type"], b["event_type"])
            pairs[k] = pairs.get(k, 0) + 1
    totals: dict = {}
    for (f_, _), n in pairs.items():
        totals[f_] = totals.get(f_, 0) + n
    got = {(r["from_type"], r["to_type"]): (r["n"], r["row_total"], r["p"])
           for r in rows}
    assert set(got) == set(pairs)
    for k, n in pairs.items():
        assert got[k][0] == n
        assert got[k][1] == totals[k[0]]
        assert got[k][2] == round(n / totals[k[0]], 6)
    # rows of the matrix sum to 1 (up to 6dp rounding per cell)
    by_from: dict = {}
    for (f_, _), (n, t, p) in got.items():
        by_from[f_] = by_from.get(f_, 0.0) + p
    for s in by_from.values():
        assert abs(s - 1.0) < 1e-4


def test_bpe_merge_rounds_matches_naive(spark, sf_dir):
    import re
    from photon_spark.queries_pipeline import (BPE_ROUNDS,
                                               q_bpe_merge_rounds)
    got = [(r["round"], r["pair"], r["merged"], r["pair_count"])
           for r in q_bpe_merge_rounds(spark, sf_dir).collect()]

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
                     .select("text").collect()
    freq: dict = {}
    for d in docs:
        for t in (d["text"] or "").strip(" ").split():
            w = t.lower()
            if re.fullmatch(r"[a-z]{2,}", w):
                freq[w] = freq.get(w, 0) + 1
    vocab = {" " + " ".join(w) + " ": c for w, c in freq.items()}
    want = []
    for r in range(1, BPE_ROUNDS + 1):
        counts: dict = {}
        for s, c in vocab.items():
            syms = s.strip(" ").split(" ")
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + c
        (a, b), n = min(counts.items(),
                        key=lambda kv: (-kv[1], kv[0]))
        want.append((r, f"{a} {b}", a + b, n))
        newv: dict = {}
        for s, c in vocab.items():
            syms = s.strip(" ").split(" ")
            out, i = [], 0
            while i < len(syms):
                if (i + 1 < len(syms) and syms[i] == a
                        and syms[i + 1] == b):
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            s2 = " " + " ".join(out) + " "
            newv[s2] = newv.get(s2, 0) + c
        vocab = newv
    assert got == want
    # merges are genuinely applied: a later round may merge a multi-char
    # symbol produced earlier; at minimum rounds pick distinct pairs
    assert len({p for _, p, _, _ in got}) == BPE_ROUNDS


def test_bpe_merge_fold_is_canonical_on_overlaps(spark):
    # The " a b " → " ab " literal replace consumes the shared delimiter
    # and merges only every other pair on overlapping runs ("o o o o").
    # Pin: the fold used by q_bpe_merge_rounds (Spark aggregate) and its
    # DuckDB list_reduce twin both equal the canonical greedy
    # left-to-right scan, on exactly the shapes that broke the regex.
    import duckdb

    cases = [
        (" o o o o ", "o", "o"),          # even identical run
        (" o o o o o ", "o", "o"),        # odd identical run
        (" a b a b ", "a", "b"),          # back-to-back pair
        (" a a b b a b ", "a", "b"),      # mixed
        (" x a b y ", "a", "b"),          # single interior
        (" ab a b ", "a", "b"),           # earlier merged symbol present
    ]

    def canonical(s, a, b):
        syms = s.strip(" ").split(" ")
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        return " " + " ".join(out) + " "

    con = duckdb.connect()
    for s, a, b in cases:
        want = canonical(s, a, b)
        m = a + b
        spark_expr = (
            f"aggregate(split(trim(s), ' '), ' ', (acc, x) -> "
            f"CASE WHEN x = '{b}' AND endswith(acc, ' {a} ') "
            f"THEN concat(left(acc, length(acc) - {len(a) + 1}), '{m} ') "
            f"ELSE concat(acc, x, ' ') END)")
        got_spark = (spark.createDataFrame([(s,)], "s string")
                     .selectExpr(f"{spark_expr} AS s").collect()[0]["s"])
        got_duck = con.execute(f"""
            SELECT list_reduce(
                     list_prepend(' ', string_split(trim(?), ' ')),
                     (acc, x) -> CASE
                       WHEN x = '{b}' AND ends_with(acc, ' {a} ')
                       THEN left(acc, length(acc) - {len(a) + 1})
                            || '{m} '
                       ELSE acc || x || ' ' END)""", [s]).fetchone()[0]
        assert got_spark == want, (s, got_spark, want)
        assert got_duck == want, (s, got_duck, want)


def test_vocab_coverage_matches_naive(spark, sf_dir):
    from collections import Counter
    from photon_spark.queries_pipeline import (VOCAB_K,
                                               q_vocab_coverage_audit)
    out = {r["source"]: r for r in q_vocab_coverage_audit(spark,
                                                          sf_dir).collect()}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("source", "text").collect()
    occ = Counter()
    per_src = {}
    for r in docs:
        toks = [t.lower() for t in r["text"].strip().split()] \
            if r["text"].strip() else []
        occ.update(toks)
        per_src.setdefault(r["source"], []).extend(toks)
    vocab = {t for t, _ in sorted(occ.items(),
                                  key=lambda kv: (-kv[1], kv[0]))[:VOCAB_K]}
    assert vocab, "empty corpus"
    for src, toks in per_src.items():
        oov = [t for t in toks if t not in vocab]
        assert out[src]["n_tokens"] == len(toks)
        assert out[src]["n_oov"] == len(oov)
        assert out[src]["n_oov_types"] == len(set(oov))
        assert abs(out[src]["oov_rate"] - len(oov) / len(toks)) < 2e-6
    # non-degenerate on the test corpus: an OOV tail exists somewhere
    assert any(r["n_oov"] > 0 for r in out.values())


def test_session_packing_matches_naive(spark, sf_dir):
    from collections import defaultdict
    from photon_spark.queries_pipeline import (GAP_NS, SESSION_PACK_BUDGET,
                                               q_session_packing)
    from photon_spark.queries import _t
    out = {r["seq_id"]: r for r in q_session_packing(spark,
                                                     sf_dir).collect()}
    ev = _t(spark, sf_dir, "events") \
        .select("user_id", "ts", "event_id").collect()
    from photon_spark.queries_pipeline import SESSION_KEY_SHIFT
    by_user = defaultdict(list)
    for r in ev:
        by_user[r["user_id"]].append((r["ts"], r["event_id"]))
    sizes = {}
    for u, rows in by_user.items():
        rows.sort()
        idx, prev = 0, None
        for ts, _eid in rows:
            if prev is None or ts - prev > GAP_NS:
                idx += 1
            k = (u << SESSION_KEY_SHIFT) + idx
            sizes[k] = sizes.get(k, 0) + 1
            prev = ts
    exp = defaultdict(lambda: [0, 0, 0])
    cum = 0
    for sk in sorted(sizes):
        c = sizes[sk]
        first = (cum) // SESSION_PACK_BUDGET
        last = (cum + c - 1) // SESSION_PACK_BUDGET
        cum += c
        exp[first][0] += 1
        exp[first][1] += c
        exp[first][2] += int(first != last)
    assert set(out) == set(exp)
    for sid, (ns, nev, nb) in exp.items():
        assert out[sid]["n_sessions"] == ns
        assert out[sid]["n_events"] == nev
        assert out[sid]["n_boundary_sessions"] == nb
    assert sum(v[1] for v in exp.values()) == len(ev)  # conservation


def test_hour_window_features_match_naive(spark, sf_dir):
    from collections import defaultdict
    from photon_spark.queries import _t
    from photon_spark.queries_pipeline import (HOUR_NS,
                                               q_events_hour_window_features)
    out = {r["event_id"]: r
           for r in q_events_hour_window_features(spark, sf_dir).collect()}
    ev = _t(spark, sf_dir, "events") \
        .select("user_id", "ts", "event_id", "value").collect()
    by_user = defaultdict(list)
    for r in ev:
        by_user[r["user_id"]].append(r)
    for u, rows in by_user.items():
        for r in rows:
            frame = [x for x in rows
                     if r["ts"] - HOUR_NS <= x["ts"] <= r["ts"]]
            cents = sum(round(x["value"] * 100) for x in frame)
            assert out[r["event_id"]]["hr_n"] == len(frame)
            assert abs(out[r["event_id"]]["hr_sum"] - cents / 100) < 0.005
    assert any(r["hr_n"] > 1 for r in out.values()), "no hour overlap"


# ----------------------------------------- gap fill / lateness / compaction

def test_events_gap_fill_matches_naive(spark, sf_dir):
    from collections import defaultdict
    from decimal import ROUND_HALF_UP, Decimal
    from photon_spark.queries import _t
    from photon_spark.queries_pipeline import (GAPFILL_MOD, HOUR_NS, T0_NS,
                                               q_events_gap_fill)
    out = {(r["user_id"], r["hour"]): r
           for r in q_events_gap_fill(spark, sf_dir).collect()}
    ev = _t(spark, sf_dir, "events") \
        .where(F.col("user_id") % GAPFILL_MOD == 0) \
        .select("user_id", "ts", "value").collect()
    agg = defaultdict(lambda: [0, 0])
    for r in ev:
        h = (r["ts"] - T0_NS) // HOUR_NS
        cents = int(Decimal(repr(r["value"] * 100))
                    .quantize(Decimal("1"), ROUND_HALF_UP))
        agg[(r["user_id"], h)][0] += 1
        agg[(r["user_id"], h)][1] += cents
    spans = defaultdict(lambda: [10**18, -10**18])
    for (u, h) in agg:
        spans[u][0] = min(spans[u][0], h)
        spans[u][1] = max(spans[u][1], h)
    expect_keys = {(u, h) for u, (h0, h1) in spans.items()
                   for h in range(h0, h1 + 1)}
    assert set(out) == expect_keys  # spine = contiguous per-user hours
    for u, (h0, h1) in spans.items():
        last = None
        for h in range(h0, h1 + 1):
            r = out[(u, h)]
            n, cents = agg.get((u, h), (0, 0))
            assert r["n_events"] == n
            assert r["is_gap"] == (1 if n == 0 else 0)
            assert abs(r["spend"] - round(cents / 100.0, 2)) < 1e-9
            if n:
                last = cents
            assert last is not None  # spine starts at an active hour
            assert abs(r["last_active_spend"]
                       - round(last / 100.0, 2)) < 1e-9


def test_watermark_late_audit_matches_naive(spark, sf_dir):
    from collections import defaultdict
    from photon_spark.queries import _t
    from photon_spark.queries_pipeline import (WATERMARK_DELAY_NS,
                                               q_watermark_late_audit)
    out = {r["stream_name"]: r
           for r in q_watermark_late_audit(spark, sf_dir).collect()}
    ev = _t(spark, sf_dir, "events") \
        .select("event_type", "event_id", "ts").collect()
    by_stream = defaultdict(list)
    for r in ev:
        by_stream[r["event_type"]].append((r["event_id"], r["ts"]))
    assert set(out) == set(by_stream)
    for s, rows in by_stream.items():
        rows.sort()  # arrival order = event_id
        hwm, n_ooo, n_drop, mx = None, 0, 0, 0
        for _, ts in rows:
            if hwm is not None and ts < hwm:
                late = hwm - ts
                n_ooo += 1
                mx = max(mx, late)
                if late > WATERMARK_DELAY_NS:
                    n_drop += 1
            hwm = ts if hwm is None else max(hwm, ts)
        r = out[s]
        assert (r["n_events"], r["n_out_of_order"], r["n_dropped"],
                r["max_late_ns"]) == (len(rows), n_ooo, n_drop, mx)


def test_changelog_compaction_matches_naive(spark, sf_dir):
    from photon_spark.queries import _t
    from photon_spark.queries_pipeline import q_changelog_compaction
    out = {(r["user_id"], r["event_type"]): r
           for r in q_changelog_compaction(spark, sf_dir).collect()}
    ev = _t(spark, sf_dir, "events") \
        .select("user_id", "event_type", "event_id", "ts", "value").collect()
    latest, counts = {}, {}
    for r in ev:
        k = (r["user_id"], r["event_type"])
        counts[k] = counts.get(k, 0) + 1
        cur = latest.get(k)
        if cur is None or (r["ts"], r["event_id"]) > (cur["ts"],
                                                      cur["event_id"]):
            latest[k] = r
    assert set(out) == set(latest)
    for k, r in latest.items():
        assert out[k]["last_event_id"] == r["event_id"]
        assert out[k]["last_ts_ns"] == r["ts"]
        assert out[k]["n_versions"] == counts[k]
        assert out[k]["n_superseded"] == counts[k] - 1


def test_schema_drift_audit_matches_naive(spark, sf_dir):
    import json as _json
    from collections import defaultdict
    from photon_spark.queries import _t
    from photon_spark.queries_pipeline import (T0_NS, WEEK_NS,
                                               q_schema_drift_audit)
    out = {(r["stream_name"], r["field_path"]): r
           for r in q_schema_drift_audit(spark, sf_dir).collect()}
    ev = _t(spark, sf_dir, "events") \
        .select("event_type", "ts", "props").collect()
    weeks = defaultdict(set)      # (stream, field) -> weeks present
    counts = defaultdict(int)     # (stream, field) -> events with field
    stream_weeks = defaultdict(set)
    for r in ev:
        w = (r["ts"] - T0_NS) // WEEK_NS
        ks = list(_json.loads(r["props"]).keys()) if r["props"] else []
        for k in ks:
            weeks[(r["event_type"], k)].add(w)
            counts[(r["event_type"], k)] += 1
        if ks:
            stream_weeks[r["event_type"]].add(w)
    assert set(out) == set(weeks)
    for key, ws in weeks.items():
        r = out[key]
        assert r["first_week"] == min(ws)
        assert r["last_week"] == max(ws)
        assert r["n_weeks"] == len(ws)
        assert r["n_events_with_field"] == counts[key]
        assert r["stream_weeks"] == len(stream_weeks[key[0]])
        assert r["late_arrival"] == (
            1 if min(ws) > min(stream_weeks[key[0]]) else 0)


def test_upsert_merge_matches_naive(spark, sf_dir):
    # Re-derive the merge changelog from the raw log driver-side: base =
    # latest per key before the cut, batch = latest per key in the
    # window; classify keep/insert/update/delete with the cents%10==0
    # tombstone rule, absent-key tombstones emit nothing.
    from photon_spark.queries import _t
    from photon_spark.queries_pipeline import (_MERGE_CUT_NS, _MERGE_END_NS,
                                               q_upsert_merge)
    out = {(r["user_id"], r["event_type"]): r
           for r in q_upsert_merge(spark, sf_dir).collect()}
    ev = _t(spark, sf_dir, "events") \
        .select("user_id", "event_type", "event_id", "ts", "value").collect()
    base, hot = {}, {}
    for r in ev:
        if r["ts"] >= _MERGE_END_NS:
            continue
        side = hot if r["ts"] >= _MERGE_CUT_NS else base
        k = (r["user_id"], r["event_type"])
        cur = side.get(k)
        if cur is None or (r["ts"], r["event_id"]) > (cur["ts"],
                                                      cur["event_id"]):
            side[k] = r
    # HALF_UP cents, matching the engine's Spark F.round (Python builtin
    # round is half-even and would flip exact-.5 cents)
    from decimal import ROUND_HALF_UP, Decimal

    def cents(v):
        return int(Decimal(repr(v * 100)).quantize(Decimal(1),
                                                   ROUND_HALF_UP))

    expect = {}
    for k in set(base) | set(hot):
        b, h = base.get(k), hot.get(k)
        tomb = h is not None and cents(h["value"]) % 10 == 0
        if h is None:
            expect[k] = ("keep", b)
        elif b is None and tomb:
            continue
        elif b is None:
            expect[k] = ("insert", h)
        elif tomb:
            expect[k] = ("delete", b)
        else:
            expect[k] = ("update", h)
    assert set(out) == set(expect)
    acts = set()
    for k, (act, src) in expect.items():
        r = out[k]
        acts.add(act)
        assert r["merge_action"] == act
        assert r["last_event_id"] == src["event_id"]
        assert r["last_ts_ns"] == src["ts"]
        assert r["last_value"] == round(cents(src["value"]) / 100.0, 2)
    # the fixture exercises every action at either gate sf
    assert acts == {"keep", "insert", "update", "delete"}


def test_linear_attribution_conserves_value_and_matches_naive(spark,
                                                              sf_dir):
    """Per-(n_touch) rows equal a Python recompute, credit x touches
    reconstructs the group's gross value (linear attribution conserves
    money by construction), and unattributed purchases are present with
    NULL credit."""
    from photon_spark.queries import _t
    from photon_spark.queries_pipeline import (_ATTR_WINDOW_NS,
                                               q_linear_attribution)
    ev = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "ts", "value").collect()
    views = sorted((r["user_id"], r["ts"]) for r in ev
                   if r["event_type"] == "view")
    exp = {}
    for r in ev:
        if r["event_type"] != "purchase":
            continue
        n = sum(1 for u, t in views
                if u == r["user_id"]
                and r["ts"] - _ATTR_WINDOW_NS < t <= r["ts"])
        cents = round(r["value"] * 100)
        cnt, tot = exp.get(n, (0, 0))
        exp[n] = (cnt + 1, tot + cents)
    got = {r["n_touch"]: r for r in
           q_linear_attribution(spark, sf_dir).collect()}
    assert set(got) == set(exp)
    for n, (cnt, tot) in exp.items():
        g = got[n]
        assert g["n_purchases"] == cnt
        assert g["gross_value"] == round(tot / 100, 2)
        if n == 0:
            assert g["credit_per_touch"] is None
        else:
            assert g["credit_per_touch"] == round(tot / (100 * n), 2)
    assert 0 in exp and len(exp) > 3  # fixture exercises both regimes


def test_vocab_growth_curve_matches_naive(spark, sf_dir):
    # Naive recompute: bucket docs into deciles by integer division,
    # count tokens per decile and first-seen vocabulary types, then
    # cumulative sums.
    from collections import Counter
    from photon_spark.queries_pipeline import q_vocab_growth_curve

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "text").collect()
    n = max(r["doc_id"] for r in docs) + 1
    n_docs, n_tokens, first = Counter(), Counter(), {}
    for r in docs:
        d = min(9, r["doc_id"] * 10 // n)
        n_docs[d] += 1
        for t in r["text"].lower().split():
            n_tokens[d] += 1
            first[t] = min(first.get(t, 9), d)
    new_types = Counter(first.values())
    cum_t = cum_v = 0
    want = {}
    for d in sorted(n_docs):
        cum_t += n_tokens[d]
        cum_v += new_types[d]
        want[d] = (n_docs[d], n_tokens[d], new_types[d], cum_t, cum_v)
    got = {r["decile"]: (r["n_docs"], r["n_tokens"], r["new_types"],
                         r["cum_tokens"], r["cum_types"])
           for r in q_vocab_growth_curve(spark, sf_dir).collect()}
    assert got == want


def test_exact_pctl_sel_boundary_ranks(spark):
    """The shared order-statistic selector at its edges: n=1 (every
    percentile is the single value), n=2 (all three ranks collapse to
    the lower order statistic: floor((n-1)q/100)+1 = 1), n=100 (p50 =
    rank 50, p99 = rank 99 — the div-not-float boundary), and
    duplicate values straddling a rank (tie-insensitive selection)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from photon_spark.queries_pipeline import PCTL_QS, _exact_pctl_sel

    def run(vals):
        df = spark.createDataFrame([(v, i) for i, v in enumerate(vals)],
                                   "cents long, eid long")
        w = Window.orderBy("cents", "eid")
        wn = Window.partitionBy()
        ranked = (df.withColumn("rn", F.row_number().over(w))
                    .withColumn("n", F.count(F.lit(1)).over(wn)))
        r = ranked.agg(*_exact_pctl_sel("cents", PCTL_QS)).collect()[0]
        return (r["p50_cents"], r["p95_cents"], r["p99_cents"])

    assert run([7]) == (7, 7, 7)
    assert run([3, 9]) == (3, 3, 3)
    vals = list(range(1, 101))            # 1..100: rank k holds value k
    assert run(vals) == (50, 95, 99)
    # duplicates straddling rank 50: selection is tie-insensitive
    dup = [1] * 50 + [2] * 50
    assert run(dup) == (1, 2, 2)


# ---------------------------------------------------- phrase search

def test_phrase_search_matches_naive(spark, sf_dir):
    """Top-trigram derivation and per-doc consecutive-occurrence counts
    match a pure-Python recompute over the same corpus."""
    from collections import Counter

    from photon_spark.queries_pipeline import (
        PHRASE_TOPK, q_phrase_search_topk)

    rows = q_phrase_search_topk(spark, sf_dir).collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
                     .select("doc_id", "text").collect()
    toks = {r["doc_id"]: [t.lower() for t in r["text"].strip().split()]
            for r in docs}
    census = Counter()
    for ts in toks.values():
        for i in range(len(ts) - 2):
            census[(ts[i], ts[i + 1], ts[i + 2])] += 1
    # tie-break: highest count, then lexicographically SMALLEST phrase
    top_n = max(census.values())
    phrase = min(k for k, v in census.items() if v == top_n)
    want = {}
    for d, ts in toks.items():
        c = sum(1 for i in range(len(ts) - 2)
                if (ts[i], ts[i + 1], ts[i + 2]) == phrase)
        if c:
            want[d] = c
    expect = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))
    expect = expect[:PHRASE_TOPK]
    assert [(r["doc_id"], r["n_occurrences"]) for r in rows] == expect
    assert all(r["phrase"] == " ".join(phrase) for r in rows)
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))


# ------------------------------------------- Neyman allocation

def test_neyman_allocation_budget_and_proportionality(spark, sf_dir):
    """Σ alloc == TARGET exactly, every stratum within 1 of its
    real-valued Neyman quota (the largest-remainder guarantee), and
    weights equal sqrt(n·Σx² − (Σx)²) recomputed in Python."""
    import math

    from photon_spark.queries_pipeline import (NEYMAN_TARGET,
                                               q_neyman_allocation_plan)

    rows = q_neyman_allocation_plan(spark, sf_dir).collect()
    assert sum(r["alloc"] for r in rows) == NEYMAN_TARGET

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
                     .select("lang", "source", "n_chars").collect()
    agg = {}
    for r in docs:
        k = (r["lang"], r["source"])
        n, s1, s2 = agg.get(k, (0, 0, 0))
        agg[k] = (n + 1, s1 + r["n_chars"], s2 + r["n_chars"] ** 2)
    w = {k: round(math.sqrt(n * s2 - s1 * s1) * 1e6)
         for k, (n, s1, s2) in agg.items()}
    tot = sum(w.values())
    for r in rows:
        k = (r["lang"], r["source"])
        assert r["w_sigma"] == w[k]
        quota = NEYMAN_TARGET * w[k] / tot
        assert abs(r["alloc"] - quota) < 1.0 + 1e-9


def test_neyman_allocation_all_constant_strata(spark, tmp_path):
    """Every stratum constant-length → every weight 0 → the guard
    allocates nothing rather than dividing by zero or spraying the
    budget by tie order."""
    from photon_spark.queries_pipeline import q_neyman_allocation_plan

    df = spark.createDataFrame(
        [(i, "t", "en" if i % 2 else "de", f"src{i % 3}", 100)
         for i in range(30)],
        "doc_id long, text string, lang string, source string, "
        "n_chars long")
    path = str(tmp_path / "d")
    df.coalesce(1).write.parquet(path + "/documents.parquet")
    rows = q_neyman_allocation_plan(spark, path).collect()
    assert rows and all(r["alloc"] == 0 for r in rows)
    assert all(r["w_sigma"] == 0 for r in rows)
