"""Enrichment-stage operators: as-of join, PII profile/redaction, and the
surprisal/funnel queries' invariants."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from photon_spark.functions.asof import asof_join
from photon_spark.functions.pii import pii_profile, redact


def _naive_asof(left_rows, right_rows, strict=False):
    """Reference semantics: per left row, the max-ts right row with
    ts <= (or <) left ts, last-by-tiebreak on equal ts."""
    out = {}
    for key, lts, lid in left_rows:
        best = None
        for rkey, rts, rid, rv in right_rows:
            if rkey != key:
                continue
            if (rts < lts) if strict else (rts <= lts):
                if best is None or (rts, rid) > (best[0], best[1]):
                    best = (rts, rid, rv)
        out[lid] = best
    return out


LEFT = [("a", 10, 1), ("a", 20, 2), ("a", 5, 3), ("b", 15, 4), ("c", 7, 5)]
RIGHT = [("a", 10, 100, 1.5), ("a", 18, 101, 2.5), ("a", 18, 102, 3.5),
         ("b", 1, 103, None), ("b", 30, 104, 4.5)]


def _frames(spark):
    l = spark.createDataFrame([Row(k=k, ts=t, lid=i) for k, t, i in LEFT])
    r = spark.createDataFrame(
        [Row(k=k, ts=t, rid=i, val=v) for k, t, i, v in RIGHT],
        schema="k string, ts long, rid long, val double")
    return l, r


def test_asof_matches_naive(spark):
    l, r = _frames(spark)
    got = {row["lid"]: (row["asof_ts"], row["asof_rid"], row["asof_val"])
           for row in asof_join(l, r, on=["k"], left_ts="ts",
                                right_cols=["rid", "val"],
                                tiebreak="rid").collect()}
    want = _naive_asof(LEFT, RIGHT)
    for lid, best in want.items():
        if best is None:
            assert got[lid] == (None, None, None)
        else:
            assert got[lid] == best


def test_asof_strict_excludes_equal_ts(spark):
    l, r = _frames(spark)
    got = {row["lid"]: row["asof_rid"]
           for row in asof_join(l, r, on=["k"], left_ts="ts",
                                right_cols=["rid", "val"], strict=True,
                                tiebreak="rid").collect()}
    want = _naive_asof(LEFT, RIGHT, strict=True)
    assert got == {lid: (b[1] if b else None) for lid, b in want.items()}


def test_asof_null_payload_still_matches(spark):
    # right row (b, 1, 103, None): a NULL value column must not be skipped
    # by the running last() — the match marker is the row struct itself.
    l, r = _frames(spark)
    row = {x["lid"]: x for x in
           asof_join(l, r, on=["k"], left_ts="ts",
                     right_cols=["rid", "val"],
                     tiebreak="rid").collect()}[4]
    assert row["asof_rid"] == 103 and row["asof_val"] is None


def test_asof_no_row_amplification(spark):
    l, r = _frames(spark)
    out = asof_join(l, r, on=["k"], left_ts="ts", right_cols=["rid"])
    assert out.count() == len(LEFT)


PII_DOCS = [
    (0, "contact me at jane.doe+spam@example.co.uk for details"),
    (1, "server at 192.168.1.250 timed out"),
    (2, "ssn 123-45-6789 on file, card 4111111111111111 on record"),
    (3, "call +1 (415) 555-0199 today"),
    (4, "clean text with no identifiers at all"),
    (5, ""),
]


def test_pii_profile_counts(spark):
    df = spark.createDataFrame(PII_DOCS, "doc_id long, text string")
    got = {r["doc_id"]: r for r in pii_profile(df).collect()}
    assert got[0]["n_email"] == 1 and got[0]["has_pii"]
    assert got[1]["n_ipv4"] == 1
    assert got[2]["n_ssn"] == 1 and got[2]["n_card"] == 1
    assert got[3]["n_phone"] == 1
    assert not got[4]["has_pii"] and got[4]["n_pii"] == 0
    assert not got[5]["has_pii"]


def test_pii_redact_removes_all_detections(spark):
    df = spark.createDataFrame(PII_DOCS, "doc_id long, text string")
    red = redact(df)
    # after redaction, a second profile pass finds nothing
    assert (pii_profile(red).agg(F.sum("n_pii")).collect()[0][0] or 0) == 0
    texts = {r["doc_id"]: r["text"] for r in red.collect()}
    assert "[EMAIL]" in texts[0] and "[SSN]" in texts[2]
    assert "example" not in texts[0].split("@")[-1] if "@" in texts[0] else True


def test_funnel_counts_are_monotone(spark, sf_dir):
    from photon_spark.queries_enrich import q_quality_filter_funnel
    for r in q_quality_filter_funnel(spark, sf_dir).collect():
        assert r["n_pass"] <= min(r["n_len_ok"], r["n_quality_ok"],
                                  r["n_lang_ok"]) <= r["n_docs"]
        assert abs(r["retention"] - round(r["n_pass"] / r["n_docs"], 6)) < 1e-9


def test_surprisal_bounds(spark, sf_dir):
    # mean surprisal is >= 0 and <= log2(total tokens); rarest token's
    # rarity ~ bit length of the corpus size.
    from photon_spark.queries_enrich import q_token_surprisal_by_source
    rows = q_token_surprisal_by_source(spark, sf_dir).collect()
    assert rows
    total = sum(r["n_tokens"] for r in rows)
    for r in rows:
        assert 0.0 <= r["mean_surprisal_bits"] <= total.bit_length()
        assert r["n_distinct_tokens"] <= r["n_tokens"]


def test_pii_scrub_stats_matches_python_re(spark, sf_dir):
    # Python `re` recompute over the same closed-form docs: counts per
    # kind AND the priority-ordered redaction output — a third engine
    # agreeing with the Spark/DuckDB pair.
    import re as _re
    from photon_spark.functions.pii import PII_PATTERNS
    from photon_spark.queries_enrich import _pii_docs, q_pii_scrub_stats
    row = q_pii_scrub_stats(spark, sf_dir).collect()[0]
    docs = sorted((r["id"], r["text"]) for r in _pii_docs(spark).collect())
    counts = {k: 0 for k in PII_PATTERNS}
    reds = []
    for _, t in docs:
        for k, pat in PII_PATTERNS.items():
            counts[k] += len(_re.findall(pat, t))
        red = t
        for k, pat in PII_PATTERNS.items():
            red = _re.sub(pat, f"[{k.upper()}]", red)
        reds.append(red)
    for k in PII_PATTERNS:
        assert row[f"n_{k}"] == counts[k], k
    assert row["n_pii"] == sum(counts.values())
    assert row["n_docs_with_pii"] == len(docs)
    import hashlib
    want = hashlib.md5("|".join(reds).encode()).hexdigest()
    assert row["redacted_md5"] == want


def test_bigram_lm_bits_naive_recompute(spark, sf_dir):
    # Full naive recompute of the bigram-LM doc scores on a corpus
    # sample: add-one-smoothed conditional rarity in floor-log2 bits,
    # LM trained on the SAME full corpus the query trains on.
    import math
    from collections import Counter
    from photon_spark.queries_enrich import q_bigram_lm_doc_bits

    docs = {r["doc_id"]: r["text"].split()
            for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
                          .collect()}
    c12, c1, vocab = Counter(), Counter(), set()
    for toks in docs.values():
        vocab.update(toks)
        for a, b in zip(toks, toks[1:]):
            c12[(a, b)] += 1
            c1[a] += 1
    v = len(vocab)
    want = {}
    for did, toks in docs.items():
        bgs = list(zip(toks, toks[1:]))
        if not bgs:
            continue
        bits = [int(math.log2((c1[a] + v) // (c12[(a, b)] + 1)))
                for a, b in bgs]
        want[did] = (len(bgs), sum(bits))
    got = {r["doc_id"]: (r["n_bigrams"], r["sum_bits"])
           for r in q_bigram_lm_doc_bits(spark, sf_dir).collect()}
    assert got == want


def test_kneser_ney_bits_naive_recompute(spark, sf_dir):
    # Full naive recompute of the interpolated Kneser-Ney doc scores:
    # D = 3/4, so P(w2|w1) = ((4*c12-3)*R + 3*n1(w1)*r(w2)) / (4*c1*R)
    # exactly, and each occurrence costs floor(log2(B // A)) bits.
    from collections import Counter
    from photon_spark.queries_enrich import q_kneser_ney_doc_bits

    docs = {r["doc_id"]: r["text"].split()
            for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
                          .collect()}
    c12 = Counter()
    for toks in docs.values():
        for a, b in zip(toks, toks[1:]):
            c12[(a, b)] += 1
    c1, n1, r = Counter(), Counter(), Counter()
    for (a, b), k in c12.items():
        c1[a] += k
        n1[a] += 1
        r[b] += 1
    R = len(c12)
    want = {}
    for did, toks in docs.items():
        bgs = list(zip(toks, toks[1:]))
        if not bgs:
            continue
        bits = []
        for a, b in bgs:
            A = (4 * c12[(a, b)] - 3) * R + 3 * n1[a] * r[b]
            B = 4 * c1[a] * R
            bits.append((B // A).bit_length() - 1)
        want[did] = (len(bgs), sum(bits))
    got = {row["doc_id"]: (row["n_bigrams"], row["sum_bits"])
           for row in q_kneser_ney_doc_bits(spark, sf_dir).collect()}
    assert got == want


def test_kneser_ney_is_proper_distribution(spark, sf_dir):
    # The exact-rational KN numerators must sum to the denominator for
    # every left context ONCE the unseen continuations get their
    # backoff share: sum over ALL w2 of A(w1,w2) — the full formula on
    # observed bigrams, 3·n1(w1)·r(w2) on unseen — equals B(w1)
    # exactly, because sum_w2 r(w2) = R. The observed subset alone must
    # come in at or under B (each occurrence's bits >= 0): that is the
    # property that makes floor-log2 "bits" a true code length.
    from collections import Counter

    docs = [r["text"].split()
            for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
                          .collect()]
    c12 = Counter()
    for toks in docs:
        for a, b in zip(toks, toks[1:]):
            c12[(a, b)] += 1
    c1, n1, r = Counter(), Counter(), Counter()
    for (a, b), k in c12.items():
        c1[a] += k
        n1[a] += 1
        r[b] += 1
    R = len(c12)
    obs = {}
    for (a, b) in c12:
        obs.setdefault(a, []).append(b)
    for w1 in list(c1)[:50]:
        B = 4 * c1[w1] * R
        seen = obs[w1]
        num_obs = sum((4 * c12[(w1, b)] - 3) * R + 3 * n1[w1] * r[b]
                      for b in seen)
        # full-vocabulary total: observed terms + backoff on the rest
        num_all = num_obs + 3 * n1[w1] * (R - sum(r[b] for b in seen))
        assert num_all == B
        assert 0 < num_obs <= B
        for b in seen:  # every observed bigram individually codable
            assert (4 * c12[(w1, b)] - 3) * R + 3 * n1[w1] * r[b] <= B


# ------------------------------------------- seeded Markov generation

def test_markov_sample_chains_are_corpus_bigrams(spark, sf_dir):
    """Every adjacent pair in every generated text is an OBSERVED
    corpus bigram, the start token exists in the corpus, chains are
    {start}+{steps} tokens unless a dead-end prefix cut them, and the
    whole relation is deterministic run-over-run."""
    from photon_spark.queries_enrich import (MKV_STEPS,
                                             q_markov_text_sample)

    rows = q_markov_text_sample(spark, sf_dir).collect()
    assert len(rows) > 0
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
                     .select("text").collect()
    toks = [[t.lower() for t in r["text"].strip().split()] for r in docs]
    vocab = {t for ts in toks for t in ts}
    bigrams = {(a, b) for ts in toks for a, b in zip(ts, ts[1:])}
    for r in rows:
        ws = r["gen_text"].split(" ")
        assert r["n_tokens"] == len(ws) <= 1 + MKV_STEPS
        assert ws[0] in vocab
        for a, b in zip(ws, ws[1:]):
            assert (a, b) in bigrams, (r["sample_id"], a, b)

    again = q_markov_text_sample(spark, sf_dir).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_markov_draws_match_python_inverse_cdf(spark, sf_dir):
    """Sample 0's full chain equals a pure-Python replay of the seeded
    inverse-CDF construction (md5 digit-fold mod total, cumulative
    intervals ordered by token)."""
    import hashlib

    from photon_spark.queries_enrich import (MKV_SEED, MKV_STEPS,
                                             q_markov_text_sample)

    [r0] = [r for r in q_markov_text_sample(spark, sf_dir).collect()
            if r["sample_id"] == 0]

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
                     .select("text").collect()
    toks = [[t.lower() for t in r["text"].strip().split()] for r in docs]
    uni, big = {}, {}
    for ts in toks:
        for t in ts:
            uni[t] = uni.get(t, 0) + 1
        for a, b in zip(ts, ts[1:]):
            big.setdefault(a, {})[b] = big.get(a, {}).get(b, 0) + 1

    def h(s, t):
        return int(hashlib.md5(
            f"{MKV_SEED}:{s}:{t}".encode()).hexdigest()[:12], 16)

    def pick(dist, draw):
        cum = 0
        for k in sorted(dist):
            cum += dist[k]
            if draw < cum:
                return k
        raise AssertionError("draw beyond total")

    chain = [pick(uni, h(0, 0) % sum(uni.values()))]
    for t in range(1, MKV_STEPS + 1):
        nxt = big.get(chain[-1])
        if not nxt:
            break
        chain.append(pick(nxt, h(0, t) % sum(nxt.values())))
    assert r0["gen_text"] == " ".join(chain)
