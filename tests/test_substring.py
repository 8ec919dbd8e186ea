"""Exact-substring dedup (functions/substring.py) pinned on a
constructed corpus with known repeated spans, plus invariants of the
gate queries over the testdata corpus."""

import pytest
from pyspark.sql import functions as F

from photon_spark.functions import substring

L = 5  # small gram length so the constructed docs stay readable


def _words(prefix, n):
    return " ".join(f"{prefix}{i}" for i in range(n))


@pytest.fixture(scope="module")
def corpus(spark):
    shared = _words("s", 12)          # 12-token span shared by docs 1/2
    rep = _words("r", 6)              # 6-token span repeated WITHIN doc 3
    rows = [
        (1, f"{_words('a', 8)} {shared} {_words('b', 7)}"),
        (2, f"{_words('c', 5)} {shared} {_words('d', 9)}"),
        (3, f"{rep} {_words('e', 10)} {rep}"),
        (4, _words("z", 30)),         # no repeats anywhere
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_pair_spans_find_exact_shared_span(corpus):
    spans = substring.repeated_spans(corpus, L).collect()
    # Only docs 1 and 2 share a cross-doc span; doc 3's repeat is
    # within-doc (excluded from PAIR mining), doc 4 has none.
    assert {(r["lo_id"], r["hi_id"]) for r in spans} == {(1, 2)}
    [s] = spans
    # The shared span is exactly the 12 shared tokens, starting after
    # 8 tokens in doc 1 and 5 tokens in doc 2.
    assert (s["span_len"], s["start_a"], s["start_b"]) == (12, 8, 5)


def test_pair_spans_are_maximal_not_fragmented(corpus):
    # A 12-token span at L=5 is 8 consecutive shared grams — they must
    # chain into ONE maximal span, not 8 rows.
    spans = substring.repeated_spans(corpus, L).collect()
    assert len(spans) == 1


def test_profile_counts_within_doc_repeats(corpus):
    prof = {r["doc_id"]: r for r in
            substring.repeated_span_profile(corpus, L).collect()}
    # doc 4 untouched by any duplicated span
    assert 4 not in prof
    # docs 1/2: exactly the 12 shared tokens are covered
    assert prof[1]["dup_tokens"] == 12 and prof[2]["dup_tokens"] == 12
    assert prof[1]["n_tokens"] == 8 + 12 + 7
    assert prof[1]["dup_frac"] == round(12 / 27, 6)
    # doc 3: both copies of the within-doc 6-token repeat are covered
    assert prof[3]["dup_tokens"] == 12


def test_short_docs_cannot_match(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c")], "doc_id long, text string")
    assert substring.repeated_spans(df, 5).count() == 0
    assert substring.repeated_span_profile(df, 5).count() == 0


def test_posting_cap_drops_boilerplate_pairs(spark):
    # one 5-token boilerplate line in 4 docs: occ=4 > max_occ=3 → no
    # pairs mined; with the cap lifted, all 6 pairs appear.
    boiler = _words("x", L)
    rows = [(i, f"{_words(chr(97 + i) * 2, 6)} {boiler}") for i in range(4)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    assert substring.repeated_spans(df, L, max_occ=3).count() == 0
    assert substring.repeated_spans(df, L, max_occ=100).count() == 6


def test_gate_queries_consistent_on_testdata(spark, sf_dir):
    from photon_spark import queries_substring as qs
    pairs = qs.q_exact_substring_dedup(spark, sf_dir)
    prof = qs.q_exact_substring_doc_fraction(spark, sf_dir)
    rows = pairs.collect()
    assert rows, "testdata contains planted near-dups; spans must exist"
    for r in rows:
        assert r["max_span_len"] >= qs.SPAN_L
        assert r["span_tokens"] >= r["max_span_len"]
        assert r["n_spans"] >= 1
    # every doc in a pair span is covered in the profile
    prof_ids = {r["doc_id"] for r in prof.collect()}
    for r in rows:
        assert r["lo_id"] in prof_ids and r["hi_id"] in prof_ids
    # fractions are valid and positive
    assert prof.where((F.col("dup_frac") <= 0)
                      | (F.col("dup_frac") > 1)).count() == 0


def test_paragraph_minhash_catches_diluted_partial_overlap(spark, tmp_path):
    """Two docs sharing one paragraph inside mostly-distinct bodies:
    whole-doc MinHash dilutes the Jaccard below threshold (no doc-level
    pair), but the chunk-granularity miner finds the shared paragraph
    and rolls it up to the doc pair."""
    from photon_spark.functions import dedup
    from photon_spark import queries_substring as qs

    para = " ".join(f"shared{i}" for i in range(22))   # > one 100-char window
    tail_a = " ".join(f"alpha{i}" for i in range(60))
    tail_b = " ".join(f"beta{i}" for i in range(60))
    df = spark.createDataFrame(
        [(1, f"{para} {tail_a}", "en", "s", 1),
         (2, f"{para} {tail_b}", "en", "s", 1)],
        "doc_id long, text string, lang string, source string, n_chars long")
    sf = str(tmp_path / "sf")
    df.coalesce(1).write.parquet(f"{sf}/documents.parquet")

    doc_pairs = dedup.minhash_near_duplicates(
        spark.read.parquet(f"{sf}/documents.parquet")).collect()
    assert doc_pairs == [], "tails must dilute whole-doc jaccard below 0.7"

    rolled = qs.q_paragraph_minhash_dedup(spark, sf).collect()
    assert [(r["doc_lo"], r["doc_hi"]) for r in rolled] == [(1, 2)]
    assert rolled[0]["max_jaccard"] >= 0.7


def test_trim_plan_keeps_first_occurrence(corpus):
    plan = {r["doc_id"]: r for r in
            substring.trim_plan(corpus, L).collect()}
    # doc 1 holds the globally-first copy of the shared span → nothing
    # to trim there; doc 2's copy is removable in full
    assert 1 not in plan
    assert plan[2]["trim_tokens"] == 12
    assert plan[2]["kept_tokens"] == plan[2]["n_tokens"] - 12
    # doc 3: second within-doc copy of the 6-token repeat is removable
    assert plan[3]["trim_tokens"] == 6
    assert 4 not in plan
