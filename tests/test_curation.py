"""Unit tests for the corpus-curation operators (operators/curation.py):
exact hand-computed expectations for the Gopher repetition signals, the
staged PII scrub, n-gram decontamination and deterministic stratified
sampling.  Cross-engine parity with the DuckDB twins is separately gated
by tests/test_driver_contract.py (cur_* entries)."""

import pytest

from wikiprep_spark.operators import curation


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# --- repetition_stats ------------------------------------------------------

def test_repetition_duplicate_lines(spark):
    docs = _docs(spark, [(1, "a\nb\na\nc\na")])
    row = curation.repetition_stats(docs).collect()[0]
    assert row.n_lines == 5
    # 'a' occurs 3x -> 3 duplicate lines out of 5, 3 of the 5 line-chars
    assert row.dup_line_frac == pytest.approx(0.6)
    assert row.dup_line_char_frac == pytest.approx(0.6)


def test_repetition_ngram_stuffing(spark):
    docs = _docs(spark, [(1, "spam ham spam ham spam ham")])
    row = curation.repetition_stats(docs).collect()[0]
    # 6 tokens; 'spam ham' x3 of 5 bigrams -> 2*3/6; 'spam ham spam' x2
    # of 4 trigrams -> 3*2/6
    assert row.top_bigram_frac == pytest.approx(1.0)
    assert row.top_trigram_frac == pytest.approx(1.0)
    assert row.dup_line_frac == 0.0


def test_repetition_short_doc_zero_grams(spark):
    docs = _docs(spark, [(1, "x")])
    row = curation.repetition_stats(docs).collect()[0]
    assert row.n_lines == 1
    assert row.dup_line_frac == 0.0
    assert row.top_bigram_frac == 0.0
    assert row.top_trigram_frac == 0.0


def test_repetition_all_unique(spark):
    docs = _docs(spark, [(1, "one two three four five six")])
    row = curation.repetition_stats(docs).collect()[0]
    # every bigram/trigram occurs once: fracs are n*1/n_tokens
    assert row.top_bigram_frac == pytest.approx(2 / 6, abs=1e-6)
    assert row.top_trigram_frac == pytest.approx(3 / 6, abs=1e-6)


# --- pii_scrub -------------------------------------------------------------

def test_pii_scrub_all_three_kinds(spark):
    docs = _docs(spark, [
        (1, "mail a@b.com or 10.0.0.1 call +1-800-555-1234"),
    ])
    row = curation.pii_scrub(docs).collect()[0]
    assert (row.n_emails, row.n_ipv4, row.n_phones) == (1, 1, 1)
    assert row.scrubbed_text == "mail <EMAIL> or <IP> call <PHONE>"


def test_pii_scrub_email_wins_over_ip(spark):
    # the dotted-quad local part is consumed by the email pass first, so
    # the later IP pass sees no dotted quad (staged counts are on the
    # text as it stands at each stage)
    docs = _docs(spark, [(1, "contact 1.2.3.4@example.com now")])
    row = curation.pii_scrub(docs).collect()[0]
    assert (row.n_emails, row.n_ipv4, row.n_phones) == (1, 0, 0)
    assert row.scrubbed_text == "contact <EMAIL> now"


def test_pii_scrub_clean_text_unchanged(spark):
    docs = _docs(spark, [(1, "no contact info here")])
    row = curation.pii_scrub(docs).collect()[0]
    assert (row.n_emails, row.n_ipv4, row.n_phones) == (0, 0, 0)
    assert row.scrubbed_text == "no contact info here"


# --- ngram_decontaminate ---------------------------------------------------

def test_decontaminate_flags_exact_overlap(spark):
    train = _docs(spark, [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "tiny doc"),
        (3, "completely different words that never match anything"),
    ])
    ev = _docs(spark, [(100, "quick brown fox jumps over")])
    out = {r.doc_id: r for r in
           curation.ngram_decontaminate(train, ev, n=5).collect()}
    assert out[1].n_shared_ngrams == 1 and out[1].contaminated
    # shorter than n tokens -> no grams -> clean
    assert out[2].n_shared_ngrams == 0 and not out[2].contaminated
    assert out[3].n_shared_ngrams == 0 and not out[3].contaminated
    assert len(out) == 3


def test_decontaminate_counts_distinct_grams(spark):
    # the train doc repeats the contaminated 5-gram; distinct grams are
    # counted once (array_distinct before the join)
    text = "a b c d e and then a b c d e"
    train = _docs(spark, [(1, text)])
    ev = _docs(spark, [(100, "a b c d e")])
    row = curation.ngram_decontaminate(train, ev, n=5).collect()[0]
    assert row.n_shared_ngrams == 1


# --- stratified_sample -----------------------------------------------------

def _lang_docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, lang string")


def test_sample_deterministic_and_subset(spark):
    rows = [(i, ["en", "de", "zh"][i % 3]) for i in range(300)]
    docs = _lang_docs(spark, rows)
    a = sorted(tuple(r) for r in curation.stratified_sample(docs).collect())
    b = sorted(tuple(r) for r in curation.stratified_sample(docs).collect())
    assert a == b  # pure function of the id: reproducible across runs
    kept = {r[0] for r in a}
    assert kept <= {i for i, _ in rows}
    assert all(0 <= r[2] < 10000 for r in a)


def test_sample_respects_rates(spark):
    rows = [(i, ["en", "de", "zh"][i % 3]) for i in range(300)]
    docs = _lang_docs(spark, rows)
    out = curation.stratified_sample(docs).collect()
    by_lang = {}
    for r in out:
        by_lang[r.lang] = by_lang.get(r.lang, 0) + 1
    # zh has no entry in SAMPLE_RATES -> default rate 1.0 keeps all 100
    assert by_lang["zh"] == 100
    # en at 0.5 and de at 0.8 of 100 docs each: md5 buckets are uniform
    # enough at this size for a wide sanity band
    assert 30 <= by_lang["en"] <= 70
    assert 60 <= by_lang["de"] <= 95
    # every kept row individually satisfies its stratum threshold
    thr = {"en": 5000, "de": 8000, "zh": 10000}
    assert all(r.bucket < thr[r.lang] for r in out)


def test_sample_custom_rates_zero_drops_stratum(spark):
    docs = _lang_docs(spark, [(1, "en"), (2, "fr"), (3, "en")])
    out = curation.stratified_sample(
        docs, rates={"en": 0.0}, default_rate=1.0).collect()
    assert {r.lang for r in out} == {"fr"}
