"""Text-analysis expression edge cases (registry parity is covered by
test_oracle_parity; these cover inputs not present in the corpus)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_ecommerce_data_spark.functions import text as TX


def _one(spark, text: str, expr):
    df = spark.createDataFrame([(text,)], "text string")
    return df.select(expr(F.col("text")).alias("v")).first()["v"]


def test_token_count_simple(spark):
    assert _one(spark, "a b c", TX.token_count) == 3


def test_token_count_empty_string(spark):
    # split("", " ") → [""] in both Spark and DuckDB: one (empty) token.
    assert _one(spark, "", TX.token_count) == 1


def test_distinct_tokens(spark):
    assert _one(spark, "a b a", TX.distinct_token_count) == 2


def test_detected_lang_markers(spark):
    assert _one(spark, "der hund und die katze ist nicht da", TX.detected_lang) == "de"
    assert _one(spark, "the cat is on the mat", TX.detected_lang) == "en"
    assert _one(spark, "xyz qqq zzz", TX.detected_lang) == "und"


def test_detected_lang_tie_breaks_alphabetically(spark):
    # one marker hit for de ("die") and one for en ("the") → 'de' wins ties.
    assert _one(spark, "die the", TX.detected_lang) == "de"


def test_shingle_fingerprint_short_doc_falls_back(spark):
    short = _one(spark, "a b", TX.shingle_fingerprint)
    whole = _one(spark, "a b", TX.fingerprint)
    assert short == whole


def test_shingle_fingerprint_is_min_of_shingles(spark):
    import hashlib

    text = "w1 w2 w3 w4"
    shingles = ["w1 w2 w3", "w2 w3 w4"]
    want = min(hashlib.md5(s.encode()).hexdigest() for s in shingles)
    assert _one(spark, text, TX.shingle_fingerprint) == want


def test_quality_score_bounds(spark):
    v = _one(spark, "the quick brown fox and the lazy dog", TX.quality_score)
    assert 0.0 <= v <= 1.0


def test_hll_distinct_within_error_bound(spark):
    from etl_ecommerce_data_spark.plans.queries import QUERIES
    from etl_ecommerce_data_spark.sources.registry import load_table

    from tests.conftest import SF_SMOKE

    approx = {
        r["event_date"]: r["approx_users"]
        for r in QUERIES["daily_users_hll"].builder(spark, SF_SMOKE).collect()
    }
    ev = load_table(spark, SF_SMOKE, "events")
    from pyspark.sql import functions as F

    exact = {
        r["event_date"]: r["n"]
        for r in ev.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("event_date"))
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(approx) == set(exact)
    for d, n in exact.items():
        # rsd=2% → allow a generous 4-sigma band
        assert abs(approx[d] - n) <= max(2, 0.08 * n), (d, approx[d], n)


def test_percentile_approx_within_rank_error(spark):
    from pyspark.sql import functions as F

    from etl_ecommerce_data_spark.plans.queries import QUERIES
    from etl_ecommerce_data_spark.sources.registry import load_table

    from tests.conftest import SF_SMOKE

    approx = {
        r["event_type"]: (r["p50"], r["p95"])
        for r in QUERIES["value_percentiles_approx"].builder(spark, SF_SMOKE).collect()
    }
    ev = load_table(spark, SF_SMOKE, "events")
    for etype, (p50, p95) in approx.items():
        vals = sorted(
            r["value"] for r in ev.filter(F.col("event_type") == etype).collect()
        )
        n = len(vals)
        # GK with accuracy 10000 on n≈2000: rank error ≤ n/10000 < 1, but the
        # approx result is a real element, not interpolated → compare ranks.
        import bisect

        for q, got in ((0.5, p50), (0.95, p95)):
            rank = bisect.bisect_left(vals, got)
            assert abs(rank - q * n) <= max(2, 0.01 * n), (etype, q, got, rank, q * n)


# --- PII redaction ----------------------------------------------------------

def test_pii_redact_all_categories(spark):
    txt = "mail a.b+c@ex-ample.org ip 192.168.0.1 call 555-0042 done"
    out = _one(spark, txt, TX.pii_redact)
    assert out == "mail <EMAIL> ip <IP> call <PHONE> done"


def test_pii_redact_clean_text_unchanged(spark):
    txt = "no pii here just words and 42 numbers"
    assert _one(spark, txt, TX.pii_redact) == txt


def test_pii_counts_on_original_text(spark):
    # Counts are taken on the ORIGINAL text, so categories are independent
    # of redaction order (an IP inside an email-like token still counts).
    txt = "x@y.com and 1.2.3.4 and 10.0.0.1 and 555-1234 and 555-9999"
    df = spark.createDataFrame([(txt,)], "text string")
    counts = TX.pii_counts(F.col("text"))
    row = df.select(
        counts["email"].alias("e"), counts["ipv4"].alias("i"), counts["phone"].alias("p")
    ).first()
    assert (row["e"], row["i"], row["p"]) == (1, 2, 2)


def test_pii_placeholders_do_not_cascade(spark):
    # A redacted placeholder must not create a match for a later pattern:
    # <EMAIL> etc. contain no digits or @, so the chain is order-stable.
    txt = "a@b.io 9.9.9.9 555-1111"
    out = _one(spark, txt, TX.pii_redact)
    assert out.count("<") == 3


def test_pii_ipv4_word_boundary(spark):
    # Version-like strings with >4 dotted groups are still matched on their
    # first 4 groups (documented greedy behavior shared by both engines);
    # a plain decimal is never matched.
    assert _one(spark, "pi is 3.14 ok", TX.pii_redact) == "pi is 3.14 ok"


# --- corpus boilerplate removal (query-level behavior at sf0.001) ------------

def test_boilerplate_removal_preserves_all_docs(spark):
    from etl_ecommerce_data_spark.plans.queries import QUERIES
    from tests.conftest import SF_SMOKE

    df = QUERIES["corpus_boilerplate_removal"].builder(spark, SF_SMOKE)
    rows = df.collect()
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    assert len(rows) == docs.count()
    for r in rows:
        assert r["n_chunks"] >= 1
        assert 0 <= r["n_removed"] <= r["n_chunks"]
        # kept text has exactly n_chunks - n_removed chunks' worth of tokens
        if r["n_removed"] == r["n_chunks"]:
            assert r["clean_text"] == ""
