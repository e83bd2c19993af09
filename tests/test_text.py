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
