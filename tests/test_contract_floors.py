"""Non-vacuity pins for the capped-regime contract floors (driver ADVICE r6).

The round-6 recall floors waived listing recall entirely whenever any
(band, bucket) exceeded the operator's cap — so a banding regression that
collapsed docs into one mega-bucket flipped the row into the waived regime
and kept it green while recall was destroyed. Round 7 rewrote the capped
regime to assert the star anchor contract INLINE. These tests prove the
rewrite is a real check, not a new vacuity: with the cap forced to fire,
the contract (a) holds for the honest operator and (b) flips FALSE when the
operator loses its star pairs (the exact regression class the advisor
described).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import etl_ecommerce_data_spark.plans.queries as Q

from tests.conftest import SF_SMOKE


def _one_row(name, spark):
    return Q.QUERIES[name].builder(spark, SF_SMOKE).collect()[0]


def test_minhash_recall_capped_regime_detects_star_regression(spark, monkeypatch):
    real = Q.DD.minhash_lsh_pairs

    # cap=3 in the DEFAULT makes the query's signature-derived regime
    # rederivation fire at SF_SMOKE (225 oversized buckets, 2118 true
    # anchor pairs) — the capped branch is exercised, not the 0.95 floor
    def capped(df, threshold=0.6, num_perms=64, bands=16, text_col="text",
               id_col="doc_id", bucket_cap=3):
        return real(df, threshold=threshold, num_perms=num_perms, bands=bands,
                    text_col=text_col, id_col=id_col, bucket_cap=3)

    monkeypatch.setattr(Q.DD, "minhash_lsh_pairs", capped)
    row = _one_row("dedup_minhash_recall", spark)
    assert row["recall_contract"] is True
    assert row["no_false_positives"] is True

    # a star-path regression (here: total pair loss) must flip the row red
    def gutted(df, threshold=0.6, num_perms=64, bands=16, text_col="text",
               id_col="doc_id", bucket_cap=3):
        out = real(df, threshold=threshold, num_perms=num_perms, bands=bands,
                   text_col=text_col, id_col=id_col, bucket_cap=3)
        return out.filter(F.lit(False))

    monkeypatch.setattr(Q.DD, "minhash_lsh_pairs", gutted)
    row = _one_row("dedup_minhash_recall", spark)
    assert row["recall_contract"] is False


def test_cross_corpus_recall_capped_regime_detects_star_regression(
    spark, monkeypatch
):
    real = Q.DD.minhash_lsh_pairs_cross

    def capped(df_new, df_corpus, threshold=0.6, num_perms=64, bands=16,
               text_col="text", id_col="doc_id", bucket_cap=3):
        return real(df_new, df_corpus, threshold=threshold,
                    num_perms=num_perms, bands=bands, text_col=text_col,
                    id_col=id_col, bucket_cap=3)

    monkeypatch.setattr(Q.DD, "minhash_lsh_pairs_cross", capped)
    row = _one_row("dedup_cross_corpus_recall", spark)
    assert row["recall_contract"] is True
    assert row["no_false_positives"] is True

    def gutted(df_new, df_corpus, threshold=0.6, num_perms=64, bands=16,
               text_col="text", id_col="doc_id", bucket_cap=3):
        out = real(df_new, df_corpus, threshold=threshold,
                   num_perms=num_perms, bands=bands, text_col=text_col,
                   id_col=id_col, bucket_cap=3)
        return out.filter(F.lit(False))

    monkeypatch.setattr(Q.DD, "minhash_lsh_pairs_cross", gutted)
    row = _one_row("dedup_cross_corpus_recall", spark)
    assert row["recall_contract"] is False


def test_embedding_star_cap_floor_detects_star_regression(spark, monkeypatch):
    """The new floor's anchor assertion must notice a capped-path pair loss:
    gut ONLY the capped run (bucket_cap is not None) and the anchor flag and
    subset flag must flip accordingly."""
    real = Q.SIM.embedding_near_dup_pairs

    row = _one_row("embedding_star_cap_floor", spark)
    assert row["cap_exercised"] is True
    assert row["no_false_pairs"] is True
    assert row["anchor_pair_recall_1"] is True
    assert row["listing_degraded"] is True

    def gutted(df, *args, **kwargs):
        out = real(df, *args, **kwargs)
        if kwargs.get("bucket_cap") is not None:
            return out.filter(F.lit(False))
        return out

    monkeypatch.setattr(Q.SIM, "embedding_near_dup_pairs", gutted)
    row = _one_row("embedding_star_cap_floor", spark)
    assert row["anchor_pair_recall_1"] is False
