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


def _not_green(name, spark) -> bool:
    """A driver row is red on EITHER a contract False or an execution
    error (the driver records err → not hash-green). ANSI mode makes the
    0/0 Jaccard of empty hash arrays fail loud; the non-empty-truth clause
    covers the empty-truth paths that never reach a division."""
    try:
        row = _one_row(name, spark)
    except Exception:
        return True
    return row["recall_contract"] is False


def test_minhash_recall_detects_truth_destroying_regression(spark, monkeypatch):
    """The round-7 self-review's sharper vacuity variant: a _token_hashes
    regression that empties every hash array collapses all reps into one
    null-signature mega-bucket per band (capped regime ON with the real
    default cap) and destroys the rederived star truth — the anchor
    assertion would otherwise hold over an EMPTY truth set. The row must
    not stay green (here: ANSI fails the 0/0 Jaccard loudly; with ANSI
    off, the truth set comes back empty and the n_star_truth >= 1 clause
    flips the contract False)."""
    empty = lambda col: F.array().cast("array<bigint>")
    monkeypatch.setattr(Q.DD, "_token_hashes", empty)
    assert _not_green("dedup_minhash_recall", spark)


def test_cross_corpus_recall_detects_truth_destroying_regression(
    spark, monkeypatch
):
    empty = lambda col: F.array().cast("array<bigint>")
    monkeypatch.setattr(Q.DD, "_token_hashes", empty)
    assert _not_green("dedup_cross_corpus_recall", spark)


def test_minhash_recall_detects_empty_star_truth_without_division(
    spark, monkeypatch
):
    """Empty-truth path with NO 0/0 anywhere: banding collapses docs into
    mega-buckets (capped regime ON) but the star-truth derivation loses all
    its pairs — modeled by gutting the helper's output. Only the
    n_star_truth >= 1 clause can catch this; anchor recall over the empty
    set is vacuously perfect."""
    real = Q._minhash_star_truth

    def truthless(rep_hs, n_perms, n_bands, cap, threshold):
        truth, n_over = real(rep_hs, n_perms, n_bands, cap, 0.0)
        # force the capped regime on (cap=0: every bucket oversized) but
        # return an empty truth frame
        _, n_over = real(rep_hs, n_perms, n_bands, 0, threshold)
        return truth.filter(F.lit(False)), n_over

    monkeypatch.setattr(Q, "_minhash_star_truth", truthless)
    row = _one_row("dedup_minhash_recall", spark)
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
    assert row["anchor_truth_nonempty"] is True
    assert row["listing_degraded"] is True

    def gutted(df, *args, **kwargs):
        out = real(df, *args, **kwargs)
        if kwargs.get("bucket_cap") is not None:
            return out.filter(F.lit(False))
        return out

    monkeypatch.setattr(Q.SIM, "embedding_near_dup_pairs", gutted)
    row = _one_row("embedding_star_cap_floor", spark)
    assert row["anchor_pair_recall_1"] is False


def test_embedding_star_cap_floor_detects_kernel_regression(spark, monkeypatch):
    """The shared-kernel-vacuity probe the round-7 advisor described: the
    floor's truth side now derives its signature word per-bit from
    _plane_sign via JVM folds, NOT from the operator's _srp_words_udf, so
    a kernel regression moves the operator and the truth APART instead of
    greening both in lockstep. Gut the kernel to a constant zero word: the
    operator's banding collapses into one mega-bucket per band and loses
    the true per-bucket star pairs, while the independent truth still
    derives them — the row must go red on anchor recall."""
    real = Q.SIM._srp_words_udf

    def zeroed(num_bits, dim):
        import numpy as np
        import pandas as pd
        from pyspark.sql.functions import pandas_udf

        n_words = (num_bits + 63) // 64

        def zero_words(vecs):
            return pd.Series([np.zeros(n_words, dtype=np.int64)] * len(vecs))

        # explicit returnType form: `from __future__ import annotations`
        # in this module turns hints into strings pandas_udf can't infer
        return pandas_udf(zero_words, "array<long>")

    monkeypatch.setattr(Q.SIM, "_srp_words_udf", zeroed)
    row = _one_row("embedding_star_cap_floor", spark)
    assert row["anchor_pair_recall_1"] is False
    assert row["anchor_truth_nonempty"] is True  # independent truth intact
    monkeypatch.setattr(Q.SIM, "_srp_words_udf", real)


def test_linkage_block_cap_floor_detects_pair_loss(spark, monkeypatch):
    """The round-8 floor (VERDICT r7 ask #2): honest operator green on every
    boolean; a capped-run pair loss must flip surviving_recall_1 (the truth
    side is derived independently, so it stays non-empty)."""
    real = Q.LK.blocked_levenshtein_pairs

    row = _one_row("linkage_block_cap_floor", spark)
    assert row["cap_exercised"] is True
    assert row["no_pair_invented"] is True
    assert row["surviving_recall_1"] is True
    assert row["truth_nonempty"] is True
    assert row["listing_degraded"] is True

    def gutted(df, id_col, text_col, **kwargs):
        out = real(df, id_col, text_col, **kwargs)
        if kwargs.get("max_block_size", 10**9) <= 10:  # only the capped run
            return out.filter(F.lit(False))
        return out

    monkeypatch.setattr(Q.LK, "blocked_levenshtein_pairs", gutted)
    row = _one_row("linkage_block_cap_floor", spark)
    assert row["surviving_recall_1"] is False
    assert row["truth_nonempty"] is True  # independent truth unaffected


def test_linkage_block_cap_floor_detects_invented_pair(spark, monkeypatch):
    """A pair the cap INVENTED (not in any surviving block) must flip
    no_pair_invented — the 'never corrupts kept blocks' half of the
    contract."""
    real = Q.LK.blocked_levenshtein_pairs

    def inventing(df, id_col, text_col, **kwargs):
        out = real(df, id_col, text_col, **kwargs)
        if kwargs.get("max_block_size", 10**9) <= 10:
            fake = out.sparkSession.createDataFrame(
                [(-1, -2, "a", "b", 0)], out.schema
            )
            return out.unionByName(fake)
        return out

    monkeypatch.setattr(Q.LK, "blocked_levenshtein_pairs", inventing)
    row = _one_row("linkage_block_cap_floor", spark)
    assert row["no_pair_invented"] is False
    assert row["surviving_recall_1"] is True


def test_linkage_block_cap_floor_detects_key_regression(spark, monkeypatch):
    """The shared-helper-vacuity probe (ADVICE r7 class): the floor's truth
    side deliberately does NOT call linkage.block_key, so a regression in
    the operator's key helper moves the operator and the truth APART. Break
    the key to all-distinct md5 blocks: the operator finds no pairs at all
    while the independent truth is untouched — the row must go red on
    recall, not green-in-lockstep."""
    monkeypatch.setattr(
        Q.LK, "block_key", lambda text, n_tokens=2: F.md5(F.monotonically_increasing_id().cast("string"))
    )
    row = _one_row("linkage_block_cap_floor", spark)
    assert row["surviving_recall_1"] is False
    assert row["truth_nonempty"] is True
