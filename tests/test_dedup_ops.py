"""Dedup operator properties: LSH paths vs exact baselines."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_ecommerce_data_spark.operators import dedup as DD
from etl_ecommerce_data_spark.sources.registry import load_table

from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def docs(spark):
    # A lang-block subset keeps the exact O(n²) baseline cheap.
    return load_table(spark, SF_SMOKE, "documents").filter(F.col("lang") == "fr").cache()


def test_exact_dedup_survivor_and_counts(spark):
    df = spark.createDataFrame(
        [(1, "same text"), (2, "same text"), (3, "other")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r["dup_count"] for r in DD.exact_dedup(df).collect()}
    assert out == {1: 2, 3: 1}  # min-id survivor, correct multiplicity


def test_minhash_lsh_recall_and_precision(spark, docs):
    exact = {
        (r["doc_a"], r["doc_b"])
        for r in DD.ngram_jaccard_pairs(docs, threshold=0.7, block_col=None).collect()
    }
    lsh = {
        (r["doc_a"], r["doc_b"])
        for r in DD.minhash_lsh_pairs(docs, threshold=0.7).collect()
    }
    # Exact-Jaccard verification step ⇒ no false positives, ever.
    assert lsh <= exact
    # 16 bands × 4 rows ⇒ collision prob at j=0.7 is 1-(1-0.7^4)^16 ≈ 0.99.
    assert exact, "fixture should contain near-dup pairs at 0.7"
    assert len(lsh) / len(exact) >= 0.9


def test_minhash_lsh_recall_at_registered_threshold(spark):
    """The registered scale path (dedup_minhash_docs / dedup_clusters input):
    full corpus, threshold 0.6, unblocked ground truth — recall ≥ 0.95
    (round-2 promotion contract; the primary fuzzy-dedup query is LSH)."""
    corpus = load_table(spark, SF_SMOKE, "documents").cache()
    exact = {
        (r["doc_a"], r["doc_b"])
        for r in DD.ngram_jaccard_pairs(corpus, threshold=0.6, block_col=None).collect()
    }
    lsh = {
        (r["doc_a"], r["doc_b"])
        for r in DD.minhash_lsh_pairs(corpus, threshold=0.6).collect()
    }
    assert lsh <= exact  # exact verification ⇒ zero false positives
    assert exact, "fixture must contain near-dup pairs at 0.6"
    recall = len(lsh) / len(exact)
    assert recall >= 0.95, f"recall {recall:.4f}"


def test_simhash_banding_complete_for_small_hamming(spark, docs):
    # Pigeonhole: 4 chunks of 16 bits find EVERY pair with hamming ≤ 3.
    sh = docs.select("doc_id", DD.simhash64(F.col("text")).alias("h"))
    a = sh.selectExpr("doc_id as doc_a", "h as ha")
    b = sh.selectExpr("doc_id as doc_b", "h as hb")
    brute = {
        (r["doc_a"], r["doc_b"])
        for r in a.crossJoin(b)
        .filter(F.col("doc_a") < F.col("doc_b"))
        .withColumn("d", DD.hamming64(F.col("ha"), F.col("hb")))
        .filter(F.col("d") <= 3)
        .collect()
    }
    banded = {
        (r["doc_a"], r["doc_b"]) for r in DD.simhash_pairs(docs, max_hamming=3).collect()
    }
    assert banded == brute


def test_minhash_signature_shape(spark, docs):
    sig = docs.select(DD.minhash_signature(F.col("text"), num_perms=16).alias("s")).first()["s"]
    assert len(sig) == 16
    assert all(isinstance(v, int) for v in sig)


def test_connected_components_basic(spark):
    from etl_ecommerce_data_spark.operators.dedup import connected_components

    # components {1,2,3}, {10,11}; 20 isolated
    edges = spark.createDataFrame([(2, 3), (1, 2), (10, 11)], "doc_a long, doc_b long")
    nodes = spark.createDataFrame([(i,) for i in (1, 2, 3, 10, 11, 20)], "doc_id long")
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(edges, nodes).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20}


def test_connected_components_path_graph_converges(spark):
    from etl_ecommerce_data_spark.operators.dedup import connected_components

    # worst-case diameter: a chain 0-1-2-...-11 needs ~11 propagation rounds
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(11)], "doc_a long, doc_b long"
    )
    nodes = spark.createDataFrame([(i,) for i in range(12)], "doc_id long")
    got = connected_components(edges, nodes).collect()
    assert {r["cluster_id"] for r in got} == {0}
    assert len(got) == 12


def test_exact_dedup_excludes_null_texts(spark):
    """md5(NULL) is NULL and groupBy treats NULLs as equal — without the
    filter, unrelated content-less docs collapse into one 'duplicate' group
    and a keep-one consumer drops all but one of them."""
    df = spark.createDataFrame(
        [(1, None), (2, None), (3, "real")], "doc_id long, text string"
    )
    rows = DD.exact_dedup(df).collect()
    assert [(r["doc_id"], r["dup_count"]) for r in rows] == [(3, 1)]


def test_minhash_cross_group_expansion_is_star_capped(spark):
    """Two exact-dup groups larger than bucket_cap whose texts are near-dups
    of each other must NOT emit the |A|x|B| bipartite product from their one
    verified rep pair — the expansion degrades to a double star through the
    representatives, and clustering connectivity survives."""
    ta = " ".join(f"tok{i}" for i in range(40))
    tb = " ".join(f"tok{i}" for i in range(38)) + " zza zzb"  # jaccard ~0.9
    rows = [(i, ta) for i in range(10)] + [(100 + i, tb) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = DD.minhash_lsh_pairs(df, threshold=0.6, bucket_cap=4)
    got = {(r["doc_a"], r["doc_b"]) for r in pairs.collect()}
    # intra stars: (|A|-1) + (|B|-1); cross double star: |A| + |B| - 1
    assert len(got) == 9 + 9 + 19
    # full bipartite would be 100 cross pairs; star keeps reps connected
    nodes = df.select("doc_id")
    cc = DD.connected_components(pairs, nodes)
    n_clusters = cc.select("cluster_id").distinct().count()
    assert n_clusters == 1  # all 20 docs reachable through the reps
    # below the cap the full listing is unchanged
    full = DD.minhash_lsh_pairs(df, threshold=0.6, bucket_cap=512)
    assert full.count() == 45 + 45 + 100  # C(10,2)*2 intra + 10*10 cross


def test_banding_and_simhash_parameter_guards(spark, docs):
    """Silent mis-banding is worse than an error: num_perms must split
    evenly into bands, and simhash's hamming filter must stay inside the
    pigeonhole guarantee (pairs at hamming >= bands can collide on zero
    chunks and vanish from a listing that claims them)."""
    with pytest.raises(ValueError, match="multiple of bands"):
        DD.minhash_lsh_pairs(docs, num_perms=64, bands=24).count()
    with pytest.raises(ValueError, match="pigeonhole"):
        DD.simhash_pairs(docs, max_hamming=8, bands=4)


def test_connected_components_rejects_missing_endpoints(spark):
    """An edge endpoint absent from nodes silently splits components (its
    label row never exists, so hops through it are dropped) — fail loudly
    like the non-convergence path."""
    edges = spark.createDataFrame([(1, 2), (2, 3)], "doc_a long, doc_b long")
    nodes = spark.createDataFrame([(1,), (3,)], "doc_id long")
    with pytest.raises(ValueError, match="missing from"):
        DD.connected_components(edges, nodes)
