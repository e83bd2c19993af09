"""Similarity search: exact cosine vs numpy, LSH recall vs exact top-k."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from etl_ecommerce_data_spark.functions.vectors import cosine
from etl_ecommerce_data_spark.operators import similarity as SIM
from etl_ecommerce_data_spark.sources.registry import load_table

from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF_SMOKE, "embeddings").cache()


def test_cosine_matches_numpy(spark):
    a, b = [1.0, 2.0, 3.0], [-1.0, 0.5, 2.0]
    df = spark.createDataFrame([(a, b)], "a array<double>, b array<double>")
    got = df.select(cosine(F.col("a"), F.col("b")).alias("c")).first()["c"]
    want = float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))
    assert abs(got - want) < 1e-12


def test_cosine_zero_vector_is_null(spark):
    df = spark.createDataFrame([([0.0, 0.0], [1.0, 2.0])], "a array<double>, b array<double>")
    assert df.select(cosine(F.col("a"), F.col("b")).alias("c")).first()["c"] is None


def test_exact_topk_is_correct_vs_numpy(spark, emb):
    rows = emb.filter(F.col("vec_id") < 50).collect()
    mat = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in rows}
    out = SIM.cosine_topk(
        emb.filter(F.col("vec_id") < 50), emb.filter(F.col("vec_id") == 0), k=3
    ).collect()
    got = [(r["neighbor_id"]) for r in sorted(out, key=lambda r: r["rank"])]
    q = mat[0]
    sims = {
        i: float(np.dot(q, v) / (np.linalg.norm(q) * np.linalg.norm(v)))
        for i, v in mat.items()
        if i != 0
    }
    want = [i for i, _ in sorted(sims.items(), key=lambda kv: (-kv[1], kv[0]))[:3]]
    assert got == want


def test_lsh_topk_recall(spark, emb):
    exact = SIM.cosine_topk(emb, emb.filter(F.col("vec_id") < 10), k=5).collect()
    approx = SIM.lsh_topk(emb, emb.filter(F.col("vec_id") < 10), k=5, dim=64).collect()
    exact_set = {(r["query_id"], r["neighbor_id"]) for r in exact}
    approx_set = {(r["query_id"], r["neighbor_id"]) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    # SRP-LSH with 16 bits / 4 bands on 64-dim noise-ish vectors: modest but
    # non-degenerate recall; the contract is "finds a meaningful fraction
    # while scoring a fraction of the corpus".
    assert recall >= 0.3, f"recall {recall}"
    assert len(approx_set) <= 10 * 5


def test_banded_near_dup_recall_at_registered_config(spark, emb):
    """The registered embedding_near_dup scale path (48 bits / 16 bands,
    threshold 0.4): banded output ⊆ exact and recall ≥ 0.95 on the full
    fixture corpus (measured 1.0 at sf0.01, 0.989 at sf0.1)."""
    exact = {
        (r["vec_a"], r["vec_b"])
        for r in SIM.embedding_near_dup_pairs(emb, threshold=0.4, exact=True).collect()
    }
    banded = {
        (r["vec_a"], r["vec_b"])
        for r in SIM.embedding_near_dup_pairs(
            emb, threshold=0.4, exact=False, num_bits=48, bands=16
        ).collect()
    }
    assert banded <= exact  # exact cosine verification ⇒ no false positives
    assert exact, "fixture must contain near-dup pairs at 0.4"
    recall = len(banded) / len(exact)
    assert recall >= 0.95, f"recall {recall:.4f}"


def test_banded_near_dup_output_invariant_to_verify_chunking(spark, emb):
    """End-to-end pin of the chunk-invariance contract through the full Spark
    operator (not just the numpy kernel): verify_chunk_cells is a MEMORY
    knob, so a 1-cell chunking (every Gram chunk degenerates to one row,
    dispatching dot/gemv instead of blocked gemm) must produce the SAME
    pairs with bit-identical cosines as the default."""
    kw = dict(threshold=0.4, exact=False, num_bits=48, bands=16)
    default = {
        (r["vec_a"], r["vec_b"]): r["cosine_sim"]
        for r in SIM.embedding_near_dup_pairs(emb, **kw).collect()
    }
    tiny = {
        (r["vec_a"], r["vec_b"]): r["cosine_sim"]
        for r in SIM.embedding_near_dup_pairs(
            emb, verify_chunk_cells=1, **kw
        ).collect()
    }
    assert default, "fixture must contain near-dup pairs at 0.4"
    assert tiny.keys() == default.keys()
    for k, v in default.items():
        assert tiny[k] == v  # bit-identical, not approximately equal


def test_banded_near_dup_rejects_ragged_prefilter_bits(spark, emb):
    """The Hamming gate counts whole packed 64-bit words; a non-multiple
    would silently count fewer bits than _prefilter_max_ham budgets for
    (weakened gate), so the operator must reject it loudly."""
    import pytest

    for bad in (100, 32, -64):
        with pytest.raises(ValueError, match="multiple of 64"):
            SIM.embedding_near_dup_pairs(emb, exact=False, prefilter_bits=bad)


def test_banded_near_dup_ignores_null_embeddings(spark, emb):
    """A null embedding row must not crash the signature UDF (numpy
    np.stack has no None handling) — it is dropped: null vectors can never
    be near-dups."""
    with_null = emb.unionByName(
        spark.createDataFrame(
            [(999_999, None)], schema=emb.select("vec_id", "embedding").schema
        ),
        allowMissingColumns=True,
    )
    out = SIM.embedding_near_dup_pairs(
        with_null, threshold=0.4, exact=False, num_bits=48, bands=16
    ).collect()
    assert all(r["vec_a"] != 999_999 and r["vec_b"] != 999_999 for r in out)
    baseline = SIM.embedding_near_dup_pairs(
        emb, threshold=0.4, exact=False, num_bits=48, bands=16
    ).collect()
    assert len(out) == len(baseline)


def test_banded_near_dup_adapts_to_regenerated_dim(spark):
    """The signature kernel derives the vector width from each Arrow batch
    (planes are deterministic per (bits, dim)), so a regenerated embeddings
    table with a different dimension keeps working instead of dying inside
    a shape-mismatched matmul — the testdata-drift failure mode."""
    import random

    random.seed(11)
    base = [random.uniform(-1, 1) for _ in range(32)]
    rows = [
        (i, [x + random.uniform(-0.05, 0.05) for x in base]) for i in range(20)
    ] + [(100 + i, [random.uniform(-1, 1) for _ in range(32)]) for i in range(20)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = SIM.embedding_near_dup_pairs(
        df, threshold=0.9, exact=False, num_bits=48, bands=16
    ).collect()
    # the 20 jittered copies of one base vector are mutual near-dups
    assert len(out) >= 150
    assert all(r["cosine_sim"] >= 0.9 for r in out)


def test_banded_near_dup_bucket_cap_star_guard(spark, emb):
    """Forcing a tiny bucket_cap must (a) keep output ⊆ the uncapped banded
    output (the star guard only removes pairs), (b) keep every surviving
    pair exactly verified, and (c) keep every anchor pair — the linear star
    candidates are exact-verified through the id-join tail (the grouped-map
    UDF materializes whole groups, so the cap is the task-memory guard)."""
    uncapped = {
        (r["vec_a"], r["vec_b"]): r["cosine_sim"]
        for r in SIM.embedding_near_dup_pairs(
            emb, threshold=0.4, exact=False, num_bits=48, bands=16,
            bucket_cap=None,
        ).collect()
    }
    capped = {
        (r["vec_a"], r["vec_b"]): r["cosine_sim"]
        for r in SIM.embedding_near_dup_pairs(
            emb, threshold=0.4, exact=False, num_bits=48, bands=16,
            bucket_cap=8,
        ).collect()
    }
    assert set(capped) <= set(uncapped)
    assert capped, "cap=8 must still find the anchor pairs"
    for k, v in capped.items():
        assert abs(v - uncapped[k]) < 1e-9


def test_ivf_fit_centroids_deterministic_and_bounded(spark, emb):
    c1 = SIM.ivf_fit_centroids(emb, n_centroids=8, lloyd_iters=2)
    c2 = SIM.ivf_fit_centroids(emb, n_centroids=8, lloyd_iters=2)
    rows1 = sorted(c1.collect(), key=lambda r: r["centroid_id"])
    rows2 = sorted(c2.collect(), key=lambda r: r["centroid_id"])
    assert len(rows1) <= 8 and len(rows1) > 0
    # exact-decimal Lloyd means → bit-identical refit
    assert [(r["centroid_id"], r["__cent"]) for r in rows1] == [
        (r["centroid_id"], r["__cent"]) for r in rows2
    ]
    dim = len(emb.first()["embedding"])
    assert all(len(r["__cent"]) == dim for r in rows1)


def test_ivf_topk_recall_and_shape(spark, emb):
    queries = emb.filter(F.col("vec_id") < 10)
    exact = SIM.cosine_topk(emb, queries, k=5).collect()
    approx = SIM.ivf_topk(emb, queries, k=5, n_centroids=16, n_probe=4).collect()
    # per-query rank sequence is dense 1..k and self-matches are excluded
    by_q = {}
    for r in approx:
        assert r["query_id"] != r["neighbor_id"]
        by_q.setdefault(r["query_id"], []).append(r["rank"])
    assert all(sorted(v) == list(range(1, len(v) + 1)) for v in by_q.values())
    exact_set = {(r["query_id"], r["neighbor_id"]) for r in exact}
    approx_set = {(r["query_id"], r["neighbor_id"]) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    # probing 4/16 data-adaptive cells: same contract as LSH — meaningful
    # recall at a fraction of the brute-force scoring cost.
    assert recall >= 0.3, f"recall {recall}"


def test_ivf_probe_all_cells_equals_exact(spark, emb):
    # n_probe == n_centroids degenerates to brute force → recall 1.0
    queries = emb.filter(F.col("vec_id") < 5)
    exact = SIM.cosine_topk(emb, queries, k=3).collect()
    full = SIM.ivf_topk(emb, queries, k=3, n_centroids=4, n_probe=4).collect()
    assert {(r["query_id"], r["neighbor_id"], r["rank"]) for r in exact} == {
        (r["query_id"], r["neighbor_id"], r["rank"]) for r in full
    }


def test_pandas_udf_cosine_equals_jvm_cosine(spark, emb):
    from etl_ecommerce_data_spark.functions.pandas_udfs import cosine_pandas
    from etl_ecommerce_data_spark.functions.vectors import to_double_array

    pairs = (
        emb.filter(F.col("vec_id") < 30)
        .select(F.col("vec_id").alias("ia"), to_double_array(F.col("embedding")).alias("va"))
        .crossJoin(
            emb.filter(F.col("vec_id").between(30, 40)).select(
                F.col("vec_id").alias("ib"), to_double_array(F.col("embedding")).alias("vb")
            )
        )
    )
    both = pairs.select(
        "ia",
        "ib",
        cosine(F.col("va"), F.col("vb")).alias("jvm"),
        cosine_pandas(F.col("va"), F.col("vb")).alias("py"),
    ).collect()
    assert len(both) > 0
    for r in both:
        assert abs(r["jvm"] - r["py"]) < 1e-12


def test_ivf_prefit_matches_inline(spark, emb):
    # The persisted-index probe path (ensure_ivf_index + ivf_topk_prefit)
    # must return exactly what the self-contained ivf_topk computes from the
    # same hyperparameters — the registered similarity_topk_ivf runs prefit.
    queries = emb.filter(F.col("vec_id") < 10)
    inline = SIM.ivf_topk(emb, queries, k=5, n_centroids=16, n_probe=4).collect()
    cents, asg = SIM.ensure_ivf_index(spark, emb, SF_SMOKE, n_centroids=16)
    prefit = SIM.ivf_topk_prefit(asg, cents, queries, k=5, n_probe=4).collect()
    key = lambda r: (r["query_id"], r["rank"])
    assert sorted(
        [(r["query_id"], r["neighbor_id"], r["rank"]) for r in prefit]
    ) == sorted([(r["query_id"], r["neighbor_id"], r["rank"]) for r in inline])
    got = {key(r): r["cosine_sim"] for r in prefit}
    for r in inline:
        assert abs(got[key(r)] - r["cosine_sim"]) < 1e-12


# --- Gram / PCA statistics ---------------------------------------------------

def test_gram_arrow_matches_quantized_and_numpy(spark, emb):
    import numpy as np

    vecs = np.stack([r["embedding"] for r in emb.select("embedding").collect()]).astype(
        np.float64
    )
    want = vecs.T @ vecs

    # Arrow partial-gram path: float-exact up to accumulation order.
    got_arrow = SIM.gram_upper_arrow(emb).collect()
    d = want.shape[0]
    g = np.zeros((d, d))
    for r in got_arrow:
        g[r["i"], r["j"]] = r["gram"]
    g = g + np.triu(g, 1).T
    assert np.allclose(g, want, rtol=1e-9, atol=1e-9)

    # Quantized verification path: within rows/2 quanta of scale*gram.
    got_q = {(r["i"], r["j"]): r["gram_q"] for r in SIM.gram_upper_quantized(emb).collect()}
    n = vecs.shape[0]
    for (i, j), q in got_q.items():
        assert abs(q - want[i, j] * 1e9) <= n / 2 + 1, (i, j)


def test_pca_variance_spectrum_properties(spark):
    from etl_ecommerce_data_spark.plans.queries import QUERIES

    rows = QUERIES["embedding_pca_variance"].builder(spark, SF_SMOKE).collect()
    vals = [r["eigenvalue"] for r in sorted(rows, key=lambda r: r["component"])]
    ratios = [r["explained_variance_ratio"] for r in sorted(rows, key=lambda r: r["component"])]
    # PSD spectrum, descending, ratios normalized.
    assert all(vals[k] >= vals[k + 1] - 1e-9 for k in range(len(vals) - 1))
    assert vals[-1] >= -1e-6
    assert abs(sum(ratios) - 1.0) < 1e-9
    # Trace == mean squared norm of the corpus (independent recomputation).
    import numpy as np

    emb2 = load_table(spark, SF_SMOKE, "embeddings")
    vecs = np.stack([r["embedding"] for r in emb2.select("embedding").collect()]).astype(
        np.float64
    )
    assert abs(sum(vals) - (vecs ** 2).sum() / len(vecs)) < 1e-6


def test_gram_arrow_ignores_null_embeddings(spark):
    import numpy as np

    rows = [(0, [1.0, 2.0]), (1, None), (2, [3.0, 4.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {(r["i"], r["j"]): r["gram"] for r in SIM.gram_upper_arrow(df).collect()}
    want = np.array([[1.0, 2.0], [3.0, 4.0]])
    w = want.T @ want
    assert got == {(0, 0): w[0, 0], (0, 1): w[0, 1], (1, 1): w[1, 1]}


def test_gram_quantized_skips_null_vectors(spark):
    # null embeddings are excluded from the cells AND from n_vectors: the
    # Gram summed only the non-null rows, so counting nulls would
    # understate any gram_q / (scale * n_vectors) normalization downstream
    # (contract revised in round 11; the Arrow path filters identically).
    rows = [(0, [1.0, 0.0]), (1, None)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {(r["i"], r["j"]): (r["gram_q"], r["n_vectors"])
           for r in SIM.gram_upper_quantized(df).collect()}
    assert got == {(0, 0): (10**9, 1), (0, 1): (0, 1), (1, 1): (0, 1)}


def test_mixed_width_embeddings_band_disjointly(spark):
    # Two uniform-width partitions (the partially-regenerated-files shape):
    # banding must never pair vectors across widths, and per-width near-dups
    # must still verify. Before the width-disjoint bucket fix this either
    # crashed np.stack in the Gram kernel or silently banded incomparable
    # signatures.
    w4 = spark.createDataFrame(
        [(0, [1.0, 2.0, 3.0, 4.0]), (1, [1.0, 2.0, 3.0, 4.0]), (2, [-4.0, 3.0, -2.0, 1.0])],
        "vec_id long, embedding array<double>",
    ).coalesce(1)
    w8 = spark.createDataFrame(
        [(10, [1.0] * 8), (11, [1.0] * 8), (12, [4.0, -3.0, 2.0, -1.0, 0.5, 0.5, -0.5, 0.5])],
        "vec_id long, embedding array<double>",
    ).coalesce(1)
    df = w4.unionByName(w8)
    for verify in ("bucket", "pairs"):
        pairs = {
            (r["vec_a"], r["vec_b"])
            for r in SIM.embedding_near_dup_pairs(
                df, threshold=0.99, exact=False, num_bits=16, bands=4, verify=verify
            ).collect()
        }
        assert (0, 1) in pairs and (10, 11) in pairs, verify
        for a, b in pairs:
            assert (a < 10) == (b < 10), f"cross-width pair {(a, b)} via {verify}"


def test_gram_arrow_mixed_widths_key_separately_and_pca_rejects(spark):
    import pytest as _pytest

    w2 = spark.createDataFrame(
        [(0, [1.0, 2.0])], "vec_id long, embedding array<double>"
    ).coalesce(1)
    w3 = spark.createDataFrame(
        [(1, [1.0, 2.0, 3.0])], "vec_id long, embedding array<double>"
    ).coalesce(1)
    rows = SIM.gram_upper_arrow(w2.unionByName(w3)).collect()
    # cells key on width: no (i, j) cell sums across coordinate systems
    assert {r["d"] for r in rows} == {2, 3}
    assert len([r for r in rows if r["d"] == 2]) == 3
    assert len([r for r in rows if r["d"] == 3]) == 6

    # and the PCA consumer rejects the mix loudly instead of eigensolving it
    from etl_ecommerce_data_spark.plans.queries import QUERIES  # noqa: F401
    import pandas as pd
    import numpy as np

    # drive the guard directly through the registered query on a scratch dir
    import os, tempfile, shutil

    tmp = tempfile.mkdtemp(prefix="mixed_emb_")
    try:
        w2.unionByName(w3).withColumn(
            "embedding", F.col("embedding").cast("array<float>")
        ).withColumn("label", F.lit("x")).write.parquet(
            os.path.join(tmp, "embeddings.parquet")
        )
        with _pytest.raises(Exception, match="mixed embedding widths"):
            QUERIES["embedding_pca_variance"].builder(spark, tmp).collect()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_lsh_topk_parameter_and_dim_guards(spark, emb):
    """A declared dim that mismatches the real embedding width null-pads the
    signature fold and collapses every vector into one bucket per band — the
    'LSH' silently becomes an all-pairs join. Fail loudly instead; same for
    a band count that doesn't divide num_bits."""
    q = emb.filter(F.col("vec_id") < 3)
    with pytest.raises(ValueError, match="-wide"):
        SIM.lsh_topk(emb, q, dim=128)
    with pytest.raises(ValueError, match="multiple of bands"):
        SIM.lsh_topk(emb, q, dim=64, num_bits=16, bands=5)


def test_near_dup_band_width_guards(spark, emb):
    """Zero-width bands put every row in one mega-bucket; a 64-bit band
    width overflows the width-folded bucket id — both raise with curated
    messages instead of degenerating or dying in py4j."""
    with pytest.raises(ValueError, match="multiple of"):
        SIM.embedding_near_dup_pairs(emb, exact=False, num_bits=16, bands=32)
    with pytest.raises(ValueError, match="exceeds 48"):
        SIM.embedding_near_dup_pairs(emb, exact=False, num_bits=64, bands=1)


def test_srp_kernel_handles_mixed_widths_within_one_batch(spark):
    """A partially regenerated table can interleave widths inside one Arrow
    batch: the kernel groups rows by width before the stack (no raw numpy
    shape crash) and the width-folded bucket ids keep the widths in
    disjoint buckets — pairs only ever form within one width."""
    import random

    rng = random.Random(7)
    rows = []
    for i in range(30):  # width 8: three near-identical families
        base = [rng.uniform(0.5, 1.0)] * 8
        rows.append((i, [v + rng.uniform(-0.01, 0.01) for v in base]))
    for i in range(30, 60):  # width 16, interleaved ids
        base = [rng.uniform(0.5, 1.0)] * 16
        rows.append((i, [v + rng.uniform(-0.01, 0.01) for v in base]))
    rng.shuffle(rows)
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>").coalesce(1)
    pairs = SIM.embedding_near_dup_pairs(
        df, threshold=0.9, exact=False, num_bits=16, bands=4
    ).collect()
    assert pairs  # near-identical families must surface
    for r in pairs:  # never across widths
        assert (r["vec_a"] < 30) == (r["vec_b"] < 30)


def test_ivf_rejects_duplicate_ids(spark):
    """An id-keyed index silently drops duplicate-id rows (the probe window
    partitions by id) — the exact path would score them, so the two paths
    would disagree beyond approximation. Raise at fit time."""
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (1, [0.0, 1.0]), (2, [1.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(ValueError, match="duplicate"):
        SIM.ivf_topk(df, df.filter(F.col("vec_id") == 2), k=1, n_centroids=2)

