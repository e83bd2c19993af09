"""Partition-independence: the engine's core determinism doctrine, tested.

SCALE.md claims results are independent of partitioning/arrival order (exact
decimal sums, deterministic survivors, hash-derived salts/signatures). These
tests run the same operator over aggressively different partitionings of the
same data and require BIT-IDENTICAL results — the property that makes outputs
stable across cluster sizes, AQE re-plans, and speculative re-execution at
100 TB.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_ecommerce_data_spark.operators import dedup as DD
from etl_ecommerce_data_spark.operators.cleaning import dedup_by_key
from etl_ecommerce_data_spark.operators.joins import asof_join
from etl_ecommerce_data_spark.sources.registry import load_table

from tests.conftest import SF_SMOKE


def _collect_sorted(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("parts", [1, 7, 64])
def test_exact_decimal_aggregation_partition_independent(spark, parts):
    li = load_table(spark, SF_SMOKE, "lineitem").repartition(parts)
    out = li.groupBy("l_returnflag").agg(
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double").alias("s")
    )
    got = {r["l_returnflag"]: r["s"] for r in out.collect()}
    if not hasattr(test_exact_decimal_aggregation_partition_independent, "_ref"):
        test_exact_decimal_aggregation_partition_independent._ref = got
    assert got == test_exact_decimal_aggregation_partition_independent._ref


@pytest.mark.parametrize("parts", [1, 13])
def test_dedup_survivor_partition_independent(spark, parts):
    df = spark.createDataFrame(
        [(k % 50, f"v{k}") for k in range(1000)], "k long, v string"
    ).repartition(parts)
    out = dedup_by_key(df, ["k"], order_by=["v"])
    got = _collect_sorted(out)
    if not hasattr(test_dedup_survivor_partition_independent, "_ref"):
        test_dedup_survivor_partition_independent._ref = got
    assert got == test_dedup_survivor_partition_independent._ref


@pytest.mark.parametrize("parts", [2, 32])
def test_minhash_pairs_partition_independent(spark, parts):
    docs = load_table(spark, SF_SMOKE, "documents").repartition(parts)
    got = _collect_sorted(DD.minhash_lsh_pairs(docs, threshold=0.7))
    if not hasattr(test_minhash_pairs_partition_independent, "_ref"):
        test_minhash_pairs_partition_independent._ref = got
    assert got == test_minhash_pairs_partition_independent._ref


@pytest.mark.parametrize("parts", [1, 5, 32])
def test_embedding_near_dup_partition_independent(spark, parts):
    """Input partitioning permutes the row order each (band, bucket) group
    hands the Gram kernel — np.stack order, chunk membership, gate blocking
    all shift. The round-6 fixed-shape per-pair re-verify makes the emitted
    pairs AND cosines bit-identical anyway (the same property the
    chunk_cells invariance pins on the memory axis, here on the
    partitioning axis)."""
    from etl_ecommerce_data_spark.operators import similarity as SIM

    emb = load_table(spark, SF_SMOKE, "embeddings").repartition(parts)
    got = _collect_sorted(
        SIM.embedding_near_dup_pairs(
            emb, threshold=0.4, exact=False, num_bits=48, bands=16
        )
    )
    ref_attr = test_embedding_near_dup_partition_independent
    if not hasattr(ref_attr, "_ref"):
        ref_attr._ref = got
    assert got == ref_attr._ref


def _with_conf(spark, key, value):
    import contextlib

    @contextlib.contextmanager
    def cm():
        old = spark.conf.get(key)
        spark.conf.set(key, value)
        try:
            yield
        finally:
            spark.conf.set(key, old)

    return cm()


def test_results_invariant_to_aqe_and_shuffle_partitions(spark):
    """The remaining runtime-config axes a cluster operator actually turns:
    AQE (runtime re-planning, partition coalescing, skew splits) and
    spark.sql.shuffle.partitions. Both change the physical plan and the
    per-task row grouping; neither may change a single emitted byte —
    exact decimal aggregation and the banded near-dup path checked."""
    from etl_ecommerce_data_spark.operators import similarity as SIM

    def run_both():
        li = load_table(spark, SF_SMOKE, "lineitem")
        agg = _collect_sorted(
            li.groupBy("l_returnflag").agg(
                F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
                .cast("double")
                .alias("s")
            )
        )
        emb = load_table(spark, SF_SMOKE, "embeddings")
        nd = _collect_sorted(
            SIM.embedding_near_dup_pairs(
                emb, threshold=0.4, exact=False, num_bits=48, bands=16
            )
        )
        return agg, nd

    ref = run_both()
    with _with_conf(spark, "spark.sql.adaptive.enabled", "false"):
        assert run_both() == ref
    with _with_conf(spark, "spark.sql.shuffle.partitions", "3"):
        assert run_both() == ref


def test_near_dup_invariant_to_arrow_batch_size(spark):
    """spark.sql.execution.arrow.maxRecordsPerBatch changes how many rows
    each pandas_udf invocation sees — the SRP signature matmul batch shape
    and the grouped-map row deliveries both shift. Per-row signatures come
    from a deterministic per-width plane matrix and per-pair cosines from a
    fixed-shape ddot, so a 16-row batch limit must reproduce the default's
    output bit-for-bit."""
    from etl_ecommerce_data_spark.operators import similarity as SIM

    def run():
        emb = load_table(spark, SF_SMOKE, "embeddings")
        nd = _collect_sorted(
            SIM.embedding_near_dup_pairs(
                emb, threshold=0.4, exact=False, num_bits=48, bands=16
            )
        )
        docs = load_table(spark, SF_SMOKE, "documents")
        sh = _collect_sorted(DD.simhash_pairs(docs, max_hamming=3))
        return nd, sh

    ref = run()
    with _with_conf(spark, "spark.sql.execution.arrow.maxRecordsPerBatch", "16"):
        assert run() == ref


@pytest.mark.parametrize("parts", [1, 16])
def test_asof_join_partition_independent(spark, parts):
    events = (
        load_table(spark, SF_SMOKE, "events")
        .select("event_id", "user_id", "ts")
        .repartition(parts)
    )
    orders = (
        load_table(spark, SF_SMOKE, "orders")
        .select(
            F.col("o_custkey").alias("user_id"),
            F.col("o_orderkey"),
            F.col("o_orderdate"),
        )
        .repartition(max(1, parts // 2))
    )
    out = asof_join(
        events, orders, key="user_id", left_time="ts", right_time="o_orderdate",
        right_cols=["o_orderkey", "o_orderdate"],
    )
    got = _collect_sorted(out)
    if not hasattr(test_asof_join_partition_independent, "_ref"):
        test_asof_join_partition_independent._ref = got
    assert got == test_asof_join_partition_independent._ref
