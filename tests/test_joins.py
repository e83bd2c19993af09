"""Join operators: as-of correctness (incl. ties and no-match), salted join
equivalence with a plain join."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from etl_ecommerce_data_spark.operators.joins import asof_join, broadcast_join, salted_join


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_asof_join_basic_tie_and_miss(spark):
    left = spark.createDataFrame(
        [
            (1, 10, _ts("2024-01-05T00:00:00")),  # after two orders
            (2, 10, _ts("2024-01-01T00:00:00")),  # exactly at an order ts (inclusive)
            (3, 11, _ts("2024-01-01T00:00:00")),  # user with no orders → null
            (4, 10, _ts("2023-12-31T00:00:00")),  # before any order → null
        ],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, 100, _ts("2024-01-01T00:00:00")),
            (10, 101, _ts("2024-01-01T00:00:00")),  # tie: greater key must win
            (10, 102, _ts("2024-01-03T00:00:00")),
        ],
        "user_id long, o_orderkey long, o_orderdate timestamp",
    )
    out = asof_join(
        left, right, key="user_id", left_time="ts", right_time="o_orderdate",
        right_cols=["o_orderkey", "o_orderdate"],
    )
    got = {r["event_id"]: r["o_orderkey"] for r in out.collect()}
    assert got == {1: 102, 2: 101, 3: None, 4: None}
    assert out.count() == left.count()  # as-of never fans out


def test_asof_join_tolerance_filters_stale_matches(spark):
    """tolerance_expr runs over the output columns: rows whose matched order
    is older than the bound (or unmatched, where the expr is null) are
    dropped — the staleness-gate composition the operator documents."""
    left = spark.createDataFrame(
        [
            (1, 10, _ts("2024-01-05T00:00:00")),  # 2 days after last order
            (2, 10, _ts("2024-01-10T00:00:00")),  # 7 days after → stale
            (3, 11, _ts("2024-01-01T00:00:00")),  # no orders → null → dropped
        ],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(10, 102, _ts("2024-01-03T00:00:00"))],
        "user_id long, o_orderkey long, o_orderdate timestamp",
    )
    out = asof_join(
        left, right, key="user_id", left_time="ts", right_time="o_orderdate",
        right_cols=["o_orderkey", "o_orderdate"],
        tolerance_expr="o_orderdate >= ts - INTERVAL 3 DAYS",
    )
    got = {r["event_id"]: r["o_orderkey"] for r in out.collect()}
    assert got == {1: 102}


def test_asof_join_matched_row_stays_whole(spark):
    """The matched right row travels as one struct: a NULL in one right column
    must NOT be papered over with a stale value from an older right row, and
    at equal right_time all output columns come from the same (tiebreak-
    winning) row — the column-mixing bug flagged in round-1 ADVICE."""
    left = spark.createDataFrame(
        [(1, 10, _ts("2024-01-05T00:00:00")), (2, 10, _ts("2024-01-02T00:00:00"))],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            # older row: both columns set
            (10, 100, "old-note", _ts("2024-01-01T00:00:00")),
            # newer matched row: note is genuinely NULL → output note must be NULL
            (10, 102, None, _ts("2024-01-03T00:00:00")),
            # tie at the same ts: key 102 wins the tiebreak; its note (NULL)
            # must come along, not 101's.
            (10, 101, "tie-note", _ts("2024-01-03T00:00:00")),
        ],
        "user_id long, o_orderkey long, note string, o_orderdate timestamp",
    )
    out = asof_join(
        left, right, key="user_id", left_time="ts", right_time="o_orderdate",
        right_cols=["o_orderkey", "note", "o_orderdate"],
    )
    rows = {r["event_id"]: r for r in out.collect()}
    assert rows[1]["o_orderkey"] == 102
    assert rows[1]["note"] is None  # genuine NULL preserved, no stale carry
    assert rows[2]["o_orderkey"] == 100
    assert rows[2]["note"] == "old-note"


def test_range_join_rejects_outer(spark):
    import pytest

    from etl_ecommerce_data_spark.operators.joins import range_join

    left = spark.createDataFrame([(1, _ts("2024-01-01T00:00:00"))], "l_id long, lt timestamp")
    right = spark.createDataFrame([(2, _ts("2024-01-01T00:01:00"))], "r_id long, rt timestamp")
    with pytest.raises(ValueError, match="inner"):
        range_join(left, right, "lt", "rt", 0.0, 600.0, how="left")


def test_connected_components_raises_on_iteration_cap(spark):
    import pytest

    from etl_ecommerce_data_spark.operators.dedup import connected_components

    # A 6-node chain needs ~5 propagation rounds; cap at 2 → must raise, not
    # silently emit non-minimal labels.
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(5)], "doc_a long, doc_b long"
    )
    nodes = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
    with pytest.raises(RuntimeError, match="converge"):
        connected_components(edges, nodes, max_iters=2)


def test_asof_join_matches_pandas_merge_asof(spark):
    """Independent oracle: random keyed event/order data, compared against
    pandas.merge_asof (backward, inclusive). Ties are aligned by sorting the
    right side so pandas' last-match-wins picks the greatest tiebreak — the
    engine's documented tie rule."""
    import random

    import pandas as pd

    rng = random.Random(20240813)
    base = dt.datetime(2024, 1, 1)
    lrows = [
        (i, rng.randrange(6), base + dt.timedelta(seconds=rng.randrange(0, 86400, 600)))
        for i in range(400)
    ]
    rrows = [
        (rng.randrange(6), 1000 + i, base + dt.timedelta(seconds=rng.randrange(0, 86400, 600)))
        for i in range(200)
    ]
    left = spark.createDataFrame(lrows, "event_id long, k long, ts timestamp")
    right = spark.createDataFrame(rrows, "k long, okey long, ots timestamp")
    got = {
        r["event_id"]: r["okey"]
        for r in asof_join(
            left, right, key="k", left_time="ts", right_time="ots",
            right_cols=["okey", "ots"],
        ).collect()
    }
    lpd = pd.DataFrame(lrows, columns=["event_id", "k", "ts"]).sort_values("ts")
    rpd = (
        pd.DataFrame(rrows, columns=["k", "okey", "ots"])
        .sort_values(["ots", "okey"])  # last match at equal ots = max okey
        .reset_index(drop=True)
    )
    merged = pd.merge_asof(
        lpd, rpd, left_on="ts", right_on="ots", by="k", direction="backward"
    )
    want = {
        int(r.event_id): (None if pd.isna(r.okey) else int(r.okey))
        for r in merged.itertuples()
    }
    assert got == want


def test_salted_join_matches_plain_join(spark):
    left = spark.range(0, 1000).withColumn("k", (F.col("id") % 7).cast("long"))
    right = spark.createDataFrame([(int(i), f"v{i}") for i in range(7)], "k long, v string")
    plain = left.join(right, "k").select("id", "v")
    salted = salted_join(left, right, "k", salt_buckets=8).select("id", "v")
    assert sorted(plain.collect()) == sorted(salted.collect())


def test_broadcast_join_dedups_using_column(spark):
    fact = spark.createDataFrame([(1, "a"), (2, "b")], "k long, x string")
    dim = spark.createDataFrame([(1, "d1")], "k long, d string")
    out = broadcast_join(fact, dim, "k", "left")
    assert out.columns.count("k") == 1
    assert "BroadcastHashJoin" in out._jdf.queryExecution().executedPlan().toString()


def test_range_join_matches_naive_nonequi(spark):
    import random

    rng = random.Random(7)
    base = dt.datetime(2024, 1, 1)
    left = spark.createDataFrame(
        [(i, rng.randrange(5), base + dt.timedelta(seconds=rng.randrange(86400)))
         for i in range(300)],
        "l_id long, k long, lt timestamp",
    )
    right = spark.createDataFrame(
        [(i, rng.randrange(5), base + dt.timedelta(seconds=rng.randrange(86400)))
         for i in range(300)],
        "r_id long, k long, rt timestamp",
    )
    from etl_ecommerce_data_spark.operators.joins import range_join

    got = range_join(left, right, "lt", "rt", 0.0, 600.0, on="k").select("l_id", "r_id")
    naive = left.join(
        right,
        (left["k"] == right["k"])
        & (right["rt"] >= left["lt"])
        & (right["rt"] <= left["lt"] + F.expr("INTERVAL 600 SECONDS")),
    ).select("l_id", "r_id")
    assert sorted(got.collect()) == sorted(naive.collect())
    assert got.count() > 0  # the fixture actually exercises matches


def test_range_join_negative_band_and_bucket_boundary(spark):
    # Exact bucket-boundary times and a band that looks backwards in time.
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01T00:10:00")), (2, _ts("2024-01-01T00:00:00"))],
        "l_id long, lt timestamp",
    )
    right = spark.createDataFrame(
        [(100, _ts("2024-01-01T00:00:00")), (101, _ts("2024-01-01T00:10:00")),
         (102, _ts("2024-01-01T00:05:00")), (103, _ts("2023-12-31T23:59:59"))],
        "r_id long, rt timestamp",
    )
    from etl_ecommerce_data_spark.operators.joins import range_join

    # right_time in [left_time - 600s, left_time] (backward-looking band)
    out = range_join(left, right, "lt", "rt", -600.0, 0.0)
    got = sorted((r["l_id"], r["r_id"]) for r in out.collect())
    assert got == [(1, 100), (1, 101), (1, 102), (2, 100), (2, 103)]


def test_salted_join_rejects_right_preserving_joins(spark):
    import pytest

    """The replicated right side would emit every unmatched right key once
    per salt bucket under right/full joins — silently wrong multisets."""
    from etl_ecommerce_data_spark.operators.joins import salted_join

    l = spark.createDataFrame([(1, "a")], "k long, v string")
    r = spark.createDataFrame([(1, "x"), (2, "y")], "k long, w string")
    for bad in ("right", "full", "full_outer"):
        with pytest.raises(ValueError, match="left-preserving"):
            salted_join(l, r, "k", how=bad)
    # left outer stays correct: the unmatched LEFT row appears exactly once
    got = sorted(
        (row["k"], row["w"]) for row in
        salted_join(
            spark.createDataFrame([(1, "a"), (3, "b")], "k long, v string"),
            r, "k", how="left",
        ).collect()
    )
    assert got == [(1, "x"), (3, None)]
    # Spark's own left-preserving aliases 'semi' and 'anti' must pass the
    # guard (they normalize to left_semi/left_anti, for which the salting
    # is correct; ADVICE r11) — and produce the right multisets
    l2 = spark.createDataFrame([(1, "a"), (3, "b")], "k long, v string")
    semi = sorted(r2["k"] for r2 in salted_join(l2, r, "k", how="semi").collect())
    anti = sorted(r2["k"] for r2 in salted_join(l2, r, "k", how="anti").collect())
    assert semi == [1] and anti == [3]


def test_range_join_rejects_reversed_band(spark):
    import pytest

    """Swapped bounds made the bucket sequence explode one element per
    microsecond per right row — a clear error beats an executor OOM for a
    trivially-empty result."""
    from etl_ecommerce_data_spark.operators.joins import range_join

    df = spark.createDataFrame([(1,)], "k long").selectExpr(
        "k", "timestamp'2024-01-01' AS t"
    )
    with pytest.raises(ValueError, match="reversed"):
        range_join(df, df.withColumnRenamed("t", "t2"), "t", "t2", 600.0, 0.0, on="k")


def test_asof_join_ignores_null_key_and_null_time_right_rows(spark):
    """SQL as-of semantics: NULL = NULL never matches, and a NULL right
    time is not 'earliest' — it previously sorted first and carried its
    payload onto every left row preceding any real right row."""
    import datetime

    from etl_ecommerce_data_spark.operators.joins import asof_join

    def ts(h):
        return datetime.datetime(2024, 1, 1, h)

    left = spark.createDataFrame(
        [(1, ts(5)), (None, ts(5))], "k long, lt timestamp"
    )
    right = spark.createDataFrame(
        [(1, None, 99.0), (None, ts(1), 77.0), (1, ts(9), 11.0)],
        "k long, rt timestamp, v double",
    )
    out = {r["k"]: r["v"] for r in asof_join(left, right, "k", "lt", "rt", ["v"]).collect()}
    # k=1: the only valid right rows are (NULL time -> dropped) and ts(9)
    # which is AFTER lt -> no match; NULL-key left row matches nothing
    assert out == {1: None, None: None}


def test_cosine_pandas_nulls_on_malformed_vectors(spark):
    """Mismatched widths aborted the task (np.dot shape error) and null
    elements poisoned results with NaN — both are NULL under the JVM
    twin's contract, so the reference UDF must match."""
    from etl_ecommerce_data_spark.functions.pandas_udfs import cosine_pandas

    df = spark.createDataFrame(
        [([1.0, 2.0], [1.0, 2.0, 3.0]), ([1.0, None], [1.0, 2.0]), ([1.0, 0.0], [1.0, 0.0])],
        "a array<double>, b array<double>",
    )
    got = [r["c"] for r in df.select(cosine_pandas("a", "b").alias("c")).collect()]
    assert got[0] is None and got[1] is None and abs(got[2] - 1.0) < 1e-12


def test_chunk_udtf_rejects_non_positive_size_and_ewma_takes_string_keys(spark):
    import pytest

    from etl_ecommerce_data_spark.functions.pandas_udfs import chunk_udtf, user_value_ewma

    with pytest.raises(ValueError, match="positive"):
        chunk_udtf(0)
    ev = spark.createDataFrame(
        [("s1", 1, 1, 10.0), ("s1", 2, 2, 20.0), ("s2", 1, 3, 5.0)],
        "session_id string, ts long, event_id long, value double",
    )
    out = {r["session_id"]: r["ewma_value"]
           for r in user_value_ewma(ev, alpha=0.5, key_col="session_id").collect()}
    assert abs(out["s1"] - 15.0) < 1e-12 and out["s2"] == 5.0
