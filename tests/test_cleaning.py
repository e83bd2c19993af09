"""Silver cleaning operators on dirty Olist-shape fixtures (FIXTURES.md §A):
the reference-parity semantics (dropDuplicates, na.fill typing rules,
normalization, coalesce fallback) on data with actual dirt in it."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_ecommerce_data_spark.operators.cleaning import (
    cast_money,
    dedup_by_key,
    dedup_exact_rows,
    drop_null_rows,
    fill_nulls,
    filter_non_negative,
    filter_positive,
    normalize_strings,
    parse_timestamps,
    translate_with_fallback,
)


def _orders(spark):
    rows = [
        ("o1", "c1", "delivered", "2017-10-02 10:56:33"),
        ("o1", "c1", "delivered", "2017-10-02 10:56:33"),  # exact dup
        ("o2", "c2", None, "2018-07-24 20:41:37"),         # null status
        ("o3", "c3", "shipped", "not-a-date"),             # bad timestamp
    ]
    return spark.createDataFrame(
        rows, "order_id string, customer_id string, order_status string, order_purchase_timestamp string"
    )


def test_parse_timestamps_invalid_becomes_null(spark):
    df = parse_timestamps(_orders(spark), ["order_purchase_timestamp"])
    got = {r["order_id"]: r["order_purchase_timestamp"] for r in df.collect()}
    assert got["o3"] is None
    assert got["o2"].year == 2018


def test_dedup_exact_rows(spark):
    assert dedup_exact_rows(_orders(spark)).count() == 3


def test_fill_nulls_string_and_typing_rule(spark):
    df = fill_nulls(_orders(spark), {"order_status": "pending"})
    statuses = {r["order_id"]: r["order_status"] for r in df.collect()}
    assert statuses["o2"] == "pending"
    # na.fill typing rule: an int fill on a string column is a no-op (never an error)
    df2 = fill_nulls(_orders(spark), {"order_status": 0})
    assert {r["order_status"] for r in df2.collect()} >= {"delivered", "shipped", None} - {None}


def test_dedup_by_key_deterministic_survivor(spark):
    df = spark.createDataFrame(
        [("c1", "zeta"), ("c1", "alpha"), ("c2", "mid")], "customer_id string, city string"
    )
    first = dedup_by_key(df, ["customer_id"], order_by=["city"])
    got = {r["customer_id"]: r["city"] for r in first.collect()}
    assert got == {"c1": "alpha", "c2": "mid"}
    last = dedup_by_key(df, ["customer_id"], order_by=["city"], keep="last")
    got = {r["customer_id"]: r["city"] for r in last.collect()}
    assert got == {"c1": "zeta", "c2": "mid"}


def test_drop_null_rows_and_normalize(spark):
    df = spark.createDataFrame(
        [("c1", "  São Paulo ", " sp "), ("c2", None, "rj")],
        "customer_id string, customer_city string, customer_state string",
    )
    cleaned = drop_null_rows(df)
    assert cleaned.count() == 1
    norm = normalize_strings(
        cleaned, lower=["customer_city"], upper=["customer_state"],
        trim=["customer_city", "customer_state"],
    )
    row = norm.collect()[0]
    assert row["customer_city"] == "são paulo"
    assert row["customer_state"] == "SP"


def test_money_cast_and_filters(spark):
    df = spark.createDataFrame(
        [("i1", 10.555, 1.0), ("i2", -5.0, 2.0), ("i3", 20.0, -0.5), ("i4", 0.0, 0.0)],
        "id string, price double, freight_value double",
    )
    out = filter_non_negative(filter_positive(cast_money(df, ["price", "freight_value"]), "price"), "freight_value")
    rows = {r["id"]: r for r in out.collect()}
    assert set(rows) == {"i1"}
    assert str(rows["i1"]["price"]) == "10.56"  # DECIMAL(10,2) HALF_UP
    assert out.schema["price"].dataType.simpleString() == "decimal(10,2)"


def test_translate_with_fallback(spark):
    products = spark.createDataFrame(
        [("p1", "moveis"), ("p2", "esporte"), ("p3", None)],
        "product_id string, product_category_name string",
    )
    translation = spark.createDataFrame(
        [("moveis", "furniture")],
        "product_category_name string, product_category_name_english string",
    )
    out = translate_with_fallback(
        products, translation, "product_category_name",
        "product_category_name_english", "product_category_name",
    )
    got = {r["product_id"]: r["product_category_name_english"] for r in out.collect()}
    # translated / untranslated-fallback / null→fill
    assert got == {"p1": "furniture", "p2": "esporte", "p3": "unknown"}


def test_dedup_by_key_guards_and_tie_determinism(spark):
    """keep='last' with no ordering is meaningless (the dropDuplicates
    fallback keeps an arbitrary row) and invalid keep values must raise
    even on that path; rows tying on every order_by column get a
    deterministic full-row-tiebreak survivor, not a partition-order one."""
    import pytest

    from etl_ecommerce_data_spark.operators.cleaning import dedup_by_key

    df = spark.createDataFrame(
        [(1, "2024", "x"), (1, "2024", "y"), (2, "2023", "z")],
        "k long, ver string, payload string",
    )
    with pytest.raises(ValueError, match="requires order_by"):
        dedup_by_key(df, ["k"], keep="last")
    with pytest.raises(ValueError, match="first.*last"):
        dedup_by_key(df, ["k"], keep="banana")
    with pytest.raises(ValueError, match="reserves"):
        dedup_by_key(df.withColumnRenamed("payload", "__rn"), ["k"], order_by=["ver"])
    picks = {
        tuple(sorted((r["k"], r["payload"]) for r in
                     dedup_by_key(df.repartition(8), ["k"], order_by=["ver"]).collect()))
        for _ in range(3)
    }
    assert len(picks) == 1  # tie survivor stable across runs
    ((ka, pa), (kb, pb)) = next(iter(picks))
    assert {ka, kb} == {1, 2} and pa in ("x", "y")
