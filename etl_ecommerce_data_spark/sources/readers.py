"""Connectors: parquet (primary), CSV ingest, JDBC (optional, partitioned).

Reference behavior being re-expressed (and fixed):
- CSV ingest with ``inferSchema=True`` (``to_bronze.py:39``) → here CSV reads
  take an explicit schema (one less full pass; deterministic types).
- JDBC reads with no partitioning options (``to_silver.py:22-30``,
  ``to_gold.py:25-33``) serialize each table through ONE task. Here JDBC reads
  require a numeric ``partition_column`` + bounds when parallelism is wanted,
  so the scan fans out across executors.
- All sinks were Postgres-overwrite (``to_bronze.py:41-50``). The engine's
  primary sink is partitioned parquet (splittable, columnar, predicate
  pushdown on re-read); JDBC write is retained as a connector.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_parquet_table(
    spark: SparkSession, path: str, schema: T.StructType | None = None
) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.parquet(path)


def write_parquet_table(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """Parquet sink; ``partition_by`` gives storage-level partition pruning
    (e.g. by order date) which the reference's Postgres zones never had."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def read_csv_table(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
    **options: str,
) -> DataFrame:
    """CSV scan with a declared schema (replaces to_bronze.py:39 inference)."""
    return spark.read.options(header=str(header).lower(), **options).schema(schema).csv(path)


class QuarantinedRead:
    """Handle returned by ``read_csv_with_quarantine``: ``.good`` /
    ``.bad`` frames plus ``.release()`` to unpersist the shared cached
    parse once both sides are consumed. Unpacks as a 2-tuple
    (``good, bad = read_csv_with_quarantine(...)``) so split-only callers
    stay simple; the handle — not the frames — owns the cache, so any
    select/filter over the returned frames can't orphan it (a dynamic
    attribute on the frames themselves would vanish on the first
    transformation and silently leak the cache for the session)."""

    def __init__(self, good: DataFrame, bad: DataFrame, parsed: DataFrame):
        self.good = good
        self.bad = bad
        self._parsed = parsed

    def __iter__(self):
        return iter((self.good, self.bad))

    def release(self) -> None:
        """Unpersist the cached parse backing both frames."""
        self._parsed.unpersist()

    # context-manager form releases the cache even on error paths:
    #   with read_csv_with_quarantine(...) as split: ...
    def __enter__(self) -> "QuarantinedRead":
        return self

    def __exit__(self, *exc) -> None:
        self.release()


def read_csv_with_quarantine(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
    **options: str,
) -> QuarantinedRead:
    """CSV scan that splits malformed rows into a quarantine frame instead
    of silently nulling them (PERMISSIVE default) or dropping them
    (DROPMALFORMED): returns a ``QuarantinedRead`` whose ``good`` frame has
    exactly ``schema`` and whose ``bad`` frame carries the raw offending
    line as ``raw_record``. The reference ingests with inference and no
    policy at all (`to_bronze.py:39`) — a malformed line there corrupts
    types for the whole load.

    The parsed frame is cached for the two-way split: Spark refuses plans
    that filter on the internal corrupt-record column of an un-materialized
    CSV relation (SPARK-21610), and the cache also keeps the split one scan
    instead of two. At 100 TB the same split runs as one pass per batch
    with both sides written out — the cache is batch-sized, not
    corpus-sized, because ingest is incremental.
    """
    reserved = {"mode", "columnNameOfCorruptRecord"} & set(options)
    if reserved:
        # these two ARE the quarantine mechanism — forwarding an override
        # would either crash with an opaque duplicate-kwarg TypeError or
        # silently break the good/bad split contract
        raise ValueError(
            f"read_csv_with_quarantine sets {sorted(reserved)} itself "
            "(PERMISSIVE + _corrupt_record are the quarantine mechanism); "
            "use read_csv_table for custom malformed-row policies"
        )
    aug = T.StructType(
        list(schema.fields) + [T.StructField("_corrupt_record", T.StringType())]
    )
    parsed = (
        spark.read.options(
            header=str(header).lower(),
            mode="PERMISSIVE",
            columnNameOfCorruptRecord="_corrupt_record",
            **options,
        )
        .schema(aug)
        .csv(path)
        .cache()
    )
    good = parsed.filter(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    bad = parsed.filter(F.col("_corrupt_record").isNotNull()).select(
        F.col("_corrupt_record").alias("raw_record")
    )
    # the handle owns the cached parse so a multi-table ingest loop can
    # release it once both sides are consumed instead of pinning every raw
    # CSV in executor storage for the session
    return QuarantinedRead(good, bad, parsed)


def read_json_table(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    **options: str,
) -> DataFrame:
    """JSON-lines scan with a declared schema. Schema is mandatory: JSON
    inference is a full extra pass AND type-unstable across files (an
    all-null column in one file infers string) — unacceptable at 100 TB."""
    return spark.read.options(**options).schema(schema).json(path)


def write_json_table(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """JSON-lines sink (interchange format; parquet stays the analytics
    format — JSON has no column pruning/statistics)."""
    df.write.mode(mode).json(path)


def read_orc_table(
    spark: SparkSession, path: str, schema: T.StructType | None = None
) -> DataFrame:
    """ORC scan — same splittable/columnar/pushdown properties as parquet,
    for interop with Hive-era lakes."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def write_orc_table(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)


def read_binary_files(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
) -> DataFrame:
    """Binary-file scan (built-in ``binaryFile`` source): one row per file
    with (path, modificationTime, length, content) — the ingestion edge for
    multimodal payloads (images/audio) before they enter the media contract
    (multimodal.attach_media_columns). Files are NOT splittable: parallelism
    is per-file, so shard large corpora into many objects at write time."""
    reader = spark.read.format("binaryFile")
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


def read_text_table(
    spark: SparkSession, path: str, whole_file: bool = False
) -> DataFrame:
    """Plain-text scan (built-in ``text`` source): one row per line, or one
    row per file with ``whole_file`` (raw-document ingestion). Single
    ``value`` string column; attach ids/metadata downstream."""
    return spark.read.text(path, wholetext=whole_file)


def avro_available(spark: SparkSession) -> bool:
    """The Avro connector (spark-avro) is an external module since Spark 2.4
    and is not bundled in every distribution (absent in this sandbox).

    The probe FAILS CLOSED: availability is asserted only on the positive
    signal that the data source resolved and then hit the deliberately
    missing probe path (PATH_NOT_FOUND). Classifying the other way round
    ("message doesn't say 'Failed to find data source' → available") made
    any wording drift — Spark error-class rework, locale, a broken
    classpath's ClassNotFoundException — report a missing module as
    present, sending callers past the NotImplementedError gate into raw
    lookup failures."""
    try:
        spark.read.format("avro").load("/nonexistent-avro-probe")
    except Exception as e:  # noqa: BLE001 - classify by signal
        msg = str(e)
        return "PATH_NOT_FOUND" in msg or "Path does not exist" in msg
    return True  # pragma: no cover


def read_avro_table(spark: SparkSession, path: str) -> DataFrame:
    """Avro scan — gated: raises a clear error when the spark-avro module is
    not deployed (add the spark-avro package at submit time on a cluster)."""
    if not avro_available(spark):
        raise NotImplementedError(
            "spark-avro module not deployed; submit with the spark-avro "
            "package to enable Avro reads"
        )
    return spark.read.format("avro").load(path)  # pragma: no cover


def read_jdbc_table(
    spark: SparkSession,
    url: str,
    table: str,
    user: str,
    password: str,
    driver: str = "org.postgresql.Driver",
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 16,
    fetchsize: int = 10_000,
) -> DataFrame:
    """Partitioned JDBC scan.

    With ``partition_column`` + bounds Spark issues ``num_partitions`` range
    predicates in parallel — the fix for the reference's single-task reads.
    """
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("user", user)
        .option("password", password)
        .option("driver", driver)
        .option("fetchsize", str(fetchsize))
    )
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError("partitioned JDBC read needs lower_bound/upper_bound")
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    return reader.load()


def write_jdbc_table(
    df: DataFrame,
    url: str,
    table: str,
    user: str,
    password: str,
    driver: str = "org.postgresql.Driver",
    mode: str = "overwrite",
    batchsize: int = 10_000,
) -> None:
    """JDBC sink (connector parity with to_bronze.py:41-50, plus batching)."""
    (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("user", user)
        .option("password", password)
        .option("driver", driver)
        .option("batchsize", str(batchsize))
        .option("stringtype", "unspecified")
        .mode(mode)
        .save()
    )
