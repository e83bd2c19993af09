"""Incremental write semantics over a plain-parquet lakehouse.

The reference only ever full-refreshes (``mode("overwrite")`` at
``to_bronze.py:49``, ``to_silver.py:41``, ``to_gold.py:44``) — rewriting every
zone per run. At 100 TB a full refresh is the difference between touching
terabytes and touching the day's slice, so the engine adds the two incremental
patterns plain parquet can express safely:

- **Dynamic partition overwrite** (``overwrite_partitions``): replace only the
  storage partitions present in the incoming batch, leave the rest untouched.
  Spark-native (``spark.sql.sources.partitionOverwriteMode=dynamic``) —
  per-partition atomicity, no table-wide rewrite.
- **Merge/upsert** (``merge_upsert``): latest-version-wins per key, expressed
  as union + deterministic ``row_number`` pick. Without a transaction log
  (Delta/Iceberg are out of scope here) a safe in-place rewrite of the same
  path is impossible — lazy reads would race the overwrite — so the merge
  writes to a NEW snapshot directory and returns its path; the caller flips a
  pointer (or, partitioned, combines with ``overwrite_partitions`` to rewrite
  only affected partitions).

At cluster scale the same ``merge_upsert`` dataframe-level semantics port
directly onto Delta/Iceberg ``MERGE INTO``; the operator keeps the engine's
declared, testable behavior independent of the table format.
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def overwrite_partitions(
    df: DataFrame, path: str, partition_by: Sequence[str]
) -> None:
    """Overwrite ONLY the partitions present in ``df`` (dynamic mode); other
    partitions of the table keep their data.

    The dynamic mode is set as a PER-WRITER option, not by mutating the
    session conf: a set/restore around the write races with concurrent
    writers on a shared session (one thread's ``finally`` restoring
    ``static`` before another's job reads the conf turns that job into a
    whole-table wipe — the exact failure this function exists to prevent).
    An empty ``partition_by`` would degrade to the same full overwrite, so
    it fails fast instead."""
    if not partition_by:
        raise ValueError(
            "overwrite_partitions with no partition columns would replace "
            "the whole table — use a plain overwrite explicitly if that is "
            "intended"
        )
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_by)
        .parquet(path)
    )


def merge_dataframes(
    current: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
    version_col: str,
) -> DataFrame:
    """Latest-wins upsert as a pure transform: one row per key, the survivor
    being the greatest ``version_col`` with updates beating current on ties.

    Single shuffle on the keys, deterministic survivor at EVERY tie level
    (the reference's ``dropDuplicates([k])`` survivor is whichever
    partition wins the race — SURVEY §2.6 D2): version desc, then updates
    over current, then — for duplicate (key, version) rows WITHIN one
    relation, which well-formed batches should pre-deduplicate but the
    contract must not depend on — a total order over the full serialized
    row, so the pick can never flip between runs. The serialization is a
    per-row JVM expression (codegen'd, no shuffle of its own); exact
    duplicates serialize identically and are interchangeable survivors.
    """
    for c in ("__src", "__rn"):
        if c in current.columns or c in updates.columns:
            raise ValueError(
                f"merge_dataframes reserves column name {c!r}; rename it in "
                "the input (it would be silently overwritten and dropped)"
            )
    tagged = current.withColumn("__src", F.lit(0)).unionByName(
        updates.withColumn("__src", F.lit(1))
    )
    row_key = F.to_json(
        F.struct(*[c for c in tagged.columns if c != "__src"])
    )
    w = Window.partitionBy(*keys).orderBy(
        F.col(version_col).desc(), F.col("__src").desc(), row_key.desc()
    )
    return (
        tagged.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__src")
    )


def merge_upsert(
    spark: SparkSession,
    table_path: str,
    updates: DataFrame,
    keys: Sequence[str],
    version_col: str,
    snapshot: str = "snapshot",
) -> str:
    """Merge ``updates`` into the parquet table at ``table_path`` and write
    the result as a new UNIQUELY-NAMED snapshot directory next to it (never
    in place — a reader of ``table_path`` must not observe a
    half-overwritten table). Returns the snapshot path; the caller promotes
    it (rename / view flip) and retires the predecessor.

    The uuid suffix matters for the promote-then-merge-again cycle: a fixed
    sibling name would make the second merge overwrite the very snapshot
    the first one promoted — clobbering it under concurrent readers, or,
    when the promoted path IS the new ``table_path``, overwriting the path
    being lazily read (same isolation contract as ``compact_table``).
    """
    import uuid

    current = spark.read.parquet(table_path)
    merged = merge_dataframes(current, updates, keys, version_col)
    out = os.path.join(
        os.path.dirname(table_path.rstrip("/")),
        f"{snapshot}_{uuid.uuid4().hex[:8]}.parquet",
    )
    merged.write.mode("overwrite").parquet(out)
    return out


def compact_table(
    spark: SparkSession,
    table_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_within_by: list[str] | None = None,
    partition_by: Sequence[str] | None = None,
) -> tuple[str, int]:
    """Small-file compaction for a plain-parquet table — the maintenance op
    every incremental sink needs: streaming/upsert writers accumulate files
    far below scan granularity (each file under ``maxPartitionBytes`` costs
    a task and a footer read), so periodic compaction rewrites the table at
    ~``target_file_bytes`` per file.

    Output-file count is sized from the table's ACTUAL on-disk bytes (file
    metadata, no data scan), read through the Hadoop FileSystem API so any
    table URI Spark can read (file://, hdfs://, s3a://) is sized correctly —
    a driver-local directory walk would silently report 0 bytes for a remote
    store and collapse the whole table into one file/task. A table with no
    parquet files raises instead of guessing. The rewrite is one snapshot
    write to a sibling directory — never in place, same crash-safety
    contract as ``merge_upsert``. ``sort_within_by`` optionally sorts within
    output files (restores min-max pruning after appends interleave key
    ranges — compose with zorder keys for 2-D layouts).

    Hive-partitioned tables MUST pass ``partition_by`` (their partition
    columns): the read infers partition columns as ordinary data columns,
    so a rewrite without ``partitionBy`` would silently flatten the layout
    — the compacted snapshot would lose directory-level partition pruning
    and no longer compose with ``overwrite_partitions``. Returns
    ``(new_snapshot_path, n_output_files)``.
    """
    import uuid

    jpath = spark._jvm.org.apache.hadoop.fs.Path(table_path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    it = fs.listFiles(jpath, True)  # raises FileNotFoundException if absent
    size = 0
    while it.hasNext():
        st = it.next()
        if st.getPath().getName().endswith(".parquet"):
            size += st.getLen()
    if size == 0:
        # distinct from the Hadoop FileNotFoundException listFiles raises
        # for a MISSING path: the path exists but holds no parquet bytes
        # (parquet-free dir, or zero-length placeholder files)
        raise ValueError(
            f"compact_table: no parquet bytes under {table_path!r} "
            "(parquet-free or empty-file table; nothing to compact)"
        )
    n_files = max(1, -(-size // target_file_bytes))  # ceil

    df = spark.read.parquet(table_path)
    out = f"{table_path.rstrip('/')}_compact_{uuid.uuid4().hex[:8]}"
    if partition_by:
        # n_files per PARTITION would over-shard; repartition on the
        # partition columns co-locates each hive partition's rows so the
        # layout-preserving rewrite emits one file per partition chunk
        writer = df.repartition(n_files, *partition_by)
    else:
        writer = df.repartition(n_files)
    if sort_within_by:
        writer = writer.sortWithinPartitions(*sort_within_by)
    w = writer.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(out)
    return out, n_files
