"""Structured Streaming equals batch; multimodal mapInPandas plumbing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_ecommerce_data_spark.multimodal import (
    FEATURE_SCHEMA,
    attach_media_columns,
    decode_image,
    extract_features,
)
from etl_ecommerce_data_spark.sources.registry import load_table
from etl_ecommerce_data_spark.streaming.events import run_windowed_stream_to_memory
from etl_ecommerce_data_spark.testing import normalize

from tests.conftest import SF_SMOKE


def test_streaming_window_agg_equals_batch(spark):
    stream_out = run_windowed_stream_to_memory(spark, SF_SMOKE)
    ev = load_table(spark, SF_SMOKE, "events")
    batch = (
        ev.groupBy(F.window("ts", "5 minutes").start.alias("window_start"), "event_type")
        .agg(
            F.count("event_id").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
    )
    assert normalize(stream_out) == normalize(batch)


def test_multimodal_feature_extraction(spark):
    docs = load_table(spark, SF_SMOKE, "documents").limit(20)
    media = attach_media_columns(
        docs.withColumn("payload", F.encode(F.col("text"), "UTF-8")),
        id_col="doc_id", payload_col="payload", media_type="text/plain", source_col="source",
    )
    feats = extract_features(media, dim=8)
    assert feats.schema == FEATURE_SCHEMA
    rows = feats.collect()
    assert len(rows) == 20
    for r in rows:
        assert r["media_type"] == "text/plain"
        assert len(r["feature"]) == 8
        assert abs(sum(r["feature"]) - 1.0) < 1e-9  # histogram normalized
        assert r["n_bytes"] > 0


def test_decode_image_is_explicit_stub(spark):
    docs = load_table(spark, SF_SMOKE, "documents").limit(1)
    with pytest.raises(NotImplementedError, match="PIL"):
        decode_image(docs)


def test_stateful_user_stats_across_micro_batches(spark, tmp_path):
    """State must carry across micro-batches: 3 files → 3 batches, the final
    update per user equals the all-data aggregate."""
    import uuid

    from etl_ecommerce_data_spark.streaming.events import user_running_stats

    rows = [(u, float(v) / 100.0) for u in range(5) for v in range(100, 1300, 100)]
    src = str(tmp_path / "src")
    spark.createDataFrame(rows, "user_id long, value double").repartition(3).write.parquet(src)
    stream = (
        spark.readStream.schema("user_id long, value double")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    name = f"t_{uuid.uuid4().hex[:8]}"
    q = (
        user_running_stats(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
        assert len(q.recentProgress) >= 3  # really ran multiple micro-batches
    finally:
        q.stop()
    out = spark.table(name).collect()
    final = {}
    for r in out:  # keep the emission with the highest running count per user
        if r["user_id"] not in final or r["n_events"] > final[r["user_id"]]["n_events"]:
            final[r["user_id"]] = r
    assert len(final) == 5
    for u, r in final.items():
        assert r["n_events"] == 12
        assert abs(r["total_value"] - 78.0) < 1e-12


def test_streaming_dedup_drops_cross_batch_duplicates(spark, tmp_path):
    import datetime as dt
    import uuid

    from etl_ecommerce_data_spark.streaming.events import dedup_events_stream

    base = dt.datetime(2024, 1, 1)
    rows = [(i, base + dt.timedelta(seconds=i), i % 3) for i in range(20)]
    src = tmp_path / "src"
    src.mkdir()
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long")
    # same 20 events written twice → two micro-batches with full duplicates
    df.coalesce(1).write.parquet(str(src / "a"))
    df.coalesce(1).write.parquet(str(src / "b"))
    stream = (
        spark.readStream.schema("event_id long, ts timestamp, user_id long")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src / "*"))
    )
    name = f"t_{uuid.uuid4().hex[:8]}"
    q = (
        dedup_events_stream(stream)
        .select("event_id")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = sorted(r["event_id"] for r in spark.table(name).collect())
    assert got == list(range(20))


def test_resize_grayscale_nearest_neighbor(spark):
    import numpy as np

    from etl_ecommerce_data_spark.multimodal import resize_grayscale

    img = np.arange(16, dtype=np.uint8).reshape(4, 4)  # 4x4 gradient
    rows = [
        (1, img.tobytes(), 4, 4),
        (2, b"short", 4, 4),  # corrupt: wrong byte count -> null payload
        (3, None, 4, 4),
    ]
    media = spark.createDataFrame(
        rows, "media_id long, payload binary, width int, height int"
    )
    out = {r["media_id"]: r for r in resize_grayscale(media, "width", "height", 2, 2).collect()}
    want = img[[0, 2]][:, [0, 2]]  # nearest-neighbor: rows 0,2 / cols 0,2
    assert bytes(out[1]["payload"]) == want.tobytes()
    assert out[1]["width"] == 2 and out[1]["height"] == 2
    assert out[2]["payload"] is None and out[3]["payload"] is None


def test_resample_pcm_decimation(spark):
    import numpy as np

    from etl_ecommerce_data_spark.multimodal import resample_pcm

    samples = np.arange(10, dtype="<i2")
    rows = [(1, samples.tobytes() + b"\x07"), (2, None)]  # odd trailing byte
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    out = {r["media_id"]: r for r in resample_pcm(media, every_n=2).collect()}
    assert np.frombuffer(bytes(out[1]["payload"]), dtype="<i2").tolist() == [0, 2, 4, 6, 8]
    assert out[2]["payload"] is None


def test_transform_with_state_map_counts(spark):
    """transformWithStateInPandas (arbitrary-state v2, typed MapState): equals
    the batch GROUP BY twin. Capability-gated: the TWS driver worker needs
    google.protobuf, absent in this sandbox (same gate as the Avro source)."""
    import pytest

    try:
        import google.protobuf  # noqa: F401
    except ImportError:
        pytest.skip("google.protobuf not available - transformWithState gated")

    from pyspark.sql import functions as F

    from etl_ecommerce_data_spark.sources.registry import load_table
    from etl_ecommerce_data_spark.streaming.events import (
        run_user_type_counts_tws_to_memory,
    )
    from etl_ecommerce_data_spark.testing import normalize

    out = run_user_type_counts_tws_to_memory(spark, SF_SMOKE)
    batch = (
        load_table(spark, SF_SMOKE, "events")
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    )
    assert normalize(out) == normalize(batch)


def test_streaming_restart_recovers_offsets_exactly_once(spark, tmp_path):
    """Kill-and-restart fault tolerance, the 100 TB operational contract:
    a file-source stream with a checkpoint processes two files, STOPS, two
    more files arrive, and a brand-new query object restarted on the SAME
    checkpoint must (a) not reprocess the first two files (source offsets
    recovered) and (b) leave the append file sink exactly-once — every
    input row exactly once across both incarnations."""
    src, ckpt, out = (str(tmp_path / d) for d in ("src", "ckpt", "out"))

    def add_file(lo, hi):
        spark.createDataFrame(
            [(i, float(i)) for i in range(lo, hi)], "id long, value double"
        ).coalesce(1).write.mode("append").parquet(src)

    def run_once():
        stream = (
            spark.readStream.schema("id long, value double")
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        q = (
            stream.withColumn("double_value", F.col("value") * 2)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    add_file(0, 50)
    add_file(50, 100)
    run_once()
    add_file(100, 150)
    add_file(150, 200)
    run_once()  # new query object, same checkpoint
    got = spark.read.parquet(out).collect()
    assert len(got) == 200  # no loss, no reprocessing duplicates
    assert {r["id"] for r in got} == set(range(200))
    assert all(r["double_value"] == 2.0 * r["id"] for r in got)


def test_stateful_stream_restart_recovers_state_store(spark, tmp_path):
    """applyInPandasWithState state must survive a restart: after stop +
    restart on the same checkpoint, new batches see the RESTORED running
    counts (HDFS-backed state store), so the final per-user stats equal the
    all-data aggregate even though no single incarnation saw all the data."""
    from etl_ecommerce_data_spark.streaming.events import user_running_stats

    src, ckpt, sink = (str(tmp_path / d) for d in ("src", "ckpt", "sink"))

    def add_file(vals):
        spark.createDataFrame(
            [(u, float(v)) for u in range(3) for v in vals],
            "user_id long, value double",
        ).coalesce(1).write.mode("append").parquet(src)

    def emit(batch_df, batch_id):
        # the memory sink cannot recover from a checkpoint; foreachBatch is
        # the recoverable sink shape (same as the incremental-dedup ingest)
        batch_df.write.mode("append").parquet(sink)

    def run_once():
        stream = (
            spark.readStream.schema("user_id long, value double")
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        q = (
            user_running_stats(stream)
            .writeStream.outputMode("update")
            .foreachBatch(emit)
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    add_file([1.0, 2.0])
    run_once()
    add_file([3.0, 4.0])
    run_once()  # fresh incarnation, same checkpoint
    # the final (highest-count) emission per user must reflect the RESTORED
    # pre-restart state plus the post-restart rows
    final = {}
    for r in spark.read.parquet(sink).collect():
        if r["user_id"] not in final or r["n_events"] > final[r["user_id"]]["n_events"]:
            final[r["user_id"]] = r
    assert len(final) == 3
    for r in final.values():
        assert r["n_events"] == 4  # 2 pre-restart + 2 post-restart rows
        assert abs(r["total_value"] - 10.0) < 1e-12


def test_incremental_dedup_ingest_drops_cross_batch_duplicates(spark, tmp_path):
    from etl_ecommerce_data_spark.streaming.events import run_incremental_dedup_ingest

    # doc 2 (even, batch 0) and doc 3 (odd, batch 1) share text -> batch 0
    # wins. docs 5/7 (both odd) share text -> min odd id 5 wins. docs 0/4
    # (both even) share text -> min even id 0 wins. doc 1 unique.
    rows = [
        (0, "shared even text"),
        (4, "shared even text"),
        (2, "cross parity text"),
        (3, "cross parity text"),
        (5, "shared odd text"),
        (7, "shared odd text"),
        (1, "unique text"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.write.parquet(str(tmp_path / "documents.parquet"))
    got = {
        r["content_hash"]: r["doc_id"]
        for r in run_incremental_dedup_ingest(spark, str(tmp_path)).collect()
    }
    import hashlib

    h = lambda t: hashlib.md5(t.encode()).hexdigest()
    assert got == {
        h("shared even text"): 0,
        h("cross parity text"): 2,
        h("shared odd text"): 5,
        h("unique text"): 1,
    }


def test_incremental_dedup_ingest_handle_reclaims_eagerly(spark, tmp_path):
    """Driver ADVICE r6: repeated invocations in a long-lived driver must
    not accumulate snapshot dirs or atexit hooks — the handle reclaims its
    scratch root eagerly, and the root set shrinks back."""
    import os

    from etl_ecommerce_data_spark.streaming import events as EV

    rows = [(0, "a text"), (1, "b text"), (2, "a text")]
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        str(tmp_path / "documents.parquet")
    )
    before = set(EV._INGEST_ROOTS)
    with EV.run_incremental_dedup_ingest(
        spark, str(tmp_path), as_handle=True
    ) as snap:
        assert os.path.isdir(snap.root)
        assert snap.root in EV._INGEST_ROOTS
        assert len(snap.df.collect()) == 2  # a-text deduped
    # context exit released the scratch root and untracked it
    assert not os.path.exists(snap.root)
    assert EV._INGEST_ROOTS == before
    # release is idempotent
    snap.release()
    # a second invocation reuses the ONE shared atexit hook (no per-call
    # registration): the tracked-set grows by exactly the live handle
    snap2 = EV.run_incremental_dedup_ingest(spark, str(tmp_path), as_handle=True)
    assert EV._INGEST_ROOTS - before == {snap2.root}
    snap2.release()
    assert EV._INGEST_ROOTS == before


def test_incremental_dedup_ingest_default_mode_leaves_nothing(spark, tmp_path):
    """Driver ADVICE r7 closed: the DEFAULT (non-handle) mode must not
    accumulate snapshot dirs either — the result is checkpointed off the
    scratch dir, the dir reclaimed before return, and the frame stays
    collectable (twice — it is pinned, not lazily re-read) afterwards."""
    from etl_ecommerce_data_spark.streaming import events as EV

    rows = [(0, "a text"), (1, "b text"), (2, "a text")]
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        str(tmp_path / "documents.parquet")
    )
    import glob
    import tempfile

    pattern = tempfile.gettempdir() + "/dedup_ingest_*"
    before = set(EV._INGEST_ROOTS)
    on_disk_before = set(glob.glob(pattern))  # stale dirs of other sessions
    df = EV.run_incremental_dedup_ingest(spark, str(tmp_path))
    # no new tracked root, and no NEW dedup_ingest_* scratch dir on disk
    assert EV._INGEST_ROOTS == before
    assert set(glob.glob(pattern)) - on_disk_before == set()
    assert len(df.collect()) == 2
    assert len(df.collect()) == 2  # still valid on a second action


def test_file_sink_matches_memory_sink(spark, tmp_path):
    """The production parquet file sink (streaming/events.py _run_to_parquet,
    executor-side writes) emits exactly the row set of the driver-collected
    memory verification sink for EVERY streaming runner — append mode
    (native file sink), update mode (foreachBatch append matches the memory
    sink's accumulation), and complete mode (foreachBatch per-batch
    OVERWRITE matches the memory sink's table replacement; ADVICE r8: a
    per-batch append would duplicate earlier batches' re-emitted state).
    This is the sink swap the N-copy scaling experiments rely on above the
    memory sink's driver-heap bound."""
    from etl_ecommerce_data_spark.streaming.events import (
        run_dedup_events_to_memory,
        run_session_windows_to_memory,
        run_stream_static_enrich_to_memory,
        run_user_running_stats_to_memory,
        run_view_purchase_join_to_memory,
        run_windowed_stream_to_memory,
    )

    runners = (
        run_dedup_events_to_memory,  # append, native file sink
        run_session_windows_to_memory,  # append, native file sink
        run_user_running_stats_to_memory,  # update, foreachBatch append
        run_view_purchase_join_to_memory,  # append, native file sink
        run_windowed_stream_to_memory,  # complete, foreachBatch overwrite
        run_stream_static_enrich_to_memory,  # complete, foreachBatch overwrite
    )
    for runner in runners:
        mem = runner(spark, SF_SMOKE)
        fil = runner(
            spark, SF_SMOKE, sink="files", out_dir=str(tmp_path / runner.__name__)
        )
        cols = mem.columns
        assert set(fil.columns) == set(cols)
        mem_rows = sorted(map(tuple, mem.select(*cols).collect()))
        fil_rows = sorted(map(tuple, fil.select(*cols).collect()))
        assert len(mem_rows) > 0, runner.__name__
        assert mem_rows == fil_rows, runner.__name__


def test_file_sink_tws_matches_memory(spark, tmp_path):
    """transformWithState runner's file sink == memory sink (capability-gated
    with the module's protobuf gate)."""
    import pytest

    try:
        import google.protobuf  # noqa: F401
    except ImportError:
        pytest.skip("google.protobuf not available - transformWithState gated")
    from etl_ecommerce_data_spark.streaming.events import (
        run_user_type_counts_tws_to_memory,
    )

    mem = run_user_type_counts_tws_to_memory(spark, SF_SMOKE)
    fil = run_user_type_counts_tws_to_memory(
        spark, SF_SMOKE, sink="files", out_dir=str(tmp_path / "tws")
    )
    assert sorted(map(tuple, mem.collect())) == sorted(map(tuple, fil.collect()))


def test_file_sink_zero_emissions_returns_empty_frame(spark, tmp_path):
    """ADVICE r8: a stream with zero emissions must hand back an empty frame
    with the stream's schema, not an opaque read.parquet path/inference
    error — callers' own empty-result diagnostics (e.g. the session
    runner's micro-batch-ordering RuntimeError) depend on it."""
    from etl_ecommerce_data_spark.streaming.events import (
        _run_to_parquet,
        dedup_events_stream,
        events_read_schema,
        events_ts_kind,
    )
    import os

    src = os.path.join(SF_SMOKE, "events.parquet")
    kind = events_ts_kind(spark, src)
    stream = (
        spark.readStream.schema(events_read_schema(kind))
        .option("pathGlobFilter", "events.parquet")
        .parquet(SF_SMOKE)
    )
    from etl_ecommerce_data_spark.sources.registry import events_normalize_ts

    ev = events_normalize_ts(stream, kind)
    # a filter nothing passes -> the dedup stream emits zero rows
    silenced = dedup_events_stream(ev.filter("event_id < 0")).select(
        "event_id", "user_id", "event_type"
    )
    out = _run_to_parquet(silenced, spark, "append", str(tmp_path / "empty"))
    assert out.columns == ["event_id", "user_id", "event_type"]
    assert out.count() == 0


def test_update_mode_file_sink_idempotent_under_batch_replay(spark, tmp_path):
    """foreachBatch is at-least-once after a checkpoint restart, so the
    update-mode file sink must tolerate a batch running TWICE with the same
    batch_id without duplicating rows (per-batch-id overwrite subdirs —
    the production exactly-once pattern for non-transactional sinks), while
    distinct batch_ids still accumulate like the memory sink."""
    from etl_ecommerce_data_spark.streaming.events import _foreach_batch_writer

    data = str(tmp_path / "data")
    write = _foreach_batch_writer(data, "update")
    b0 = spark.createDataFrame([(1, 10), (2, 20)], "k long, v long")
    b1 = spark.createDataFrame([(3, 30)], "k long, v long")
    write(b0, 0)
    write(b0, 0)  # replayed batch: overwrites its own subdir, no dupes
    write(b1, 1)
    out = sorted(
        map(
            tuple,
            spark.read.option("recursiveFileLookup", "true")
            .parquet(data)
            .collect(),
        )
    )
    assert out == [(1, 10), (2, 20), (3, 30)]


def test_update_mode_file_sink_multi_batch_equals_memory(spark, tmp_path):
    """End-to-end multi-micro-batch update-mode run through BOTH sinks: the
    per-batch-id subdir file sink must accumulate emissions across batches
    exactly like the memory sink (3 files -> 3 batches -> one running-stats
    emission per user per batch it appears in)."""
    from etl_ecommerce_data_spark.streaming.events import (
        _run_to_memory,
        _run_to_parquet,
        user_running_stats,
    )

    rows = [(u, float(v) / 100.0) for u in range(5) for v in range(100, 1300, 100)]
    src = str(tmp_path / "src")
    spark.createDataFrame(rows, "user_id long, value double").repartition(
        3
    ).write.parquet(src)

    def stream():
        return (
            spark.readStream.schema("user_id long, value double")
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )

    mem = _run_to_memory(user_running_stats(stream()), spark, "update")
    fil = _run_to_parquet(
        user_running_stats(stream()), spark, "update", str(tmp_path / "sink")
    )
    mem_rows = sorted(map(tuple, mem.select("user_id", "n_events", "total_value").collect()))
    fil_rows = sorted(map(tuple, fil.select("user_id", "n_events", "total_value").collect()))
    assert len(mem_rows) >= 5  # multiple batches really emitted
    assert mem_rows == fil_rows


def test_update_file_sink_restart_replayed_batch_not_duplicated(spark, tmp_path):
    """The at-least-once path FOR REAL: delete the newest commit marker from
    the checkpoint after a run, so the restarted query re-executes that
    micro-batch with the SAME batch_id (offsets logged, commit missing —
    Spark's recovery contract). The per-batch-id overwrite writer must
    leave the sink exactly-once; a plain parquet append here would
    duplicate the replayed batch's rows."""
    import os

    from etl_ecommerce_data_spark.streaming.events import _foreach_batch_writer

    src, ckpt, data = (str(tmp_path / d) for d in ("src", "ckpt", "data"))

    def add_file(lo, hi):
        spark.createDataFrame(
            [(i,) for i in range(lo, hi)], "id long"
        ).coalesce(1).write.mode("append").parquet(src)

    def run_once():
        stream = (
            spark.readStream.schema("id long")
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        q = (
            stream.writeStream.outputMode("update")
            .foreachBatch(_foreach_batch_writer(data, "update"))
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    add_file(0, 50)
    add_file(50, 100)
    run_once()  # batches 0 and 1
    commits = [f for f in os.listdir(os.path.join(ckpt, "commits"))
               if not f.startswith(".")]
    latest = max(commits, key=int)
    os.remove(os.path.join(ckpt, "commits", latest))
    crc = os.path.join(ckpt, "commits", f".{latest}.crc")  # checksum-FS twin
    if os.path.exists(crc):
        os.remove(crc)
    add_file(100, 150)
    run_once()  # replays batch 1, then batch 2
    got = sorted(
        r["id"]
        for r in spark.read.option("recursiveFileLookup", "true")
        .parquet(data)
        .collect()
    )
    assert got == list(range(150))  # replayed batch rewrote, not duplicated


def test_unknown_sink_value_errors_immediately(spark):
    """A sink typo must raise, not silently fall back to the driver-collected
    memory sink (at production volumes that silent fallback IS the
    driver-heap OOM sink="files" exists to avoid)."""
    from etl_ecommerce_data_spark.streaming.events import (
        run_dedup_events_to_memory,
    )

    with pytest.raises(ValueError, match="unknown sink"):
        run_dedup_events_to_memory(spark, SF_SMOKE, sink="file")


def test_complete_mode_file_sink_replay_and_latest_state_only(spark, tmp_path):
    """Complete-mode writer contract: each batch's whole-dir overwrite keeps
    ONLY the latest full state (matching the memory sink's table
    replacement) and is trivially replay-idempotent."""
    from etl_ecommerce_data_spark.streaming.events import _foreach_batch_writer

    data = str(tmp_path / "data")
    write = _foreach_batch_writer(data, "complete")
    b0 = spark.createDataFrame([(1, 1)], "k long, n long")
    b1 = spark.createDataFrame([(1, 3), (2, 1)], "k long, n long")
    write(b0, 0)
    write(b1, 1)
    write(b1, 1)  # replayed final batch rewrites the same answer
    out = sorted(map(tuple, spark.read.parquet(data).collect()))
    assert out == [(1, 3), (2, 1)]  # only the latest full state


def test_bucketed_upsert_rewrites_only_touched_buckets(spark, tmp_path):
    """The latest-state snapshot is hash-bucketed; a batch must merge and
    rewrite ONLY the buckets containing touched users (the 100 TB contract:
    rewrite cost ∝ touched state, not snapshot size), keep untouched bucket
    pointers on their prior snapshot, and stay latest-(ts, event_id)-wins
    across batches."""
    import datetime

    from etl_ecommerce_data_spark.streaming.events import _bucketed_upsert_batch

    nb = 8
    # pick three users in three DIFFERENT buckets (same expr as the runner)
    probe = (
        spark.range(1, 200)
        .select(
            F.col("id").alias("user_id"),
            F.pmod(F.xxhash64(F.col("id")), F.lit(nb)).alias("b"),
        )
        .collect()
    )
    by_bucket: dict[int, int] = {}
    for r in probe:
        by_bucket.setdefault(r["b"], r["user_id"])
        if len(by_bucket) == 3:
            break
    (ba, ua), (bb, ub), (bc, uc) = list(by_bucket.items())[:3]

    def ts(h):
        return datetime.datetime(2024, 1, 1, h)

    cols = "event_id long, ts timestamp, user_id long, value double"
    root = str(tmp_path / "snap_root")
    dirs: dict[int, str] = {}
    b0 = spark.createDataFrame(
        [(10, ts(5), ua, 1.0), (11, ts(5), ub, 2.0), (12, ts(5), uc, 3.0)], cols
    )
    _bucketed_upsert_batch(spark, root, dirs, nb, b0, 0)
    assert set(dirs) == {ba, bb, bc} and all("snap_0" in p for p in dirs.values())
    # batch 1: ua gets a NEWER row, ub an OLDER one, uc is untouched
    b1 = spark.createDataFrame([(20, ts(9), ua, 9.0), (21, ts(1), ub, 0.5)], cols)
    _bucketed_upsert_batch(spark, root, dirs, nb, b1, 1)
    assert "snap_0" in dirs[bc]  # untouched bucket: pointer (and files) kept
    assert "snap_1" in dirs[ba] and "snap_1" in dirs[bb]
    final = {
        r["user_id"]: (r["event_id"], r["value"])
        for r in spark.read.parquet(*dirs.values()).collect()
    }
    assert final[ua] == (20, 9.0)  # newer ts wins
    assert final[ub] == (11, 2.0)  # older update loses to current state
    assert final[uc] == (12, 3.0)  # untouched state intact


def test_file_sink_rejects_stale_data_dir_without_checkpoint(spark, tmp_path):
    """ADVICE r9: reusing an out_dir whose data/ holds part files from an
    EARLIER run (fresh checkpoint → batch ids restart at 0) must fail fast
    instead of silently mixing stale files into the read-back; resuming
    with the checkpoint intact stays legitimate."""
    import shutil

    from etl_ecommerce_data_spark.streaming.events import (
        run_windowed_stream_to_memory,
    )

    out = str(tmp_path / "sink")
    first = run_windowed_stream_to_memory(
        spark, SF_SMOKE, sink="files", out_dir=out
    )
    n = first.count()
    assert n > 0
    # legitimate resume: data + commits both present -> no error, same rows
    again = run_windowed_stream_to_memory(
        spark, SF_SMOKE, sink="files", out_dir=out
    )
    assert again.count() == n
    # stale reuse: wipe the checkpoint but keep the data files
    shutil.rmtree(str(tmp_path / "sink" / "ckpt"))
    with pytest.raises(ValueError, match="another run"):
        run_windowed_stream_to_memory(spark, SF_SMOKE, sink="files", out_dir=out)


def test_sink_dir_lineage_guard_distinguishes_crash_from_stale(tmp_path):
    """ADVICE r10 #1: part files + offsets-but-no-commits is a legitimate
    crashed-before-first-commit lineage (Spark's recovery replays that
    batch), NOT stale reuse — only data with no checkpoint trace at all
    may raise."""
    import os

    from etl_ecommerce_data_spark.streaming.events import _check_sink_dir_lineage

    def mk(case, offsets=False, commits=False, part=True):
        out = str(tmp_path / case)
        os.makedirs(os.path.join(out, "data"))
        if part:
            open(os.path.join(out, "data", "part-00000.parquet"), "w").close()
        for sub, yes in (("offsets", offsets), ("commits", commits)):
            d = os.path.join(out, "ckpt", sub)
            os.makedirs(d)
            if yes:
                open(os.path.join(d, "0"), "w").close()
        return out

    with pytest.raises(ValueError, match="another run"):
        _check_sink_dir_lineage(mk("stale"))  # data, no lineage -> stale
    _check_sink_dir_lineage(mk("crashed", offsets=True))  # crash recovery ok
    _check_sink_dir_lineage(mk("resume", offsets=True, commits=True))  # ok
    _check_sink_dir_lineage(mk("fresh", part=False))  # no data at all ok


def test_file_sink_resumes_after_crash_before_first_commit(spark, tmp_path):
    """Integration twin of the guard unit test: wipe the commit markers but
    keep the offsets (the exact on-disk state a run leaves when it dies
    after writing data files but before its commit lands) — the rerun must
    resume the lineage and converge to the same rows, not raise."""
    import os

    out = str(tmp_path / "sink")
    first = run_windowed_stream_to_memory(spark, SF_SMOKE, sink="files", out_dir=out)
    n = first.count()
    assert n > 0
    commits = os.path.join(out, "ckpt", "commits")
    for f in os.listdir(commits):
        os.remove(os.path.join(commits, f))
    again = run_windowed_stream_to_memory(spark, SF_SMOKE, sink="files", out_dir=out)
    assert again.count() == n


def test_bucketed_upsert_restart_resumes_from_manifest_and_prunes(spark, tmp_path):
    """VERDICT r10 ask #2: the bucketed upsert survives a process restart —
    the pointer map reloads from the latest per-batch manifest and a
    replayed offsets-logged-but-uncommitted batch applies idempotently
    through BOTH crash points (after the manifest landed; before it) —
    and disk stays bounded: only snap dirs referenced by a retained
    manifest remain (two generations max — the predecessor's snapshots
    must survive for exactly the crash-before-manifest replay path this
    test exercises)."""
    import json
    import os

    from etl_ecommerce_data_spark.streaming.events import (
        _load_latest_upsert_manifest,
        _upsert_live_snaps,
        run_foreach_batch_upsert,
    )

    root = str(tmp_path / "upsert_root")
    baseline = {
        tuple(r)
        for r in run_foreach_batch_upsert(spark, SF_SMOKE, num_buckets=8, root=root).collect()
    }
    assert baseline

    def on_disk_snaps():
        return {d for d in os.listdir(root) if d.startswith("snap_")}

    assert on_disk_snaps() == _upsert_live_snaps(root)  # unreferenced pruned
    assert len(os.listdir(os.path.join(root, "manifests"))) <= 2

    def drop_latest_commit():
        commits = os.path.join(root, "ckpt", "commits")
        latest = max(
            (f for f in os.listdir(commits) if not f.startswith(".")), key=int
        )
        os.remove(os.path.join(commits, latest))
        crc = os.path.join(commits, f".{latest}.crc")
        if os.path.exists(crc):
            os.remove(crc)
        return int(latest)

    # restart A — crash landed BETWEEN manifest write and checkpoint commit:
    # the replayed batch's manifest exists, so it adopts it and skips.
    # num_buckets is deliberately wrong: resume must take the manifest's.
    drop_latest_commit()
    again = run_foreach_batch_upsert(spark, SF_SMOKE, num_buckets=999, root=root)
    assert {tuple(r) for r in again.collect()} == baseline
    assert _load_latest_upsert_manifest(root)[1] == 8  # layout preserved
    assert on_disk_snaps() == _upsert_live_snaps(root)

    # restart B — crash BEFORE the manifest landed: drop the commit AND the
    # replayed batch's manifest; the rerun recomputes the merge from the
    # prior manifest's pointers and overwrites the orphan snapshot.
    bid = drop_latest_commit()
    mdir = os.path.join(root, "manifests")
    latest_m = sorted(os.listdir(mdir))[-1]
    assert json.load(open(os.path.join(mdir, latest_m)))["batch_id"] == bid
    os.remove(os.path.join(mdir, latest_m))
    again = run_foreach_batch_upsert(spark, SF_SMOKE, num_buckets=999, root=root)
    assert {tuple(r) for r in again.collect()} == baseline
    assert on_disk_snaps() == _upsert_live_snaps(root)


def test_bucketed_upsert_refuses_foreign_root_and_wrong_source(spark, tmp_path):
    """Data-safety contract of the durable upsert's root handling: (a) an
    explicit root holding anything this runner did not create must raise,
    not be silently rm -rf'd; (b) a resumable table answers for ONE
    source — resuming it against a different sf_dir must raise, not
    return the old table as if it were the new input's."""
    import os

    from etl_ecommerce_data_spark.streaming.events import run_foreach_batch_upsert

    foreign = tmp_path / "user_data"
    foreign.mkdir()
    (foreign / "precious.txt").write_text("do not delete")
    with pytest.raises(ValueError, match="did not create"):
        run_foreach_batch_upsert(spark, SF_SMOKE, num_buckets=8, root=str(foreign))
    assert (foreign / "precious.txt").read_text() == "do not delete"

    root = str(tmp_path / "tbl")
    run_foreach_batch_upsert(spark, SF_SMOKE, num_buckets=8, root=root)
    other = os.path.join(os.path.dirname(SF_SMOKE.rstrip("/")), "sf0.01")
    with pytest.raises(ValueError, match="refusing to resume"):
        run_foreach_batch_upsert(spark, other, num_buckets=8, root=root)


def test_upsert_manifest_loader_skips_torn_latest(tmp_path):
    """A torn/unparseable latest manifest (the power-loss case the fsync
    discipline defends against) must not brick the table: the loader falls
    back to the retained predecessor, the exact file kept for recovery."""
    import os

    from etl_ecommerce_data_spark.streaming.events import (
        _load_latest_upsert_manifest,
        _write_upsert_manifest,
    )

    root = str(tmp_path / "tbl")
    ptr = {3: os.path.join(root, "snap_0", "__bkt=3")}
    _write_upsert_manifest(root, 0, 8, ptr)
    torn = os.path.join(root, "manifests", f"manifest_{1:020d}.json")
    with open(torn, "w") as fh:
        fh.write('{"batch_id": 1, "num_buck')  # truncated mid-write
    bid, nb, loaded = _load_latest_upsert_manifest(root)
    assert (bid, nb) == (0, 8)
    assert loaded == ptr


def test_resize_grayscale_null_dimensions_yield_null_payload(spark):
    """Arrow hands a nullable int column to pandas as float64 NaN — the old
    `is None` check never fired and int(NaN) killed the task, the exact
    failure the corrupt-input contract forbids."""
    from etl_ecommerce_data_spark.multimodal import resize_grayscale

    rows = [(1, bytes(range(16)), 4, 4), (2, bytes(range(16)), None, 4)]
    media = spark.createDataFrame(
        rows, "media_id long, payload binary, width int, height int"
    )
    out = {r["media_id"]: r["payload"] for r in
           resize_grayscale(media, "width", "height", 2, 2).collect()}
    assert out[1] is not None and out[2] is None


def test_attach_media_columns_rejects_non_integral_ids(spark):
    """cast('long') on a string key silently nulls every media_id (declared
    non-nullable) — the misuse must raise at plan time."""
    from etl_ecommerce_data_spark.multimodal import attach_media_columns

    df = spark.createDataFrame(
        [("a1b2", b"xx", "s")], "k string, payload binary, source string"
    )
    with pytest.raises(ValueError, match="not\\s+integral"):
        attach_media_columns(df, "k", "payload", "image/raw", "source")


def test_fake_decoder_module_kernel_matches_shipped_copy(spark):
    """extract_features ships its default kernel NESTED (cloudpickle
    by-value, workers need no importable package); _fake_decode_features is
    the module-level reference implementation — this pin keeps the two
    hand-synced copies from drifting."""
    from etl_ecommerce_data_spark.multimodal import (
        _fake_decode_features,
        attach_media_columns,
        extract_features,
    )

    payloads = [b"hello world", bytes(range(200)), b""]
    df = spark.createDataFrame(
        [(i, p, "s") for i, p in enumerate(payloads)],
        "k long, payload binary, source string",
    )
    media = attach_media_columns(df, "k", "payload", "application/octet-stream", "source")
    got = {r["media_id"]: r["feature"] for r in extract_features(media, dim=8).collect()}
    for i, p in enumerate(payloads):
        assert got[i] == _fake_decode_features(p, dim=8)


def test_bucketed_upsert_refuses_committed_table_without_checkpoint(spark, tmp_path):
    """Manifests mean committed state; a root holding them with its ckpt
    deleted can neither resume nor be treated as pre-commit junk — wiping
    it silently would destroy a durable table."""
    import os
    import shutil

    from etl_ecommerce_data_spark.streaming.events import run_foreach_batch_upsert

    root = str(tmp_path / "tbl")
    run_foreach_batch_upsert(spark, SF_SMOKE, num_buckets=8, root=root)
    shutil.rmtree(os.path.join(root, "ckpt"))
    with pytest.raises(ValueError, match="checkpoint is gone"):
        run_foreach_batch_upsert(spark, SF_SMOKE, num_buckets=8, root=root)
    assert os.path.isdir(os.path.join(root, "manifests"))  # table untouched


def test_events_stream_reads_directory_shaped_table(spark, tmp_path):
    """A directory-shaped events table (multi-file writers) must stream its
    part files — the single-file glob matched zero files there and every
    runner returned an honest-looking EMPTY frame."""
    import os
    import shutil

    from etl_ecommerce_data_spark.streaming.events import run_dedup_events_to_memory

    sf = tmp_path / "sf"
    evdir = sf / "events.parquet"
    evdir.mkdir(parents=True)
    shutil.copyfile(
        os.path.join(SF_SMOKE, "events.parquet"), str(evdir / "part-00000.parquet")
    )
    out = run_dedup_events_to_memory(spark, str(sf))
    assert out.count() > 0


def test_user_running_stats_tolerates_null_values(spark, tmp_path):
    """A NULL value row reaches the pandas state UDF as NaN; the old
    astype('int64') killed the query — it must count the row (COUNT(*)
    oracle) and contribute 0 to the sum (SUM skips NULLs)."""
    import uuid

    from etl_ecommerce_data_spark.streaming.events import user_running_stats

    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(1, 2.0), (1, None), (2, 3.5)], "user_id long, value double"
    ).coalesce(1).write.parquet(src)
    stream = spark.readStream.schema("user_id long, value double").parquet(src)
    name = f"t_{uuid.uuid4().hex[:8]}"
    q = (
        user_running_stats(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {r["user_id"]: (r["n_events"], r["total_value"])
           for r in spark.table(name).collect()}
    assert got == {1: (2, 2.0), 2: (1, 3.5)}


def test_scratch_root_sweeps_dead_siblings_and_registers_atexit():
    """Pid-suffixed scratch roots must not leak (ADVICE r11): a dead
    process's same-hash sibling is swept before staging, a live process's
    sibling and non-pid-shaped names survive, and this process's root is
    registered for atexit reclaim."""
    import os
    import subprocess
    import tempfile

    from etl_ecommerce_data_spark.streaming import events as ev

    sf_dir = "/root/testdata/sf0.001"
    tmp = tempfile.gettempdir()
    import hashlib

    base = f"upsert_stream_{hashlib.md5(sf_dir.encode()).hexdigest()[:8]}_"
    # a genuinely dead pid: a child that has already exited and been reaped
    p = subprocess.Popen(["sleep", "0"])
    p.wait()
    dead = os.path.join(tmp, f"{base}{p.pid}")
    alive = os.path.join(tmp, f"{base}1")  # pid 1 always alive
    oddball = os.path.join(tmp, f"{base}notapid")
    for d in (dead, alive, oddball):
        os.makedirs(d, exist_ok=True)
    try:
        root = ev._scratch_root("upsert_stream", sf_dir)
        assert root == os.path.join(tmp, f"{base}{os.getpid()}")
        assert root in ev._SCRATCH_ROOTS
        assert ev._SCRATCH_ATEXIT_REGISTERED
        assert not os.path.isdir(dead), "dead sibling not swept"
        assert os.path.isdir(alive), "live (pid 1) sibling was deleted"
        assert os.path.isdir(oddball), "non-pid-shaped name was deleted"
        # the atexit hook reclaims this process's registered roots
        os.makedirs(root, exist_ok=True)
        ev._reclaim_scratch_roots()
        assert not os.path.isdir(root)
        assert root not in ev._SCRATCH_ROOTS
    finally:
        import shutil

        for d in (dead, alive, oddball):
            shutil.rmtree(d, ignore_errors=True)


def test_upsert_rejects_concurrent_writer_and_recovers_after_crash(spark, tmp_path):
    """Two streams pointed at one durable root must not race the same
    checkpoint: while a LIVE writer holds the kernel flock the second call
    fails fast with ValueError carrying the owner pid (VERDICT r11 ask
    #6). A crashed writer's flock is released by the kernel (closing the
    fd models it), so a leftover lock FILE with a dead writer's pid inside
    is no obstacle — the run proceeds. The lock file itself is NEVER
    unlinked (removing it while a waiter holds an fd to the old inode
    would let two processes lock different inodes at one path)."""
    import fcntl
    import os

    from etl_ecommerce_data_spark.streaming.events import run_foreach_batch_upsert

    root = str(tmp_path / "tbl")
    lock = root + ".writer.lock"

    # live writer: hold the flock ourselves (different fd, same conflict
    # domain) and stamp a recognizable pid for the diagnostic message
    fd = os.open(lock, os.O_CREAT | os.O_RDWR)
    os.write(fd, b"424242")
    fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
    try:
        with pytest.raises(ValueError, match="live writer.*424242"):
            run_foreach_batch_upsert(spark, SF_SMOKE, num_buckets=8, root=root)
    finally:
        os.close(fd)  # "crash": kernel releases the lock with the fd

    # crashed writer: the stale pid is still in the FILE, but no kernel
    # lock is held — the new run acquires and completes
    assert open(lock).read() == "424242"
    out = run_foreach_batch_upsert(spark, SF_SMOKE, num_buckets=8, root=root)
    assert out.count() > 0
    assert os.path.exists(lock), "the lock file is persistent by design"
    assert open(lock).read() == str(os.getpid()), "owner stamp not updated"
    # no scratch siblings from the lock protocol
    leftovers = [f for f in os.listdir(tmp_path) if ".writer.lock." in f]
    assert leftovers == []


def _lock_race_worker(root, barrier, q):
    """Module-level so multiprocessing can pickle it under the spawn start
    method (spawn, not fork: forking a pytest process that holds capture/
    py4j threads can deadlock the child on inherited locks — the flake
    shows up as a silent worker and a queue timeout). Race to acquire the
    writer lock, hold it briefly, report the held interval; ANY exception
    is reported, never swallowed into a hang."""
    import os
    import time

    try:
        from etl_ecommerce_data_spark.streaming.events import (
            _acquire_writer_lock,
            _release_writer_lock,
        )

        barrier.wait(timeout=60)
        try:
            fd = _acquire_writer_lock(root)
        except ValueError:
            q.put(("rejected", None, None))
            return
        t0 = time.monotonic()
        time.sleep(0.3)
        t1 = time.monotonic()
        _release_writer_lock(fd)
        q.put(("acquired", t0, t1))
    except BaseException as exc:  # noqa: BLE001 — diagnostic channel
        q.put(("error", repr(exc), None))
        raise


def test_writer_lock_mutual_exclusion_under_stale_takeover_race(tmp_path):
    """Four PROCESSES simultaneously contend for a root whose lock FILE was
    left by a dead writer (stale pid inside, no kernel lock held). The
    mutual-exclusion contract: acquires may happen SEQUENTIALLY (a worker
    that tries after the holder released is legitimate), but no two held
    intervals may ever overlap — overlap means two live streams on one
    checkpoint. This very test caught the two pid-file protocols that
    preceded the kernel flock (a contender that had read the old stale
    lock could rename away a freshly-claimed LIVE lock); with flock the
    exclusion is a kernel guarantee. monotonic clocks are system-wide on
    Linux, so intervals compare across processes."""
    import multiprocessing as mp
    import os
    import subprocess

    root = str(tmp_path / "tbl")
    p = subprocess.Popen(["sleep", "0"])
    p.wait()
    with open(root + ".writer.lock", "w") as fh:
        fh.write(str(p.pid))  # stale: owner is dead — everyone may take over

    ctx = mp.get_context("spawn")
    barrier = ctx.Barrier(4)
    q = ctx.Queue()
    procs = [
        ctx.Process(target=_lock_race_worker, args=(root, barrier, q))
        for _ in range(4)
    ]
    for pr in procs:
        pr.start()
    results = [q.get(timeout=120) for _ in procs]
    for pr in procs:
        pr.join(timeout=30)
    errors = [r for r in results if r[0] == "error"]
    assert not errors, f"workers crashed: {errors}"
    acquired = sorted(
        (t0, t1) for kind, t0, t1 in results if kind == "acquired"
    )
    assert acquired, f"nobody acquired a provably-stale lock: {results}"
    for (a0, a1), (b0, b1) in zip(acquired, acquired[1:]):
        assert a1 <= b0, (
            f"two live writers held the lock concurrently: "
            f"({a0},{a1}) overlaps ({b0},{b1})"
        )
    assert os.path.exists(root + ".writer.lock"), "lock file is persistent"
    # the protocol creates no scratch siblings (no pid-tmps, no graves)
    leftovers = [
        f for f in os.listdir(tmp_path)
        if ".writer.lock." in f
    ]
    assert leftovers == [], f"lock-protocol scratch files leaked: {leftovers}"


def _midbatch_writer_worker(root, q):
    """Module-level for spawn pickling (see _lock_race_worker). Models the
    FIRST writer mid-batch: acquires the REAL writer lock through the
    production code path, reports readiness, then blocks until SIGKILLed —
    so no cleanup code of ours runs and only the kernel can release the
    flock. ANY exception is reported, never swallowed into a hang."""
    import time

    try:
        from etl_ecommerce_data_spark.streaming.events import _acquire_writer_lock

        _acquire_writer_lock(root)
        q.put(("locked", None))
        time.sleep(600)  # SIGKILLed long before this expires
    except BaseException as exc:  # noqa: BLE001 — diagnostic channel
        q.put(("error", repr(exc)))
        raise


def test_upsert_crash_under_concurrency_releases_lock_and_resumes(spark, tmp_path):
    """VERDICT r12 ask #7 — the COMPOSED failure the three individual drills
    (crash/restart, restart-at-100x, concurrent-writer rejection) left
    uncovered: a durable root sits in crash-before-manifest state while
    its writer is still alive mid-batch; a second writer's acquisition is
    rejected WHILE the first lives; the first is then SIGKILLed (no
    Python cleanup runs — the kernel alone releases the flock); and the
    second writer then acquires the SAME root and resumes it to exactly
    the clean run's state, end-to-end through run_foreach_batch_upsert."""
    import json
    import multiprocessing as mp
    import os

    from etl_ecommerce_data_spark.streaming.events import (
        _upsert_live_snaps,
        run_foreach_batch_upsert,
    )

    root = str(tmp_path / "tbl")
    expected = {
        tuple(r)
        for r in run_foreach_batch_upsert(
            spark, SF_SMOKE, num_buckets=8, root=root
        ).collect()
    }
    assert expected

    # Surgery: drop the newest commit AND its manifest — the on-disk state
    # a writer killed mid-batch (before its manifest landed) leaves behind;
    # the resume must recompute that batch from the prior manifest.
    commits = os.path.join(root, "ckpt", "commits")
    latest = max((f for f in os.listdir(commits) if not f.startswith(".")), key=int)
    os.remove(os.path.join(commits, latest))
    crc = os.path.join(commits, f".{latest}.crc")
    if os.path.exists(crc):
        os.remove(crc)
    mdir = os.path.join(root, "manifests")
    latest_m = sorted(os.listdir(mdir))[-1]
    assert json.load(open(os.path.join(mdir, latest_m)))["batch_id"] == int(latest)
    os.remove(os.path.join(mdir, latest_m))

    ctx = mp.get_context("spawn")
    q = ctx.Queue()
    writer_a = ctx.Process(target=_midbatch_writer_worker, args=(root, q))
    writer_a.start()
    try:
        kind, detail = q.get(timeout=120)
        assert kind == "locked", f"writer A failed to acquire: {detail}"
        # Second writer while A is live mid-batch: fail-fast rejection
        # carrying A's (best-effort) pid — not a hang, not a takeover.
        with pytest.raises(ValueError, match=f"live writer.*{writer_a.pid}"):
            run_foreach_batch_upsert(spark, SF_SMOKE, num_buckets=8, root=root)
    finally:
        writer_a.kill()  # SIGKILL: the crash; only the kernel releases
        writer_a.join(timeout=30)

    # The kernel released A's flock on death; the second writer acquires
    # the same root and resumes. num_buckets deliberately wrong: resume
    # must take the manifest's layout, proving it's a real resume.
    resumed = {
        tuple(r)
        for r in run_foreach_batch_upsert(
            spark, SF_SMOKE, num_buckets=999, root=root
        ).collect()
    }
    assert resumed == expected, "post-crash resume diverged from clean state"
    on_disk = {d for d in os.listdir(root) if d.startswith("snap_")}
    assert on_disk == _upsert_live_snaps(root), "unreferenced snaps on disk"
