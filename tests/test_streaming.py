"""Structured Streaming operators driven to completion with a file
source + memory sink (deterministic, synchronous).

Append-mode event-time aggregations only EMIT a window once the
watermark passes its end, and the watermark only advances between
micro-batches — so tests feed multiple files (maxFilesPerTrigger=1)
with late "sentinel" rows whose only job is to push the watermark
forward. Sentinel users are filtered out of assertions.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from auto_ml_platform_with_timeseries_data_spark.streaming import events as stv

_SENTINEL_USER = 99


def _write_stream_files(spark, tmp_path) -> str:
    path = str(tmp_path / "stream_src")
    os.makedirs(path, exist_ok=True)
    main = [
        (1, "2024-01-01 00:05:00", 1, "click", 1.0, "{}"),
        (2, "2024-01-01 00:20:00", 1, "click", 2.0, "{}"),
        (3, "2024-01-01 01:10:00", 2, "view", 3.0, "{}"),
        (2, "2024-01-01 00:20:00", 1, "click", 2.0, "{}"),  # exact dup
        (4, "2024-01-01 03:00:00", 1, "click", 5.0, "{}"),
    ]
    sent1 = [(100, "2024-01-01 10:00:00", _SENTINEL_USER, "s", 0.0, "{}")]
    sent2 = [(101, "2024-01-01 20:00:00", _SENTINEL_USER, "s", 0.0, "{}")]
    schema = ("event_id long, ts string, user_id long, event_type string, "
              "value double, props string")
    for i, rows in enumerate((main, sent1, sent2)):
        df = spark.createDataFrame(rows, schema).withColumn(
            "ts", F.to_timestamp("ts"))
        sub = os.path.join(path, f"f{i}")
        df.coalesce(1).write.mode("overwrite").parquet(sub)
        # file source orders batches by mtime — force the sequence
        for root, _, files in os.walk(sub):
            for f in files:
                os.utime(os.path.join(root, f), (1000 + i, 1000 + i))
    return os.path.join(path, "f*")


def test_windowed_counts_append_flush(spark, tmp_path):
    path = _write_stream_files(spark, tmp_path)
    stream = stv.read_event_stream(spark, path)
    agg = stv.windowed_counts(stream, window="1 hour", watermark="10 minutes")
    stv.run_to_memory(agg, "win_out", output_mode="append")
    got = {(str(r["window_start"]), r["event_type"]): r["n"]
           for r in spark.sql("SELECT * FROM win_out").collect()
           if r["event_type"] != "s"}
    # all main windows flushed by the sentinel batches
    assert got[("2024-01-01 00:00:00", "click")] == 3  # no dedup in this op
    assert got[("2024-01-01 01:00:00", "view")] == 1
    assert got[("2024-01-01 03:00:00", "click")] == 1


def test_dedup_within_watermark(spark, tmp_path):
    path = _write_stream_files(spark, tmp_path)
    stream = stv.read_event_stream(spark, path)
    dedup = stv.dedup_within_watermark(stream, ["event_id"], watermark="1 hour")
    stv.run_to_memory(dedup, "dedup_out", output_mode="append")
    ids = [r["event_id"] for r in
           spark.sql(f"SELECT event_id FROM dedup_out "
                     f"WHERE user_id != {_SENTINEL_USER}").collect()]
    assert sorted(ids) == [1, 2, 3, 4]  # dup of event 2 dropped


def test_session_windows(spark, tmp_path):
    path = _write_stream_files(spark, tmp_path)
    stream = stv.read_event_stream(spark, path)
    sess = stv.session_windows(stream, gap="30 minutes", watermark="10 minutes")
    stv.run_to_memory(sess, "sess_out", output_mode="append")
    rows = [r for r in
            spark.sql("SELECT * FROM sess_out ORDER BY user_id, session_start")
            .collect() if r["user_id"] != _SENTINEL_USER]
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    # user 1: 00:05 + 00:20 (+dup) merge (gaps < 30min); 03:00 separate
    assert len(by_user[1]) == 2
    assert by_user[1][0]["n_events"] == 3
    assert by_user[1][1]["n_events"] == 1
    assert len(by_user[2]) == 1


def test_streaming_over_fixture_matches_batch(spark, sf_dir, tmp_path):
    # real fixture as a bounded stream (re-written to micros first —
    # the raw fixture is TIMESTAMP(NANOS)); complete mode avoids the
    # flush dance: totals must equal the batch row count
    from auto_ml_platform_with_timeseries_data_spark.tables import load_table

    src = str(tmp_path / "events_us")
    load_table(spark, sf_dir, "events").write.mode("overwrite").parquet(src)
    stream = stv.read_event_stream(spark, src, max_files_per_trigger=4)
    agg = stv.windowed_counts(stream, window="6 hours", watermark="1 hour")
    stv.run_to_memory(agg, "fx_out", output_mode="complete")
    stream_total = spark.sql("SELECT sum(n) AS s FROM fx_out").collect()[0]["s"]
    batch_total = load_table(spark, sf_dir, "events").count()
    assert stream_total == batch_total


def test_checkpoint_resume_exactly_once(spark, sf_dir, tmp_path):
    """Failure-recovery semantics: a streaming query killed mid-stream
    and restarted from its checkpoint must produce exactly the batch
    answer in its file sink — no lost and no duplicated micro-batches.
    This is the property that makes the streaming operators deployable:
    the file sink commits atomically per epoch and the checkpoint
    replays only uncommitted batches."""
    from pyspark.sql import functions as F

    from auto_ml_platform_with_timeseries_data_spark.streaming.events import (
        _staged_plain,
    )
    from auto_ml_platform_with_timeseries_data_spark.tables import load_table

    stage = _staged_plain(spark, sf_dir)
    ev = load_table(spark, sf_dir, "events")
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "sink")

    def start():
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1).parquet(stage)
            .select("event_id", "user_id", "value")
        )
        return (
            stream.writeStream.format("parquet")
            .option("path", sink).option("checkpointLocation", ckpt)
            .trigger(processingTime="0 seconds")
            .start()
        )

    # phase 1: process SOME batches, then kill mid-stream
    q = start()
    import time
    while len(q.recentProgress) < 2:          # ≥2 of 4 micro-batches
        time.sleep(0.2)
    q.stop()

    # phase 2: restart from the checkpoint, drain the rest
    q = start()
    q.processAllAvailable()
    q.stop()

    got = spark.read.parquet(sink)
    assert got.count() == ev.count()          # no loss, no dupes
    assert got.select(F.sum("event_id")).first()[0] == \
        ev.select(F.sum("event_id")).first()[0]


def test_stream_sink_exactly_once_replay_idempotent(spark, tmp_path):
    """The foreachBatch sink's exactly-once claim rests on epoch replay
    being idempotent: re-landing the SAME epoch (Structured Streaming's
    at-least-once redelivery) must not duplicate rows."""
    import os

    from auto_ml_platform_with_timeseries_data_spark.streaming import events as se

    df = spark.createDataFrame(
        [(i, float(i)) for i in range(10)], "event_id long, value double")
    dest = str(tmp_path / "sink")

    def write_batch(bdf, epoch_id):
        bdf.write.mode("overwrite").parquet(
            os.path.join(dest, f"epoch={epoch_id}"))

    write_batch(df, 0)
    write_batch(df, 0)  # replayed epoch
    write_batch(df.filter("event_id >= 5"), 1)
    back = spark.read.parquet(dest)
    assert back.count() == 15  # 10 (epoch 0, once) + 5 (epoch 1)
    assert back.select("epoch").distinct().count() == 2


def test_stream_sink_query_matches_batch(spark, sf_dir):
    """q149 end-to-end: streamed-and-landed aggregate equals the batch
    aggregate of the source."""
    from auto_ml_platform_with_timeseries_data_spark.streaming.events import (
        q149_stream_sink_exactly_once,
    )
    from auto_ml_platform_with_timeseries_data_spark.tables import load_table

    got = {r["event_type"]: r for r in
           q149_stream_sink_exactly_once(spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events")
    want = {r["event_type"]: r for r in
            ev.groupBy("event_type").agg(
                F.count(F.lit(1)).alias("n"),
                F.min("event_id").alias("min_id"),
                F.max("event_id").alias("max_id")).collect()}
    assert set(got) == set(want)
    for k in want:
        assert (got[k]["n"], got[k]["min_id"], got[k]["max_id"]) == \
            (want[k]["n"], want[k]["min_id"], want[k]["max_id"])


def test_rollup_merge_is_associative_and_late_data_adds(spark):
    """q204's merge algebra: splitting the input any way and merging
    partials equals the one-shot rollup, and a late row lands in its
    existing bucket (adds, never duplicates the bucket row)."""
    import datetime as dt

    from auto_ml_platform_with_timeseries_data_spark.streaming.events import (
        rollup_merge,
        rollup_partial,
    )

    t0 = dt.datetime(2024, 1, 1, 0, 5)
    t1 = dt.datetime(2024, 1, 1, 1, 5)
    rows = [(t0, 1.0), (t0, 2.0), (t1, 4.0), (t0, 8.0)]
    ev = spark.createDataFrame(rows, "ts timestamp, value double")
    one_shot = {r["bucket"]: r for r in rollup_partial(ev).collect()}

    b1 = spark.createDataFrame(rows[:3], "ts timestamp, value double")
    b2 = spark.createDataFrame(rows[3:], "ts timestamp, value double")  # late
    merged = {r["bucket"]: r for r in rollup_merge(
        rollup_partial(b1), rollup_partial(b2)).collect()}

    assert set(merged) == set(one_shot) and len(merged) == 2
    for k in one_shot:
        assert merged[k]["n_events"] == one_shot[k]["n_events"]
        assert merged[k]["sum_cents"] == one_shot[k]["sum_cents"]


def test_rollup_survives_driver_restart_and_replay(spark, tmp_path):
    """q204's restart contract: the predecessor version is discovered
    from the ON-DISK epoch=* listing, so a driver restart (all Python
    state gone) followed by an at-least-once REPLAY of the in-flight
    epoch still converges to the one-shot rollup. Torn writes (an
    epoch directory without _SUCCESS) are invisible to recovery."""
    import datetime as dt

    from auto_ml_platform_with_timeseries_data_spark.streaming.events import (
        rollup_merge_epoch,
        rollup_partial,
        rollup_versions,
    )

    root = str(tmp_path / "cagg_state")
    os.makedirs(root)
    t = lambda h, m: dt.datetime(2024, 1, 1, h, m)  # noqa: E731
    batches = [
        [(t(0, 5), 1.0), (t(0, 10), 2.0)],
        [(t(1, 5), 4.0), (t(0, 55), 8.0)],   # late row into bucket 0
        [(t(2, 5), 16.0), (t(1, 30), 32.0)],
    ]
    dfs = [spark.createDataFrame(rows, "ts timestamp, value double")
           for rows in batches]

    # first driver lifetime: epochs 0 and 1 land
    rollup_merge_epoch(spark, dfs[0], 0, root)
    rollup_merge_epoch(spark, dfs[1], 1, root)

    # --- driver restart: nothing Python-side survives; the module
    # functions carry no dict, so calling them again IS the restarted
    # driver. Checkpoint recovery replays the in-flight epoch 1 first.
    rollup_merge_epoch(spark, dfs[1], 1, root)   # at-least-once replay
    rollup_merge_epoch(spark, dfs[2], 2, root)

    # a torn write from a crash must not be served or merged
    os.makedirs(os.path.join(root, "epoch=9"))
    versions = rollup_versions(root)
    assert set(versions) == {0, 1, 2}

    got = {str(r["bucket"]): (r["n_events"], r["sum_cents"])
           for r in spark.read.parquet(versions[2]).collect()}
    ev = dfs[0].unionByName(dfs[1]).unionByName(dfs[2])
    want = {str(r["bucket"]): (r["n_events"], r["sum_cents"])
            for r in rollup_partial(ev).collect()}
    assert got == want and len(got) == 3


def test_perceptual_index_survives_driver_restart_and_replay(
        spark, tmp_path):
    """q236's restart contract: the known-fingerprint set is discovered
    from the _SUCCESS-gated on-disk epoch=* listing, so a driver
    restart followed by an at-least-once REPLAY of the in-flight epoch
    still converges to the one-shot batch index — no fingerprint
    duplicated, no canonical changed. Torn writes are invisible."""
    from auto_ml_platform_with_timeseries_data_spark.operators.multimodal import (
        image_dhash,
        synth_bmp_media,
    )
    from auto_ml_platform_with_timeseries_data_spark.streaming.events import (
        perceptual_index_epoch,
        rollup_versions,
    )

    fam = 7
    root = str(tmp_path / "pidx_state")
    os.makedirs(root)
    batches = [
        spark.createDataFrame([(i,) for i in ids], "doc_id long")
        for ids in ([0, 1, 2], [3, 4, 8], [9, 10, 20])
    ]

    # first driver lifetime: epochs 0 and 1 land
    perceptual_index_epoch(spark, batches[0], 0, root, fam)
    perceptual_index_epoch(spark, batches[1], 1, root, fam)

    # driver restart: no Python state survives; checkpoint recovery
    # replays the in-flight epoch 1 before moving on
    perceptual_index_epoch(spark, batches[1], 1, root, fam)
    perceptual_index_epoch(spark, batches[2], 2, root, fam)

    # a torn write from a crash must not be served or anti-joined
    os.makedirs(os.path.join(root, "epoch=9"))
    versions = rollup_versions(root)
    assert set(versions) == {0, 1, 2}

    got = {(r["dhash_lo"], r["dhash_hi"]): r["canonical_id"]
           for r in spark.read.parquet(*versions.values()).collect()}
    all_ids = batches[0].unionByName(batches[1]).unionByName(batches[2])
    want = {(r["dhash_lo"], r["dhash_hi"]): r["canonical_id"]
            for r in image_dhash(synth_bmp_media(all_ids, families=fam))
            .groupBy("dhash_lo", "dhash_hi")
            .agg(F.min("media_id").alias("canonical_id")).collect()}
    assert got == want
    # replay did not duplicate: one index row per distinct fingerprint
    n_rows = spark.read.parquet(*versions.values()).count()
    assert n_rows == len(want)


def test_stream_ivfpq_index_converges_and_survives_restart(
        spark, sf_dir, tmp_path):
    """The composed ANN index maintained as a stream: three id-ordered
    micro-batches of embeddings each cell+code themselves against the
    injected codebooks and append their novel ids to an epoch
    directory. After a simulated driver restart with an at-least-once
    replay of the in-flight epoch, the union of complete epochs equals
    the one-shot batch ivfpq_encode of all the vectors — no id
    duplicated, no code changed — and a search over the drained index
    equals the in-memory path."""
    import numpy as np

    from auto_ml_platform_with_timeseries_data_spark.operators import (
        similarity as sim,
    )
    from auto_ml_platform_with_timeseries_data_spark.streaming.events import (
        ivfpq_index_epoch,
        rollup_versions,
    )
    from auto_ml_platform_with_timeseries_data_spark.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    crows = (emb.filter((F.col("vec_id") >= 100) & (F.col("vec_id") < 108))
             .orderBy("vec_id").select("embedding").collect())
    cents = np.array([r[0] for r in crows], dtype=np.float64)
    brows = (emb.filter((F.col("vec_id") >= 120) & (F.col("vec_id") < 136))
             .orderBy("vec_id").select("embedding").collect())
    seeds = np.array([r[0] for r in brows], dtype=np.float64)
    seeds /= np.linalg.norm(seeds, axis=1, keepdims=True)
    books = seeds.reshape(len(seeds), 8, -1).transpose(1, 0, 2).copy()

    root = str(tmp_path / "ivfpq_stream")
    os.makedirs(root)
    batches = [emb.filter((F.col("vec_id") >= lo) & (F.col("vec_id") < hi))
               for lo, hi in ((0, 60), (60, 140), (140, 10 ** 9))]

    ivfpq_index_epoch(spark, batches[0], 0, root, "vec_id", "embedding",
                      cents, books)
    ivfpq_index_epoch(spark, batches[1], 1, root, "vec_id", "embedding",
                      cents, books)
    # driver restart + at-least-once replay of the in-flight epoch
    ivfpq_index_epoch(spark, batches[1], 1, root, "vec_id", "embedding",
                      cents, books)
    ivfpq_index_epoch(spark, batches[2], 2, root, "vec_id", "embedding",
                      cents, books)
    os.makedirs(os.path.join(root, "epoch=9"))   # torn write: invisible

    versions = rollup_versions(root)
    assert set(versions) == {0, 1, 2}
    drained = spark.read.parquet(*versions.values())
    want = sim.ivfpq_encode(emb, "vec_id", "embedding", cents, books)
    d = {r["vec_id"]: (r["cell"], tuple(r["codes"]))
         for r in drained.collect()}
    w = {r["vec_id"]: (r["cell"], tuple(r["codes"]))
         for r in want.collect()}
    assert d == w

    queries = emb.filter(F.col("vec_id") < 5)
    kwargs = dict(k=5, nprobe=3, refine=4,
                  centroids=cents, codebooks=books)
    from_stream = sim.cosine_topk_ivfpq(
        emb, queries, "vec_id", "embedding",
        index=drained, **kwargs).collect()
    from_mem = sim.cosine_topk_ivfpq(
        emb, queries, "vec_id", "embedding", **kwargs).collect()
    key = lambda t: (t[0], t[2])  # (query_id, rank)  # noqa: E731
    assert sorted(map(tuple, from_stream), key=key) \
        == sorted(map(tuple, from_mem), key=key)


def test_stream_near_screen_survives_restart_and_matches_bruteforce(
        spark, tmp_path):
    """q251's restart contract: both the screen output and the index
    delta derive from the _SUCCESS-gated epoch=* listings strictly
    below the running epoch, so a driver restart + at-least-once
    replay regenerates identical outputs; the drained screen union
    must equal a python brute-force of 'batch doc vs earlier-batch
    canonical within Hamming 2'."""
    from auto_ml_platform_with_timeseries_data_spark.operators.multimodal import (
        _NP_MAXH,
        image_dhash,
        synth_bmp_media_mixed,
    )
    from auto_ml_platform_with_timeseries_data_spark.streaming.events import (
        perceptual_screen_epoch,
        rollup_versions,
    )

    idx_root = str(tmp_path / "nscreen_idx")
    scr_root = str(tmp_path / "nscreen_out")
    os.makedirs(idx_root)
    os.makedirs(scr_root)
    # mixed synthesis: ids i and i+50 are same-family (i<10 unperturbed
    # vs perturbed copy) → cross-batch near pairs at distance ≤ 2
    batch_ids = ([0, 1, 2], [50, 51, 3], [100, 52, 4])
    batches = [spark.createDataFrame([(i,) for i in ids], "doc_id long")
               for ids in batch_ids]

    perceptual_screen_epoch(spark, batches[0], 0, idx_root, scr_root)
    perceptual_screen_epoch(spark, batches[1], 1, idx_root, scr_root)
    # driver restart: replay the in-flight epoch 1, then continue
    perceptual_screen_epoch(spark, batches[1], 1, idx_root, scr_root)
    perceptual_screen_epoch(spark, batches[2], 2, idx_root, scr_root)

    all_ids = [i for ids in batch_ids for i in ids]
    all_df = spark.createDataFrame([(i,) for i in all_ids],
                                   "doc_id long")
    fps = {r["media_id"]: (r["dhash_lo"], r["dhash_hi"]) for r in
           image_dhash(synth_bmp_media_mixed(all_df)).collect()}
    batch_of = {i: b for b, ids in enumerate(batch_ids) for i in ids}
    canon = {}
    for i in sorted(all_ids):
        canon.setdefault(fps[i], i)           # min id per fingerprint
    want = set()
    for d in all_ids:
        for fp, cid in canon.items():
            if batch_of[cid] >= batch_of[d]:
                continue
            h = (bin(fps[d][0] ^ fp[0]).count("1")
                 + bin(fps[d][1] ^ fp[1]).count("1"))
            if h <= _NP_MAXH:
                want.add((d, cid, h))
    got = {(r["delta_id"], r["corpus_id"], r["hamming"]) for r in
           spark.read.parquet(
               *rollup_versions(scr_root).values()).collect()}
    assert got == want and len(want) > 0
    # replay did not duplicate index rows
    n_idx = spark.read.parquet(*rollup_versions(idx_root).values()).count()
    assert n_idx == len(canon)


def test_write_ordered_slices_forces_strict_mtime_order(spark, tmp_path):
    """The ADVICE-r8 hardening: staged slices must carry strictly
    increasing per-slice mtimes (FileStreamSource's tie order is
    listing-hash dependent, so equal timestamps would make staged
    batch order nondeterministic on coarse-timestamp filesystems)."""
    from pyspark.sql.window import Window

    from auto_ml_platform_with_timeseries_data_spark.streaming.events import (
        _write_ordered_slices,
    )

    d = str(tmp_path / "slices")
    os.makedirs(d)
    df = spark.createDataFrame([(i,) for i in range(40)], "doc_id long")
    sliced = df.withColumn(
        "__slice", F.ntile(4).over(Window.orderBy("doc_id")))
    _write_ordered_slices(sliced, d)
    parts = sorted(
        (os.path.getmtime(os.path.join(d, f)), f)
        for f in os.listdir(d) if f.endswith(".parquet"))
    assert len(parts) == 4
    mtimes = [m for m, _ in parts]
    assert all(b - a >= 1.0 for a, b in zip(mtimes, mtimes[1:])), mtimes
    # ADVICE-r9 hardening: every stamp sits in the PAST — a stamp in
    # the future could tie with or trail a later real write on a
    # 1 s-granularity filesystem and reorder arrival
    assert mtimes[-1] <= time.time(), (mtimes[-1], time.time())
    # the slice content follows the mtime order: earliest file holds
    # the smallest ids
    first = spark.read.parquet(os.path.join(d, parts[0][1]))
    assert first.agg(F.max("doc_id")).first()[0] == 9
