"""Structured Streaming operators over the `events` stream (SURVEY.md
§2.10 / §7 M6 — additive scope; the reference has no streaming at all).

Batch twins of these live in operators/sessionize.py with DuckDB
oracles; here the same window semantics run incrementally with
watermarks, state, and late-data handling. Local tests drive them with
a file source over the fixture parquet + a memory sink
(processAllAvailable makes the run synchronous and deterministic).

Scale notes: all operators keep state keyed by (window×group) or
(dedup key) with a watermark bound, so state size is O(active windows),
not O(stream length) — the requirement for an unbounded 100 TB/day
stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

EVENT_SCHEMA = ("event_id long, ts timestamp, user_id long, "
                "event_type string, value double, props string")


def read_event_stream(spark: SparkSession, path: str,
                      max_files_per_trigger: int = 1) -> DataFrame:
    return (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def windowed_counts(stream: DataFrame, window: str = "1 hour",
                    slide: str | None = None,
                    watermark: str = "2 hours") -> DataFrame:
    """Tumbling (or sliding, if `slide` given) event-time window agg with
    a watermark for late-data cutoff."""
    win = F.window("ts", window, slide) if slide else F.window("ts", window)
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(win.alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_value"))
        .select(F.col("w.start").alias("window_start"),
                F.col("w.end").alias("window_end"), "event_type", "n", "sum_value")
    )


def dedup_within_watermark(stream: DataFrame, keys: list[str],
                           watermark: str = "2 hours") -> DataFrame:
    """Stateful exact dedup with bounded state — dropDuplicatesWithinWatermark
    keeps each key only as long as the watermark can still admit a dup."""
    return stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keys)


def session_windows(stream: DataFrame, gap: str = "30 minutes",
                    watermark: str = "2 hours") -> DataFrame:
    """Event-time session windows (the streaming twin of the batch
    lag-gap sessionize operator)."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        .select("user_id", F.col("w.start").alias("session_start"),
                F.col("w.end").alias("session_end"), "n_events", "sum_value")
    )


def run_to_memory(df: DataFrame, name: str, output_mode: str = "append",
                  state_partitions: int = 4):
    """Drive a streaming query to completion against currently-available
    files; returns the query (stopped). Read results from table `name`.

    Stateful streaming stages take their partition count from
    spark.sql.shuffle.partitions at query START and AQE never coalesces
    them — every micro-batch then pays (partitions × state-store ops)
    regardless of data volume. Size state partitions to the stream's key
    cardinality, not the batch default: the fixture streams have a few
    hundred keys, so 4 partitions cuts per-batch overhead ~8× vs 32.
    The conf is restored after the run so batch plans are unaffected."""
    spark = df.sparkSession
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    try:
        q = (
            df.writeStream.outputMode(output_mode)
            .format("memory").queryName(name)
            .start()
        )
        q.processAllAvailable()
        q.stop()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    return q


# ---------------------------------------------------------------------------
# Registered query: a REAL incremental streaming run, oracle-checked
# ---------------------------------------------------------------------------

from auto_ml_platform_with_timeseries_data_spark.registry import query  # noqa: E402
from auto_ml_platform_with_timeseries_data_spark.tables import load_table  # noqa: E402

# Staged stream directories, memoized per variant key — usually
# (variant, sf_dir), sometimes with extra parameters appended: the
# staging content is a pure function of the fixture, so repeated runs
# (bench's two passes; queries sharing a staging shape) skip the
# rewrite.
_STAGE_CACHE: dict[tuple, str] = {}


def _write_ordered_slices(sliced: DataFrame, d: str, n: int = 4) -> None:
    """Write `sliced` (carrying a 1-based ``__slice`` column) as `n`
    sequential single-part parquet files under `d`, then FORCE strictly
    increasing per-slice mtimes with ``os.utime`` (1 s apart).

    FileStreamSource orders newly discovered files by modification
    time; its tie order is listing-hash dependent, so two part files
    landing in the same timestamp granule would make every staged-batch
    query's arrival order — and any arrival-order-sensitive output
    (e.g. q236's min-id-wins fingerprint canon) — nondeterministic on
    coarse-timestamp filesystems. Explicit utime replaces the previous
    50 ms-sleep heuristic with a guarantee (and drops the sleeps)."""
    import os as _os
    import time as _time

    groups: list[list[str]] = []
    seen: set[str] = set()
    for i in range(1, n + 1):
        (sliced.filter(F.col("__slice") == i).drop("__slice")
         .coalesce(1).write.mode("append").parquet(d))
        now = {f for f in _os.listdir(d) if f.endswith(".parquet")}
        added = sorted(now - seen)
        if len(added) != 1:
            # a real exception, not an assert (stripped under -O): an
            # empty slice writing zero part files would silently
            # mis-order staging for every downstream arrival-order test
            raise RuntimeError(
                f"slice {i}: expected exactly 1 new part file under "
                f"{d}, got {added!r} — source has fewer rows than "
                f"slices, or the writer emitted multiple parts")
        groups.append(added)
        seen = now
    # anchor so even the LAST slice's stamp sits in the past — a stamp
    # in the future could tie with (or trail) a later real write on a
    # 1 s-granularity filesystem and reorder arrival
    base = float(int(_time.time())) - n
    for i, files in enumerate(groups):
        for f in files:
            _os.utime(_os.path.join(d, f), (base + i, base + i))


def _staged_plain(spark: SparkSession, sf_dir: str) -> str:
    """events as 4 unordered parquet files (windowed-agg inputs)."""
    key = ("plain4", sf_dir)
    if key not in _STAGE_CACHE:
        from auto_ml_platform_with_timeseries_data_spark.staging import (
            staging_dir,
        )

        ev = load_table(spark, sf_dir, "events")
        d = staging_dir("stream_plain", fresh=True)
        ev.repartition(4).write.mode("overwrite").parquet(d)
        _STAGE_CACHE[key] = d
    return _STAGE_CACHE[key]


def _staged_time_sliced(spark: SparkSession, sf_dir: str,
                        doubled: bool = False) -> str:
    """events as 4 TIME-RANGE slices written sequentially in time order
    (watermark-safe arrival order; see q52's docstring), optionally with
    every event doubled (at-least-once delivery simulation)."""
    key = ("sliced4_doubled" if doubled else "sliced4", sf_dir)
    if key not in _STAGE_CACHE:
        from pyspark.sql.window import Window

        from auto_ml_platform_with_timeseries_data_spark.staging import (
            staging_dir,
        )

        ev = load_table(spark, sf_dir, "events")
        if doubled:
            ev = ev.unionAll(ev)
        d = staging_dir("stream_sliced", fresh=True)
        sliced = ev.withColumn("__slice", F.ntile(4).over(Window.orderBy("ts")))
        _write_ordered_slices(sliced, d)
        _STAGE_CACHE[key] = d
    return _STAGE_CACHE[key]


@query(
    "q39_stream_window_counts",
    oracle="""
    SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           count(*) AS n,
           ROUND(sum(value), 4) AS sum_value
    FROM events GROUP BY 1, 2
    """,
)
def q39_stream_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end Structured Streaming: the events fixture is staged as a
    multi-file directory, consumed INCREMENTALLY (maxFilesPerTrigger=1 →
    4 triggers with state carried across micro-batches), aggregated into
    event-time tumbling windows, and the final state hash-matched against
    the batch SQL oracle — streaming results must equal the batch answer.
    Complete output mode so every window is emitted regardless of the
    final watermark position."""
    import uuid

    ev = load_table(spark, sf_dir, "events")
    stage_dir = _staged_plain(spark, sf_dir)

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage_dir)
    )
    agg = windowed_counts(stream, window="1 hour", watermark="2 hours")
    name = f"q39mem{uuid.uuid4().hex[:8]}"
    run_to_memory(agg, name, output_mode="complete")
    return spark.table(name).select(
        F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "event_type", "n",
        F.round("sum_value", 4).alias("sum_value"),
    )


@query(
    "q52_stream_dedup",
    oracle="""
    SELECT event_type, count(*) AS n,
           ROUND(sum(value), 4) AS sum_value
    FROM events GROUP BY event_type
    """,
)
def q52_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup under at-least-once delivery: the fixture is
    staged DOUBLED (every event twice), written as 4 time-range-ordered
    files and consumed one file per trigger; dropDuplicatesWithinWatermark
    on event_id must recover exactly the original stream.

    Two correctness-critical staging choices that mirror production:
    - both copies of an event land in the SAME file (time-slice split),
      so the dedup state for a key is live when its dup arrives —
      state evicted past the watermark can't resurrect old dups;
    - files are WRITTEN sequentially in time order: the file source
      orders ties in modification time arbitrarily, and a later slice
      processed first would advance the watermark past earlier slices,
      silently dropping them as late (observed: 49% of events lost
      with a single range-partitioned write).
    State stays bounded by the 2h watermark horizon — O(keys in window),
    the requirement for an unbounded stream."""
    import uuid

    ev = load_table(spark, sf_dir, "events")
    stage_dir = _staged_time_sliced(spark, sf_dir, doubled=True)

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage_dir)
    )
    deduped = dedup_within_watermark(stream, ["event_id"], watermark="2 hours")
    name = f"q52mem{uuid.uuid4().hex[:8]}"
    run_to_memory(deduped, name, output_mode="append")
    return (
        spark.table(name)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"),
             F.round(F.sum("value"), 4).alias("sum_value"))
    )


def user_running_stats(stream: DataFrame) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: per-user
    running (event count, value sum), state carried across micro-batches
    with Arrow-batched pandas kernels — the extension point for stateful
    logic Spark has no built-in for (CUSUM drift detectors, session
    models, online feature stats)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def kernel(key, pdfs, state: "GroupState"):
        import pandas as pd

        (uid,) = key
        n, s = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf["value"].sum())
        state.update((n, s))
        yield pd.DataFrame(
            {"user_id": [uid], "n_events": [n], "sum_value": [s]}
        )

    return (
        stream.groupBy("user_id")
        .applyInPandasWithState(
            kernel,
            outputStructType="user_id long, n_events long, sum_value double",
            stateStructType="n long, s double",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


@query(
    "q53_stateful_user_stats",
    oracle="""
    SELECT user_id, count(*) AS n_events,
           ROUND(sum(value), 4) AS sum_value
    FROM events GROUP BY user_id
    """,
)
def q53_stateful_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user running stats through a custom pandas-with-state kernel,
    fed incrementally (4 files, one per trigger). Update mode emits one
    row per (user, batch); the final answer per user is the emission
    with the highest running count (monotone), reconciled with
    max/max_by — then hash-checked against the one-shot batch SQL."""
    import uuid

    ev = load_table(spark, sf_dir, "events")
    stage_dir = _staged_plain(spark, sf_dir)

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage_dir)
    )
    stats = user_running_stats(stream)
    name = f"q53mem{uuid.uuid4().hex[:8]}"
    run_to_memory(stats, name, output_mode="update")
    return (
        spark.table(name)
        .groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.round(F.max_by("sum_value", "n_events"), 4).alias("sum_value"),
        )
    )


@query(
    "q58_stream_static_join",
    oracle="""
    WITH top_users AS (
      SELECT user_id FROM events
      GROUP BY user_id ORDER BY sum(value) DESC, user_id ASC LIMIT 5
    )
    SELECT e.user_id, e.event_type, count(*) AS n,
           ROUND(sum(e.value), 4) AS sum_value
    FROM events e JOIN top_users t ON e.user_id = t.user_id
    GROUP BY e.user_id, e.event_type
    """,
)
def q58_stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join: an incremental stream enriched against a
    static dimension (here: the top-5 users by lifetime value, computed
    batch-side). The static side is broadcast into every micro-batch —
    the standard pattern for joining a stream against reference data
    without shuffling the stream. Aggregation runs per (user, type) in
    complete mode; the final state must equal the one-shot batch SQL."""
    import uuid

    ev = load_table(spark, sf_dir, "events")
    top = (
        ev.groupBy("user_id").agg(F.sum("value").alias("__tv"))
        .orderBy(F.desc("__tv"), F.asc("user_id")).limit(5)
        .select("user_id")
    )
    stage_dir = _staged_plain(spark, sf_dir)
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage_dir)
    )
    agg = (
        stream.join(F.broadcast(top), "user_id")
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("n"),
             F.round(F.sum("value"), 4).alias("sum_value"))
    )
    name = f"q58mem{uuid.uuid4().hex[:8]}"
    run_to_memory(agg, name, output_mode="complete")
    return spark.table(name)


@query(
    "q79_stream_sessions",
    oracle="""
    WITH s AS (
      SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w >= INTERVAL '30 minutes'
                  THEN 1 ELSE 0 END AS brk
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), g AS (
      SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                               ROWS UNBOUNDED PRECEDING) AS sid
      FROM s
    )
    SELECT user_id,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           strftime(max(ts) + INTERVAL '30 minutes',
                    '%Y-%m-%d %H:%M:%S') AS session_end,
           count(*) AS n_events, ROUND(sum(value), 4) AS sum_value
    FROM g GROUP BY user_id, sid
    """,
)
def q79_stream_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming session windows (the incremental twin of the batch
    lag-gap sessionize, q25): events consumed one file per trigger;
    `session_window` state merges windows that overlap within the gap
    across micro-batches. Oracle = the closed-form batch
    sessionization — a new session starts when the gap to the previous
    event is ≥ 30 min, and session_end = last_ts + gap (Spark's
    window-end convention, end-exclusive). Complete mode emits the
    final merged state regardless of watermark position; state size in
    a real deployment is bounded by the watermark (O(open sessions)),
    not stream length.

    Staging must be TIME-SLICED files written in time order (q52's
    lesson): unlike the plain windowed aggregate (q39), the
    session-merge path drops watermark-late INPUT even in complete
    mode, so a hash-partitioned staging (every file spans the full
    time range) silently loses ~half the sessions once file 1 has
    advanced the watermark to end-of-stream − 2 h."""
    import uuid

    ev = load_table(spark, sf_dir, "events")
    stage_dir = _staged_time_sliced(spark, sf_dir)
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage_dir)
    )
    agg = session_windows(stream, gap="30 minutes", watermark="2 hours")
    name = f"q79mem{uuid.uuid4().hex[:8]}"
    run_to_memory(agg, name, output_mode="complete")
    return spark.table(name).select(
        "user_id",
        F.date_format("session_start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        F.date_format("session_end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
        "n_events",
        F.round("sum_value", 4).alias("sum_value"),
    )


@query(
    "q92_stream_stream_join",
    oracle="""
    SELECT v.user_id, v.event_id AS view_id, p.event_id AS purchase_id
    FROM events v JOIN events p
      ON v.user_id = p.user_id
     AND v.event_type = 'view' AND p.event_type = 'purchase'
     AND p.ts > v.ts AND p.ts <= v.ts + INTERVAL '1 hour'
    """,
)
def q92_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream inner join with an event-time range condition:
    purchases attributed to a same-user view within the previous hour
    (the incremental twin of the batch range join, q49). Both sides
    carry watermarks, so the join STATE is bounded — a buffered view
    is evicted once the purchase watermark passes view_ts + 1 h; the
    inner join emits each matched pair eagerly, so completeness needs
    only that state survive until the partner arrives (guaranteed:
    join range 1 h ≤ watermark 2 h, with time-ordered file slices so
    arrival order tracks event time). Oracle = the one-shot batch
    range join."""
    import uuid

    ev = load_table(spark, sf_dir, "events")
    stage_dir = _staged_time_sliced(spark, sf_dir)

    def _side(event_type: str, idc: str, tsc: str) -> DataFrame:
        return (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1).parquet(stage_dir)
            .filter(F.col("event_type") == event_type)
            .select("user_id", F.col("event_id").alias(idc),
                    F.col("ts").alias(tsc))
            .withWatermark(tsc, "2 hours")
        )

    views = _side("view", "view_id", "__vts")
    purchases = _side("purchase", "purchase_id", "__pts")
    joined = views.join(
        purchases,
        (views["user_id"] == purchases["user_id"])
        & (F.col("__pts") > F.col("__vts"))
        & (F.col("__pts") <= F.col("__vts") + F.expr("INTERVAL 1 HOUR")),
    ).select(views["user_id"], "view_id", "purchase_id")
    name = f"q92mem{uuid.uuid4().hex[:8]}"
    run_to_memory(joined, name, output_mode="append")
    return spark.table(name)


# ---------------------------------------------------------------------------
# q149 — exactly-once parquet sink via foreachBatch idempotent writes
# ---------------------------------------------------------------------------


def stream_to_parquet_idempotent(stream: DataFrame, dest: str,
                                 checkpoint: str):
    """The production exactly-once file-sink pattern: foreachBatch writes
    each micro-batch to a DETERMINISTIC per-epoch directory with
    overwrite. Structured Streaming replays a failed epoch with the SAME
    epoch_id, so the overwrite makes redelivery idempotent — at-least-
    once execution + idempotent write = exactly-once output, without the
    file-sink's single-driver commit-log bottleneck. Each epoch directory
    is written in parallel by the batch's tasks; nothing funnels through
    the driver."""
    import os

    def write_batch(bdf: DataFrame, epoch_id: int) -> None:
        bdf.write.mode("overwrite").parquet(
            os.path.join(dest, f"epoch={epoch_id}"))

    q = (
        stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return q


@query(
    "q149_stream_sink_exactly_once",
    oracle="""
    SELECT event_type, count(*) AS n,
           ROUND(sum(value), 4) AS sum_value,
           CAST(min(event_id) AS BIGINT) AS min_id,
           CAST(max(event_id) AS BIGINT) AS max_id
    FROM events GROUP BY event_type
    """,
)
def q149_stream_sink_exactly_once(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end exactly-once streaming sink: events consumed one file
    per trigger (4 epochs), each micro-batch landed in its own
    epoch=N parquet directory by foreachBatch, the landed dataset read
    back and aggregated — the result must equal aggregating the source
    directly (no lost or duplicated rows across epochs)."""
    from auto_ml_platform_with_timeseries_data_spark.staging import staging_dir

    ev = load_table(spark, sf_dir, "events")
    stage_dir = _staged_plain(spark, sf_dir)
    # stable tags: the pre-wipe doubles as the fresh-checkpoint contract
    dest = staging_dir("sink_dest")
    ckpt = staging_dir("sink_ckpt")
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage_dir)
    )
    stream_to_parquet_idempotent(stream, dest, ckpt)
    back = spark.read.parquet(dest).drop("epoch")
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 4).alias("sum_value"),
        F.min("event_id").alias("min_id"),
        F.max("event_id").alias("max_id"),
    )


# ---------------------------------------------------------------------------
# q170 — streaming incremental dedup against a STATIC corpus index
# ---------------------------------------------------------------------------


def _staged_delta_docs(spark: SparkSession, sf_dir: str) -> str:
    """The q154 delta batch (doc_id % 5 == 0) staged as 4 sequential
    doc_id-ordered files — the 'today's crawl arrives in chunks'
    shape."""
    key = ("delta_docs4", sf_dir)
    if key not in _STAGE_CACHE:
        from pyspark.sql.window import Window

        from auto_ml_platform_with_timeseries_data_spark.staging import (
            staging_dir,
        )

        docs = load_table(spark, sf_dir, "documents") \
            .filter(F.col("doc_id") % 5 == 0)
        d = staging_dir("stream_delta_docs", fresh=True)
        sliced = docs.withColumn(
            "__slice", F.ntile(4).over(Window.orderBy("doc_id")))
        _write_ordered_slices(sliced, d)
        _STAGE_CACHE[key] = d
    return _STAGE_CACHE[key]


@query(
    "q170_stream_incremental_dedup",
    oracle="""
    WITH fp AS (
      SELECT doc_id,
             md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
      FROM documents
    ),
    idx AS (
      SELECT DISTINCT fp FROM fp WHERE doc_id % 5 != 0
    ),
    delta AS (SELECT doc_id, fp FROM fp WHERE doc_id % 5 = 0),
    firsts AS (SELECT DISTINCT fp FROM delta)
    SELECT (SELECT count(*) FROM delta) AS n_stream,
           (SELECT count(*) FROM firsts) AS n_first_seen,
           (SELECT count(*) FROM firsts f
             WHERE EXISTS (SELECT 1 FROM idx i WHERE i.fp = f.fp))
             AS n_dup_corpus,
           (SELECT count(*) FROM firsts f
             WHERE NOT EXISTS (SELECT 1 FROM idx i WHERE i.fp = f.fp))
             AS n_novel,
           (SELECT count(*) FROM delta)
             - (SELECT count(*) FROM firsts) AS n_dup_delta
    """,
)
def q170_stream_incremental_dedup(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """The q154 pipeline IN FLIGHT: a document stream (4 micro-batches)
    is deduplicated against itself with streaming `dropDuplicates` on
    the content fingerprint (state carried ACROSS micro-batches — a
    dup arriving three triggers after its first sighting is still
    dropped), then each surviving first-sighting classifies against
    the STATIC corpus fingerprint index via a stream-static join (the
    index is a batch DataFrame joined into every micro-batch — Spark
    re-plans it per trigger, no state). Emitted counts are
    order-independent (which representative of a dup family survives
    is arrival-order-dependent; how MANY survive is not), so the batch
    oracle pins them exactly.

    Production note: dropDuplicates without a watermark keeps state
    per distinct fingerprint forever — right for a bounded backfill
    like this; an unbounded crawl stream uses
    dropDuplicatesWithinWatermark (q52) once fingerprints carry event
    time, or the batch-incremental q154/q165 loop."""
    import uuid

    from auto_ml_platform_with_timeseries_data_spark.functions.text_exprs import (
        normalize_text,
    )
    from auto_ml_platform_with_timeseries_data_spark.operators.dedup import (
        fingerprint_index,
    )

    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    idx = fingerprint_index(corpus, "doc_id", "text") \
        .withColumnRenamed("fingerprint", "__fp")
    stage_dir = _staged_delta_docs(spark, sf_dir)

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage_dir)
    )
    firsts = (
        stream.select(F.col("doc_id"),
                      F.md5(normalize_text("text")).alias("__fp"))
        .dropDuplicates(["__fp"])
        .join(idx, "__fp", "left")
        .select(
            "doc_id",
            F.when(F.col("canonical_id").isNotNull(), F.lit("dup_corpus"))
            .otherwise(F.lit("novel")).alias("status"),
        )
    )
    name = f"q170mem{uuid.uuid4().hex[:8]}"
    run_to_memory(firsts, name, output_mode="append")
    n_stream = docs.filter(F.col("doc_id") % 5 == 0).count()
    emitted = spark.table(name)
    return emitted.agg(
        F.lit(n_stream).cast("long").alias("n_stream"),
        F.count(F.lit(1)).alias("n_first_seen"),
        F.sum((F.col("status") == "dup_corpus").cast("long"))
        .alias("n_dup_corpus"),
        F.sum((F.col("status") == "novel").cast("long")).alias("n_novel"),
        (F.lit(n_stream) - F.count(F.lit(1))).cast("long")
        .alias("n_dup_delta"),
    )


# ---------------------------------------------------------------------------
# q182 — the daily-crawl index loop AS A STREAM: per-micro-batch
# classify-and-append against a PERSISTED on-disk fingerprint index
# (q154's consume half + q165's maintenance half, fused into
# foreachBatch)
# ---------------------------------------------------------------------------


def _staged_doc_batches(spark: SparkSession, sf_dir: str) -> str:
    """ALL documents as 4 sequential doc_id-ordered files — four crawl
    'days' arriving in order."""
    key = ("doc_batches4", sf_dir)
    if key not in _STAGE_CACHE:
        from pyspark.sql.window import Window

        from auto_ml_platform_with_timeseries_data_spark.staging import (
            staging_dir,
        )

        docs = load_table(spark, sf_dir, "documents")
        d = staging_dir("stream_doc_batches", fresh=True)
        sliced = docs.withColumn(
            "__slice", F.ntile(4).over(Window.orderBy("doc_id")))
        _write_ordered_slices(sliced, d)
        _STAGE_CACHE[key] = d
    return _STAGE_CACHE[key]


@query(
    "q182_stream_index_maintenance",
    oracle="""
    SELECT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
             AS fingerprint,
           CAST(min(doc_id) AS BIGINT) AS canonical_id
    FROM documents
    GROUP BY 1
    """,
)
def q182_stream_index_maintenance(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """The rolling dedup-index loop run END TO END as a stream: four
    doc_id-ordered micro-batches each (a) fingerprint themselves, (b)
    anti-join the CURRENT on-disk index to find novel fingerprints, and
    (c) append exactly those novels back to the index directory — the
    q154 classify + q165 maintain cycle inside one foreachBatch. After
    the stream drains, the persisted index must equal the batch-built
    index over the whole corpus: every distinct fingerprint exactly
    once, canonicalized to its global min doc_id (batches partition the
    id range in order, so first-sighting min == global min — the
    arrival-order invariant the maintenance contract guarantees).

    State lives ON DISK, not in stream memory: each batch reads the
    index directory fresh, so the loop survives restarts and the state
    size is the index, not the watermark horizon — the shape a rolling
    100 TB crawl actually runs (per-day batch = one trigger).

    Replay caveat: foreachBatch is at-least-once, and a REPLAYED epoch
    would append its novels twice under plain mode=append. Production
    hardening is the q149 pattern — write each epoch's novels to an
    epoch={id} subdirectory with overwrite (idempotent redelivery) and
    union the epoch dirs on read; kept plain here so the maintained
    index stays directly value-hash-comparable to the batch oracle."""
    import glob
    import os
    import uuid

    from auto_ml_platform_with_timeseries_data_spark.operators.dedup import (
        fingerprint_index,
    )
    from auto_ml_platform_with_timeseries_data_spark.staging import (
        staging_dir,
    )

    docs = load_table(spark, sf_dir, "documents")
    stage_dir = _staged_doc_batches(spark, sf_dir)
    index_dir = staging_dir("stream_fp_index")   # wiped per invocation
    ckpt = staging_dir("stream_fp_index_ckpt")

    def upsert(bdf: DataFrame, epoch_id: int) -> None:
        sp = bdf.sparkSession
        delta_idx = fingerprint_index(bdf, "doc_id", "text")
        if glob.glob(os.path.join(index_dir, "part-*")):
            idx = sp.read.parquet(index_dir).select("fingerprint")
            delta_idx = delta_idx.join(idx, "fingerprint", "left_anti")
        delta_idx.write.mode("append").parquet(index_dir)

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage_dir)
    )
    q = (stream.writeStream.foreachBatch(upsert)
         .option("checkpointLocation", ckpt)
         .queryName(f"q182idx{uuid.uuid4().hex[:8]}")
         .start())
    q.processAllAvailable()
    q.stop()
    return spark.read.parquet(index_dir).select("fingerprint",
                                                "canonical_id")


# ---------------------------------------------------------------------------
# q204 — streaming continuous aggregate: per-micro-batch merge into an
# epoch-versioned on-disk rollup (q196's refresh loop AS A STREAM; the
# maintained hypertable rollup a timeseries platform serves reads from)
# ---------------------------------------------------------------------------


def _staged_event_batches(spark: SparkSession, sf_dir: str) -> str:
    """ALL events as 4 sequential ts-ordered files — four ingest 'days'
    arriving in order."""
    key = ("event_batches4", sf_dir)
    if key not in _STAGE_CACHE:
        from pyspark.sql.window import Window

        from auto_ml_platform_with_timeseries_data_spark.staging import (
            staging_dir,
        )

        ev = load_table(spark, sf_dir, "events")
        d = staging_dir("stream_event_batches", fresh=True)
        sliced = ev.withColumn(
            "__slice", F.ntile(4).over(Window.orderBy("ts", "event_id")))
        _write_ordered_slices(sliced, d)
        _STAGE_CACHE[key] = d
    return _STAGE_CACHE[key]


def rollup_partial(bdf: DataFrame) -> DataFrame:
    """Hourly (bucket, count, integer-cent sum) partial of one batch."""
    return (bdf.select(
        F.date_trunc("hour", F.col("ts")).alias("bucket"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
        .alias("cents"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.sum("cents").alias("sum_cents")))


def rollup_merge(prev: DataFrame, delta: DataFrame) -> DataFrame:
    """Additive merge of two rollup versions — the count/sum merge
    algebra that makes the maintained aggregate associative (any batch
    arrival order yields the same final rollup)."""
    return (prev.unionByName(delta)
            .groupBy("bucket")
            .agg(F.sum("n_events").alias("n_events"),
                 F.sum("sum_cents").alias("sum_cents")))


def rollup_versions(state_root: str) -> dict[int, str]:
    """COMPLETE rollup versions on disk: ``epoch=N`` directories under
    ``state_root`` whose parquet commit marker (``_SUCCESS``) exists.

    This is the recovery source of truth — NOT driver memory. After a
    driver restart, a replayed epoch must still find its predecessor to
    merge against, and the epoch directories are the only state that
    survives the restart. Listing also excludes torn writes: a crash
    mid-write leaves a directory without ``_SUCCESS``, which a replay
    then overwrites atomically-enough (mode=overwrite clears it first).
    The listing is O(#epochs) driver-side names — bounded by the
    retention policy, never by data size.

    Listing goes through the Hadoop FileSystem API when a SparkSession
    is live, so ``state_root`` may carry any scheme the cluster's
    Hadoop conf resolves (HDFS, s3a, file) — the production deployments
    this guarantee targets. The ``os.listdir`` fallback covers plain
    local paths with no active session (unit tests, offline tooling)."""
    import os

    versions: dict[int, str] = {}
    spark = SparkSession.getActiveSession()
    if spark is not None:
        jvm = spark._jvm
        root = jvm.org.apache.hadoop.fs.Path(state_root)
        fs = root.getFileSystem(spark._jsc.hadoopConfiguration())
        if not fs.exists(root):
            return versions
        for st in fs.listStatus(root):
            name = st.getPath().getName()
            if not (st.isDirectory() and name.startswith("epoch=")):
                continue
            try:
                eid = int(name.split("=", 1)[1])
            except ValueError:
                continue
            if fs.exists(jvm.org.apache.hadoop.fs.Path(
                    st.getPath(), "_SUCCESS")):
                versions[eid] = st.getPath().toString()
        return versions
    try:
        names = os.listdir(state_root)
    except OSError:
        return versions
    for name in names:
        if not name.startswith("epoch="):
            continue
        try:
            eid = int(name.split("=", 1)[1])
        except ValueError:
            continue
        path = os.path.join(state_root, name)
        if os.path.exists(os.path.join(path, "_SUCCESS")):
            versions[eid] = path
    return versions


def rollup_merge_epoch(spark_or_bdf_session, bdf: DataFrame,
                       epoch_id: int, state_root: str) -> str:
    """One micro-batch step of the maintained rollup: aggregate the
    batch, merge with the newest on-disk predecessor version, write
    ``epoch={epoch_id}``. Returns the written path. Restart-safe by
    construction — the predecessor comes from ``rollup_versions``
    (disk), so a replay after driver loss re-merges against the same
    predecessor it used the first time and overwrites its OWN
    directory: idempotent per epoch."""
    import os

    sp = spark_or_bdf_session
    delta = rollup_partial(bdf)
    # previous version = the newest COMPLETE epoch STRICTLY BELOW this
    # one — not simply "the last write": a replayed epoch must merge
    # against its predecessor again, never against its own earlier
    # output (which would double-count the batch)
    versions = rollup_versions(state_root)
    prev = [e for e in versions if e < epoch_id]
    if prev:
        delta = rollup_merge(sp.read.parquet(versions[max(prev)]), delta)
    out = os.path.join(state_root, f"epoch={epoch_id}")
    delta.write.mode("overwrite").parquet(out)
    return out


@query(
    "q204_stream_continuous_aggregate",
    oracle="""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS bucket,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS sum_cents
    FROM events GROUP BY 1
    """,
)
def q204_stream_continuous_aggregate(spark: SparkSession,
                                     sf_dir: str) -> DataFrame:
    """The hourly events rollup maintained AS A STREAM: four ts-ordered
    micro-batches each aggregate themselves to (bucket, count, cents)
    partials and merge additively into the previous on-disk rollup
    version, writing the merged rollup to an epoch={id} directory with
    overwrite. After the stream drains, the newest version must equal
    the one-shot batch rollup of the whole table — every bucket's
    count and integer-cent sum value-hash-checked.

    Two production properties the epoch-versioned merge buys:
    - EXACTLY-ONCE under foreachBatch's at-least-once contract: a
      replayed epoch re-reads the same previous version and overwrites
      its OWN directory — the merge is idempotent per epoch (the q149
      sink pattern applied to stateful maintenance, hardening the
      append-only caveat q182 documents). The predecessor lookup reads
      the ON-DISK ``epoch=*`` listing (``rollup_versions``), not driver
      memory, so the guarantee survives a real driver RESTART with
      checkpoint recovery: the replayed batch still finds its
      predecessor (tests/test_streaming.py simulates this with a fresh
      stream + checkpoint over the same state_root).
    - Bounded state: each version holds one row per bucket — the
      retention window's bucket count, never the event count. A late
      row ADDS into its existing bucket (sum/count merge algebra), the
      same late-data semantics q196 proves for the batch refresh.
    Serving reads always hit the newest complete version — snapshot
    isolation for free from immutable epoch directories."""
    import uuid

    from auto_ml_platform_with_timeseries_data_spark.staging import (
        staging_dir,
    )

    ev = load_table(spark, sf_dir, "events")
    stage_dir = _staged_event_batches(spark, sf_dir)
    state_root = staging_dir("stream_cagg")       # wiped per invocation
    ckpt = staging_dir("stream_cagg_ckpt")

    def merge(bdf: DataFrame, epoch_id: int) -> None:
        rollup_merge_epoch(bdf.sparkSession, bdf, epoch_id, state_root)

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage_dir)
    )
    q = (stream.writeStream.foreachBatch(merge)
         .option("checkpointLocation", ckpt)
         .queryName(f"q204cagg{uuid.uuid4().hex[:8]}")
         .start())
    q.processAllAvailable()
    q.stop()
    versions = rollup_versions(state_root)
    return spark.read.parquet(versions[max(versions)]).select(
        F.date_format("bucket", "yyyy-MM-dd HH:mm:ss").alias("bucket"),
        F.col("n_events").cast("long").alias("n_events"),
        F.col("sum_cents").cast("long").alias("sum_cents"))


# ---------------------------------------------------------------------------
# q236 — the perceptual-index loop AS A STREAM (VERDICT r7 #7): q224's
# image-dHash maintenance inside foreachBatch, with q204's
# epoch-versioned on-disk state so the loop survives a driver restart
# — the hardening q182 documents as its replay caveat, applied to the
# perceptual tier.
# ---------------------------------------------------------------------------


def _staged_media_id_batches(spark: SparkSession, sf_dir: str,
                             hi: int) -> str:
    """doc_id < hi as 4 sequential id-ordered files — four crawl 'days'
    of media arriving in order (ids only; the media bytes synthesize
    map-side per batch, so the stream source stays tiny)."""
    key = ("media_id_batches4", sf_dir, hi)
    if key not in _STAGE_CACHE:
        from pyspark.sql.window import Window

        from auto_ml_platform_with_timeseries_data_spark.staging import (
            staging_dir,
        )

        ids = (load_table(spark, sf_dir, "documents").select("doc_id")
               .filter(F.col("doc_id") < hi))
        d = staging_dir("stream_media_ids", fresh=True)
        sliced = ids.withColumn(
            "__slice", F.ntile(4).over(Window.orderBy("doc_id")))
        _write_ordered_slices(sliced, d)
        _STAGE_CACHE[key] = d
    return _STAGE_CACHE[key]


def perceptual_index_epoch(sp: SparkSession, bdf: DataFrame,
                           epoch_id: int, state_root: str,
                           families: int) -> str:
    """One micro-batch of the maintained dHash index: synthesize +
    fingerprint ONLY the batch's media (delta-linear decode), reduce to
    one (fingerprint → min id) row per distinct value, anti-join the
    union of COMPLETE epochs STRICTLY BELOW this one, and overwrite
    ``epoch={epoch_id}`` with exactly the novel fingerprints.

    Restart-safe by the q204 discipline: the known-fingerprint set
    comes from the ``_SUCCESS``-gated on-disk ``epoch=*`` listing
    (``rollup_versions`` — the listing is index-agnostic), never from
    driver memory, and a replayed epoch anti-joins its PREDECESSORS
    only before overwriting its OWN directory — idempotent per epoch,
    and its own torn first attempt is invisible (no ``_SUCCESS``).
    State per epoch is that epoch's novel fingerprints; the union of
    epoch directories IS the index, so canonical ids never change once
    assigned (the q165/q224 contract)."""
    import os

    from auto_ml_platform_with_timeseries_data_spark.operators.multimodal import (
        image_dhash,
        synth_bmp_media,
    )

    delta_idx = (image_dhash(synth_bmp_media(bdf, families=families))
                 .groupBy("dhash_lo", "dhash_hi")
                 .agg(F.min("media_id").alias("canonical_id")))
    versions = rollup_versions(state_root)
    prev = [p for e, p in versions.items() if e < epoch_id]
    if prev:
        known = sp.read.parquet(*prev).select("dhash_lo", "dhash_hi")
        delta_idx = delta_idx.join(known, ["dhash_lo", "dhash_hi"],
                                   "left_anti")
    out = os.path.join(state_root, f"epoch={epoch_id}")
    delta_idx.write.mode("overwrite").parquet(out)
    return out


def _stream_pidx_oracle() -> str:
    from auto_ml_platform_with_timeseries_data_spark.operators.multimodal import (
        _SPIDX_FAM,
        _SPIDX_HI,
        dhash_half_sql,
    )

    return f"""
    WITH hc AS (
      SELECT doc_id, {dhash_half_sql(_SPIDX_FAM, 0, 32)} AS dhash_lo,
             {dhash_half_sql(_SPIDX_FAM, 32, 64)} AS dhash_hi
      FROM documents WHERE doc_id < {_SPIDX_HI}
    )
    SELECT dhash_lo, dhash_hi, CAST(min(doc_id) AS BIGINT)
             AS canonical_id
    FROM hc GROUP BY 1, 2
    """


@query("q236_stream_perceptual_index", oracle=_stream_pidx_oracle())
def q236_stream_perceptual_index(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """The image-dHash index maintained END TO END as a stream: four
    doc_id-ordered micro-batches of media ids each synthesize and
    fingerprint ONLY their own media, anti-join the epochs already on
    disk, and write their novel fingerprints to an epoch={id}
    directory (overwrite — idempotent under foreachBatch's
    at-least-once replay, restart-safe via the _SUCCESS-gated epoch
    listing). After the stream drains, the UNION of epoch directories
    must equal the one-shot batch index over all the media: every
    distinct fingerprint exactly once, canonicalized to its global min
    id (batches partition the id range in order, so first-sighting
    min == global min). Every (fingerprint pair, canonical) row
    value-hash-checked against the oracle's arithmetic recomputation
    of the dHash from the generation rule."""
    import uuid

    from auto_ml_platform_with_timeseries_data_spark.operators.multimodal import (
        _SPIDX_FAM,
        _SPIDX_HI,
    )
    from auto_ml_platform_with_timeseries_data_spark.staging import (
        staging_dir,
    )

    stage_dir = _staged_media_id_batches(spark, sf_dir, _SPIDX_HI)
    state_root = staging_dir("stream_pidx")      # wiped per invocation
    ckpt = staging_dir("stream_pidx_ckpt")

    def step(bdf: DataFrame, epoch_id: int) -> None:
        perceptual_index_epoch(bdf.sparkSession, bdf, epoch_id,
                               state_root, _SPIDX_FAM)

    stream = (
        spark.readStream.schema("doc_id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(stage_dir)
    )
    q = (stream.writeStream.foreachBatch(step)
         .option("checkpointLocation", ckpt)
         .queryName(f"q236pidx{uuid.uuid4().hex[:8]}")
         .start())
    q.processAllAvailable()
    q.stop()
    versions = rollup_versions(state_root)
    return spark.read.parquet(*versions.values()).select(
        "dhash_lo", "dhash_hi", F.col("canonical_id").cast("long")
        .alias("canonical_id"))


def ivfpq_index_epoch(sp: SparkSession, bdf: DataFrame, epoch_id: int,
                      state_root: str, id_col: str, vec_col: str,
                      centroids, codebooks) -> str:
    """One micro-batch of the maintained COMPOSED ANN index: cell+code
    the batch's vectors against the EXISTING centroids/codebooks (the
    q234 append contract — one Arrow pass, no retrain), drop ids whose
    rows already live in a COMPLETE epoch strictly below this one
    (idempotent under at-least-once replay of ingestion overlap), and
    overwrite ``epoch={epoch_id}`` with the batch's index rows. The
    union of epoch directories IS the (id, cell, codes) index
    ``cosine_topk_ivfpq`` probes — and because each epoch is written
    partitioned by nothing (epoch dirs are the version axis), a
    serving compaction can repartition the union by cell for the
    q233 pruning layout. Same restart discipline as q204/q236: the
    known-id set comes from the ``_SUCCESS``-gated on-disk listing,
    never driver memory."""
    import os

    from auto_ml_platform_with_timeseries_data_spark.operators.similarity import (
        ivfpq_encode,
    )

    enc = ivfpq_encode(bdf, id_col, vec_col, centroids, codebooks)
    versions = rollup_versions(state_root)
    prev = [p for e, p in versions.items() if e < epoch_id]
    if prev:
        known = sp.read.parquet(*prev).select(id_col)
        enc = enc.join(known, id_col, "left_anti")
    out = os.path.join(state_root, f"epoch={epoch_id}")
    enc.write.mode("overwrite").parquet(out)
    return out


# ---------------------------------------------------------------------------
# q251 — streaming NEAR-dup screening (VERDICT r8 #4): q236's
# epoch-versioned index loop composed with q230's banded near screen.
# Per micro-batch: fingerprint ONLY the batch's media, near-screen the
# batch against the union of COMPLETE prior epochs' index (banded
# Hamming join — delta band rows + true candidates, never corpus²),
# write the pairs to screen/epoch={id}, THEN append the batch's novel
# exact fingerprints to the index. This closes the incremental-
# multimodal matrix: exact maintenance (q224-q226), batch near screens
# (q230/q237/q238), streaming exact (q236), streaming near (here).
# ---------------------------------------------------------------------------


def perceptual_screen_epoch(sp: SparkSession, bdf: DataFrame,
                            epoch_id: int, state_root: str,
                            screen_root: str) -> None:
    """One micro-batch of screen-then-append: both the screen output
    and the index delta anti-join/band-join ONLY epochs STRICTLY BELOW
    this one, so an at-least-once replay of the in-flight epoch
    regenerates byte-identical outputs and overwrites its own two
    directories — idempotent regardless of which write a crash tore
    (the q204/q236 restart discipline, now over paired state)."""
    import os

    from auto_ml_platform_with_timeseries_data_spark.operators.dedup import (
        hamming_band_pairs_delta,
    )
    from auto_ml_platform_with_timeseries_data_spark.operators.multimodal import (
        _NP_MAXH,
        image_dhash,
        synth_bmp_media_mixed,
    )

    fp = (image_dhash(synth_bmp_media_mixed(bdf))
          .localCheckpoint(eager=True))
    versions = rollup_versions(state_root)
    prev = [p for e, p in versions.items() if e < epoch_id]
    delta_idx = (fp.groupBy("dhash_lo", "dhash_hi")
                 .agg(F.min("media_id").alias("canonical_id")))
    if prev:
        known = sp.read.parquet(*prev)
        pairs = hamming_band_pairs_delta(
            fp,
            known.select(F.col("canonical_id").alias("media_id"),
                         "dhash_lo", "dhash_hi"),
            "media_id", [("dhash_lo", 32), ("dhash_hi", 32)], _NP_MAXH)
        delta_idx = delta_idx.join(
            known.select("dhash_lo", "dhash_hi"),
            ["dhash_lo", "dhash_hi"], "left_anti")
    else:
        pairs = sp.createDataFrame(
            [], "delta_id long, corpus_id long, hamming int")
    pairs.write.mode("overwrite").parquet(
        os.path.join(screen_root, f"epoch={epoch_id}"))
    delta_idx.write.mode("overwrite").parquet(
        os.path.join(state_root, f"epoch={epoch_id}"))


def _stream_near_screen_oracle() -> str:
    from auto_ml_platform_with_timeseries_data_spark.operators.multimodal import (
        _NP_DOCS,
        _NP_MAXH,
        _mixed_dhash_cte,
    )

    return f"""
    WITH ids AS (
      SELECT doc_id, ntile(4) OVER (ORDER BY doc_id) AS b
      FROM documents WHERE doc_id < {_NP_DOCS}
    ),
    h0 AS ({_mixed_dhash_cte()}),
    h AS (
      SELECT h0.doc_id, ids.b, h0.dhash_lo, h0.dhash_hi
      FROM h0 JOIN ids ON h0.doc_id = ids.doc_id
    ),
    canon AS (
      SELECT dhash_lo, dhash_hi,
             CAST(min(doc_id) AS BIGINT) AS canonical_id,
             min(b) AS b0
      FROM h GROUP BY 1, 2
    )
    SELECT d.doc_id AS delta_id, c.canonical_id AS corpus_id,
           CAST(bit_count(xor(d.dhash_lo, c.dhash_lo))
                + bit_count(xor(d.dhash_hi, c.dhash_hi)) AS INT)
             AS hamming
    FROM h d JOIN canon c ON c.b0 < d.b
    WHERE bit_count(xor(d.dhash_lo, c.dhash_lo))
          + bit_count(xor(d.dhash_hi, c.dhash_hi)) <= {_NP_MAXH}
    """


@query("q251_stream_near_screen", oracle=_stream_near_screen_oracle())
def q251_stream_near_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling near-dup screening END TO END as a stream: four
    doc_id-ordered micro-batches of mixed-family media each fingerprint
    their own images, band-join the on-disk index of every COMPLETE
    earlier epoch (near pairs at Hamming ≤ 2 land in
    screen/epoch={id}), then append their novel fingerprints. After
    the drain, the union of screen epochs must equal the batch
    semantics the oracle states directly: every (batch doc, earlier-
    batch canonical) pair within the Hamming bound — the q230 screen
    run incrementally, with the pigeonhole recall bound per pair.
    Every (delta, corpus, hamming) row value-hash-checked against the
    arithmetic dHash recomputation."""
    import uuid

    from auto_ml_platform_with_timeseries_data_spark.operators.multimodal import (
        _NP_DOCS,
    )
    from auto_ml_platform_with_timeseries_data_spark.staging import (
        staging_dir,
    )

    stage_dir = _staged_media_id_batches(spark, sf_dir, _NP_DOCS)
    state_root = staging_dir("stream_nscreen_idx")   # wiped per call
    screen_root = staging_dir("stream_nscreen_out")
    ckpt = staging_dir("stream_nscreen_ckpt")

    def step(bdf: DataFrame, epoch_id: int) -> None:
        perceptual_screen_epoch(bdf.sparkSession, bdf, epoch_id,
                                state_root, screen_root)

    stream = (
        spark.readStream.schema("doc_id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(stage_dir)
    )
    q = (stream.writeStream.foreachBatch(step)
         .option("checkpointLocation", ckpt)
         .queryName(f"q251nscreen{uuid.uuid4().hex[:8]}")
         .start())
    q.processAllAvailable()
    q.stop()
    screens = rollup_versions(screen_root)
    return spark.read.parquet(*screens.values()).select(
        F.col("delta_id").cast("long").alias("delta_id"),
        F.col("corpus_id").cast("long").alias("corpus_id"),
        F.col("hamming").cast("int").alias("hamming"))


# ---------------------------------------------------------------------------
# q350 — FLEET TRIAGE ON ARRIVAL (VERDICT r14 #5): the reference's demo
# story ("detect the failing engine", /root/reference/README.md:40-47)
# is an on-arrival read, not a batch job. q346's composed triage
# (collective residual windows + MAD point outliers + matrix-profile
# discord per series) maintained inside the q204/q236 epoch-versioned
# incremental loop: per micro-batch, recompute evidence for the series
# the batch TOUCHED over their full history, leave every untouched
# series' stored evidence untouched, and re-rank at read time over
# fleet cardinality. Work per epoch is touched-series detector cost +
# a fleet-sized rank — on a real fleet where a day's data touches a
# sliver of the fleet, that is the incremental win; the staged demo
# batches touch everything, which is the worst case, not the contract.
# ---------------------------------------------------------------------------


def fleet_triage_epoch(sp: SparkSession, bdf: DataFrame, epoch_id: int,
                       events_root: str, evid_root: str,
                       n_buckets: int = 64) -> None:
    """One micro-batch of incrementally-maintained fleet triage: store
    the batch's non-null-valued events under ``events/epoch={id}``,
    then recompute the UNRANKED per-series evidence
    (ts_features.fleet_evidence — the q346 detectors) for exactly the
    series the batch touched, over those series' full history = events
    epochs STRICTLY BELOW this one ∪ this batch, and overwrite
    ``evid/epoch={id}``.

    SCAN PRUNING (the 100 TB contract): the event store is
    hash-bucket-partitioned by series (``__bkt = pmod(xxhash64(
    user_id), n_buckets)``, a parquet partition directory per epoch),
    and the history read filters to the BATCH'S buckets before the
    exact left-semi on touched series — so an epoch's read cost is the
    touched buckets' files, not the fleet's. Without this the
    touched-series recompute was sliver-bound in COMPUTE but
    full-corpus-bound in SCAN (``read.parquet(*prev)`` walked every
    epoch's every file per micro-batch — at fleet scale the scan IS
    the cost). The bucket list is a bounded driver collect (at most
    ``n_buckets`` ints). Size ``n_buckets`` well above the series a
    typical batch touches and at least the cluster's parallelism —
    for a million-series fleet where a batch touches 0.1%, 1024
    buckets turns the per-epoch scan into ~read-what-arrived.
    INVARIANT: ``n_buckets`` is part of the store's on-disk contract
    and must stay constant for the store's lifetime — an epoch written
    under a different modulus would carry ``__bkt`` values the current
    batch's bucket filter silently drops (missing history, wrong
    evidence). Re-bucketing requires rewriting the store.

    Restart discipline (q204/q236/q251): both inputs come from the
    ``_SUCCESS``-gated on-disk epoch listing plus the replayed batch
    itself — never driver memory and never the epoch's own torn
    directories — so an at-least-once replay regenerates byte-identical
    outputs and overwrites its own two directories, idempotent
    regardless of which write a crash tore (bucketing is a pure
    function of the replayed rows, so the partition layout replays
    identically too; an EMPTY batch writes nothing and returns — a
    partitioned write of zero rows would leave a schemaless marker
    directory). The final triage read takes each series' evidence from
    its LATEST epoch (that epoch saw the series' full prefix) and
    ranks — so after the stream drains the table equals the one-shot
    q346 batch answer."""
    import os

    from auto_ml_platform_with_timeseries_data_spark.operators.ts_features import (
        fleet_evidence,
    )

    batch = (bdf.filter(F.col("value").isNotNull())
             .select("user_id", "ts", "event_id", "value")
             .withColumn("__bkt", F.pmod(F.xxhash64("user_id"),
                                         F.lit(n_buckets)).cast("int"))
             .localCheckpoint(eager=True))   # read 3× below; micro-batch-sized
    bkts = [r["__bkt"] for r in batch.select("__bkt").distinct().collect()]
    if not bkts:
        return
    versions = rollup_versions(events_root)
    prev = [p for e, p in versions.items() if e < epoch_id]
    hist = batch
    for p in prev:
        # one read per epoch dir, each with its own basePath: the
        # epoch=N dirs are themselves hive-style names, so a multi-path
        # read would refuse the "conflicting" layouts; per-path reads
        # also keep the _SUCCESS-gated listing as the only discovery.
        # #prev is bounded by epoch retention, not data size.
        stored = (sp.read.option("basePath", p).parquet(p)
                  .filter(F.col("__bkt").isin(bkts)))
        hist = hist.unionByName(stored)
    touched = batch.select("user_id").distinct()
    hist = hist.join(touched, "user_id", "left_semi")
    evid = fleet_evidence(
        hist.drop("__bkt"), "user_id", "ts", "event_id", "value",
        F.floor(F.col("value") * 100 + F.lit(0.5)), tie_break="event_id")
    # Cluster by bucket before the partitioned write: without this,
    # every write task emits a file into every bucket it saw (tasks x
    # buckets small files — measured 3.3x slower sliver epochs at 100x
    # from listing alone); clustered, an epoch carries ~one file per
    # bucket and the per-epoch listing stays O(touched buckets).
    (batch.repartition(n_buckets, F.col("__bkt"))
     .write.mode("overwrite").partitionBy("__bkt").parquet(
        os.path.join(events_root, f"epoch={epoch_id}")))
    evid.write.mode("overwrite").parquet(
        os.path.join(evid_root, f"epoch={epoch_id}"))


def _stream_fleet_triage_oracle() -> str:
    from auto_ml_platform_with_timeseries_data_spark.operators.ts_features import (
        _fleet_triage_oracle,
    )

    return _fleet_triage_oracle()


@query("q350_stream_fleet_triage", oracle=_stream_fleet_triage_oracle())
def q350_stream_fleet_triage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q346's fleet-triage table maintained END TO END as a stream:
    four ts-ordered micro-batches of events each update the
    epoch-versioned per-series evidence store (touched series only,
    full-history recompute — fleet_triage_epoch), then the drained
    store is read latest-epoch-wins per series and ranked. Every
    (triage_rank, user, n_collective, n_point, discord_dist2) row
    value-hash-checked against q346's composed batch oracle — the
    streaming loop must converge to the batch answer exactly."""
    import uuid

    from pyspark.sql.window import Window

    from auto_ml_platform_with_timeseries_data_spark.operators.ts_features import (
        triage_rank,
    )
    from auto_ml_platform_with_timeseries_data_spark.staging import (
        staging_dir,
    )

    ev = load_table(spark, sf_dir, "events")
    stage_dir = _staged_event_batches(spark, sf_dir)
    events_root = staging_dir("stream_ftri_events")   # wiped per call
    evid_root = staging_dir("stream_ftri_evid")
    ckpt = staging_dir("stream_ftri_ckpt")

    def step(bdf: DataFrame, epoch_id: int) -> None:
        fleet_triage_epoch(bdf.sparkSession, bdf, epoch_id,
                           events_root, evid_root)

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage_dir)
    )
    q = (stream.writeStream.foreachBatch(step)
         .option("checkpointLocation", ckpt)
         .queryName(f"q350ftri{uuid.uuid4().hex[:8]}")
         .start())
    q.processAllAvailable()
    q.stop()
    versions = rollup_versions(evid_root)
    frames = [spark.read.parquet(p).withColumn("__e", F.lit(e))
              for e, p in versions.items()]
    allv = frames[0]
    for f in frames[1:]:
        allv = allv.unionByName(f)
    wl = Window.partitionBy("user_id").orderBy(F.desc("__e"))
    latest = (allv.withColumn("__rk", F.row_number().over(wl))
              .filter(F.col("__rk") == 1).drop("__rk", "__e"))
    return triage_rank(latest, "user_id")
