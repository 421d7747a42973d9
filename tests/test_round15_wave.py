"""Round-15 wave: clone collapse + corpus-side bucket cap on the
delta-vs-corpus perceptual screen (the round-14 VERDICT WEAK item)."""

from __future__ import annotations


def _pairs(spark, delta_rows, corpus_rows, **kw):
    from auto_ml_platform_with_timeseries_data_spark.operators.dedup import (
        hamming_band_pairs_delta,
    )

    ddf = spark.createDataFrame(delta_rows, "id long, fp long")
    cdf = spark.createDataFrame(corpus_rows, "id long, fp long")
    return {(r["delta_id"], r["corpus_id"]): r["hamming"]
            for r in hamming_band_pairs_delta(
                ddf, cdf, "id", [("fp", 64)], max_hamming=3,
                **kw).collect()}


SIG = 0x0123456789ABCDEF


def test_clone_collapse_keeps_full_recall_under_tiny_bucket_cap(spark):
    """An over-full bucket made of CLONES: 50 corpus rows share one
    identical signature (one clone family), so after collapse the
    band buckets hold ONE distinct signature — a max_bucket_size=2
    cap cannot bind on duplication, and the full 50-member match
    list still comes back exactly."""
    corpus = [(i, SIG) for i in range(50)] + [(900, SIG ^ (0xFF << 40))]
    got = _pairs(spark, [(2000, SIG ^ 0b1)], corpus, max_bucket_size=2)
    assert got == {(2000, i): 1 for i in range(50)}


def test_bucket_cap_binds_on_distinct_signatures_and_match_survives(spark):
    """A genuinely over-full bucket (5 DISTINCT filler signatures share
    band 0 with the delta but are far in hamming) capped at 2: the
    fillers beyond the cap vanish from the candidate set — they were
    never matches — while the true 1-bit match, reachable through the
    un-full band-1/2/3 buckets, survives.  Output identical to the
    uncapped run."""
    fillers = [(i, (SIG & 0xFFFF) | (0x1111 * (i + 2)) << 16)
               for i in range(5)]           # share band 0 only, d >> 3
    corpus = fillers + [(9, SIG ^ (1 << 20))]
    want = {(2000, 9): 1}
    assert _pairs(spark, [(2000, SIG)], corpus) == want
    assert _pairs(spark, [(2000, SIG)], corpus, max_bucket_size=2) == want


def test_bucket_cap_amended_recall_drop_is_the_documented_one(spark):
    """The documented recall amendment: a ≤ max_hamming match whose
    EVERY shared-band bucket is over-full with smaller canonical ids
    is dropped under the cap (and found without it).  The match here
    differs in one bit of each of bands 1..3, so band 0 is its only
    shared bucket, and two smaller-id distinct fillers occupy the
    first max_bucket_size=2 slots of that bucket."""
    match = SIG ^ (1 << 16) ^ (1 << 32) ^ (1 << 48)   # d=3, shares band 0
    fillers = [(1, (SIG & 0xFFFF) | (0xAAAA555533 << 16)),
               (2, (SIG & 0xFFFF) | (0x5555AAAACC << 16))]
    corpus = fillers + [(9, match)]
    assert _pairs(spark, [(2000, SIG)], corpus) == {(2000, 9): 3}
    assert _pairs(spark, [(2000, SIG)], corpus, max_bucket_size=2) == {}


def test_top_m_rank_exact_across_collapsed_groups(spark):
    """top_m ranks (hamming, corpus_id) EXACTLY across clone groups
    whose members interleave by id: group A (d=1) has members {5, 100},
    group B (d=1) has member {7} — the true top-3 is 5, 7, 100, which
    the min(m, |group|)-per-group expansion must reproduce (a naive
    group-then-concat layout would emit 5, 100, 7)."""
    ga, gb = SIG ^ 0b1, SIG ^ 0b100
    corpus = [(5, ga), (100, ga), (7, gb), (300, SIG ^ 0xFF00FF)]
    got = _pairs(spark, [(2000, SIG)], corpus, top_m=3)
    assert got == {(2000, 5): 1, (2000, 7): 1, (2000, 100): 1}
    got2 = _pairs(spark, [(2000, SIG)], corpus, top_m=2)
    assert got2 == {(2000, 5): 1, (2000, 7): 1}


# streaming fleet triage (q350) — the q236 restart discipline


def test_fleet_triage_epochs_survive_restart_and_replay(spark, tmp_path):
    """q350's restart contract: evidence and event state are discovered
    from the _SUCCESS-gated on-disk epoch=* listings, so a driver
    restart followed by an at-least-once REPLAY of the in-flight epoch
    still converges the latest-epoch-wins triage table to the one-shot
    batch q346 answer; a torn directory is invisible."""
    import os

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from auto_ml_platform_with_timeseries_data_spark.operators.ts_features import (
        fleet_triage,
        triage_rank,
    )
    from auto_ml_platform_with_timeseries_data_spark.streaming.events import (
        fleet_triage_epoch,
        rollup_versions,
    )

    ev_root = str(tmp_path / "ftri_events")
    evid_root = str(tmp_path / "ftri_evid")
    os.makedirs(ev_root)
    os.makedirs(evid_root)

    # 3 series × 24 ordered points (series 30 gets a planted level
    # shift; series 10 a point spike; series 20 stays calm), split into
    # 3 time-ordered batches of 8 points each — plus one NULL-valued
    # row that must not create a series
    rows = []
    for u, pat in ((10, "spike"), (20, "calm"), (30, "shift")):
        for t in range(24):
            v = float(100 + (t % 5))
            if pat == "spike" and t == 7:
                v = 500.0
            if pat == "shift" and t >= 12:
                v += 80.0
            rows.append((u * 1000 + t, u, t, v))
    rows.append((99999, 40, 3, None))
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts long, value double")
    batches = [df.filter((F.col("ts") >= lo) & (F.col("ts") < lo + 8))
               for lo in (0, 8, 16)]

    # first driver lifetime: epochs 0 and 1 land
    fleet_triage_epoch(spark, batches[0], 0, ev_root, evid_root)
    fleet_triage_epoch(spark, batches[1], 1, ev_root, evid_root)
    # driver restart: no Python state survives; checkpoint recovery
    # replays the in-flight epoch 1 before moving on
    fleet_triage_epoch(spark, batches[1], 1, ev_root, evid_root)
    fleet_triage_epoch(spark, batches[2], 2, ev_root, evid_root)
    # a torn write from a crash must not be served
    os.makedirs(os.path.join(evid_root, "epoch=9"))

    versions = rollup_versions(evid_root)
    assert set(versions) == {0, 1, 2}
    frames = [spark.read.parquet(p).withColumn("__e", F.lit(e))
              for e, p in versions.items()]
    allv = frames[0]
    for f in frames[1:]:
        allv = allv.unionByName(f)
    wl = Window.partitionBy("user_id").orderBy(F.desc("__e"))
    latest = (allv.withColumn("__rk", F.row_number().over(wl))
              .filter(F.col("__rk") == 1).drop("__rk", "__e"))
    got = [tuple(r) for r in triage_rank(latest, "user_id")
           .orderBy("triage_rank").collect()]

    want = [tuple(r) for r in fleet_triage(
        df.filter(F.col("value").isNotNull()),
        "user_id", "ts", "event_id", "value",
        F.floor(F.col("value") * 100 + F.lit(0.5)),
        tie_break="event_id").orderBy("triage_rank").collect()]
    assert got == want
    assert {r[1] for r in got} == {10, 20, 30}   # NULL-only series absent


def test_fleet_event_store_is_bucket_partitioned_and_prunes(spark, tmp_path):
    """The q350 event store's 100 TB contract: epochs are written
    hash-bucket-partitioned by series, and the history read's
    ``__bkt IN (batch buckets)`` filter reaches the scan as a
    PartitionFilter — so an epoch's I/O is the touched buckets' files,
    not the fleet's (measured on the 10x staged corpus: 50 of 640
    files for a 5-series batch at 64 buckets)."""
    import os

    from pyspark.sql import functions as F

    from auto_ml_platform_with_timeseries_data_spark.plans import explain
    from auto_ml_platform_with_timeseries_data_spark.streaming.events import (
        fleet_triage_epoch,
    )

    ev_root = str(tmp_path / "ev")
    evid_root = str(tmp_path / "evid")
    os.makedirs(ev_root)
    os.makedirs(evid_root)
    rows = [(u * 100 + t, u, t, float(100 + t)) for u in range(40)
            for t in range(6)]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts long, value double")
    fleet_triage_epoch(spark, df, 0, ev_root, evid_root, n_buckets=16)

    epoch0 = os.path.join(ev_root, "epoch=0")
    assert any(n.startswith("__bkt=") for n in os.listdir(epoch0))
    rd = (spark.read.option("basePath", epoch0).parquet(epoch0)
          .filter(F.col("__bkt").isin([1, 2])))
    plan = explain.formatted_plan(rd)
    assert "PartitionFilters" in plan and "__bkt" in plan.split(
        "PartitionFilters", 1)[1][:200]


def test_fleet_triage_epoch_empty_batch_writes_nothing(spark, tmp_path):
    """An all-NULL-valued (hence empty after the filter) micro-batch
    returns without writing either epoch directory — a partitioned
    zero-row write would leave a schemaless marker dir that later
    epochs' reads trip over — and a subsequent real epoch proceeds
    normally against the unchanged store."""
    import os

    from auto_ml_platform_with_timeseries_data_spark.streaming.events import (
        fleet_triage_epoch,
        rollup_versions,
    )

    ev_root = str(tmp_path / "ev")
    evid_root = str(tmp_path / "evid")
    os.makedirs(ev_root)
    os.makedirs(evid_root)
    schema = "event_id long, user_id long, ts long, value double"
    real = spark.createDataFrame(
        [(i, 7, i, float(i)) for i in range(6)], schema)
    empty = spark.createDataFrame([(99, 8, 0, None)], schema)

    fleet_triage_epoch(spark, real, 0, ev_root, evid_root)
    fleet_triage_epoch(spark, empty, 1, ev_root, evid_root)
    assert set(rollup_versions(ev_root)) == {0}
    assert set(rollup_versions(evid_root)) == {0}
    fleet_triage_epoch(spark, real, 2, ev_root, evid_root)
    assert set(rollup_versions(evid_root)) == {0, 2}
