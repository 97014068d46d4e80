"""Structured Streaming parity tests.

Structured Streaming's contract is incremental execution of a batch
query — so each streaming op, drained with an availableNow trigger into
a memory sink, must produce EXACTLY the rows of its batch twin run on
the same files. That pins the streaming plans to the same semantics the
DuckDB oracle checks for the batch queries.
"""

from __future__ import annotations

import pytest

from pyspark.sql import Window
from pyspark.sql import functions as F

from algoritmos_etl_spark.sources.readers import load_table
from algoritmos_etl_spark.streaming import (
    read_event_stream,
    run_to_memory_sink,
    session_stats,
    sliding_stats,
    streaming_running_streaks,
    tumbling_stats,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def batch_events(spark):
    return load_table(spark, SF_DIR, "events").cache()


def _rows(df, *order_cols):
    return [tuple(r) for r in df.orderBy(*order_cols).collect()]


def test_tumbling_parity(spark, batch_events):
    streamed = run_to_memory_sink(
        tumbling_stats(read_event_stream(spark, SF_DIR)), "t_tumbling"
    )
    batch = tumbling_stats(batch_events)
    assert _rows(streamed, "window_start", "event_type") == _rows(
        batch, "window_start", "event_type"
    )


def test_sliding_parity_and_overlap(spark, batch_events):
    streamed = run_to_memory_sink(
        sliding_stats(read_event_stream(spark, SF_DIR)), "t_sliding"
    )
    batch = sliding_stats(batch_events)
    assert _rows(streamed, "window_start") == _rows(batch, "window_start")
    # every event lands in duration/slide = 2 windows
    n_events = batch_events.count()
    assert streamed.agg(F.sum("n_events")).first()[0] == 2 * n_events


def test_session_parity_and_batch_twin(spark, batch_events):
    streamed = run_to_memory_sink(
        session_stats(read_event_stream(spark, SF_DIR)), "t_sessions"
    )
    batch = session_stats(batch_events)
    assert _rows(streamed, "user_id", "session_start") == _rows(
        batch, "user_id", "session_start"
    )
    # session count matches the lag+cumsum formulation. session_window
    # semantics: an event at EXACTLY last_ts+gap starts a new session
    # (window is [start, last+gap)), hence >= on exact microseconds.
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = batch_events.withColumn(
        "new_session",
        (
            F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
            >= 1800 * 1_000_000
        ).cast("int"),
    ).fillna({"new_session": 1})
    lagged = (
        marked.groupBy("user_id")
        .agg(F.sum("new_session").alias("n_sessions"))
        .orderBy("user_id")
        .collect()
    )
    streamed_counts = (
        streamed.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .orderBy("user_id")
        .collect()
    )
    assert [tuple(r) for r in lagged] == [tuple(r) for r in streamed_counts]


def test_stateful_running_streaks(spark, batch_events):
    streamed = run_to_memory_sink(
        streaming_running_streaks(read_event_stream(spark, SF_DIR)),
        "t_streaks",
    )
    # batch twin: per-user running streak via lag + run-length recurrence
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    up = (F.col("value") > F.lag("value").over(w)).cast("int")
    flagged = batch_events.withColumn("up", F.coalesce(up, F.lit(0)))
    grp_w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = flagged.withColumn("rn", F.row_number().over(grp_w)).withColumn(
        "grp", F.col("rn") - F.sum("up").over(
            grp_w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    streak_w = Window.partitionBy("user_id", "grp").orderBy("ts", "event_id")
    batch = flagged.withColumn(
        "streak",
        F.when(F.col("up") == 1, F.row_number().over(streak_w) - 1).otherwise(0),
    ).select("user_id", "event_id", "streak")
    assert _rows(streamed, "user_id", "event_id") == _rows(
        batch, "user_id", "event_id"
    )


def test_stateful_state_survives_micro_batches(spark, batch_events, tmp_path):
    """Split events into 3 time-sliced files and force one file per
    micro-batch: per-user streak state must carry across batches and
    reproduce the single-batch (= batch-twin) result exactly."""
    from pyspark.sql.functions import ntile
    from pyspark.sql import Window

    out = tmp_path / "sliced"
    # 3 contiguous time slices; write in chronological order so the
    # file source (ordered by modification time) replays them in order
    sliced = batch_events.withColumn(
        "slice", ntile(3).over(Window.orderBy("ts", "event_id"))
    )
    import time as _time

    for s in (1, 2, 3):
        (
            sliced.filter(F.col("slice") == s)
            .drop("slice")
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(str(out / f"slice={s}"))
        )
        _time.sleep(1.1)  # distinct mtimes → deterministic replay order

    # slices were written from the repaired (µs) events, so ts is a
    # proper timestamp already — no nanos repair on re-read
    stream = (
        spark.readStream.schema(
            "event_id bigint, ts timestamp, user_id bigint, "
            "event_type string, value double, props string"
        )
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", True)
        .parquet(str(out))
    )
    streamed = run_to_memory_sink(
        streaming_running_streaks(stream), "t_streaks_sliced", timeout_sec=180
    )
    single = run_to_memory_sink(
        streaming_running_streaks(read_event_stream(spark, SF_DIR)),
        "t_streaks_single",
    )
    assert _rows(streamed, "user_id", "event_id") == _rows(
        single, "user_id", "event_id"
    )


def test_checkpoint_restart_recovers_state_exactly_once(spark, batch_events, tmp_path):
    """Two separate availableNow runs over a growing source directory,
    sharing one checkpoint: run 2 must process ONLY the new file (no
    duplicates) and the stateful streaks must CONTINUE from recovered
    state — Structured Streaming's exactly-once + state-recovery
    contract, which is what makes the operator restartable mid-backfill
    on a real cluster."""
    from pyspark.sql import Window

    src = tmp_path / "src"
    sink = tmp_path / "sink"
    ckpt = tmp_path / "ckpt"
    halves = batch_events.withColumn(
        "half", F.ntile(2).over(Window.orderBy("ts", "event_id"))
    )

    def write_half(h):
        halves.filter(F.col("half") == h).drop("half").coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(src / f"h{h}"))

    def run_stream():
        stream = (
            spark.readStream.schema(
                "event_id bigint, ts timestamp, user_id bigint, "
                "event_type string, value double, props string"
            )
            .option("recursiveFileLookup", True)
            .parquet(str(src))
        )
        q = (
            streaming_running_streaks(stream)
            .writeStream.format("parquet")
            .option("path", str(sink))
            .option("checkpointLocation", str(ckpt))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    write_half(1)
    run_stream()
    n_after_first = spark.read.parquet(str(sink)).count()
    write_half(2)
    run_stream()

    out = spark.read.parquet(str(sink))
    assert n_after_first < out.count() == batch_events.count()
    # no event processed twice
    assert out.select("event_id").distinct().count() == out.count()
    # streaks equal the single-run batch twin: state was recovered, not reset
    single = run_to_memory_sink(
        streaming_running_streaks(read_event_stream(spark, SF_DIR)),
        "t_streaks_ckpt_ref",
    )
    assert _rows(out, "user_id", "event_id") == _rows(single, "user_id", "event_id")


def test_streaming_dedup_drops_redeliveries(spark, batch_events, tmp_path):
    """At-least-once delivery: re-deliver a sample of events in a later
    file; dropDuplicatesWithinWatermark must drop every re-delivery that
    arrives inside the watermark, reproducing the batch distinct."""
    from algoritmos_etl_spark.streaming import streaming_dedup
    import time as _time

    src = tmp_path / "redelivered"
    first = batch_events
    dups = batch_events.sample(0.3, seed=7)
    first.coalesce(1).write.mode("overwrite").parquet(str(src / "b1"))
    _time.sleep(1.1)
    dups.coalesce(1).write.mode("overwrite").parquet(str(src / "b2"))

    stream = (
        spark.readStream.schema(
            "event_id bigint, ts timestamp, user_id bigint, "
            "event_type string, value double, props string"
        )
        .option("maxFilesPerTrigger", 1)  # re-deliveries in a LATER micro-batch
        .option("recursiveFileLookup", True)
        .parquet(str(src))
    )
    # watermark wider than the data's time span: no state eviction, so
    # every re-delivery is inside the dedup horizon
    streamed = run_to_memory_sink(
        streaming_dedup(stream, watermark="3650 days"), "t_dedup"
    )
    assert streamed.count() == batch_events.count()
    assert streamed.select("event_id").distinct().count() == streamed.count()
    assert _rows(streamed.select("event_id", "user_id"), "event_id") == _rows(
        batch_events.select("event_id", "user_id"), "event_id"
    )


def test_streaming_neardup_against_index(tables, spark, tmp_path):
    """foreachBatch near-dup: micro-batches dedup against the standing
    LSH index then append themselves to it. The union of emitted pairs
    equals the full-batch pipeline minus pairs internal to the seeded
    corpus (those were 'already deduped' before the stream started)."""
    from algoritmos_etl_spark.operators import dedup
    from algoritmos_etl_spark.streaming.streams import (
        streaming_neardup_against_index,
    )

    docs = tables["documents"].select("doc_id", "text")
    seed = docs.filter(F.col("doc_id") % 3 == 0)
    rest = docs.filter(F.col("doc_id") % 3 != 0)
    idx, out, src = (str(tmp_path / d) for d in ("idx", "out", "src"))
    dedup.minhash_write_index(seed, idx)
    rest.repartition(2).write.parquet(src)

    stream = (
        spark.readStream.schema(rest.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    streaming_neardup_against_index(
        stream, idx, out, threshold=0.2, max_bucket_size=100
    )

    got = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in spark.read.parquet(f"{out}/pairs").collect()
    }
    seed_ids = {r.doc_id for r in seed.select("doc_id").collect()}
    want = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in dedup.minhash_lsh_dedup(
            docs, threshold=0.2, max_bucket_size=100
        ).collect()
        if not (r.doc_a in seed_ids and r.doc_b in seed_ids)
    }
    assert got == want
    assert got, "stream emitted no pairs — fixture no longer overlaps"

    # replay idempotency: every sink write lands in a per-batch
    # batch_id=N subdirectory via overwrite, so re-running a batch
    # replaces its directory instead of duplicating rows — the pairs
    # dataset has no duplicate (doc_a, doc_b) across batch dirs, and
    # the index nests uniformly under batch_id (base corpus = -1)
    pairs_df = spark.read.parquet(f"{out}/pairs")
    assert "batch_id" in pairs_df.columns
    assert pairs_df.groupBy("doc_a", "doc_b").count().filter("count > 1").count() == 0
    bands = spark.read.parquet(f"{idx}/bands")
    assert {"batch_id", "band"} <= set(bands.columns)
    assert bands.select("batch_id").distinct().count() >= 2


def test_neardup_replay_is_idempotent(tables, spark, tmp_path):
    """A replayed micro-batch must compute against exactly the
    pre-batch corpus: with the batch's own rows already landed in the
    index (the crash-between-append-and-commit state), the
    `max_batch_id_exclusive` read produces the SAME pairs as the
    original run — without it, the batch's shingles count twice and
    jaccard values shift."""
    from algoritmos_etl_spark.operators import dedup

    docs = tables["documents"].limit(120).localCheckpoint()
    seed = docs.filter(F.col("doc_id") % 3 != 0)
    batch = docs.filter(F.col("doc_id") % 3 == 0)
    idx = str(tmp_path / "idx")
    dedup.minhash_write_index(seed, idx)

    first = sorted(
        map(
            tuple,
            dedup.minhash_lsh_incremental(
                spark, batch, idx, max_bucket_size=100,
                max_batch_id_exclusive=0,
            ).collect(),
        )
    )
    # land the batch's own index rows, as the crashed run would have
    sh = dedup.doc_shingles(batch, 3)
    bands = dedup.minhash_bands(
        dedup._with_base_hash(sh).groupBy("doc_id").agg(*dedup._minhash_aggs())
    )
    bands.write.mode("overwrite").partitionBy("band").parquet(
        f"{idx}/bands/batch_id=0"
    )
    sh.write.mode("overwrite").parquet(f"{idx}/shingles/batch_id=0")

    replay = sorted(
        map(
            tuple,
            dedup.minhash_lsh_incremental(
                spark, batch, idx, max_bucket_size=100,
                max_batch_id_exclusive=0,
            ).collect(),
        )
    )
    assert replay == first and len(first) > 0
    # and the unguarded read really does diverge (the bug this guards)
    unguarded = sorted(
        map(
            tuple,
            dedup.minhash_lsh_incremental(
                spark, batch, idx, max_bucket_size=100,
            ).collect(),
        )
    )
    assert unguarded != first


def test_stream_static_enrichment_matches_batch(spark, batch_events):
    """Stream-static broadcast join: the streamed enrichment must equal
    the same join run in batch, including events with no dim row."""
    from algoritmos_etl_spark.streaming.streams import enrich_with_dimension

    dim = spark.createDataFrame(
        [(u, f"seg{u % 3}") for u in range(0, 50, 2)],  # odd users missing
        "user_id long, segment string",
    )
    out_cols = ["event_id", "user_id", "segment"]
    streamed = run_to_memory_sink(
        enrich_with_dimension(
            read_event_stream(spark, SF_DIR), dim
        ).select(*out_cols),
        "t_enrich",
    )
    batch = enrich_with_dimension(batch_events, dim).select(*out_cols)
    assert sorted(map(tuple, streamed.collect())) == sorted(
        map(tuple, batch.collect())
    )
    # left semantics: un-dimensioned events survive with NULL segment
    assert batch.filter(F.col("segment").isNull()).count() > 0


def test_attribution_join_stream_equals_batch(spark, batch_events):
    """Stream-stream watermarked range join ≡ batch self-join on the
    same files — Spark's incremental-execution guarantee extended to
    the two-sided state-store join."""
    from algoritmos_etl_spark.streaming.streams import attribution_join

    stream = read_event_stream(spark, SF_DIR)
    streamed = run_to_memory_sink(
        attribution_join(
            stream.filter(F.col("event_type") == "click"),
            stream.filter(F.col("event_type") == "purchase"),
        ),
        "t_attribution",
    )
    batch = attribution_join(
        batch_events.filter(F.col("event_type") == "click"),
        batch_events.filter(F.col("event_type") == "purchase"),
    )
    assert _rows(streamed, "click_id", "purchase_id") == _rows(
        batch, "click_id", "purchase_id"
    )
    assert streamed.count() > 0  # the corpus actually exercises the join
    # every attributed click strictly precedes its purchase within 30 min
    assert streamed.filter(
        (F.col("lag_us") <= 0) | (F.col("lag_us") > 30 * 60 * 1_000_000)
    ).count() == 0


def test_incremental_mv_lifecycle(spark, batch_events, tmp_path):
    """Delta → view → compaction → more deltas: the view equals the
    batch GROUP BY at every point, and replays overwrite idempotently."""
    from algoritmos_etl_spark.streaming import mv

    ev = load_table(spark, SF_DIR, "events")
    stage = str(tmp_path / "stage")
    for i in (0, 1):
        ev.filter(F.col("event_id") % 2 == i).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{stage}/b{i}")

    def run(ckpt: str) -> None:
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .option("pathGlobFilter", "*.parquet")
            .parquet(f"{stage}/b*")
        )
        mv.streaming_agg_mv(
            stream, str(tmp_path / "mv"), ["event_type"], "value",
            checkpoint=ckpt,
        )

    run(str(tmp_path / "ck1"))
    expect = {
        r.event_type: (round(r.s, 6), r.n)
        for r in ev.groupBy("event_type")
        .agg(
            F.sum(F.col("value").cast("decimal(30,10)"))
            .cast("double")
            .alias("s"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    }

    def view():
        return {
            r.event_type: (round(r.total_value, 6), r.n_rows)
            for r in mv.read_agg_mv(spark, str(tmp_path / "mv")).collect()
        }

    assert view() == expect
    # two delta layers exist (one per micro-batch)
    import glob as _g

    assert len(_g.glob(str(tmp_path / "mv/delta/batch_id=*"))) == 2

    # compaction folds them into a base; view unchanged
    rep = mv.compact_agg_mv(spark, str(tmp_path / "mv"))
    assert rep["upto"] == 1 and rep["keys"] == len(expect)
    assert view() == expect

    # replay with a FRESH checkpoint: same batch ids rewrite the same
    # delta dirs; the read rule ignores them (batch_id <= upto) and the
    # view still matches
    run(str(tmp_path / "ck2"))
    assert view() == expect

    # vacuum retires everything the read rule already ignores; the
    # view survives on the base alone
    rep = mv.vacuum_agg_mv(str(tmp_path / "mv"))
    assert rep == {"deltas_removed": 2, "bases_removed": 0}
    assert len(_g.glob(str(tmp_path / "mv/delta/batch_id=*"))) == 0
    assert view() == expect


def test_mv_torn_state_between_compaction_and_vacuum(spark, tmp_path):
    """The read rule's fold invariant under torn maintenance state:
    a compacted base (upto=N) coexisting with the not-yet-vacuumed
    deltas it folded must not double-count (batch_id <= upto layers
    are invisible), while deltas that landed AFTER the compaction are
    folded on top of the base."""
    from algoritmos_etl_spark.streaming import mv

    ev = load_table(spark, SF_DIR, "events")
    path = str(tmp_path / "mv")

    def write_delta(i: int) -> None:
        part = ev.filter(F.col("event_id") % 3 == i).groupBy(
            "event_type"
        ).agg(
            F.sum(F.col("value").cast("decimal(30,10)")).alias("sum_part"),
            F.count(F.lit(1)).alias("n_part"),
        )
        part.write.mode("overwrite").parquet(f"{path}/delta/batch_id={i}")

    def batch_expect(mods):
        cond = F.col("event_id") % 3 == mods[0]
        for m in mods[1:]:
            cond = cond | (F.col("event_id") % 3 == m)
        return {
            r.event_type: (round(r.s, 6), r.n)
            for r in ev.filter(cond)
            .groupBy("event_type")
            .agg(
                F.sum(F.col("value").cast("decimal(30,10)"))
                .cast("double")
                .alias("s"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()
        }

    def view():
        return {
            r.event_type: (round(r.total_value, 6), r.n_rows)
            for r in mv.read_agg_mv(spark, path).collect()
        }

    write_delta(0)
    write_delta(1)
    rep = mv.compact_agg_mv(spark, path)
    assert rep["upto"] == 1
    # TORN STATE: base/upto=1 written, deltas 0 and 1 NOT vacuumed,
    # and a fresh delta 2 lands on top
    write_delta(2)
    import glob as _g

    assert len(_g.glob(f"{path}/delta/batch_id=*")) == 3
    assert view() == batch_expect([0, 1, 2])  # no double count


def test_mv_vacuum_crash_window(spark, tmp_path):
    """vacuum_agg_mv killed mid-surgery leaves a readable store at
    every intermediate state: two base generations + partially removed
    deltas all fold to the same view, and a re-run of vacuum finishes
    the job idempotently."""
    import glob as _g
    import shutil

    from algoritmos_etl_spark.streaming import mv

    ev = load_table(spark, SF_DIR, "events")
    path = str(tmp_path / "mv")

    for i in (0, 1):
        ev.filter(F.col("event_id") % 2 == i).groupBy("event_type").agg(
            F.sum(F.col("value").cast("decimal(30,10)")).alias("sum_part"),
            F.count(F.lit(1)).alias("n_part"),
        ).write.mode("overwrite").parquet(f"{path}/delta/batch_id={i}")
        mv.compact_agg_mv(spark, path)

    # crash window: TWO base generations (upto=0, upto=1) + both deltas
    assert len(_g.glob(f"{path}/base/upto=*")) == 2
    expect = {
        r.event_type: (round(r.s, 6), r.n)
        for r in ev.groupBy("event_type")
        .agg(
            F.sum(F.col("value").cast("decimal(30,10)"))
            .cast("double")
            .alias("s"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    }

    def view():
        return {
            r.event_type: (round(r.total_value, 6), r.n_rows)
            for r in mv.read_agg_mv(spark, path).collect()
        }

    assert view() == expect  # reader picks max-upto base only

    # simulate a vacuum that died after removing ONE delta
    shutil.rmtree(f"{path}/delta/batch_id=0")
    assert view() == expect
    # re-run completes: removes the remaining dead delta + stale base
    rep = mv.vacuum_agg_mv(path)
    assert rep == {"deltas_removed": 1, "bases_removed": 1}
    assert len(_g.glob(f"{path}/base/upto=*")) == 1
    assert len(_g.glob(f"{path}/delta/batch_id=*")) == 0
    assert view() == expect
    # idempotent: a second vacuum is a no-op
    assert mv.vacuum_agg_mv(path) == {"deltas_removed": 0, "bases_removed": 0}


def test_streaming_neardup_driver_query_leaves_no_orphan_dirs(spark):
    """bench runs the registered query 3×; each run must reclaim its
    run dir (pairs are eagerly checkpointed) and reuse ONE setup tree
    per (session, sf_dir) — no unbounded /tmp growth in a long-lived
    driver (VERDICT r6 'What's wrong' #3)."""
    import glob as _g
    import tempfile

    from algoritmos_etl_spark.driver_queries import REGISTRY

    tmp = tempfile.gettempdir()
    q = REGISTRY["streaming_neardup"].build
    before_runs = set(_g.glob(f"{tmp}/streaming_neardup_run_*"))
    n1 = q(spark, SF_DIR).count()
    n2 = q(spark, SF_DIR).count()
    assert n1 == n2  # replay path: identical result against the base index
    after_runs = set(_g.glob(f"{tmp}/streaming_neardup_run_*"))
    assert after_runs == before_runs, "leaked run dirs"
    # exactly one standing setup tree for this (session, sf_dir)
    from algoritmos_etl_spark.driver_queries_ext import _STREAM_NEARDUP_SETUP

    keys = [k for k in _STREAM_NEARDUP_SETUP if k[1] == SF_DIR]
    assert len(keys) == 1


def test_streaming_cdc_merge_tombstones_survive_out_of_order_batches(
    spark, tmp_path
):
    """A later micro-batch carrying an OLDER record for a deleted key
    must not resurrect it: tombstones persist in the state snapshots
    and only the serving read filters them (the bug class the
    streaming_cdc_state oracle caught in round 7)."""
    from algoritmos_etl_spark.streaming import mv

    src = tmp_path / "src"
    rows_b0 = [  # batch 0: the NEWEST records, including a delete
        (1, 100, "alive", "U"),
        (2, 100, None, "D"),        # key 2 deleted at ts=100
    ]
    rows_b1 = [  # batch 1: OLDER records arriving late
        (2, 50, "stale", "U"),      # must NOT resurrect key 2
        (3, 60, "new", "U"),
    ]
    schema = "k long, ts long, s string, op string"
    import time as _t

    for i, rows in ((0, rows_b0), (1, rows_b1)):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(src / f"b{i}"))
        _t.sleep(1.1)  # distinct mtimes → deterministic batch order

    def run(ck):
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .option("pathGlobFilter", "*.parquet")
            .parquet(str(src / "b*"))
        )
        mv.streaming_cdc_merge(
            stream, str(tmp_path / "store"), key_cols=["k"], ts_col="ts",
            op_col="op", checkpoint=ck,
        )

    run(str(tmp_path / "ck1"))
    served = {r.k: r for r in mv.read_cdc_state(
        spark, str(tmp_path / "store")
    ).collect()}
    assert set(served) == {1, 3}, served  # key 2 stays dead
    # raw state keeps the tombstone with its ts
    raw = {r.k: r for r in mv.read_cdc_state(
        spark, str(tmp_path / "store"), serving=False
    ).collect()}
    assert raw[2].op == "D" and raw[2].ts == 100
    # replay with a fresh checkpoint: identical state, idempotent
    run(str(tmp_path / "ck2"))
    served2 = {r.k: (r.ts, r.s) for r in mv.read_cdc_state(
        spark, str(tmp_path / "store")
    ).collect()}
    assert served2 == {k: (r.ts, r.s) for k, r in served.items()}
    # vacuum retains the TWO newest versions (crash-window rule: if the
    # newest version's checkpoint commit was lost, its replay merges
    # onto the previous version — which must therefore survive vacuum);
    # view unchanged. keep=1 is clamped up to 2 for the same reason.
    import glob as _g

    n_before = len(_g.glob(str(tmp_path / "store/state/version=*")))
    rep = mv.vacuum_cdc_state(str(tmp_path / "store"), keep=1)
    assert rep["versions_removed"] == max(0, n_before - 2)
    assert len(_g.glob(str(tmp_path / "store/state/version=*"))) == min(
        n_before, 2
    )
    served3 = {r.k: (r.ts, r.s) for r in mv.read_cdc_state(
        spark, str(tmp_path / "store")
    ).collect()}
    assert served3 == served2
    # the crash-window replay itself: drop the newest version's
    # checkpoint (simulating a crash after the state write but before
    # the commit) and re-run — the replayed batch finds the RETAINED
    # previous version and reproduces identical state, not a state
    # shrunk to the last batch's keys.
    run(str(tmp_path / "ck3"))
    served4 = {r.k: (r.ts, r.s) for r in mv.read_cdc_state(
        spark, str(tmp_path / "store")
    ).collect()}
    assert served4 == served2


def test_attribution_join_outer_stream_equals_batch(
    spark, batch_events, tmp_path
):
    """LEFT OUTER stream-stream join ≡ batch left join on the same
    rows: unmatched purchases materialize as NULL-click rows only once
    the click-side WATERMARK passes their match window — the outer
    emission semantics the inner join never exercises. Purchases
    inside the final watermark horizon are (correctly) withheld
    awaiting possible matches, so the corpus is staged with one
    far-future sentinel click (user −1, matches nothing, and as an
    unmatched RIGHT row never appears in left-join output) to advance
    the watermark past every real purchase — exactly what the next
    day's data does in production."""
    from algoritmos_etl_spark.streaming.streams import attribution_join_outer

    # TWO sentinels: the global watermark is min(click wm, purchase
    # wm), so BOTH sides need a far-future event for it to pass the
    # real data. The sentinel purchase itself is then withheld in
    # state (click wm < its ts), so it never reaches the output.
    staged = batch_events.unionByName(
        spark.createDataFrame(
            [
                (10**9, "2024-03-01 00:00:00", -1, "click", 0.0, "{}"),
                (10**9 + 1, "2024-03-01 00:00:00", -1, "purchase", 0.0, "{}"),
            ],
            "event_id long, ts string, user_id long, event_type string, "
            "value double, props string",
        ).withColumn("ts", F.col("ts").cast("timestamp"))
    )
    src = str(tmp_path / "events")
    staged.coalesce(1).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string"
    ).parquet(src)
    streamed = run_to_memory_sink(
        attribution_join_outer(
            stream.filter(F.col("event_type") == "purchase"),
            stream.filter(F.col("event_type") == "click"),
        ),
        "t_attribution_outer",
    )
    batch = attribution_join_outer(
        batch_events.filter(F.col("event_type") == "purchase"),
        batch_events.filter(F.col("event_type") == "click"),
    )
    assert _rows(streamed, "purchase_id", "click_id") == _rows(
        batch, "purchase_id", "click_id"
    )
    # the corpus exercises BOTH arms: attributed and unattributed
    assert streamed.filter(F.col("click_id").isNotNull()).count() > 0
    assert streamed.filter(F.col("click_id").isNull()).count() > 0
    # every purchase appears at least once (left preservation)
    n_purchases = batch_events.filter(
        F.col("event_type") == "purchase"
    ).count()
    assert streamed.select("purchase_id").distinct().count() == n_purchases


def test_incremental_distinct_mv_lifecycle(spark, batch_events, tmp_path):
    """HLL distinct-count MV: incremental union over micro-batches
    must estimate EXACTLY like the one-shot sketch (register-wise max
    is order/split-invariant), stay within 5% of exact distinct, and
    survive compaction + vacuum unchanged."""
    from algoritmos_etl_spark.streaming import mv

    ev = load_table(spark, SF_DIR, "events")
    stage = str(tmp_path / "stage")
    for i in (0, 1):
        ev.filter(F.col("event_id") % 2 == i).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{stage}/b{i}")
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "*.parquet")
        .parquet(f"{stage}/b*")
    )
    mv.streaming_distinct_mv(
        stream, str(tmp_path / "mv"), ["event_type"], "user_id",
        checkpoint=str(tmp_path / "ck"),
    )

    def view():
        return {
            r.event_type: (r.approx_distinct, r.n_rows)
            for r in mv.read_distinct_mv(spark, str(tmp_path / "mv")).collect()
        }

    got = view()
    oneshot = {
        r.event_type: int(r.est)
        for r in ev.groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(F.hll_sketch_agg("user_id"))
            .cast("long")
            .alias("est")
        )
        .collect()
    }
    exact = {
        r.event_type: (r.d, r.n)
        for r in ev.groupBy("event_type")
        .agg(
            F.count_distinct("user_id").alias("d"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    }
    for et, (est, n_rows) in got.items():
        assert est == oneshot[et], "incremental union != one-shot sketch"
        d, n = exact[et]
        assert abs(est - d) / d < 0.05
        assert n_rows == n
    # compaction folds losslessly; vacuum retires merged layers
    rep = mv.compact_distinct_mv(spark, str(tmp_path / "mv"))
    assert rep["upto"] == 1
    assert view() == got
    assert mv.vacuum_agg_mv(str(tmp_path / "mv")) == {
        "deltas_removed": 2, "bases_removed": 0,
    }
    assert view() == got


def test_incremental_sketch_mv_lifecycle(spark, tmp_path):
    """Count-min MV: the incrementally-maintained grid must equal the
    one-shot grid CELL FOR CELL (sums are split-invariant — this is
    what lets streaming_heavy_hitters keep a full oracle), and survive
    compaction + vacuum unchanged."""
    from pyspark.sql import functions as F

    from algoritmos_etl_spark.operators import sketches
    from algoritmos_etl_spark.operators.text import words_col
    from algoritmos_etl_spark.streaming import mv

    docs = load_table(spark, SF_DIR, "documents")
    stage = str(tmp_path / "stage")
    for i in (0, 1):
        docs.filter(F.col("doc_id") % 2 == i).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{stage}/b{i}")
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "*.parquet")
        .parquet(f"{stage}/b*")
        .select(F.explode(words_col(F.col("text"))).alias("word"))
    )
    mv.streaming_sketch_mv(
        stream, str(tmp_path / "mv"), "word",
        checkpoint=str(tmp_path / "ck"),
    )

    def grid():
        return {
            (r.d, r.bucket): r.cnt
            for r in mv.read_sketch_mv(spark, str(tmp_path / "mv")).collect()
        }

    got = grid()
    words = docs.select(F.explode(words_col(F.col("text"))).alias("word"))
    oneshot = {
        (r.d, r.bucket): r.cnt
        for r in sketches.count_min_build(words, "word").collect()
    }
    assert got == oneshot
    rep = mv.compact_sketch_mv(spark, str(tmp_path / "mv"))
    assert rep["upto"] == 1
    assert grid() == got
    # re-compacting with no newer deltas is a no-op, NOT an in-place
    # rewrite of the base directory the fold reads from
    rep2 = mv.compact_sketch_mv(spark, str(tmp_path / "mv"))
    assert rep2 == rep
    assert grid() == got
    assert mv.vacuum_agg_mv(str(tmp_path / "mv")) == {
        "deltas_removed": 2, "bases_removed": 0,
    }
    assert grid() == got


def test_streaming_warc_ingest_stream_equals_batch(tables, spark, tmp_path):
    """End-to-end crawl stream (r11): real .warc.gz files on disk ->
    binaryFile stream -> per-batch WARC parse -> quarantine split ->
    html_to_text -> near-dup vs the standing index. Union of emitted
    pairs == the full-batch pipeline over (raw seed docs + EXTRACTED
    stream docs), minus seed-internal pairs and the torn member; the
    torn member's quarantine row is VISIBLE in out/quarantine."""
    import os

    from algoritmos_etl_spark.operators import dedup
    from algoritmos_etl_spark.sources import warc
    from algoritmos_etl_spark.streaming.streams import streaming_warc_ingest

    docs = tables["documents"].select("doc_id", "text")
    seed = docs.filter(F.col("doc_id") % 3 == 0)
    rest = docs.filter(F.col("doc_id") % 3 != 0)
    n = rest.count()
    idx, out, src = (str(tmp_path / d) for d in ("idx", "out", "src"))
    dedup.minhash_write_index(seed, idx)
    os.makedirs(src)
    files = warc.synthesize_warc_corpus(
        rest, docs_per_file=max(1, (n + 1) // 2), torn_every=2
    )
    for r in files.collect():
        with open(os.path.join(src, r.warc_file), "wb") as f:
            f.write(bytes(r.content))

    streaming_warc_ingest(spark, src, idx, out, max_bucket_size=100)

    got = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in spark.read.parquet(f"{out}/pairs").collect()
    }
    # the batch twin: seed docs at raw text, stream docs as the WARC
    # round trip actually yields them (extracted from the same files)
    extracted = warc.warc_extract_pages(
        warc.parse_warc_records(files)
    ).filter("ok").select(
        F.regexp_extract("url", "doc/([0-9]+)$", 1).cast("long").alias(
            "doc_id"
        ),
        "text",
    )
    mixed = seed.unionByName(extracted)
    seed_ids = {r.doc_id for r in seed.select("doc_id").collect()}
    want = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in dedup.minhash_lsh_dedup(
            mixed, threshold=0.2, max_bucket_size=100
        ).collect()
        if not (r.doc_a in seed_ids and r.doc_b in seed_ids)
    }
    assert got == want
    assert got, "stream emitted no pairs — fixture no longer overlaps"
    # the torn member quarantined, visibly: exactly one torn region,
    # and the torn doc (max increment doc_id) never reached the index
    quar = spark.read.parquet(f"{out}/quarantine")
    assert quar.filter("err = 'torn_gzip_member'").count() == 1
    torn_doc = rest.agg(F.max("doc_id")).first()[0]
    assert not any(torn_doc in (a, b) for a, b, _ in got)
    idx_sh = spark.read.parquet(f"{idx}/shingles")
    assert idx_sh.filter(F.col("doc_id") == torn_doc).count() == 0
