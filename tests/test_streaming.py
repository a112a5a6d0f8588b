"""Streaming tests: file-stream source -> windowed agg / dedup /
changelog apply -> foreachBatch sink, with availableNow (bounded)
triggers so tests terminate."""

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from seatunnel_spark.streaming import (
    changelog_apply_writer,
    run_stream_to_batch_sink,
    stream_dedup,
    windowed_agg,
)
from seatunnel_spark.types import ROW_KIND_COL


@pytest.fixture()
def events_stream(spark, sf_dir, tmp_path):
    static = spark.read.parquet(f"{sf_dir}/events.parquet")
    # events.ts is parquet TIMESTAMP(NANOS): depending on the session's
    # legacy conf it arrives as bigint (convert) or timestamp_ntz (cast).
    if dict(static.dtypes)["ts"] == "bigint":
        static = static.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000").cast("long"))
        )
    else:
        static = static.withColumn("ts", F.col("ts").cast("timestamp"))
    src_dir = str(tmp_path / "stream_src")
    static.write.mode("overwrite").parquet(src_dir)
    stream = spark.readStream.schema(static.schema).parquet(src_dir)
    return static, stream


def _run_batches(spark, df, tmp_path, mode="append"):
    out = []
    q = run_stream_to_batch_sink(
        df, lambda b: out.append(b.collect()), str(tmp_path / "ckpt"), mode=mode
    )
    q.awaitTermination(120)
    return out


def _run_collect(spark, df, tmp_path, mode="append"):
    return [r for batch in _run_batches(spark, df, tmp_path, mode) for r in batch]


def test_windowed_agg_stream_matches_batch(spark, events_stream, tmp_path):
    static, stream = events_stream
    spec = dict(ts_col="ts", window="1 hour", watermark="2 hours",
                group_cols=["event_type"],
                aggs={"n": "count(1)", "sv": "round(sum(value), 2)"})
    # complete mode: append-mode windows inside the watermark horizon don't
    # flush at end-of-stream; the final complete emission is the full result.
    batches = _run_batches(spark, windowed_agg(stream, **spec), tmp_path,
                           mode="complete")
    got = batches[-1]
    expected = windowed_agg(static, **spec).collect()
    assert len(got) == len(expected)
    assert {tuple(r) for r in got} == {tuple(r) for r in expected}


def test_stream_dedup(spark, tmp_path):
    rows = [(1, "2024-01-01 00:00:00"), (1, "2024-01-01 00:00:10"),
            (2, "2024-01-01 00:01:00")]
    static = spark.createDataFrame(rows, ["k", "ts_s"]).withColumn(
        "ts", F.to_timestamp("ts_s")
    )
    src = str(tmp_path / "dedup_src")
    static.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(static.schema).parquet(src)
    got = _run_collect(spark, stream_dedup(stream, ["k"], "ts", "1 hour"), tmp_path)
    assert sorted(r["k"] for r in got) == [1, 2]


def test_changelog_apply(spark, tmp_path):
    rows = [
        ("+I", 1, "a"), ("+I", 2, "b"),
        ("-U", 1, "a"), ("+U", 1, "a2"),
        ("+I", 3, "c"), ("-D", 2, "b"),
    ]
    static = spark.createDataFrame(rows, [ROW_KIND_COL, "pk", "val"])
    src = str(tmp_path / "cl_src")
    # single file: within-batch arrival order must follow changelog order
    static.coalesce(1).write.mode("overwrite").parquet(src)
    # batch arrival order must follow the changelog sequence: single file
    stream = spark.readStream.schema(static.schema).parquet(src)

    state: dict = {}

    def writer(upserts, deletes, batch_id):
        for r in upserts.collect():
            state[r["pk"]] = r["val"]
        if deletes is not None:
            for r in deletes.collect():
                state.pop(r["pk"], None)

    q = (
        stream.writeStream.foreachBatch(changelog_apply_writer(writer, ["pk"]))
        .option("checkpointLocation", str(tmp_path / "cl_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # Winners come from last_event_per_key's content chain (no __offset
    # in this feed): the +U supersedes +I for pk=1 and -D removes pk=2.
    assert state == {1: "a2", 3: "c"}


def test_changelog_writer_delete_set_layout_invariance(spark):
    """Upserts and deletes must derive from the SAME per-key ordering:
    a +I/-D pair split across partitions must never land in both sets,
    and the final state must be identical under repartition(1) and
    repartition(32) (the bug class fixed in lakehouse merge_apply —
    the delete set previously used monotonically_increasing_id)."""
    rows = [("+I", i % 7, f"v{i}") for i in range(40)]
    rows += [("-D", 3, "v3"), ("-D", 5, "v47")]
    batch = spark.createDataFrame(rows, [ROW_KIND_COL, "pk", "val"])

    outcomes = []
    for nparts in (1, 32):
        captured = {}

        def writer(upserts, deletes, batch_id, _c=captured):
            _c["up"] = {r["pk"] for r in upserts.collect()}
            _c["del"] = {r["pk"] for r in deletes.collect()}

        changelog_apply_writer(writer, ["pk"])(
            batch.repartition(nparts), 0)
        # a key in both sets means winners were computed two ways
        assert not (captured["up"] & captured["del"]), captured
        outcomes.append((captured["up"], captured["del"]))
    assert outcomes[0] == outcomes[1]


def test_engine_streaming_job(spark, sf_dir, tmp_path):
    """Full engine path in STREAMING mode with availableNow trigger."""
    from seatunnel_spark.job.engine import run_job
    from seatunnel_spark.sinks.memory import InMemorySink

    static = spark.read.parquet(f"{sf_dir}/region.parquet")
    src = str(tmp_path / "job_src")
    static.write.mode("overwrite").parquet(src)
    cfg = {
        "env": {"job.mode": "STREAMING", "checkpoint.dir": str(tmp_path / "job_ckpt"),
                "streaming.await.timeout": 120},
        "source": [{"plugin_name": "LocalFile", "plugin_output": "r", "path": src,
                    "file_format_type": "parquet"}],
        "transform": [{"plugin_name": "Sql", "plugin_input": "r", "plugin_output": "r2",
                       "query": "SELECT r_regionkey, UPPER(r_name) AS rn FROM r"}],
        "sink": [{"plugin_name": "InMemory", "plugin_input": "r2", "name": "stream_out",
                  "trigger": "availableNow"}],
    }
    run_job(cfg, spark)
    out = InMemorySink.get("stream_out")
    assert out.count() == 5


def test_rate_limiter():
    import time

    from seatunnel_spark.streaming import TokenBucketRateLimiter

    rl = TokenBucketRateLimiter(rows_per_second=200)
    t0 = time.monotonic()
    got = list(rl.throttle(iter(range(100))))
    elapsed = time.monotonic() - t0
    assert len(got) == 100
    assert elapsed >= 0.45  # 100 rows at 200 r/s ≈ 0.5s


def test_stateful_running_counts_across_batches(spark, tmp_path):
    """State must carry across microbatches (one file = one batch via
    maxFilesPerTrigger=1)."""
    from seatunnel_spark.streaming import stateful_running_counts

    src = str(tmp_path / "state_src")
    b1 = spark.createDataFrame([("u1", 1.0), ("u2", 2.0)], ["uid", "value"])
    b1.coalesce(1).write.mode("overwrite").parquet(src)
    b2 = spark.createDataFrame([("u1", 3.0)], ["uid", "value"])
    b2.coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(b1.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = stateful_running_counts(stream, ["uid"])
    batches = []
    q = (
        out.writeStream.foreachBatch(lambda b, i: batches.append(b.collect()))
        .option("checkpointLocation", str(tmp_path / "state_ckpt"))
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    final = {}
    for batch in batches:
        for r in batch:
            final[r["uid"]] = (r["events_total"], r["value_total"])
    # u1 appears in two batches -> accumulated state
    assert final["u1"] == (2, 4.0)
    assert final["u2"] == (1, 2.0)


def test_checkpoint_restore_exactly_once(spark, tmp_path):
    """Stop a checkpointed stream mid-input, restart with the same
    checkpointLocation, and verify every input row is delivered exactly
    once across the two runs (Structured Streaming WAL — the rebuild's
    answer to the reference's CheckpointCoordinator barriers,
    CheckpointCoordinator.java:622-768)."""
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    for i in range(4):
        spark.createDataFrame([(i * 10 + j,) for j in range(10)], ["v"]) \
            .coalesce(1).write.mode("append").parquet(src)

    schema = spark.read.parquet(src).schema
    # foreachBatch is at-least-once across restarts: an uncommitted batch
    # replays with its ORIGINAL batch id, so idempotence-by-batchId (the
    # documented sink pattern, and what sinks/base.py does) yields
    # exactly-once. Keying the dict by id encodes that contract.
    batches: dict[int, list[int]] = {}
    seen: list[int] = []

    def sink(batch_df, batch_id):
        batches[batch_id] = [r["v"] for r in batch_df.collect()]
        seen.clear()
        seen.extend(v for vs in batches.values() for v in vs)

    # Run 1: process at most 2 of the 4 files, then stop.
    q = (spark.readStream.schema(schema)
         .option("maxFilesPerTrigger", 1).parquet(src)
         .writeStream.foreachBatch(sink)
         .option("checkpointLocation", ckpt).start())
    import time
    deadline = time.time() + 60
    while len(seen) < 20 and time.time() < deadline:
        time.sleep(0.3)
    q.stop()
    q.awaitTermination(30)
    first_run = len(seen)
    assert first_run >= 10

    # Run 2: same checkpoint — resumes after the committed batches.
    q2 = (spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", 1).parquet(src)
          .writeStream.foreachBatch(sink)
          .option("checkpointLocation", ckpt)
          .trigger(availableNow=True).start())
    q2.awaitTermination(120)

    assert sorted(seen) == list(range(40)), "exactly-once across restart"


def test_sink_ledger_makes_replay_noop(spark, tmp_path):
    """The batch-id ledger (the 2PC-commit analog for non-transactional
    sinks) turns a replayed microbatch into a no-op."""
    from seatunnel_spark.sinks.base import Sink

    writes = []

    class CountingSink(Sink):
        NAME = "Counting"

        def write(self, batch):
            writes.append(batch.count())

    ledger = str(tmp_path / "ckpt" / "__st_commits")
    import os
    os.makedirs(ledger, exist_ok=True)
    s = CountingSink({})
    df = spark.createDataFrame([(1,), (2,)], ["v"])

    s._process_batch(df, 7, ledger)      # first delivery: writes
    s._process_batch(df, 7, ledger)      # replay of same batch: no-op
    s._process_batch(df, 8, ledger)      # next batch: writes
    assert writes == [2, 2]
    assert sorted(os.listdir(ledger)) == ["batch-7", "batch-8"]


def test_stream_interval_join_stream_matches_batch(spark, tmp_path):
    from seatunnel_spark.streaming import stream_interval_join

    clicks = [(1, "2024-01-01 00:00:00", 100),
              (1, "2024-01-01 01:00:00", 101),
              (2, "2024-01-01 00:00:30", 102)]
    buys = [(1, "2024-01-01 00:03:00", 200),   # within 5m of click 100
            (1, "2024-01-01 02:00:00", 201),   # outside every interval
            (2, "2024-01-01 00:04:00", 202)]   # within 5m of click 102

    def mk(rows, ts_name, id_name):
        df = spark.createDataFrame(rows, ["user_id", "s", id_name]) \
            .withColumn(ts_name, F.to_timestamp("s")).drop("s")
        path = str(tmp_path / id_name)
        df.write.mode("overwrite").parquet(path)
        return df, spark.readStream.schema(df.schema).parquet(path)

    c_static, c_stream = mk(clicks, "cts", "click_id")
    b_static, b_stream = mk(buys, "bts", "buy_id")
    args = dict(key_cols=["user_id"], left_ts="cts", right_ts="bts",
                lower="0 seconds", upper="5 minutes", watermark="1 hour")
    got = _run_collect(
        spark,
        stream_interval_join(c_stream, b_stream, **args)
        .select("click_id", "buy_id"),
        tmp_path)
    expected = stream_interval_join(c_static, b_static, **args) \
        .select("click_id", "buy_id").collect()
    assert {(r["click_id"], r["buy_id"]) for r in got} == \
        {(r["click_id"], r["buy_id"]) for r in expected} == {(100, 200), (102, 202)}


def test_session_window_stream_matches_batch(spark, events_stream, tmp_path):
    """Native session_window on a real stream (watermark + complete
    mode) produces the same sessions as the batch run."""
    from seatunnel_spark.streaming import session_window_agg

    static, stream = events_stream
    spec = dict(ts_col="ts", gap="30 minutes", group_cols=["user_id"],
                aggs={"n": "count(1)", "sv": "round(sum(value), 2)"})
    batches = _run_batches(
        spark, session_window_agg(stream, watermark="2 hours", **spec),
        tmp_path, mode="complete")
    got = batches[-1]
    expected = session_window_agg(static, **spec).collect()
    assert len(got) == len(expected) > 0
    assert {tuple(r) for r in got} == {tuple(r) for r in expected}
    # dynamic windows: gap-separated events really split sessions
    sessions = [r for r in expected if r["user_id"] == expected[0]["user_id"]]
    assert all(r["session_end"] > r["session_start"] for r in sessions)


def test_stream_minhash_probe_matches_batch_incremental(spark, tmp_path):
    """Streaming ingest probing a STATIC persisted LSH index
    (stream-static join, zero state): the streamed matches equal the
    batch incremental-dedup pairs, and exact dups agree on all bands."""
    from seatunnel_spark.dataops.dedup import (
        incremental_minhash_matches, minhash_band_index)
    from seatunnel_spark.streaming import stream_minhash_probe

    base = "the quick brown fox jumps over the lazy dog again and again"
    existing = spark.createDataFrame(
        [(1, base), (2, "completely different corpus text entirely here")],
        "doc_id long, text string")
    new_static = spark.createDataFrame(
        [(10, base),
         (11, "unrelated fresh content with no overlap at all ok")],
        "doc_id long, text string")
    src = str(tmp_path / "newdocs")
    new_static.write.mode("overwrite").parquet(src)
    new_stream = spark.readStream.schema(new_static.schema).parquet(src)

    idx = minhash_band_index(existing, "doc_id", "text")
    got = _run_collect(
        spark, stream_minhash_probe(new_stream, idx), tmp_path)
    pairs = {(r["new_id"], r["match_id"]) for r in got}
    batch = incremental_minhash_matches(new_static, idx, "doc_id", "text")
    expected = {(r["new_id"], r["match_id"]) for r in batch.collect()}
    assert pairs == expected == {(10, 1)}
    # exact duplicate agrees on every band, streamed one row per band
    assert sorted(r["band"] for r in got) == [0, 1, 2, 3]


def test_cms_build_stream_matches_batch(spark, tmp_path):
    """The count-min sketch is a pure mergeable aggregation, so the
    SAME cms_build code runs on a readStream (complete mode) and the
    final sketch is bit-identical to the batch build — the property
    that lets a streaming pipeline maintain corpus token frequencies
    incrementally."""
    from seatunnel_spark.dataops.text import cms_build, cms_estimate

    rows = [(i, f"tok{i % 7} tok{i % 3} common") for i in range(60)]
    static = spark.createDataFrame(rows, "doc_id long, text string")
    path = str(tmp_path / "docs")
    static.write.mode("overwrite").parquet(path)
    stream = spark.readStream.schema(static.schema).parquet(path)

    batches = _run_batches(spark, cms_build(stream), tmp_path,
                           mode="complete")
    got = {(r["d"], r["pos"]): r["cnt"] for r in batches[-1]}
    want = {(r["d"], r["pos"]): r["cnt"]
            for r in cms_build(static).collect()}
    assert got == want and len(want) > 0
    # and the streamed sketch answers point queries exactly like batch
    sketch = spark.createDataFrame(
        [(d, pos, cnt) for (d, pos), cnt in got.items()],
        "d int, pos string, cnt long")
    probes = spark.createDataFrame([("common",)], "token string")
    assert cms_estimate(sketch, probes).collect()[0]["est"] == 60


def test_ddsketch_build_stream_matches_batch(spark, tmp_path):
    """The DDSketch build is a pure additive groupBy aggregation —
    the SAME ddsketch_build code on a readStream (complete mode)
    yields a sketch bit-identical to the batch build, so a streaming
    pipeline can maintain corpus quantiles incrementally and merge
    them with batch sketches (the CMS mergeable-aggregation property,
    extended to quantiles)."""
    from seatunnel_spark.dataops.sketches import (ddsketch_build,
                                                  ddsketch_quantiles)

    rows = [(i, float(2 ** (i % 20)) + 0.25 * i) for i in range(300)]
    static = spark.createDataFrame(rows, "k long, v double")
    path = str(tmp_path / "vals")
    static.write.mode("overwrite").parquet(path)
    stream = spark.readStream.schema(static.schema).parquet(path)

    batches = _run_batches(spark, ddsketch_build(stream, "v"), tmp_path,
                           mode="complete")
    got = {(r["kind"], r["idx"]): r["cnt"] for r in batches[-1]}
    want = {(r["kind"], r["idx"]): r["cnt"]
            for r in ddsketch_build(static, "v").collect()}
    assert got == want and len(want) > 10
    # and the streamed sketch answers quantile queries exactly like batch
    sk = spark.createDataFrame(
        [(k, i, c) for (k, i), c in got.items()], "kind int, idx int, cnt long")
    est = ddsketch_quantiles(sk, [0.5]).collect()[0]["est"]
    exact = sorted(v for _, v in rows)[149]
    assert abs(est - exact) / exact <= 0.01 + 1e-6


def test_stream_funnel_matches_batch(spark, tmp_path):
    """The funnel's per-user state is a pure conditional-min
    aggregation, so the SAME stream_funnel_state code on a readStream
    (complete mode) yields state bit-identical to the batch build, and
    funnel_finish over it reproduces the batch funnel() readout
    exactly — event analytics joins CMS/session-window/LSH-probe in
    the stream==batch family."""
    import datetime as _dt

    from seatunnel_spark.dataops.analytics import funnel, funnel_finish
    from seatunnel_spark.streaming import stream_funnel_state

    t0 = _dt.datetime(2024, 3, 1)
    rows = []
    # user 1 completes view->click->purchase in order; user 2 clicks
    # before viewing (blocked at click); user 3 views only; user 4
    # has ties (click at the same ts as view -> strict order fails)
    evs = {1: [("view", 0), ("click", 5), ("purchase", 9)],
           2: [("click", 1), ("view", 2), ("purchase", 3)],
           3: [("view", 4)],
           4: [("view", 6), ("click", 6)]}
    i = 0
    for u, seq in evs.items():
        for typ, s in seq:
            rows.append((i, t0 + _dt.timedelta(minutes=s), u, typ))
            i += 1
    static = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string")
    path = str(tmp_path / "funnel_events")
    static.write.mode("overwrite").parquet(path)
    stream = spark.readStream.schema(static.schema).parquet(path)

    steps = ["view", "click", "purchase"]
    batches = _run_batches(
        spark, stream_funnel_state(stream, "user_id", "ts",
                                   "event_type", steps),
        tmp_path, mode="complete")
    state = spark.createDataFrame(
        batches[-1],
        "user_id long, __t0 timestamp, __t1 timestamp, __t2 timestamp")
    got = {(r["step"], r["step_idx"]): r["users"]
           for r in funnel_finish(state, steps).collect()}
    want = {(r["step"], r["step_idx"]): r["users"]
            for r in funnel(static, "user_id", "ts",
                            "event_type", steps).collect()}
    assert got == want == {("view", 0): 4, ("click", 1): 1,
                           ("purchase", 2): 1}
    # and the streamed state itself equals the batch state
    stream_state = {tuple(r) for r in batches[-1]}
    want_state = {tuple(r) for r in stream_funnel_state(
        static, "user_id", "ts", "event_type", steps).collect()}
    assert stream_state == want_state


def test_stream_retention_matches_batch(spark, tmp_path):
    """Stream-static cohort join + HLL distinct counts: the SAME
    stream_retention code on a readStream (complete mode, one stateful
    aggregation) is bit-identical to the batch run — HyperLogLog++
    registers merge associatively in any arrival order."""
    import datetime as _dt

    from seatunnel_spark.streaming import (retention_cohorts,
                                           stream_retention)

    t0 = _dt.datetime(2024, 1, 1)
    hist_rows, live_rows = [], []
    for u in range(40):
        first = u % 3  # cohort weeks 0..2
        hist_rows.append((u, t0 + _dt.timedelta(days=7 * first)))
        for k in range(u % 4):  # later activity at offsets 1..3
            live_rows.append(
                (u, t0 + _dt.timedelta(days=7 * (first + k + 1))))
    hist = spark.createDataFrame(hist_rows, "user_id long, ts timestamp")
    live = spark.createDataFrame(live_rows, "user_id long, ts timestamp")
    cohorts = retention_cohorts(hist, "user_id", "ts")

    path = str(tmp_path / "live_events")
    live.write.mode("overwrite").parquet(path)
    stream = spark.readStream.schema(live.schema).parquet(path)

    batches = _run_batches(
        spark, stream_retention(stream, cohorts, "user_id", "ts"),
        tmp_path, mode="complete")
    got = {(r["cohort_period"], r["offset"]): r["users"]
           for r in batches[-1]}
    want = {(r["cohort_period"], r["offset"]): r["users"]
            for r in stream_retention(live, cohorts,
                                      "user_id", "ts").collect()}
    assert got == want and len(want) > 3
    # HLL is exact at these cardinalities: cross-check one cell
    # against the true distinct count
    truth = len({u for u, _ in live_rows if u % 3 == 0 and u % 4 >= 1})
    assert got[(2819, 1)] == truth


def test_dq_checks_streamable_with_approx(spark, tmp_path):
    """The whole declarative DQ gate (rate rules + an approx unique
    rule) is ONE map-side-combinable aggregation, so it runs unchanged
    on a readStream in complete mode and every metric/pass flag is
    bit-identical to batch — a live data-quality monitor for free.
    (An exact unique rule would be rejected on streams: COUNT DISTINCT
    state grows with the key set.)"""
    from seatunnel_spark.dataops.profile import dq_checks

    rows = [(i, i % 9, "x" if i % 5 else None) for i in range(90)]
    static = spark.createDataFrame(rows, "id long, k int, s string")
    path = str(tmp_path / "dq_rows")
    static.write.mode("overwrite").parquet(path)
    stream = spark.readStream.schema(static.schema).parquet(path)

    rules = [
        {"name": "s_mostly_set", "kind": "rate",
         "expr": "s IS NOT NULL", "min": 0.7},
        {"name": "k_cardinality", "kind": "unique", "col": "k",
         "min": 0.05, "approx": True},
    ]
    batches = _run_batches(spark, dq_checks(stream, rules), tmp_path,
                           mode="complete")
    got = {tuple(r) for r in batches[-1]}
    want = {tuple(r) for r in dq_checks(static, rules).collect()}
    assert got == want
    assert all(r[-1] for r in got)  # both rules pass on this data


def test_hll_build_stream_matches_batch(spark, tmp_path):
    """The HLL build is a pure MAX groupBy aggregation — the SAME
    hll_build code on a readStream (complete mode) yields a register
    table bit-identical to the batch build, so streaming pipelines
    maintain distinct-count sketches incrementally and hll_merge them
    with batch/offline sketches (MAX is idempotent, so at-least-once
    replays are harmless by construction)."""
    from seatunnel_spark.dataops.sketches import hll_build, hll_estimate

    rows = [(i % 700,) for i in range(2000)]
    static = spark.createDataFrame(rows, "v long")
    path = str(tmp_path / "ids")
    static.write.mode("overwrite").parquet(path)
    stream = spark.readStream.schema(static.schema).parquet(path)

    batches = _run_batches(spark, hll_build(stream, "v"), tmp_path,
                           mode="complete")
    got = {(r["reg"], r["rho"]) for r in batches[-1]}
    want = {(r["reg"], r["rho"])
            for r in hll_build(static, "v").collect()}
    assert got == want and len(want) > 100
    # and the streamed registers estimate like batch
    sk = spark.createDataFrame(sorted(got), "reg int, rho int")
    est = hll_estimate(sk, []).collect()[0]["est"]
    assert abs(est - 700) / 700 < 0.15


def test_stream_hll_dau_matches_batch(spark, tmp_path):
    """HLL registers are a pure per-register MAX: (a) the SAME
    stream_hll_dau code on a readStream (complete mode) yields
    registers bit-identical to the batch build; (b) the foreachBatch
    register store (hll_register_sink) fed one file per micro-batch
    MAX-merges to the identical table — any arrival order folds to
    the sketch of the union; (c) the estimate over either equals the
    batch estimate."""
    import datetime as _dt

    from seatunnel_spark.dataops.sketches import (hll_build_grouped,
                                                  hll_estimate)
    from seatunnel_spark.streaming import (hll_register_sink,
                                           run_stream_to_batch_sink,
                                           stream_hll_dau)

    t0 = _dt.datetime(2024, 6, 1)
    rows = [(i, t0 + _dt.timedelta(days=i % 5, minutes=i), i % 300)
            for i in range(1200)]
    static = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long")
    path = str(tmp_path / "hll_events")
    static.repartition(3).write.mode("overwrite").parquet(path)

    want = {(r["day"], r["reg"]): r["rho"] for r in
            hll_build_grouped(
                static.select(F.to_date("ts").alias("day"), "user_id"),
                ["day"], "user_id").collect()}

    # (a) aggregation form on a stream, complete mode
    stream = spark.readStream.schema(static.schema).parquet(path)
    batches = _run_batches(spark, stream_hll_dau(stream), tmp_path,
                           mode="complete")
    got = {(r["day"], r["reg"]): r["rho"] for r in batches[-1]}
    assert got == want and len(want) > 100

    # (b) foreachBatch register store, one file per micro-batch
    store = str(tmp_path / "hll_store")
    stream2 = (spark.readStream.schema(static.schema)
               .option("maxFilesPerTrigger", 1).parquet(path))
    q = (stream2.writeStream
         .foreachBatch(lambda b, i: hll_register_sink(store)(b, i))
         .option("checkpointLocation", str(tmp_path / "hll_ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    stored = {(r["day"], r["reg"]): r["rho"]
              for r in spark.read.parquet(store).collect()}
    assert stored == want

    # (c) estimates agree with the batch readout
    est_store = {r["day"]: r["est"] for r in
                 hll_estimate(spark.read.parquet(store),
                              ["day"]).collect()}
    est_batch = {r["day"]: r["est"] for r in
                 hll_estimate(
                     hll_build_grouped(
                         static.select(F.to_date("ts").alias("day"),
                                       "user_id"),
                         ["day"], "user_id"), ["day"]).collect()}
    assert est_store == est_batch and len(est_store) == 5


def test_stream_ddsketch_store_matches_batch(spark, tmp_path):
    """DDSketch bucket counts are purely ADDITIVE: (a) the SAME
    stream_ddsketch code on a readStream (complete mode) yields
    buckets bit-identical to the batch build; (b) the foreachBatch
    bucket store (ddsketch_register_sink) fed one file per
    micro-batch ADD-merges to the identical table; (c) daily
    quantiles over the store equal the batch readout."""
    import datetime as _dt

    from seatunnel_spark.dataops.sketches import (
        ddsketch_quantiles_grouped)
    from seatunnel_spark.streaming import (ddsketch_register_sink,
                                           stream_ddsketch)

    t0 = _dt.datetime(2024, 6, 1)
    rows = [(i, t0 + _dt.timedelta(days=i % 4, minutes=i),
             float(2 ** (i % 16)) + 0.5 * i) for i in range(1000)]
    static = spark.createDataFrame(
        rows, "event_id long, ts timestamp, value double")
    path = str(tmp_path / "dd_events")
    static.repartition(3).write.mode("overwrite").parquet(path)

    want = {(r["day"], r["kind"], r["idx"]): r["cnt"] for r in
            stream_ddsketch(static).collect()}

    # (a) aggregation form on a stream, complete mode
    stream = spark.readStream.schema(static.schema).parquet(path)
    batches = _run_batches(spark, stream_ddsketch(stream), tmp_path,
                           mode="complete")
    got = {(r["day"], r["kind"], r["idx"]): r["cnt"]
           for r in batches[-1]}
    assert got == want and len(want) > 40

    # (b) foreachBatch additive store, one file per micro-batch
    store = str(tmp_path / "dd_store")
    stream2 = (spark.readStream.schema(static.schema)
               .option("maxFilesPerTrigger", 1).parquet(path))
    q = (stream2.writeStream
         .foreachBatch(lambda b, i: ddsketch_register_sink(store)(b, i))
         .option("checkpointLocation", str(tmp_path / "dd_ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    stored = {(r["day"], r["kind"], r["idx"]): r["cnt"]
              for r in spark.read.parquet(store).collect()}
    assert stored == want

    # (c) daily p50/p95 from the store equal the batch readout
    qs_store = {(r["day"], r["q"]): r["est"] for r in
                ddsketch_quantiles_grouped(
                    spark.read.parquet(store), ["day"],
                    [0.5, 0.95]).collect()}
    qs_batch = {(r["day"], r["q"]): r["est"] for r in
                ddsketch_quantiles_grouped(
                    stream_ddsketch(static), ["day"],
                    [0.5, 0.95]).collect()}
    assert qs_store == qs_batch and len(qs_store) == 8


def test_cms_register_store_matches_batch(spark, tmp_path):
    """CMS counters are purely additive: the foreachBatch store
    (cms_register_sink) fed one file per micro-batch ADD-merges to
    the exact batch-built sketch, and point estimates over the store
    keep the never-underestimate guarantee."""
    from seatunnel_spark.dataops.text import cms_build, cms_estimate
    from seatunnel_spark.streaming import cms_register_sink

    rows = [(i, " ".join(f"w{j % 17}" for j in range(i, i + 6)))
            for i in range(400)]
    static = spark.createDataFrame(rows, "doc_id long, text string")
    path = str(tmp_path / "cms_docs")
    static.repartition(3).write.mode("overwrite").parquet(path)

    want = {(r["d"], r["pos"]): r["cnt"]
            for r in cms_build(static).collect()}
    store = str(tmp_path / "cms_store")
    stream = (spark.readStream.schema(static.schema)
              .option("maxFilesPerTrigger", 1).parquet(path))
    q = (stream.writeStream
         .foreachBatch(lambda b, i: cms_register_sink(store)(b, i))
         .option("checkpointLocation", str(tmp_path / "cms_ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    stored = {(r["d"], r["pos"]): r["cnt"]
              for r in spark.read.parquet(store).collect()}
    assert stored == want and len(want) > 10
    probes = spark.createDataFrame([("w3",), ("w9",)], ["token"])
    est = {r["token"]: r["est"] for r in
           cms_estimate(spark.read.parquet(store), probes).collect()}
    truth = {r["token"]: r["n"] for r in
             static.selectExpr("explode(split(text, ' ')) AS t")
             .groupBy(F.col("t").alias("token"))
             .agg(F.count(F.lit(1)).alias("n"))
             .filter("token in ('w3','w9')").collect()}
    for t in ("w3", "w9"):
        assert est[t] >= truth[t]


def _fs_for(spark, path):
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jvm, jpath.getFileSystem(spark._jsc.hadoopConfiguration()), jpath


def _dd_batch(spark, lo, hi):
    import datetime as _dt

    t0 = _dt.datetime(2024, 6, 1)
    rows = [(i, t0 + _dt.timedelta(days=i % 3, minutes=i),
             float(2 ** (i % 10)) + 0.25 * i) for i in range(lo, hi)]
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, value double")


def _store_snapshot(spark, store):
    return {tuple(r) for r in spark.read.parquet(store).collect()}


def test_register_sink_replay_is_noop(spark, tmp_path):
    """foreachBatch is at-least-once: delivering the SAME micro-batch
    twice with its original batch_id must leave the ADD-merge stores
    (CMS, DDSketch) byte-unchanged — the `_applied_b{id}` ledger skips
    the replay — while a NEW batch_id still applies. HLL covered too
    (idempotent by MAX anyway; the ledger just skips the work)."""
    from seatunnel_spark.dataops.text import cms_build  # noqa: F401
    from seatunnel_spark.streaming import (cms_register_sink,
                                           ddsketch_register_sink,
                                           hll_register_sink)

    # DDSketch (ADD merge — replay would double-count without ledger)
    dd_store = str(tmp_path / "dd_store")
    sink = ddsketch_register_sink(dd_store)
    b0, b1 = _dd_batch(spark, 0, 300), _dd_batch(spark, 300, 500)
    sink(b0, 0)
    s0 = _store_snapshot(spark, dd_store)
    sink(b0, 0)  # replay: must be a no-op
    assert _store_snapshot(spark, dd_store) == s0
    sink(b1, 1)  # fresh batch: must apply
    s1 = _store_snapshot(spark, dd_store)
    assert s1 != s0
    sink(b1, 1)  # replay of the second batch: no-op again
    assert _store_snapshot(spark, dd_store) == s1

    # CMS (ADD merge)
    cms_store = str(tmp_path / "cms_store")
    docs = spark.createDataFrame(
        [(i, " ".join(f"w{j % 7}" for j in range(i, i + 4)))
         for i in range(120)], "doc_id long, text string")
    csink = cms_register_sink(cms_store)
    csink(docs, 0)
    c0 = _store_snapshot(spark, cms_store)
    csink(docs, 0)
    assert _store_snapshot(spark, cms_store) == c0

    # HLL (MAX merge — ledger still skips the replay)
    hll_store = str(tmp_path / "hll_store")
    hsink = hll_register_sink(hll_store, value_col="event_id")
    hsink(b0, 0)
    h0 = _store_snapshot(spark, hll_store)
    hsink(b0, 0)
    assert _store_snapshot(spark, hll_store) == h0


def test_register_sink_swap_crash_recovery(spark, tmp_path):
    """Injected crash between delete(store) and rename(swap, store):
    the swap (marker present = write completed) is the ONLY full
    copy; the next merge call must rename it in as the store and then
    skip the replayed batch via the ledger — accumulated history
    intact, no double count. Verified for both ADD-merge sinks."""
    from seatunnel_spark.streaming import (cms_register_sink,
                                           ddsketch_register_sink)

    dd_store = str(tmp_path / "dd_store")
    sink = ddsketch_register_sink(dd_store)
    b0, b1 = _dd_batch(spark, 0, 300), _dd_batch(spark, 300, 500)
    sink(b0, 0)
    sink(b1, 1)
    want = _store_snapshot(spark, dd_store)
    # Simulate the crash window: batch 1's swap completed (store IS
    # that swap, marker _applied_b1 inside) but the rename never ran —
    # store path missing, complete __swap present.
    jvm, fs, jpath = _fs_for(spark, dd_store)
    jswap = jvm.org.apache.hadoop.fs.Path(dd_store + "__swap")
    assert fs.rename(jpath, jswap)
    assert not fs.exists(jpath) and fs.exists(jswap)
    sink(b1, 1)  # the stream replays batch 1 after the crash
    assert _store_snapshot(spark, dd_store) == want
    assert not fs.exists(jswap)

    cms_store = str(tmp_path / "cms_store")
    docs = spark.createDataFrame(
        [(i, " ".join(f"w{j % 7}" for j in range(i, i + 4)))
         for i in range(120)], "doc_id long, text string")
    csink = cms_register_sink(cms_store)
    csink(docs, 0)
    cwant = _store_snapshot(spark, cms_store)
    jvm, fs, jpath = _fs_for(spark, cms_store)
    jswap = jvm.org.apache.hadoop.fs.Path(cms_store + "__swap")
    assert fs.rename(jpath, jswap)
    csink(docs, 0)
    assert _store_snapshot(spark, cms_store) == cwant


def test_register_sink_incomplete_swap_removed(spark, tmp_path):
    """A swap directory WITHOUT its `_applied_b` marker is a dead
    partial write (crash mid-parquet-write): it must be discarded —
    never renamed in — and the batch merges against the intact
    store."""
    from seatunnel_spark.streaming import ddsketch_register_sink

    store = str(tmp_path / "dd_store")
    sink = ddsketch_register_sink(store)
    b0, b1 = _dd_batch(spark, 0, 300), _dd_batch(spark, 300, 500)
    sink(b0, 0)
    # Plant a junk swap with no marker alongside the intact store.
    swap = tmp_path / "dd_store__swap"
    swap.mkdir()
    (swap / "part-junk.parquet").write_bytes(b"\x00not a footer")
    sink(b1, 1)
    jvm, fs, jpath = _fs_for(spark, store)
    assert not fs.exists(jvm.org.apache.hadoop.fs.Path(str(swap)))
    # Store equals the clean two-batch build.
    clean = str(tmp_path / "dd_clean")
    csink = ddsketch_register_sink(clean)
    csink(b0, 0)
    csink(b1, 1)
    assert _store_snapshot(spark, store) == _store_snapshot(spark, clean)


def test_mg_register_sink_heavy_hitters_bound(spark, tmp_path):
    """Misra-Gries register sink: (a) with capacity >= vocabulary the
    store is the EXACT token counts (compress never fires); (b) with
    a tight capacity the store stays <= capacity rows, every stored
    cnt lower-bounds the true count, the cumulative undercount obeys
    the mergeable-summaries bound N/(capacity+1), and the heavy
    token is guaranteed present; (c) replaying a batch is a no-op
    (the shared ledger)."""
    from seatunnel_spark.streaming import mg_register_sink

    # 3 micro-batches; 'hot' dominates, long tail of w{i} tokens
    batches = []
    for bno in range(3):
        rows = [(bno * 100 + i,
                 "hot hot hot w%d w%d" % (bno * 40 + i, i % 7))
                for i in range(40)]
        batches.append(spark.createDataFrame(
            rows, "doc_id long, text string"))

    # (a) capacity far above vocab -> exact counts
    exact_store = str(tmp_path / "mg_exact")
    sink = mg_register_sink(exact_store, capacity=100_000)
    for i, b in enumerate(batches):
        sink(b, i)
    got = {r["token"]: r["cnt"]
           for r in spark.read.parquet(exact_store).collect()}
    from collections import Counter

    truth = Counter()
    for bno in range(3):
        for i in range(40):
            truth.update(("hot hot hot w%d w%d"
                          % (bno * 40 + i, i % 7)).split())
    assert got == dict(truth)

    # (b) tight capacity
    cap = 16
    tight_store = str(tmp_path / "mg_tight")
    tsink = mg_register_sink(tight_store, capacity=cap)
    for i, b in enumerate(batches):
        tsink(b, i)
    tgot = {r["token"]: r["cnt"]
            for r in spark.read.parquet(tight_store).collect()}
    n_total = sum(truth.values())
    bound = n_total / (cap + 1)
    assert len(tgot) <= cap
    for t, c in tgot.items():
        assert c <= truth[t]
        assert truth[t] - c <= bound
    assert truth["hot"] > bound and "hot" in tgot

    # (c) replay no-op via the shared ledger
    snap = {tuple(r) for r in spark.read.parquet(tight_store).collect()}
    tsink(batches[-1], 2)
    assert {tuple(r)
            for r in spark.read.parquet(tight_store).collect()} == snap
