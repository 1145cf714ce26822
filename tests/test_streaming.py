"""Structured Streaming: stream-over-static-files must equal the batch plan
(the rebuild of the reference's streaming scoring path, SURVEY.md §2.13)."""
from pyspark.sql import functions as F

from transmogrifai_spark.sources.tables import load_table
from transmogrifai_spark.streaming.windows import (run_stream_available_now,
                                                   windowed_event_aggregate)

SCHEMA = None  # derived from the parquet footer by file_stream


def test_stream_equals_batch(spark, sf_dir):
    streamed = run_stream_available_now(
        spark, f"{sf_dir}/events.parquet", SCHEMA,
        lambda s: windowed_event_aggregate(s, "ts", "1 day", "1 day"),
        ts_col="ts")
    batch = windowed_event_aggregate(load_table(spark, sf_dir, "events"), "ts", "1 day")
    s_rows = sorted(tuple(r) for r in streamed.collect())
    b_rows = sorted(tuple(r) for r in batch.collect())
    assert s_rows == b_rows
    assert len(s_rows) > 0


def test_streaming_scoring_pipeline(spark, sf_dir):
    """A fitted column-pipeline model applies to a stream unchanged."""
    from transmogrifai_spark.feature import from_dataframe
    from transmogrifai_spark.stages.base import unary
    from transmogrifai_spark.workflow import Workflow

    batch_events = load_table(spark, sf_dir, "events")
    feats = from_dataframe(batch_events.select("event_id", "value"))
    doubled = unary("dbl", feats["value"], "value_x2", "Real", lambda c: c * 2)
    model = Workflow([doubled]).fit(batch_events)

    streamed = run_stream_available_now(
        spark, f"{sf_dir}/events.parquet", SCHEMA,
        lambda s: model.transform(s).groupBy().agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value_x2").cast("decimal(28,6)")).cast("double").alias("total")),
        ts_col="ts")
    row = streamed.first()
    n_batch = batch_events.count()
    assert row["n"] == n_batch


def test_stream_stream_interval_join_equals_batch(spark, sf_dir):
    """Stream-stream interval join (click -> purchase by the same user within
    1 day): append-mode streaming output over static files must equal the
    identical batch join."""
    from transmogrifai_spark.streaming.windows import (file_stream,
                                                       run_to_memory,
                                                       stream_stream_interval_join)

    def sides(df):
        clicks = df.where(F.col("event_type") == "click") \
            .select(F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts"),
                    F.col("event_id").alias("c_id"))
        buys = df.where(F.col("event_type") == "purchase") \
            .select(F.col("user_id").alias("b_user"), F.col("ts").alias("b_ts"),
                    F.col("event_id").alias("b_id"))
        return clicks, buys

    src = f"{sf_dir}/events.parquet"
    sc, sb = sides(file_stream(spark, src, SCHEMA, ts_col="ts"))
    streamed = run_to_memory(
        stream_stream_interval_join(sc, sb, "c_user", "b_user", "c_ts", "b_ts",
                                    within="1 day", watermark="2 days"),
        output_mode="append")

    bc, bb = sides(load_table(spark, sf_dir, "events"))
    batch = stream_stream_interval_join(bc, bb, "c_user", "b_user",
                                        "c_ts", "b_ts", within="1 day")
    s_rows = sorted((r["c_id"], r["b_id"]) for r in streamed.collect())
    b_rows = sorted((r["c_id"], r["b_id"]) for r in batch.collect())
    assert s_rows == b_rows
    assert len(s_rows) > 0


def test_stream_stream_left_outer_expiry_nulls(spark, sf_dir):
    """Left-outer stream-stream join: matched pairs equal the batch join;
    unmatched left rows are emitted null-joined exactly when the final
    watermark passes their join upper bound (c_ts + within) — i.e. when
    their buffered state can be evicted; trailing rows stay withheld. This
    is the state-expiry law that bounds join state on an unbounded stream."""
    import datetime

    from transmogrifai_spark.streaming.windows import (file_stream,
                                                       run_to_memory,
                                                       stream_stream_interval_join)

    def sides(df):
        clicks = df.where(F.col("event_type") == "click") \
            .select(F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts"),
                    F.col("event_id").alias("c_id"))
        buys = df.where(F.col("event_type") == "purchase") \
            .select(F.col("user_id").alias("b_user"), F.col("ts").alias("b_ts"),
                    F.col("event_id").alias("b_id"))
        return clicks, buys

    src = f"{sf_dir}/events.parquet"
    sc, sb = sides(file_stream(spark, src, SCHEMA, ts_col="ts"))
    streamed = run_to_memory(
        stream_stream_interval_join(sc, sb, "c_user", "b_user", "c_ts", "b_ts",
                                    within="1 day", watermark="2 days",
                                    how="left_outer"),
        output_mode="append").collect()
    s_matched = sorted((r["c_id"], r["b_id"]) for r in streamed
                       if r["b_id"] is not None)
    s_null_ids = {r["c_id"] for r in streamed if r["b_id"] is None}

    bc, bb = sides(load_table(spark, sf_dir, "events"))
    batch = stream_stream_interval_join(bc, bb, "c_user", "b_user",
                                        "c_ts", "b_ts", within="1 day",
                                        how="left_outer").collect()
    b_matched = sorted((r["c_id"], r["b_id"]) for r in batch
                       if r["b_id"] is not None)
    assert s_matched == b_matched and len(s_matched) > 0

    # final GLOBAL watermark = min over the two inputs of (max event time
    # AFTER that input's filter) - delay (pinned empirically in round 5:
    # max over ALL events is wrong by the rows between the sides' maxima);
    # expiry bound = c_ts + within, strictly
    ev = load_table(spark, sf_dir, "events")
    max_c = ev.where(F.col("event_type") == "click").agg(F.max("ts")).first()[0]
    max_b = ev.where(F.col("event_type") == "purchase").agg(F.max("ts")).first()[0]
    wm = min(max_c, max_b) - datetime.timedelta(days=2)
    b_null = {r["c_id"]: r["c_ts"] for r in batch if r["b_id"] is None}
    expected = {i for i, t in b_null.items()
                if t + datetime.timedelta(days=1) < wm}
    assert s_null_ids == expected
    assert 0 < len(s_null_ids) < len(b_null)  # some emitted, trailing withheld


def test_append_mode_emits_only_watermark_closed_windows(spark, sf_dir):
    """Watermark expiry: in append mode a window is emitted only once the
    final watermark (max event time - delay) passes its end; the trailing
    windows stay buffered. Complete mode emits everything."""
    from transmogrifai_spark.streaming.windows import windowed_event_aggregate

    tf = lambda s: windowed_event_aggregate(s, "ts", "1 day", "1 day")
    src = f"{sf_dir}/events.parquet"
    complete = run_stream_available_now(spark, src, SCHEMA, tf, ts_col="ts")
    append = run_stream_available_now(spark, src, SCHEMA, tf, ts_col="ts",
                                      output_mode="append")
    c_rows = {tuple(r) for r in complete.collect()}
    a_rows = {tuple(r) for r in append.collect()}
    assert a_rows <= c_rows          # append is a subset
    assert len(a_rows) < len(c_rows)  # trailing windows withheld...
    # ...and exactly those the final watermark has not passed: wm = max_ts - 1d
    import datetime
    ev = load_table(spark, sf_dir, "events")
    max_ts = ev.agg(F.max("ts")).first()[0]
    wm_ms = (max_ts - datetime.timedelta(days=1)).replace(
        tzinfo=datetime.timezone.utc).timestamp() * 1000
    day_ms = 86_400_000
    expected_open = {t for t in c_rows if t[0] + day_ms > wm_ms}
    assert c_rows - a_rows == expected_open


def test_file_stream_max_files_per_trigger(spark, sf_dir, tmp_path):
    """Source throttling: with N input files and maxFilesPerTrigger=1, the
    availableNow run processes N micro-batches, not one — the backfill
    knob that keeps a 100 TB directory from becoming a single batch."""
    import uuid

    from transmogrifai_spark.sources.tables import load_table
    from transmogrifai_spark.streaming.windows import file_stream

    src = str(tmp_path / "many")
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    ev.repartition(4).write.parquet(src)
    stream = file_stream(spark, src, max_files_per_trigger=1)
    sink = f"mem_{uuid.uuid4().hex[:10]}"
    q = (stream.groupBy().count().writeStream.format("memory").queryName(sink)
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination()
    batches = [p for p in q.recentProgress if p["numInputRows"] > 0]
    assert len(batches) >= 4                      # one file per micro-batch
    assert spark.table(sink).first()["count"] == ev.count()


def test_curation_expressions_run_on_streams(spark, sf_dir):
    """The curation surface (quality rules, PII detection/redaction, LM-free
    text metrics) is pure expressions, so it applies unchanged to a
    readStream: stream output over static files == the batch projection."""
    from transmogrifai_spark.llm.pii import detect_pii, redact_pii
    from transmogrifai_spark.llm.quality_rules import gopher_rules
    from transmogrifai_spark.streaming.windows import (file_stream,
                                                       run_to_memory)

    src = f"{sf_dir}/documents.parquet"

    def proj(df):
        return df.select(
            "doc_id",
            gopher_rules(F.col("text"))["keep"].alias("keep"),
            F.element_at(detect_pii(F.col("text"), ["email"]), "email")
             .alias("emails"),
            F.length(redact_pii(F.col("text"), ["email"])).alias("red_len"))

    streamed = run_to_memory(proj(file_stream(spark, src)),
                             output_mode="append")
    batch = proj(spark.read.parquet(src))
    assert sorted(map(tuple, streamed.collect())) \
        == sorted(map(tuple, batch.collect()))


def test_windowed_distinct_approx_stream_equals_batch(spark, sf_dir):
    from transmogrifai_spark.streaming.windows import windowed_distinct_approx

    streamed = run_stream_available_now(
        spark, f"{sf_dir}/events.parquet", SCHEMA,
        lambda s: windowed_distinct_approx(s, "user_id", "ts", "1 day"),
        ts_col="ts")
    batch = windowed_distinct_approx(
        load_table(spark, sf_dir, "events"), "user_id", "ts", "1 day")
    s_rows = sorted(tuple(r) for r in streamed.collect())
    b_rows = sorted(tuple(r) for r in batch.collect())
    assert s_rows == b_rows and s_rows
    # sanity: approx within 5% of exact per (window, type)
    ev = load_table(spark, sf_dir, "events")
    day = 86_400_000
    exact = {(r["w"], r["event_type"]): r["n"] for r in ev.groupBy(
        (F.col("ts_ms") - F.col("ts_ms") % day).alias("w"), "event_type")
        .agg(F.countDistinct("user_id").alias("n")).collect()}
    for (w, et, _n_events, est) in b_rows:
        n = exact[(w, et)]
        assert abs(est - n) <= max(3, 0.05 * n)


def test_windowed_quantile_approx_stream_equals_batch(spark, sf_dir):
    from transmogrifai_spark.streaming.windows import windowed_quantile_approx

    tf = lambda s: windowed_quantile_approx(s, "value", [0.5, 0.95], "ts")
    streamed = run_stream_available_now(
        spark, f"{sf_dir}/events.parquet", SCHEMA, tf, ts_col="ts")
    batch = tf(load_table(spark, sf_dir, "events"))
    s_rows = sorted(tuple(r) for r in streamed.collect())
    b_rows = sorted(tuple(r) for r in batch.collect())
    assert s_rows == b_rows and s_rows
    # percentile sanity on one group: p50 <= p95, both within value range
    for r in b_rows:
        assert r[-2] <= r[-1]


def test_stream_static_broadcast_enrichment_equals_batch(spark, sf_dir):
    """Stream-static join: a streaming fact enriched by a static dim (the
    everyday streaming enrichment shape) must equal the batch join; the
    static side is broadcast so the stream never shuffles."""
    from transmogrifai_spark.streaming.windows import (file_stream,
                                                       run_to_memory)

    dim = (load_table(spark, sf_dir, "events")
           .select("event_type").distinct()
           .withColumn("type_code",
                       F.dense_rank().over(
                           __import__("pyspark").sql.window.Window
                           .orderBy("event_type"))))
    stream = file_stream(spark, f"{sf_dir}/events.parquet", ts_col="ts")
    enriched = (stream.join(F.broadcast(dim), "event_type")
                .groupBy("type_code")
                .agg(F.count(F.lit(1)).alias("n")))
    got = sorted(tuple(r) for r in run_to_memory(enriched).collect())
    want = sorted(tuple(r) for r in
                  load_table(spark, sf_dir, "events")
                  .join(F.broadcast(dim), "event_type")
                  .groupBy("type_code")
                  .agg(F.count(F.lit(1)).alias("n")).collect())
    assert got == want and got


def test_stream_rollup_partials_equal_batch_rollup(spark, sf_dir, tmp_path):
    from transmogrifai_spark.operators.rollup import (hierarchical_rollup,
                                                      rollup_finalize,
                                                      rollup_merge)
    from transmogrifai_spark.streaming.windows import (file_stream,
                                                       stream_rollup_partials)

    stats = {"n": ("count", None), "total": ("sum_exact", "value"),
             "users": ("approx_distinct", "user_id")}
    hour, day = 3_600_000, 86_400_000
    ev = load_table(spark, sf_dir, "events")
    stream = file_stream(spark, f"{sf_dir}/events.parquet", ts_col="ts",
                         max_files_per_trigger=1)
    stream = stream.withColumn(
        "ts_ms", F.expr("unix_micros(cast(ts as timestamp)) div 1000"))
    q = stream_rollup_partials(stream, str(tmp_path / "p"), "ts_ms", hour,
                               ["event_type"], stats,
                               checkpoint=str(tmp_path / "ck"))
    q.awaitTermination()
    merged = rollup_merge(spark.read.parquet(str(tmp_path / "p")), day,
                          ["event_type"], stats)
    got = sorted(map(tuple, rollup_finalize(
        merged, ["event_type"], stats).collect()))
    want = sorted(map(tuple, hierarchical_rollup(
        ev, "ts_ms", [day], ["event_type"], stats)[day].collect()))
    assert got == want and got


def test_stream_rollup_partials_replay_idempotent(spark, sf_dir, tmp_path):
    """ADVICE r4: a replayed micro-batch must not double its partials.
    Re-running the stream with a FRESH checkpoint replays every batch into
    the same partials store; because each batch overwrites its own
    batch=<id>/ directory, the store converges to the same contents."""
    from transmogrifai_spark.operators.rollup import (rollup_finalize,
                                                      rollup_merge)
    from transmogrifai_spark.streaming.windows import (file_stream,
                                                       stream_rollup_partials)

    stats = {"n": ("count", None), "total": ("sum_exact", "value")}
    hour = 3_600_000

    def run(ck):
        stream = file_stream(spark, f"{sf_dir}/events.parquet", ts_col="ts",
                             max_files_per_trigger=1)
        stream = stream.withColumn(
            "ts_ms", F.expr("unix_micros(cast(ts as timestamp)) div 1000"))
        q = stream_rollup_partials(stream, str(tmp_path / "p"), "ts_ms",
                                   hour, ["event_type"], stats,
                                   checkpoint=str(tmp_path / ck))
        q.awaitTermination()

    def snapshot():
        merged = rollup_merge(spark.read.parquet(str(tmp_path / "p")),
                              hour, ["event_type"], stats)
        return sorted(map(tuple, rollup_finalize(
            merged, ["event_type"], stats).collect()))

    run("ck1")
    first = snapshot()
    run("ck2")  # full replay: same batches, same ids, fresh checkpoint
    assert snapshot() == first and first


def test_stream_freq_partials_equal_batch_exact_regime(spark, sf_dir, tmp_path):
    """Streaming MG partials, merged, == one batch freq_partial when k
    covers every batch's distinct items (err 0, exact counts) — over a
    REAL multi-batch split (4 source files, one per trigger)."""
    from transmogrifai_spark.operators.sketches import freq_merge, freq_partial
    from transmogrifai_spark.streaming.windows import (file_stream,
                                                       stream_freq_partials)

    ev = load_table(spark, sf_dir, "events")
    src = str(tmp_path / "src")
    ev.repartition(4).write.mode("overwrite").parquet(src)
    stream = file_stream(spark, src, ts_col="ts", max_files_per_trigger=1)
    q = stream_freq_partials(stream.withColumn("g", F.col("user_id") % 2),
                             str(tmp_path / "p"), ["g"], "event_type", k=64,
                             checkpoint=str(tmp_path / "ck"))
    q.awaitTermination()
    merged = freq_merge(spark.read.parquet(str(tmp_path / "p")), ["g"], k=64)
    got = {r["g"]: (dict(r["items"]), r["err"], r["n"])
           for r in merged.collect()}
    want = {r["g"]: (dict(r["items"]), r["err"], r["n"])
            for r in freq_partial(ev.withColumn("g", F.col("user_id") % 2),
                                  ["g"], "event_type", k=64).collect()}
    assert got == want and got
    assert all(err == 0 for _, err, _ in got.values())
    # the store really did split: >1 batch directory
    import os
    batches = [d for d in os.listdir(str(tmp_path / "p"))
               if d.startswith("batch=")]
    assert len(batches) > 1


def test_scaled_state_partitions_derive_from_bytes_and_restore(spark, sf_dir):
    """r13 (VERDICT r12 #3): state partitions derive from INPUT BYTES —
    a megabytes-scale backfill gets few state stores (1 per 32 MB,
    floor 1), the clamp cannot exceed the session's shuffle partitions,
    unknown paths return None (no override), and run_to_memory restores
    the session conf afterwards."""
    from transmogrifai_spark.streaming.windows import (
        file_stream, run_to_memory, scaled_state_partitions,
        windowed_event_aggregate)
    src = f"{sf_dir}/events.parquet"
    n = scaled_state_partitions(spark, src)
    cur = int(spark.conf.get("spark.sql.shuffle.partitions"))
    assert n is not None and 1 <= n <= cur
    assert scaled_state_partitions(spark, "/nonexistent/nowhere") is None
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    out = run_to_memory(
        windowed_event_aggregate(file_stream(spark, src, ts_col="ts"), "ts",
                                 "1 day", "1 day"),
        "complete", state_partitions=n)
    assert spark.conf.get("spark.sql.shuffle.partitions") == prev
    # and the scaled run equals the batch plan on the same files — the
    # partition count must never change what the aggregation computes
    batch = windowed_event_aggregate(
        load_table(spark, sf_dir, "events"), "ts", "1 day", "1 day")
    assert sorted(map(tuple, out.collect())) == \
        sorted(map(tuple, batch.collect()))
