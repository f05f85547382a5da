"""Structured Streaming ingest: the batch transform chain run as a stream
must emit the identical edge set (SURVEY.md §2.9; the Spark-native answer
to tools/riffle's incremental merge)."""

import os

from pyspark.sql import functions as F

from wikiprep_spark.operators import edges as edge_ops
from wikiprep_spark.plans.pipeline import run_pipeline
from wikiprep_spark.sources.corpus import build_src_pages
from wikiprep_spark.streaming import ingest

SF_DIR = "/root/testdata/sf0.001"


def test_streaming_matches_batch(spark, tmp_path):
    import shutil

    src = build_src_pages(spark, SF_DIR, limit=40)
    stage_dir = tmp_path / "staged"
    # several files so maxFilesPerTrigger yields multiple micro-batches;
    # the last file is held back to exercise riffle-style catch-up below
    src.repartition(5).write.parquet(str(stage_dir))
    parts = sorted(stage_dir.glob("part-*.parquet"))
    assert len(parts) == 5
    src_dir = str(tmp_path / "src_pages")
    os.makedirs(src_dir)
    for p in parts[:4]:
        shutil.copy(p, src_dir)

    batch = run_pipeline(spark, spark.read.parquet(src_dir))
    batch_links = {
        tuple(r) for r in batch["links"].select(
            "source_id", "target_id").collect()
    }
    batch_anchors = batch["anchors"].count()

    stream = ingest.stream_src_pages(spark, src_dir, max_files_per_trigger=2)
    assert stream.isStreaming
    transformed = ingest.streaming_transform(stream, batch["_dicts_path"])
    out_dir = str(tmp_path / "out")
    q = ingest.start_edge_sink(
        transformed, out_dir, str(tmp_path / "ckpt"), available_now=True
    )
    q.awaitTermination(300)
    assert not q.isActive

    streamed = spark.read.parquet(out_dir)
    streamed_count = streamed.count()
    got_links = {
        tuple(r) for r in edge_ops.links_edges(streamed).select(
            "source_id", "target_id").collect()
    }
    assert got_links == batch_links and batch_links
    assert edge_ops.anchors_edges(streamed).count() == batch_anchors

    # riffle-style catch-up: the held-back file appears and a re-trigger
    # processes ONLY the new file (checkpoint offsets) and merges
    shutil.copy(parts[4], src_dir)

    q2 = ingest.start_edge_sink(
        ingest.streaming_transform(
            ingest.stream_src_pages(spark, src_dir), batch["_dicts_path"]
        ),
        out_dir, str(tmp_path / "ckpt"), available_now=True,
    )
    q2.awaitTermination(300)
    merged = spark.read.parquet(out_dir)
    assert merged.count() > streamed_count
    # no duplicates: each page transformed exactly once
    assert merged.groupBy("page_id").count().where("count > 1").count() == 0


def test_dictionary_refresh_cycle(spark, tmp_path):
    """The riffle merge cycle (tools/riffle/riffle.cpp semantics): pages
    stream against dictionary snapshot v1; a template published mid-stream
    is picked up by the next batch prescan (snapshot v2), and the NEXT
    micro-batch transforms against v2 — already-emitted rows are never
    recomputed (checkpoint offsets), so the output is the riffle merge of
    v1- and v2-transformed pages."""
    import os

    from wikiprep_spark.sources.mediawiki_xml import make_page_xml

    def src_df(rows):
        return spark.createDataFrame(
            [("wiki", path, "c0", "wikitext", make_page_xml(pid, t, x))
             for path, pid, t, x in rows],
            "repo string, path string, commit string, lang string, "
            "content string",
        )

    src_dir = str(tmp_path / "src")
    os.makedirs(src_dir)
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # epoch 1: an article transcluding a template that does NOT exist yet
    src_df([
        ("a1.xml", 1, "Alpha", "{{Greet}} and [[Beta]]"),
        ("a2.xml", 2, "Beta", "plain body"),
    ]).coalesce(1).write.mode("append").parquet(src_dir)
    v1 = run_pipeline(spark, spark.read.parquet(src_dir))

    q1 = ingest.start_edge_sink(
        ingest.streaming_transform(
            ingest.stream_src_pages(spark, src_dir), v1["_dicts_path"]),
        out_dir, ckpt, available_now=True)
    q1.awaitTermination(300)
    alpha_v1 = spark.read.parquet(out_dir).where("page_id = 1").first()
    assert "hello from greet" not in alpha_v1["text"]  # dict v1: no Greet

    # the template is published mid-stream, plus a new article using it
    src_df([
        ("t1.xml", 50, "Template:Greet", "hello from greet"),
        ("a3.xml", 3, "Gamma", "{{Greet}} and [[Alpha]]"),
    ]).coalesce(1).write.mode("append").parquet(src_dir)
    # dictionary-refresh: the next batch prescan builds snapshot v2
    v2 = run_pipeline(spark, spark.read.parquet(src_dir))
    assert v2["_dicts_path"] != v1["_dicts_path"]

    # next catch-up trigger transforms ONLY the new files, against v2
    q2 = ingest.start_edge_sink(
        ingest.streaming_transform(
            ingest.stream_src_pages(spark, src_dir), v2["_dicts_path"]),
        out_dir, ckpt, available_now=True)
    q2.awaitTermination(300)

    merged = spark.read.parquet(out_dir)
    rows = {r["page_id"]: r for r in merged.collect()}
    # new page expanded with the refreshed dictionary...
    assert "hello from greet" in rows[3]["text"]
    assert rows[3]["template_incl"] and 50 in {
        t["template_id"] for t in rows[3]["template_incl"]}
    # ...while the v1-transformed page was NOT recomputed (riffle merge:
    # old output rows are immutable)
    assert rows[1]["text"] == alpha_v1["text"]
    assert merged.groupBy("page_id").count().where("count > 1").count() == 0


def test_streaming_exact_dedup(spark, tmp_path):
    """Streaming dedup == batch dedup on the same input: one survivor per
    distinct normalized content, duplicates dropped across micro-batches
    (state carries between triggers)."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(50)
    # duplicate every doc's content under a different id; spread over
    # several files so duplicates land in different micro-batches
    dup = docs.select((F.col("doc_id") + 100000).alias("doc_id"), "text",
                      "lang", "source", "n_chars")
    src_dir = str(tmp_path / "docs")
    docs.unionByName(dup).repartition(4).write.parquet(src_dir)

    stream = spark.readStream.schema(docs.schema).option(
        "maxFilesPerTrigger", 1).parquet(src_dir)
    out = str(tmp_path / "out")
    q = (
        ingest.streaming_exact_dedup(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    got = spark.read.parquet(out)
    n_distinct = docs.select(
        F.md5(F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")))
    ).distinct().count()
    assert got.count() == n_distinct
    assert got.select("content_md5").distinct().count() == n_distinct

    # bounded-state variant: duplicates arriving inside the watermark
    # horizon drop via dropDuplicatesWithinWatermark state
    ts_dir = str(tmp_path / "docs_ts")
    (spark.read.parquet(src_dir)
     .withColumn("ts", F.to_timestamp(F.lit("2026-01-01 00:00:00"))
                 + F.make_interval(secs=F.col("doc_id") % 100))
     .repartition(4).write.parquet(ts_dir))
    stream_ts = spark.readStream.schema(
        spark.read.parquet(ts_dir).schema).option(
        "maxFilesPerTrigger", 1).parquet(ts_dir)
    out2 = str(tmp_path / "out2")
    q2 = (
        ingest.streaming_exact_dedup(stream_ts, ts_col="ts")
        .writeStream.format("parquet")
        .option("path", out2)
        .option("checkpointLocation", str(tmp_path / "ckpt2w"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(300)
    assert spark.read.parquet(out2).count() == n_distinct


def test_sessionize_events_stateful(spark, tmp_path):
    """applyInPandasWithState sessionization == the batch lag-window
    twin, with state carried ACROSS micro-batches (events arrive in
    time-ordered chunks; a session spanning a chunk boundary must not
    split)."""
    GAP = 3600
    events = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "user_id", F.col("ts").cast("timestamp").cast("long").alias("ts_sec"))

    # batch twin: lag-window session ids; closed sessions = all but each
    # user's last
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts_sec")
    flagged = events.withColumn(
        "new_sess",
        F.when(F.lag("ts_sec").over(w).isNull()
               | (F.col("ts_sec") - F.lag("ts_sec").over(w) > GAP), 1)
        .otherwise(0))
    sess = (
        flagged.withColumn("sid", F.sum("new_sess").over(w))
        .groupBy("user_id", "sid")
        .agg(F.min("ts_sec").alias("session_start"),
             F.max("ts_sec").alias("session_end"),
             F.count("*").alias("n_events"))
    )
    last_sid = sess.groupBy("user_id").agg(F.max("sid").alias("last_sid"))
    closed_batch = {
        tuple(r) for r in sess.join(last_sid, "user_id")
        .where(F.col("sid") != F.col("last_sid"))
        .select("user_id", "session_start", "session_end", "n_events")
        .collect()
    }
    assert closed_batch  # the fixture really contains multi-session users

    # stream: 3 time-range chunks written SEQUENTIALLY (FileStreamSource
    # orders files by modification time, so one multi-file write gives an
    # arbitrary arrival order) -> 3 micro-batches in event-time order,
    # which is the operator's arrival-order contract
    import time as _time

    raw = spark.read.parquet(f"{SF_DIR}/events.parquet")
    b1, b2 = [int(x) for x in raw.selectExpr(
        "percentile(cast(cast(ts as timestamp) as long), "
        "array(0.33, 0.66))").first()[0]]
    ev_dir = str(tmp_path / "ev")
    ts_long = F.col("ts").cast("timestamp").cast("long")
    chunks = [
        raw.where(ts_long <= b1),
        raw.where((ts_long > b1) & (ts_long <= b2)),
        raw.where(ts_long > b2),
    ]
    for c in chunks:
        c.coalesce(1).write.mode("append").parquet(ev_dir)
        _time.sleep(1.2)  # distinct mtimes -> deterministic arrival order
    stream = spark.readStream.schema(
        spark.read.parquet(ev_dir).schema).option(
        "maxFilesPerTrigger", 1).parquet(ev_dir)
    out = str(tmp_path / "sess_out")
    q = (
        ingest.sessionize_events(stream, gap_seconds=GAP)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "sess_ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    got = {tuple(r) for r in spark.read.parquet(out).collect()}
    assert got == closed_batch

    # event-time-timeout variant: tail sessions flush once the watermark
    # passes last_ts + gap and their state is removed, so the emitted set
    # is ALL sessions whose end + gap <= the global max event time (a
    # closed session's end precedes its successor by > gap, so closed
    # sessions are a subset) — bounded state on unbounded streams
    out_t = str(tmp_path / "sess_out_t")
    q2 = (
        ingest.sessionize_events(stream, gap_seconds=GAP,
                                 emit_timeouts=True)
        .writeStream.format("parquet")
        .option("path", out_t)
        .option("checkpointLocation", str(tmp_path / "sess_ckpt_t"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(300)
    max_ts = events.agg(F.max("ts_sec")).first()[0]
    expected_t = {
        tuple(r) for r in sess
        .where(F.col("session_end") + GAP <= max_ts)
        .select("user_id", "session_start", "session_end", "n_events")
        .collect()
    }
    got_t = {tuple(r) for r in spark.read.parquet(out_t).collect()}
    assert got_t == expected_t
    assert len(got_t) > len(closed_batch)  # tail sessions flushed too


def test_windowed_event_counts_stream(spark, tmp_path):
    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    ev_dir = str(tmp_path / "events")
    events.coalesce(2).write.parquet(ev_dir)
    stream = spark.readStream.schema(events.schema).parquet(ev_dir)
    agg = ingest.windowed_event_counts(stream)
    out = str(tmp_path / "agg")
    q = (
        agg.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    # append mode only emits windows the watermark has passed; with a
    # bounded input the final (max-ts) window stays open, so compare
    # emitted windows against the batch aggregate restricted to them
    got = spark.read.parquet(out)
    batch = (
        events.withColumn("ts", F.col("ts").cast("timestamp"))
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "event_type",
                "n_events")
    )
    got_set = {(r["window_start"], r["event_type"], r["n_events"])
               for r in got.collect()}
    batch_map = {(r["window_start"], r["event_type"]): r["n_events"]
                 for r in batch.collect()}
    assert got_set  # watermark passed at least some windows
    for ws, et, n in got_set:
        assert batch_map[(ws, et)] == n


def test_sessionize_cross_batch_disorder(spark, tmp_path):
    """ADVICE r4: a late-but-within-watermark event older than the stored
    session frontier must fold into the open session (or emit as its own
    elapsed singleton) WITHOUT decreasing session_end, and the re-armed
    event-time timeout must never land at or below the watermark (Spark
    rejects that with a query-killing error)."""
    import time as _time

    GAP = 60

    def write_chunk(rows):
        spark.createDataFrame(
            rows, "user_id long, ts timestamp"
        ).coalesce(1).write.mode("append").parquet(str(tmp_path / "ev"))
        _time.sleep(1.2)  # distinct mtimes -> deterministic arrival order

    import datetime as dt

    def t(sec):
        return dt.datetime(2026, 1, 1) + dt.timedelta(seconds=sec)

    # chunk 1: user 1 session frontier at 1030; user 2 drives max event
    # time so the watermark advances independently of user 1
    write_chunk([(1, t(1000)), (1, t(1030)), (2, t(5000))])
    # chunk 2: two DISORDERED user-1 events (older than last=1030, inside
    # the 2h watermark): 950 touches the open session (>= start-gap) and
    # folds in, extending start backwards; 800 is > gap before start ->
    # elapsed singleton
    write_chunk([(1, t(950)), (1, t(800))])
    # chunk 3: gap-breaking event closes the folded session
    write_chunk([(1, t(10000)), (2, t(10000))])

    ev_schema = "user_id long, ts timestamp"
    for emit_timeouts, ck in ((False, "c1"), (True, "c2")):
        stream = spark.readStream.schema(ev_schema).option(
            "maxFilesPerTrigger", 1).parquet(str(tmp_path / "ev"))
        out = str(tmp_path / ("out_" + ck))
        q = (
            ingest.sessionize_events(stream, gap_seconds=GAP,
                                     emit_timeouts=emit_timeouts,
                                     watermark="2 hours")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", str(tmp_path / ("ckpt_" + ck)))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        assert q.exception() is None  # the clamp: no timeout <= watermark
        got = {tuple(r) for r in spark.read.parquet(out).collect()}
        base = int(t(0).timestamp())
        # session_end stayed 1030 (never decreased by the late 950);
        # start extended back to 950; the very-late 800 is a singleton;
        # user 2's first session closed on its own gap break.  Final
        # watermark = 10000 - 7200 < every last+gap -> no tail flush, so
        # this is the complete emitted set for both variants.
        assert got == {(1, base + 950, base + 1030, 3),
                       (1, base + 800, base + 800, 1),
                       (2, base + 5000, base + 5000, 1)}
