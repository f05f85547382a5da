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
