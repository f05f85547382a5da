"""End-to-end pipeline orchestration with checkpoint/resume and metrics.

Stage graph (SURVEY.md §7.1):

  src_pages ─ stage0 parse ─┬─ prescan aggregations ─ broadcast dicts ─┐
                            └──────────────── transform (mapInPandas) ┴─ edges/triples

Each materialized stage writes a parquet table under ``work_dir`` (the
Iceberg-table stand-in in this environment — swap the writer for
``writeTo(...).createOrReplace()`` on a cluster with an Iceberg catalog).
A completed stage is detected by Spark's ``_SUCCESS`` marker, so a killed
run resumes from the last finished stage without recomputing earlier ones;
within a stage, Spark's task retry handles partial work.  Per-stage metrics
(rows, seconds) and per-partition lineage (row counts, sha256 checksums of
the input contents) land in ``work_dir/metrics`` and ``work_dir/lineage``.
"""

from __future__ import annotations

import json
import os
import tempfile
import time

from pyspark.sql import DataFrame, SparkSession, functions as F

from wikiprep_spark.operators import edges as edge_ops
from wikiprep_spark.operators import prescan as prescan_ops
from wikiprep_spark.operators.transform import transform_pages
from wikiprep_spark.sources.pages import parse_pages

EDGE_BUILDERS = {
    "anchors": edge_ops.anchors_edges,
    "links": edge_ops.links_edges,
    "categories": edge_ops.categories_edges,
    "related": edge_ops.related_edges,
    "interwiki": edge_ops.interwiki_edges,
    "external": edge_ops.external_edges,
    "bare_urls": edge_ops.bare_urls_edges,
    "disambig": edge_ops.disambig_edges,
    "template_inclusions": edge_ops.template_inclusion_edges,
    "pages": edge_ops.pages_table,
}


class Metrics:
    def __init__(self):
        self.stages = []

    def record(self, stage: str, seconds: float, rows: int | None = None,
               **extra):
        entry = {"stage": stage, "seconds": round(seconds, 3), "rows": rows}
        entry.update(extra)
        self.stages.append(entry)

    def save(self, path: str):
        with open(path, "w") as fh:
            for entry in self.stages:
                fh.write(json.dumps(entry) + "\n")


def _stage_done(path: str) -> bool:
    return os.path.exists(os.path.join(path, "_SUCCESS"))


def _write(df: DataFrame, path: str, partition_by=None):
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(partition_by)
    writer.parquet(path)


def lineage_df(parsed: DataFrame) -> DataFrame:
    """Per-input-partition lineage: row count plus an order-insensitive
    checksum over the content sha256 values (verifies the per-row content
    invariant survives every re-run / resume)."""
    return (
        parsed.select(
            F.spark_partition_id().alias("partition_id"),
            F.crc32(F.col("content_sha256")).alias("crc"),
            F.length("text").alias("text_chars"),
        )
        .groupBy("partition_id")
        .agg(
            F.count("*").alias("rows"),
            F.sum("crc").alias("content_checksum"),
            F.sum("text_chars").alias("byte_count"),
        )
    )


def run_pipeline(
    spark: SparkSession,
    src_pages: DataFrame,
    work_dir: str | None = None,
    resume: bool = True,
    persist: bool = True,
) -> dict:
    """Run the full src_pages -> triples pipeline.

    Returns a dict of DataFrames: parsed, transformed, every edge table,
    redirect_records, template_index, triples, plus the collected metrics
    object under key "_metrics".
    """
    metrics = Metrics()
    out: dict = {}

    # --- stage 0: parse
    t0 = time.time()
    if work_dir:
        parsed_path = os.path.join(work_dir, "parsed_pages")
        if not (resume and _stage_done(parsed_path)):
            _write(parse_pages(src_pages), parsed_path)
        parsed = spark.read.parquet(parsed_path)
    else:
        parsed = parse_pages(src_pages)
        if persist:
            parsed = parsed.persist()
    metrics.record("parse", time.time() - t0)

    # --- stage 1: prescan — one title-keyed aggregation for all three
    # dictionaries; id-dedup is a broadcast anti join (no full-data shuffle)
    t0 = time.time()
    live = prescan_ops.live_pages(parsed)
    agg = prescan_ops.title_aggregate(live)
    if persist:
        # the dictionary branches and the collect job share this aggregate;
        # Spark does no cross-branch CSE, so cache it once (skinny rows —
        # only template candidates carry text)
        agg = agg.persist()
    title2id = prescan_ops.title2id_df(agg)
    redirects = prescan_ops.redirects_df(agg)
    template_pages = prescan_ops.template_pages_df(agg)
    template_bodies = prescan_ops.template_bodies_df(template_pages)
    template_index = template_pages.select(
        F.col("page_id").alias("template_id"),
        F.col("title_norm").alias("title"),
    )

    # --- stage 2: persist the dictionaries as a shared tagged parquet
    # table (prescanSave equivalent; distributed write, no driver
    # roundtrip) — transform workers side-load it once per process
    if work_dir:
        dicts_path = os.path.join(work_dir, "dicts")
        if not (resume and _stage_done(dicts_path)):
            prescan_ops.write_dicts(
                title2id, redirects, template_bodies, dicts_path
            )
    else:
        dicts_path = tempfile.mkdtemp(prefix="wikiprep_dicts_")
        prescan_ops.write_dicts(
            title2id, redirects, template_bodies, dicts_path
        )

    import pyarrow.dataset as _ds

    n_dict_rows = _ds.dataset(dicts_path, format="parquet").count_rows()
    metrics.record("prescan", time.time() - t0, dict_rows=n_dict_rows)

    # --- stage 3: transform
    t0 = time.time()
    if work_dir:
        transformed_path = os.path.join(work_dir, "transformed_pages")
        if not (resume and _stage_done(transformed_path)):
            _write(transform_pages(live, dicts_path), transformed_path)
        transformed = spark.read.parquet(transformed_path)
    else:
        transformed = transform_pages(live, dicts_path)
        if persist:
            transformed = transformed.persist()
    metrics.record("transform", time.time() - t0)

    # --- stages 4/5: edge tables (lazy projections of the wide table)
    for name, builder in EDGE_BUILDERS.items():
        out[name] = builder(transformed)

    # redirect records: distributed output join against the cached title
    # aggregate (Output/Composite.pm:83-125); both dimension sides broadcast
    redirect_records, template_redirects = prescan_ops.redirect_records_df(
        redirects, title2id, template_bodies
    )
    out["redirect_records"] = redirect_records
    out["template_redirects"] = template_redirects
    out["template_index"] = template_index

    # single-scan triple derivation (edge tables above remain available as
    # pruned per-kind projections; triples_view is the 8-pass equivalent)
    out["triples"] = edge_ops.triples_from_transformed(
        transformed, redirect_records
    )

    if work_dir:
        t0 = time.time()
        triples_path = os.path.join(work_dir, "triples")
        if not (resume and _stage_done(triples_path)):
            # partitioned by predicate: partition pruning for per-edge reads
            _write(out["triples"], triples_path, partition_by="pred")
        out["triples"] = spark.read.parquet(triples_path)
        metrics.record("triples", time.time() - t0)

        lineage_path = os.path.join(work_dir, "lineage")
        if not (resume and _stage_done(lineage_path)):
            _write(lineage_df(parsed), lineage_path)
        metrics.save(os.path.join(work_dir, "metrics.jsonl"))

    out["parsed"] = parsed
    out["transformed"] = transformed
    out["title2id"] = title2id
    out["redirects_raw"] = redirects
    out["template_bodies"] = template_bodies
    out["_metrics"] = metrics
    out["_dicts_path"] = dicts_path
    return out
