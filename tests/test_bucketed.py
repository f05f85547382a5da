"""Bucketed-table co-located joins: the write-once-shuffle-never
property, asserted on the physical plan (not just documented)."""

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from wikiprep_spark.sources.tables import bucket_spec, save_bucketed


def _plan(df):
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    docs = spark.read.parquet(
        "/root/testdata/sf0.01/documents.parquet")
    left = docs.select("doc_id", "lang")
    right = docs.select("doc_id", F.length("text").alias("n_chars2"))

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        save_bucketed(left, "bkt_left", ["doc_id"], num_buckets=8,
                      path=str(tmp_path / "l"))
        save_bucketed(right, "bkt_right", ["doc_id"], num_buckets=8,
                      path=str(tmp_path / "r"))
        assert bucket_spec(spark, "bkt_left") == (["doc_id"], 8)

        bkt = spark.table("bkt_left").join(
            spark.table("bkt_right"), "doc_id")
        plain = left.join(right, "doc_id")

        bp, pp = _plan(bkt), _plan(plain)
        # the whole point: bucketed join shuffles NEITHER side...
        assert "hashpartitioning" not in bp, bp
        # ...where the identical plain join shuffles both
        assert pp.count("hashpartitioning") >= 2
        # and the results are identical
        assert sorted(map(tuple, bkt.collect())) == \
            sorted(map(tuple, plain.collect()))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS bkt_left")
        spark.sql("DROP TABLE IF EXISTS bkt_right")


def test_bucket_spec_none_for_plain_table(spark, tmp_path):
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").limit(10)
    docs.write.mode("overwrite").option(
        "path", str(tmp_path / "p")).saveAsTable("plain_tbl")
    try:
        assert bucket_spec(spark, "plain_tbl") is None
    finally:
        spark.sql("DROP TABLE IF EXISTS plain_tbl")
