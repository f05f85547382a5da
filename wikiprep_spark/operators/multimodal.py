"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as ``binary`` columns with a typed
metadata struct; the Spark-side plumbing (schemas, batching, partitioning,
UDF signatures) is real and tested.  The actual media decoding is STUBBED —
the decode libraries (PIL/ffmpeg/etc.) are not available in this
environment — behind ``decode_stub``: a clearly-marked deterministic fake
that raises ``NotImplementedError`` when strict=True.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

MEDIA_SCHEMA = (
    "item_id long, media_type string, payload binary, "
    "meta struct<mime:string, n_bytes:long, sha256:string>"
)

FEATURE_SCHEMA = (
    "item_id long, media_type string, n_bytes long, sha256 string, "
    "feature array<float>, decode_status string"
)


def attach_binary_payload(df: DataFrame, id_col: str, text_col: str,
                          media_type: str = "blob") -> DataFrame:
    """Wrap a column as an opaque binary payload with typed metadata —
    the ingest shape for multimodal rows."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col).cast("long").alias("item_id"),
        F.lit(media_type).alias("media_type"),
        payload.alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.length(payload).cast("long").alias("n_bytes"),
            F.sha2(payload, 256).alias("sha256"),
        ).alias("meta"),
    )


def decode_stub(payload: bytes, media_type: str, strict: bool = False):
    """STUB for the media decode step (image decode / resize / frame
    sampling / audio resample).  In production this calls the codec
    libraries; here it either raises (strict) or returns a deterministic
    8-dim byte-histogram "feature" so the downstream plumbing is exercised
    end-to-end with real data flow."""
    if strict:
        raise NotImplementedError(
            "media decoding requires codec libraries not present in this "
            "environment; deterministic fake used in non-strict mode"
        )
    hist = [0] * 8
    for b in payload[:4096]:
        hist[b >> 5] += 1
    total = max(1, sum(hist))
    return [h / total for h in hist]


def extract_features(media: DataFrame, batch_size_hint: int = 64) -> DataFrame:
    """mapInPandas feature extraction over binary payloads: Arrow batches of
    (id, payload) -> (id, feature vector, status).  The batch shape, schema
    and error handling are production-real; only decode_stub is fake."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out = []
            for item_id, mtype, payload, meta in zip(
                batch["item_id"], batch["media_type"], batch["payload"],
                batch["meta"],
            ):
                try:
                    feat = decode_stub(bytes(payload), mtype)
                    status = "ok_stub"
                except NotImplementedError:
                    feat = None
                    status = "decode_unavailable"
                out.append(
                    (item_id, mtype, meta["n_bytes"], meta["sha256"], feat,
                     status)
                )
            yield pd.DataFrame(
                out,
                columns=["item_id", "media_type", "n_bytes", "sha256",
                         "feature", "decode_status"],
            )

    return media.mapInPandas(gen, schema=FEATURE_SCHEMA)


def payload_integrity(media: DataFrame) -> DataFrame:
    """JVM-side integrity check of binary payloads against their metadata
    (no Python): recomputed sha256/byte-length must match the meta struct."""
    return media.select(
        "item_id",
        (F.sha2("payload", 256) == F.col("meta.sha256")).alias("sha_ok"),
        (F.length("payload") == F.col("meta.n_bytes")).alias("len_ok"),
    )


def _stable_hash_bytes(s: str) -> bytes:
    return hashlib.sha256(s.encode()).digest()
