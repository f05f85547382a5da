"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as ``binary`` columns with a typed
metadata struct; the Spark-side plumbing (schemas, batching, partitioning,
UDF signatures) is real and tested.  Self-describing formats are decoded
for real with the stdlib — PNG (chunk walk, per-chunk CRC32 validation,
IDAT zlib inflate, raw-size check against IHDR geometry), PCM WAV
(RIFF chunk walk, fmt parse, sample decode + RMS/peak features) and JPEG
frame geometry (marker-segment walk to the SOFn header: width/height/
precision/components/progressive).  Only codec-bound media (JPEG entropy
decode to pixels, video, compressed audio) remains STUBBED behind
``decode_stub`` — the codec libraries (PIL/ffmpeg) are not available in
this environment — a clearly-marked deterministic fake that raises
``NotImplementedError`` when strict=True.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

# every exception class a malformed payload can drive the stdlib decoders
# into; extract_features maps all of them to decode_status='corrupt'
_CORRUPT_ERRORS = (ValueError, KeyError, IndexError, struct.error, zlib.error)

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


def decode_png(payload: bytes) -> dict | None:
    """Real PNG decode with the stdlib: signature check, chunk walk with
    per-chunk CRC32 validation, IHDR geometry, IDAT concatenation + zlib
    inflate, and a raw-stream size check (height x (1 + width*bytes/px)
    for non-interlaced >=8-bit images).  Returns None if the payload is
    not PNG; raises ValueError on a corrupt PNG."""
    import struct
    import zlib

    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        return None
    pos, n_chunks, idat, crc_ok = 8, 0, b"", True
    w = h = depth = ctype = interlace = None
    while pos + 12 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos:pos + 4])
        tag = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + length]
        if len(data) < length:
            raise ValueError("truncated PNG chunk")
        (crc,) = struct.unpack(
            ">I", payload[pos + 8 + length:pos + 12 + length])
        crc_ok = crc_ok and (zlib.crc32(tag + data) & 0xFFFFFFFF) == crc
        if tag == b"IHDR":
            w, h, depth, ctype, _, _, interlace = struct.unpack(
                ">IIBBBBB", data[:13])
        elif tag == b"IDAT":
            idat += data
        n_chunks += 1
        pos += 12 + length
        if tag == b"IEND":
            break
    if w is None:
        raise ValueError("PNG without IHDR")
    if not crc_ok:
        raise ValueError("PNG chunk CRC mismatch")
    raw = zlib.decompress(idat) if idat else b""
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[ctype]
    if depth >= 8 and interlace == 0 and idat:
        expected = h * (1 + w * channels * (depth // 8))
        if len(raw) != expected:
            raise ValueError("PNG raw stream size mismatch")
    return {"format": "png", "width": w, "height": h, "bit_depth": depth,
            "color_type": ctype, "channels": channels,
            "n_chunks": n_chunks, "raw_bytes": len(raw)}


# SOFn frame-header markers: C0-C3, C5-C7, C9-CB, CD-CF (C4=DHT, C8=JPG
# reserved, CC=DAC are NOT frame headers)
_JPEG_SOF_MARKERS = frozenset(
    m for m in range(0xC0, 0xD0) if m not in (0xC4, 0xC8, 0xCC))


def decode_jpeg_meta(payload: bytes) -> dict | None:
    """Real JPEG DIMENSION decode with the stdlib: SOI check, marker-segment
    walk (fill bytes, length-less RST/TEM markers handled), SOFn frame
    header parse — width, height, sample precision, component count,
    progressive flag.  The ENTROPY decode (actual pixels) is codec-bound
    and stays stubbed; dimensions/geometry are what a curation pipeline
    filters on anyway.  Returns None if the payload is not JPEG; raises
    ValueError on a malformed JPEG stream."""
    if payload[:2] != b"\xff\xd8":
        return None
    pos, n_segments = 2, 0
    while pos + 2 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("JPEG marker desync")
        while pos + 2 < len(payload) and payload[pos + 1] == 0xFF:
            pos += 1  # fill bytes before a marker are legal
        if pos + 2 > len(payload):
            # payload ends inside a 0xFF fill run — no marker byte left
            raise ValueError("truncated JPEG marker")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI before any SOF
            break
        if 0xD0 <= marker <= 0xD7 or marker == 0x01:  # RSTn/TEM: no length
            pos += 2
            continue
        if pos + 4 > len(payload):
            raise ValueError("truncated JPEG segment header")
        (length,) = struct.unpack(">H", payload[pos + 2:pos + 4])
        if length < 2 or pos + 2 + length > len(payload):
            raise ValueError("bad JPEG segment length")
        n_segments += 1
        if marker in _JPEG_SOF_MARKERS:
            seg = payload[pos + 4:pos + 2 + length]
            if len(seg) < 6:
                raise ValueError("short JPEG SOF segment")
            precision, h, w, ncomp = struct.unpack(">BHHB", seg[:6])
            if w == 0 or h == 0 or ncomp == 0:
                raise ValueError("degenerate JPEG frame geometry")
            return {"format": "jpeg", "width": w, "height": h,
                    "precision": precision, "components": ncomp,
                    "progressive": marker == 0xC2,
                    "n_segments": n_segments}
        if marker == 0xDA:  # entropy-coded data without a frame header
            raise ValueError("JPEG SOS before SOF")
        pos += 2 + length
    raise ValueError("JPEG without SOF frame header")


def decode_wav(payload: bytes) -> dict | None:
    """Real PCM WAV decode with the stdlib: RIFF chunk walk, fmt parse,
    8/16-bit sample decode, RMS + peak features.  Returns None if the
    payload is not RIFF/WAVE; raises ValueError for non-PCM encodings
    (those are codec-bound and fall to the stub)."""
    import array
    import math
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    pos, fmt, data = 12, None, b""
    while pos + 8 <= len(payload):
        tag = payload[pos:pos + 4]
        (length,) = struct.unpack("<I", payload[pos + 4:pos + 8])
        body = payload[pos + 8:pos + 8 + length]
        if tag == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif tag == b"data":
            data = body
        pos += 8 + length + (length & 1)  # chunks are word-aligned
    if fmt is None:
        raise ValueError("WAV without fmt chunk")
    audio_format, channels, rate, _, _, bits = fmt
    if audio_format != 1 or bits not in (8, 16):
        raise ValueError("non-PCM WAV (codec-bound)")
    width = bits // 8
    usable = len(data) // width * width
    samples = array.array("h" if bits == 16 else "b", data[:usable])
    n = len(samples)
    full = float(1 << (bits - 1))
    rms = math.sqrt(sum(s * s for s in samples) / n) / full if n else 0.0
    peak = max((abs(s) for s in samples), default=0) / full
    return {"format": "wav", "channels": channels, "rate": rate,
            "bits": bits, "n_samples": n, "rms": rms, "peak": peak}


def decode_media(payload: bytes, media_type: str,
                 strict: bool = False) -> tuple:
    """Dispatch decode: real stdlib decoders for self-describing formats
    (PNG, PCM WAV, JPEG frame geometry), decode_stub for everything
    codec-bound.  Returns (8-dim feature vector, status); strict mode
    raises only for the formats that genuinely need absent codec
    libraries (JPEG dimensions are real metadata, so a well-formed JPEG
    succeeds even in strict mode — only its pixel decode is stubbed)."""
    png = decode_png(payload)
    if png is not None:
        return [
            1.0,
            min(png["width"], 65535) / 65535.0,
            min(png["height"], 65535) / 65535.0,
            png["bit_depth"] / 16.0,
            png["color_type"] / 6.0,
            png["channels"] / 4.0,
            min(png["n_chunks"], 64) / 64.0,
            1.0,
        ], "ok_png"
    jpg = decode_jpeg_meta(payload)
    if jpg is not None:
        return [
            3.0,
            min(jpg["width"], 65535) / 65535.0,
            min(jpg["height"], 65535) / 65535.0,
            jpg["precision"] / 16.0,
            jpg["components"] / 4.0,
            1.0 if jpg["progressive"] else 0.0,
            min(jpg["n_segments"], 64) / 64.0,
            1.0,
        ], "ok_jpeg_meta"
    wav = decode_wav(payload)
    if wav is not None:
        return [
            2.0,
            wav["channels"] / 8.0,
            min(wav["rate"], 192000) / 192000.0,
            wav["bits"] / 32.0,
            min(wav["n_samples"], 10 ** 6) / 10.0 ** 6,
            wav["rms"],
            wav["peak"],
            1.0,
        ], "ok_wav"
    return decode_stub(payload, media_type, strict), "ok_stub"


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
                    feat, status = decode_media(bytes(payload), mtype)
                except NotImplementedError:
                    feat = None
                    status = "decode_unavailable"
                except _CORRUPT_ERRORS:
                    # any malformed payload must degrade to a 'corrupt' row,
                    # never crash the task: the stdlib decoders can surface
                    # zlib.error (CRC-valid IDAT that fails inflate),
                    # struct.error (short IHDR/fmt chunk), KeyError (color
                    # type outside the PNG spec) and IndexError alongside
                    # the ValueErrors they raise deliberately
                    feat = None
                    status = "corrupt"
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
