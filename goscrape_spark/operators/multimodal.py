"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns with typed metadata structs —
the 100 TB-scale representation (payload stays columnar, metadata prunable).
Decode / feature-extract / resize / frame-sample run as ``mapInPandas`` over
Arrow batches; the actual codec calls are STUBBED here (Pillow/librosa/ffmpeg
are not in this container): ``decode='real'`` raises NotImplementedError at
the decode call site, ``decode='fake'`` produces a deterministic hash-derived
feature vector so the Spark-side plumbing — schema, partitioning, batch
shape, UDF signatures — is real and tested end to end.

Schema:
    media(media_id string, kind string, payload binary,
          meta struct<mime:string, width:int, height:int, duration_ms:int>)
"""

from __future__ import annotations

import hashlib
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = ("media_id string, kind string, payload binary, "
                "meta struct<mime:string, width:int, height:int, "
                "duration_ms:int>")

FEATURES_SCHEMA = ("media_id string, kind string, n_bytes long, "
                   "feature array<float>, decode_status string")


def media_from_fetched(fetched: DataFrame, url_col: str = "url",
                       body_col: str = "body") -> DataFrame:
    """Lift crawled binary assets into the media table shape (metadata
    sniffed from magic bytes, F11)."""
    from ..functions.filetype import col_file_extension

    ext = col_file_extension(F.col(body_col))
    kind = (F.when(ext.isin("jpg", "png", "gif", "webp", "bmp", "tif", "ico",
                            "psd"), "image")
            .when(ext.isin("mp3", "ogg", "wav", "flac", "mid", "amr", "aiff"),
                  "audio")
            .when(ext.isin("mp4", "webm", "avi", "flv", "mpg", "wmv"), "video")
            .otherwise("binary"))
    return fetched.select(
        F.col(url_col).alias("media_id"), kind.alias("kind"),
        F.col(body_col).alias("payload"),
        F.struct(ext.alias("mime"), F.lit(None).cast("int").alias("width"),
                 F.lit(None).cast("int").alias("height"),
                 F.lit(None).cast("int").alias("duration_ms")).alias("meta"))


def _fake_feature(payload: bytes, dim: int) -> list[float]:
    """Deterministic stand-in for a real decoder: hash-chained floats."""
    out = []
    h = hashlib.blake2b(payload or b"", digest_size=8).digest()
    for i in range(dim):
        h = hashlib.blake2b(h + bytes([i & 0xFF]), digest_size=8).digest()
        out.append((int.from_bytes(h[:4], "little") % 10_000) / 10_000.0)
    return out


def extract_media_features(media: DataFrame, dim: int = 16,
                           decode: str = "fake") -> DataFrame:
    """Arrow-batched decode + feature extraction.

    decode='real' marks where Pillow/librosa/ffmpeg would run — it raises
    NotImplementedError (libs absent in this container).  decode='fake'
    exercises the identical dataflow with deterministic features."""
    if decode not in ("fake", "real"):
        raise ValueError(f"decode must be 'fake' or 'real', got {decode!r}")

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            ids, kinds, sizes, feats, status = [], [], [], [], []
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"],
                                          pdf["payload"]):
                raw = bytes(payload) if payload is not None else b""
                ids.append(mid)
                kinds.append(kind)
                sizes.append(len(raw))
                if decode == "real":
                    # Real path: PIL.Image.open(io.BytesIO(raw)) / librosa /
                    # ffmpeg frame sampling — not available in this sandbox.
                    raise NotImplementedError(
                        "real media decoding requires Pillow/librosa/ffmpeg")
                feats.append(_fake_feature(raw, dim))
                status.append("fake")
            yield pd.DataFrame({"media_id": ids, "kind": kinds,
                                "n_bytes": sizes, "feature": feats,
                                "decode_status": status})

    # Repartition on media_id so one huge host/object doesn't serialize a
    # whole partition through a single Python worker.
    return (media.repartition("media_id")
            .mapInPandas(run, schema=FEATURES_SCHEMA))


def sample_video_frames(media: DataFrame, every_ms: int = 1000,
                        decode: str = "fake") -> DataFrame:
    """Frame-sampling plumbing: one output row per sampled frame timestamp.
    Timestamps derive from meta.duration_ms; the frame decode itself is the
    stubbed step (payload hash stands in for pixels when decode='fake')."""
    if decode == "real":
        raise NotImplementedError(
            "real frame extraction requires ffmpeg")
    frames = media.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(F.sequence(
            F.lit(0),
            F.greatest(F.coalesce(F.col("meta.duration_ms"), F.lit(0)) - 1,
                       F.lit(0)),
            F.lit(every_ms))).alias("ts_ms"),
        F.md5(F.concat(F.col("media_id"), F.lit("@"),
                       F.col("meta.duration_ms").cast("string"))).alias("frame_key"))
    return frames
