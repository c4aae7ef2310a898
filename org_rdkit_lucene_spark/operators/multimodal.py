"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The Spark-side machinery is real and tested — schema, Arrow batch
shapes, partition-preserving mapInPandas feature extraction, typed
metadata structs. The actual media DECODE is stubbed: the container
ships no image/audio libraries, so :func:`decode_media` raises
``NotImplementedError`` unless ``fake=True``, in which case a
clearly-marked deterministic fake derives metadata from the bytes
(md5-based), keeping every downstream operator exercisable and
oracle-reproducible.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id long, media_type string, n_bytes long, sig string, "
    "width int, height int, duration_ms long, n_frames int"
)

META_KEYS = ("sig", "width", "height", "duration_ms", "n_frames")

# Pluggable decoder registry: real deployments slot PIL / librosa /
# pyav in per media_type WITHOUT touching the operators — the
# registered callable takes (blob, media_type) and returns the
# META_KEYS dict. The registry is snapshotted into each operator's
# kernel CLOSURE at plan time (cloudpickle ships it to the Python
# workers — module state registered on the driver would NOT be visible
# there otherwise).
_DECODERS: dict[str, Callable[[bytes, str], dict]] = {}


def register_decoder(media_type: str, fn: Callable[[bytes, str], dict]) -> None:
    """Register a REAL decoder for ``media_type`` ('image' / 'audio' /
    'video'). The callable must be picklable (top-level function) and
    return a dict with keys {sig, width, height, duration_ms,
    n_frames}. Types without a registered decoder keep the stub/fake
    behavior."""
    _DECODERS[media_type] = fn


def unregister_decoder(media_type: str) -> None:
    _DECODERS.pop(media_type, None)


def _decode(blob: bytes, media_type: str, fake: bool, decoders: dict) -> dict:
    fn = decoders.get(media_type)
    if fn is not None:
        meta = fn(blob, media_type)
        missing = set(META_KEYS) - set(meta)
        if missing:
            raise ValueError(f"decoder for {media_type!r} missing keys {sorted(missing)}")
        return meta
    if not fake:
        raise NotImplementedError(
            "media decoding requires image/audio libs not present in this "
            "environment; register_decoder() a real one or pass fake=True "
            "for the deterministic stand-in"
        )
    digest = hashlib.md5(blob).hexdigest()
    h = int(digest[:8], 16)
    return {
        "sig": digest[:16],
        "width": 64 + h % 1024 if media_type == "image" else 0,
        "height": 64 + (h >> 10) % 1024 if media_type == "image" else 0,
        "duration_ms": (h % 600_000) if media_type in ("audio", "video") else 0,
        "n_frames": (h % 3_000) if media_type == "video" else 0,
    }


def attach_fake_media(df: DataFrame, id_col: str = "doc_id", content_col: str = "text") -> DataFrame:
    """Test/dev source: wrap a text column's UTF-8 bytes as an opaque
    media blob (binary) + media_type. Real pipelines read binary columns
    from Parquet/Iceberg directly — this is only the fixture path."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.encode(F.col(content_col), "UTF-8").alias("media"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col(id_col) % 3 + 1).cast("int"),
        ).alias("media_type"),
    )


def decode_media(blob: bytes, media_type: str, fake: bool = False) -> dict:
    """Decode one media blob → metadata dict.

    A decoder registered via :func:`register_decoder` takes precedence;
    otherwise REAL decode (PIL/librosa/pyav) is unavailable in this
    container — STUB: raises unless ``fake=True``. The fake is
    deterministic: metadata derived from md5(blob), so tests and the
    SQL oracle can reproduce it."""
    return _decode(blob, media_type, fake, _DECODERS)


def extract_media_features(media_df: DataFrame, fake: bool = True) -> DataFrame:
    """Arrow-batched feature extraction over binary media columns.

    Partition-preserving mapInPandas: no shuffle — at 100 TB the blobs
    never move, only the small typed metadata comes out. Registered
    decoders (snapshotted at plan time) handle their media types; the
    rest use the stub/fake path."""
    decoders = dict(_DECODERS)

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if len(pdf) == 0:
                continue
            rows = []
            for doc_id, blob, mt in zip(pdf["doc_id"], pdf["media"], pdf["media_type"]):
                b = bytes(blob)
                meta = _decode(b, mt, fake, decoders)
                rows.append(
                    (int(doc_id), mt, len(b), meta["sig"], meta["width"],
                     meta["height"], meta["duration_ms"], meta["n_frames"])
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "media_type", "n_bytes", "sig", "width",
                         "height", "duration_ms", "n_frames"],
            )

    return media_df.mapInPandas(kernel, schema=MEDIA_SCHEMA)


def frame_sample_plan(media_df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plan for video rows: one row per sampled frame
    timestamp (the decode of each frame is the stubbed step). Exercises
    the explode fan-out shape a real video pipeline needs."""
    feats = extract_media_features(media_df, fake=True)
    vids = feats.filter(F.col("media_type") == "video")
    return vids.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )


def embed_media_stub(media_df: DataFrame) -> DataFrame:
    """Deterministic stand-in media embedding — the plumbing a real
    encoder-model UDF would use: binary in, fixed-size float array out,
    Arrow-batched.

    dim-16 vector: v_i = (md5(blob)[i] - 127.5) / 127.5 over the 16
    digest bytes, emitted as float64 so the DuckDB oracle computes the
    bit-identical values (a float32 round-trip would shift cosines near
    quantization boundaries). A real encoder would replace this kernel
    body; the schema/batching contract is the deliverable."""

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if len(pdf) == 0:
                continue
            ids, vecs = [], []
            for doc_id, blob in zip(pdf["doc_id"], pdf["media"]):
                b = np.frombuffer(hashlib.md5(bytes(blob)).digest(), dtype=np.uint8)
                vecs.append(((b.astype(np.float64) - 127.5) / 127.5).tolist())
                ids.append(int(doc_id))
            yield pd.DataFrame({"doc_id": ids, "embedding": vecs})

    return media_df.select("doc_id", "media").mapInPandas(
        kernel, schema="doc_id long, embedding array<double>"
    )
