"""Multimodal column plumbing: opaque binary payloads + typed metadata.

north_star scope. Images/audio/video ride through the engine as ``binary``
columns with metadata; decode/resize/frame-sample run as Arrow-batched
``mapInPandas`` stages. The decode libraries are not in this container, so
the decode step is STUBBED (NotImplementedError / deterministic fake) while
the Spark-side plumbing — schema, batch iteration, partitioning — is real
and oracle-tested via byte-level features.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = "doc_id long, byte_len long, first_byte int"


def attach_binary(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stand-in ingest: utf-8 bytes of the text as the opaque media payload
    (in production: spark.read.format('binaryFile') or a blob-store URI
    column resolved inside mapInPandas)."""
    return df.withColumn("payload", F.encode(F.col(text_col), "utf-8"))


def decode_media(payload: bytes) -> object:
    """Real decoder hook (PIL/av/librosa). Not available in this container."""
    raise NotImplementedError(
        "media decode requires image/audio libs not present in this environment; "
        "extract_features uses deterministic byte-level fakes instead"
    )


def _feature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched feature extraction. Each batch is a pandas frame of
    whole rows; output schema is FEATURE_SCHEMA. Vectorized over the batch
    — this is the shape a real decode/resize/embed stage takes."""
    for pdf in batches:
        payloads = pdf["payload"]
        yield pd.DataFrame({
            "doc_id": pdf["doc_id"].astype("int64"),
            "byte_len": payloads.map(len).astype("int64"),
            "first_byte": payloads.map(lambda b: b[0] if len(b) else -1).astype("int32"),
        })


def extract_features(df: DataFrame) -> DataFrame:
    """mapInPandas feature stage over the binary payload column. The input
    is spread (pinned keyed repartition) first: a decode/feature stage is
    pure CPU, and a one-file ingest otherwise runs the whole Python stage
    in a single Arrow worker."""
    from .skew import spread

    return spread(df.select("doc_id", "payload"), "doc_id").mapInPandas(
        _feature_batches, FEATURE_SCHEMA
    )


# ---------------------------------------------------------------------------
# Resize / frame-sample plumbing (decode layer stubbed; the Spark-side
# shapes — schema, batch iteration, explode of per-frame rows — are real)
# ---------------------------------------------------------------------------

RESIZE_SCHEMA = "doc_id long, payload binary, out_w int, out_h int"
FRAME_SCHEMA = "doc_id long, frame_idx int, frame_payload binary"


def resize_batches(target_w: int, target_h: int):
    """mapInPandas stage shape for image resize. The pixel transform is a
    deterministic fake (payload truncation proportional to target area) —
    a real deployment swaps ONE line for PIL/opencv inside the batch loop;
    partitioning, Arrow transfer, and schema are production-real."""
    def _fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            scale = max(1, (256 * 256) // max(1, target_w * target_h))
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].astype("int64"),
                "payload": pdf["payload"].map(lambda b: bytes(b[: max(1, len(b) // scale)])),
                "out_w": target_w,
                "out_h": target_h,
            })
    return _fn


def resize(df: DataFrame, w: int, h: int) -> DataFrame:
    return df.select("doc_id", "payload").mapInPandas(resize_batches(w, h), RESIZE_SCHEMA)


def sample_frames(df: DataFrame, every_n_bytes: int = 32) -> DataFrame:
    """Frame sampling for video-like payloads: one output row per sampled
    'frame' (fixed-stride chunks of the payload as the deterministic
    stand-in for keyframe extraction). Output cardinality > input — the
    explode-shaped mapInPandas pattern."""
    def _fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                for i, off in enumerate(range(0, len(payload), every_n_bytes)):
                    ids.append(int(doc_id))
                    idxs.append(i)
                    frames.append(bytes(payload[off:off + every_n_bytes]))
            yield pd.DataFrame({
                "doc_id": pd.Series(ids, dtype="int64"),
                "frame_idx": pd.Series(idxs, dtype="int32"),
                "frame_payload": frames if frames else pd.Series([], dtype=object),
            })
    from .skew import spread

    return spread(df.select("doc_id", "payload"), "doc_id").mapInPandas(
        _fn, FRAME_SCHEMA
    )
