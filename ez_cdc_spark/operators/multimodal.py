"""Multimodal column plumbing (SURVEY.md X5 / north-star).

Images/audio/video are opaque ``binary`` payloads with a typed metadata
struct riding alongside. The Spark-side contract (schema, partitioning, UDF
signature, Arrow batch shape) is real and tested; the actual byte decoding
is stubbed because no media libraries exist in this container — the stub is
deterministic so pipelines remain hash-checkable.

At 100 TB: payloads stay in their own column so column pruning drops them
unless a stage touches bytes; feature extraction runs in mapInPandas (Arrow
batches of binary), never per-row Python.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F

MEDIA_META_SCHEMA = (
    "media_type STRING, width INT, height INT, sample_rate INT, n_frames INT"
)

_HAVE_PIL = False
try:  # real decoders are optional; the container ships none
    import PIL.Image  # noqa: F401

    _HAVE_PIL = True
except Exception:
    pass


def attach_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Synthesize a binary payload + typed metadata from the text column
    (deterministic stand-in for real media ingestion)."""
    payload = F.encode(F.col(text_col), "utf-8")
    return docs.withColumn("payload", payload).withColumn(
        "media_meta",
        F.struct(
            F.lit("text/plain").alias("media_type"),
            F.octet_length(payload).cast("int").alias("width"),
            F.lit(1).alias("height"),
            F.lit(0).alias("sample_rate"),
            F.lit(1).alias("n_frames"),
        ),
    )


def decode_image(payload: bytes):  # pragma: no cover - requires PIL
    """Real decode path; unavailable in this container."""
    if not _HAVE_PIL:
        raise NotImplementedError(
            "image decode requires PIL/libjpeg — not installed; use "
            "extract_features (deterministic fake) for pipeline testing"
        )
    raise NotImplementedError("wire PIL decode here when media libs exist")


def resize_payloads(
    df: DataFrame, width: int = 8, height: int = 8, payload_col: str = "payload"
) -> DataFrame:
    """Deterministic-fake image resize over Arrow batches: the payload is
    truncated or zero-padded to width*height bytes (a real resampler plugs
    into the same batch shape). Emits the resized geometry + a checksum so
    the result stays hash-checkable without shipping bytes back.
    """
    target = width * height
    out_schema = "doc_id LONG, width INT, height INT, n_bytes LONG, checksum LONG"

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = pdf[payload_col].map(lambda b: bytes(b[:target]).ljust(target, b"\0"))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": width,
                    "height": height,
                    "n_bytes": resized.map(len),
                    "checksum": resized.map(sum),
                }
            )

    return df.select("doc_id", payload_col).mapInPandas(resize, out_schema)


def sample_frames(
    df: DataFrame,
    frame_bytes: int = 16,
    every: int = 4,
    payload_col: str = "payload",
) -> DataFrame:
    """Deterministic-fake video frame sampling: the payload is treated as a
    sequence of frame_bytes-sized frames and every `every`-th frame is
    emitted as its own row — the flat-map (1 row in, k rows out) Arrow
    batch shape a real frame sampler needs. Emits per-frame metadata, not
    bytes, so results are hash-checkable.
    """
    out_schema = "doc_id LONG, frame_idx LONG, n_bytes LONG, first_byte INT"

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, sizes, firsts = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf[payload_col]):
                b = bytes(payload)
                for i in range(0, (len(b) + frame_bytes - 1) // frame_bytes, every):
                    frame = b[i * frame_bytes : (i + 1) * frame_bytes]
                    ids.append(doc_id)
                    idxs.append(i)
                    sizes.append(len(frame))
                    firsts.append(frame[0] if frame else -1)
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "n_bytes": sizes, "first_byte": firsts}
            )

    return df.select("doc_id", payload_col).mapInPandas(frames, out_schema)


def extract_features(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """mapInPandas feature extraction over Arrow batches of binary payloads.

    Deterministic fake 'decode': byte-length, first/last byte, simple
    checksum — stands in for resize/frame-sample/fft until real codecs are
    available. The batch shape (pd.Series of bytes → DataFrame of features)
    is exactly what a real decoder plugs into.
    """
    out_schema = (
        "doc_id LONG, n_bytes LONG, first_byte INT, last_byte INT, checksum LONG"
    )

    def features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload_col]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": payloads.map(len),
                    "first_byte": payloads.map(lambda b: b[0] if len(b) else -1),
                    "last_byte": payloads.map(lambda b: b[-1] if len(b) else -1),
                    "checksum": payloads.map(lambda b: sum(b) % (1 << 31)),
                }
            )

    return df.select("doc_id", payload_col).mapInPandas(features, out_schema)
