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
