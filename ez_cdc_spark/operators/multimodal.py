"""Multimodal column plumbing (SURVEY.md X5 / north-star).

Images/audio/video are opaque ``binary`` payloads with a typed metadata
struct riding alongside. The Spark-side contract (schema, partitioning, UDF
signature, Arrow batch shape) is real and tested. Decoding: uncompressed
24-bit BMP has a REAL pure-Python decode path (encode_bmp/decode_bmp below
— header parse, stride, bottom-up row order, nearest-neighbor resample);
compressed formats (PNG/JPEG/…) raise NotImplementedError because no codec
libraries exist in this container, and the deterministic fake stands in for
pipeline testing.

At 100 TB: payloads stay in their own column so column pruning drops them
unless a stage touches bytes; feature extraction runs in mapInPandas (Arrow
batches of binary), never per-row Python.
"""

from __future__ import annotations

import struct
import sys
from typing import Iterator

import pandas as pd

from pyspark import cloudpickle
from pyspark.sql import DataFrame, functions as F

# The BMP codec below is called from inside Arrow-batched UDF closures. An
# EXTERNAL driver (the attestation harness creates its own SparkSession with
# the repo on the driver's sys.path only) has Python workers that cannot
# import ez_cdc_spark — so this module opts into cloudpickle's by-value
# serialization: the codec functions travel inside the UDF pickle instead
# of as a module reference, keeping every closure self-contained (the same
# invariant the similarity/udf modules maintain by hand). Transitive
# references are stdlib-only (struct).
cloudpickle.register_pickle_by_value(sys.modules[__name__])

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


def encode_bmp(pixels: list) -> bytes:
    """Encode a grayscale pixel matrix (rows of 0-255 ints, row 0 = top) as
    a real uncompressed 24-bit BMP: BITMAPFILEHEADER (14 B) +
    BITMAPINFOHEADER (40 B) + bottom-up BGR rows padded to 4-byte stride.
    Any BMP viewer opens the result — this is the format, not a fake."""
    h = len(pixels)
    w = len(pixels[0]) if h else 0
    stride = (w * 3 + 3) & ~3
    body = bytearray()
    for row in reversed(pixels):  # BI_RGB rows are stored bottom-up
        for g in row:
            body += bytes((g, g, g))  # BGR; gray => all channels equal
        body += b"\0" * (stride - w * 3)
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + len(body), 0, 0, off)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return header + dib + bytes(body)


def decode_bmp(payload: bytes) -> tuple[int, int, list]:
    """REAL image decode for uncompressed 24-bit BMP, pure Python (struct) —
    no media libraries needed. Parses the file + DIB headers, honors the
    pixel-data offset, 4-byte row stride, and bottom-up (or top-down, via
    negative height) row order. Returns (width, height, rows) where rows is
    row 0 = top, each pixel an (r, g, b) tuple.

    Compressed payloads — BI_RLE/BI_BITFIELDS BMPs, PNG, JPEG — raise
    NotImplementedError: those genuinely need codec libraries this
    container doesn't ship, and an honest error beats a fake decode."""
    if payload[:8] == b"\x89PNG\r\n\x1a\n" or payload[:2] == b"\xff\xd8":
        raise NotImplementedError(
            "compressed image decode (PNG/JPEG) requires codec libraries "
            "not installed in this container"
        )
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    off = struct.unpack_from("<I", payload, 10)[0]
    dib_size = struct.unpack_from("<I", payload, 14)[0]
    if dib_size < 40:
        raise NotImplementedError("BITMAPCOREHEADER BMPs not supported")
    w, h_raw = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if compression != 0:
        raise NotImplementedError(
            f"compressed BMP (BI_ code {compression}) requires codec support"
        )
    if bpp != 24:
        raise NotImplementedError(f"{bpp}-bit BMP not supported (24-bit only)")
    h = abs(h_raw)
    stride = (w * 3 + 3) & ~3
    rows = []
    for y in range(h):
        # positive height = bottom-up storage: last stored row is the top
        src_y = (h - 1 - y) if h_raw > 0 else y
        base = off + src_y * stride
        row = []
        for x in range(w):
            b, g, r = payload[base + 3 * x : base + 3 * x + 3]
            row.append((r, g, b))
        rows.append(row)
    return w, h, rows


def nn_resize(rows: list, out_w: int, out_h: int) -> list:
    """Nearest-neighbor resample of an (r, g, b) pixel matrix — the real
    index math (src = floor(dst * src_extent / dst_extent)), not a byte
    truncation."""
    in_h = len(rows)
    in_w = len(rows[0]) if in_h else 0
    return [
        [rows[(y * in_h) // out_h][(x * in_w) // out_w] for x in range(out_w)]
        for y in range(out_h)
    ]


def decode_image(payload: bytes):
    """Dispatch: real decode for uncompressed BMP; honest
    NotImplementedError for formats that need codec libraries."""
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if not _HAVE_PIL:
        raise NotImplementedError(
            "non-BMP image decode requires PIL/libjpeg — not installed; "
            "encode_bmp/decode_bmp cover the uncompressed path"
        )
    raise NotImplementedError("wire PIL decode here when media libs exist")


def attach_bmp_payload(
    docs: DataFrame, width: int = 4, height: int = 4, text_col: str = "text"
) -> DataFrame:
    """Synthesize a REAL uncompressed 24-bit BMP payload per document:
    pixel (y, x) carries the byte at text[y*width + x] as gray (0 beyond
    the text's end). Deterministic media ingestion stand-in whose bytes are
    a genuine image file — the decode side is real parsing, not trust.
    Runs as an Arrow-batched pandas UDF (BMP assembly is imperative byte
    work; one vectorized batch per ~10k rows, never row-at-a-time Python
    in the plan)."""
    n = width * height

    @F.pandas_udf("binary")
    def mk(text: pd.Series) -> pd.Series:
        def one(s):
            raw = (s or "").encode("utf-8")[:n].ljust(n, b"\0")
            return encode_bmp(
                [list(raw[y * width : (y + 1) * width]) for y in range(height)]
            )

        return text.map(one)

    return docs.withColumn("payload", mk(F.col(text_col))).withColumn(
        "media_meta",
        F.struct(
            F.lit("image/bmp").alias("media_type"),
            F.lit(width).alias("width"),
            F.lit(height).alias("height"),
            F.lit(0).alias("sample_rate"),
            F.lit(1).alias("n_frames"),
        ),
    )


def resize_payloads(
    df: DataFrame, width: int = 8, height: int = 8, payload_col: str = "payload"
) -> DataFrame:
    """Image resize over Arrow batches of binary payloads. BMP payloads
    (magic 'BM') take the REAL path: header parse, pixel decode,
    nearest-neighbor resample to width×height, checksum over the resized
    RGB bytes. Non-image payloads keep the deterministic byte-truncation
    fake (the pre-r7 behavior) so text-payload pipelines stay
    hash-checkable; compressed formats raise NotImplementedError inside
    decode. Emits geometry + checksum, not bytes, so results hash-check
    without shipping pixels back.
    """
    target = width * height
    out_schema = "doc_id LONG, width INT, height INT, n_bytes LONG, checksum LONG"

    def one(payload) -> tuple[int, int]:
        b = bytes(payload)
        if b[:2] == b"BM":
            _, _, rows = decode_bmp(b)
            resized = nn_resize(rows, width, height)
            return 3 * target, sum(c for row in resized for px in row for c in px)
        fake = b[:target].ljust(target, b"\0")
        return len(fake), sum(fake)

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[payload_col].map(one)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": width,
                    "height": height,
                    "n_bytes": out.map(lambda t: t[0]),
                    "checksum": out.map(lambda t: t[1]),
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
