"""Multimodal column handling: image/audio/video as opaque ``binary``
columns + typed metadata structs, processed with Arrow-batched
``mapInPandas``.

The Spark-side plumbing is REAL and tested — schema contracts,
partition-preserving batch iteration, UDF signatures, batch shapes.
The codec step itself is STUBBED: this container has no image/audio
libraries, so ``decode_image_meta`` parses a deterministic synthetic
header (built by ``with_synthetic_image_blob``) and the real-codec
entry points raise ``NotImplementedError`` behind an import-try
(drop-in: install Pillow/torchaudio and replace ``_decode_stub``).

Design for 100 TB of blobs:
- blobs stay OFF the driver — every transform is mapInPandas over the
  scan, and metadata-only queries prune the binary column entirely
  (columnar parquet: the blob column is never read — check
  ``ReadSchema`` in the plan).
- decode parallelism = file-split parallelism; no shuffle is
  introduced by any operator here.
- batch size is bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch``
  (default 10k) — for multi-MB blobs set it low (e.g. 32) to cap
  executor memory.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Magic prefix of the synthetic blob format: 4 bytes magic, then
# 2 bytes width, 2 bytes height (big-endian), then payload.
MAGIC = b"\x89IMG"

IMAGE_META_SCHEMA = (
    "doc_id long, width int, height int, n_bytes int, format string"
)


def with_synthetic_image_blob(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach a deterministic fake 'image' blob per document: header
    (magic, width, height derived from content length) + utf-8 payload.
    Pure native expressions — this is the test-fixture generator."""
    payload = F.encode(F.col(text_col), "utf-8")
    n = F.octet_length(payload)
    width = (n % 640 + 16).cast("int")
    height = ((n % 480) + 9).cast("int")
    header = F.concat(
        F.lit(MAGIC),
        _int_to_be2(width),
        _int_to_be2(height),
    )
    return docs.withColumn("image", F.concat(header, payload))


def _int_to_be2(col):
    """2-byte big-endian encoding of a small int, as binary
    (4 zero-padded hex chars → 2 bytes)."""
    return F.to_binary(F.lpad(F.hex(col), 4, "0"), F.lit("hex"))


def decode_image_meta(docs_with_blob: DataFrame, blob_col: str = "image") -> DataFrame:
    """mapInPandas decoder: blob → typed metadata (width, height,
    size, format). One Arrow batch in, one pandas frame out — the
    shape every real codec UDF (PIL decode, ffmpeg probe) plugs into."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = pdf[blob_col]
            ok = blobs.map(lambda b: b is not None and bytes(b[:4]) == MAGIC)
            width = blobs.map(
                lambda b: int.from_bytes(bytes(b[4:6]), "big") if b is not None and bytes(b[:4]) == MAGIC else -1
            )
            height = blobs.map(
                lambda b: int.from_bytes(bytes(b[6:8]), "big") if b is not None and bytes(b[:4]) == MAGIC else -1
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": width.astype("int32"),
                    "height": height.astype("int32"),
                    "n_bytes": blobs.map(lambda b: len(b) if b is not None else 0).astype("int32"),
                    "format": ok.map(lambda x: "img" if x else "unknown"),
                }
            )

    return docs_with_blob.select("doc_id", blob_col).mapInPandas(
        decode, IMAGE_META_SCHEMA
    )


def resize_images(docs_with_blob: DataFrame, width: int, height: int) -> DataFrame:
    """Real-codec resize — requires an image library (not in this
    container). The Spark plumbing (mapInPandas over binary + typed
    output) is identical to ``decode_image_meta``."""
    try:
        import PIL  # noqa: F401
    except ImportError as exc:  # pragma: no cover
        raise NotImplementedError(
            "resize_images needs Pillow; container has no image codecs. "
            "The decode/metadata path (decode_image_meta) demonstrates the "
            "identical mapInPandas plumbing."
        ) from exc
    raise NotImplementedError("real codec path intentionally stubbed")


def sample_frames(video_df: DataFrame, every_n: int = 30) -> DataFrame:
    """Frame sampling stub — same contract as resize_images."""
    raise NotImplementedError(
        "sample_frames needs an ffmpeg binding; plumbing pattern is "
        "decode_image_meta's mapInPandas shape"
    )
