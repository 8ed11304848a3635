"""Round-13 registrations: the EXIF/TIFF IFD walk (the r12 verdict's
capability item — the multimodal tier's sixth decode shape and its
first BYTE-ORDER-SWITCHING walk: a TIFF stream declares II/MM in its
own first two bytes, so every integer read flips endianness per row).

Reference scope note: the Beam reference (konosp/
Web-Analytics-Visits-re-processing) has no multimodal surface at all —
this tier exists for the large-scale training-data-pipeline mandate,
same contract as ``operators/multimodal.py``: real container
plumbing, stubbed media payloads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from web_analytics_visits_re_processing_spark.plans.registry import query
from web_analytics_visits_re_processing_spark.sources.tables import load_table


@query(
    "exif_tiff_meta",
    # IFD walk replayed from the generation rule (with_tiff_blob):
    # n = byte length of text; byte order II/MM on n&1; pad = n%3 junk
    # bytes shifts IFD0 to 8+pad (and everything downstream by pad);
    # IFD0 carries 4 entries (width LONG n%1000+1, height LONG
    # n%800+1, Make ASCII offset-chased to 62+pad → 'CAM'+(n%90+10),
    # ExifIFD pointer → 68+pad with inline-SHORT ISO n%3200+100); the
    # chain has 2 IFDs iff (n>>2)&1 (IFD1 at 86+pad) else 1. Hashing
    # the OFFSETS and chain count pins the walk — a fixed-offset or
    # single-endianness reader cannot reproduce them.
    oracle="""
WITH d AS (
    SELECT doc_id, octet_length(encode(text)) AS n FROM documents
)
SELECT doc_id,
       CASE WHEN n % 2 = 1 THEN 'MM' ELSE 'II' END AS byte_order,
       (8 + n % 3)::BIGINT AS ifd0_offset,
       (CASE WHEN (n // 4) % 2 = 1 THEN 2 ELSE 1 END)::INT AS n_chain_ifds,
       4::INT AS n_ifd0_entries,
       (n % 1000 + 1)::BIGINT AS width,
       (n % 800 + 1)::BIGINT AS height,
       'CAM' || (n % 90 + 10)::VARCHAR AS make,
       (n % 3200 + 100)::BIGINT AS iso,
       (68 + n % 3)::BIGINT AS exif_ifd_offset,
       'ok' AS status
FROM d
""",
)
def q_exif_tiff_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXIF/TIFF metadata probe — the sixth multimodal decode shape
    and the first byte-order-SWITCHING walk (PNG/JPEG/MP4 are fixed
    big-endian, WAV fixed little-endian; TIFF declares its own order
    per file): read the II/MM mark, verify magic 42 in that order,
    chase the header's IFD0 offset (per-doc junk padding means it is
    never constant), walk the IFD entry tables pulling inline LONGs
    (dims), an offset-chased ASCII value (Make), an inline
    left-justified SHORT (ISO, inside the descended EXIF IFD) and the
    chained next-IFD offset — what exiftool does structurally
    (``operators.multimodal.decode_exif_tiff_meta``). Never-generated
    failure paths (bad order mark, bad magic, truncated IFD,
    out-of-range value offset, next-IFD cycle) are pinned by
    hand-built pytests in ``tests/test_round13.py``. Scale:
    Arrow-batched mapInPandas, per-doc loops over IFD ENTRIES (≤ a
    dozen), one bounded row per doc, blobs never leave executor
    batches."""
    from web_analytics_visits_re_processing_spark.operators.multimodal import (
        decode_exif_tiff_meta,
        with_tiff_blob,
    )

    docs = load_table(spark, sf_dir, "documents")
    return decode_exif_tiff_meta(with_tiff_blob(docs)).select(
        "doc_id",
        "byte_order",
        F.col("ifd0_offset").cast("long"),
        F.col("n_chain_ifds").cast("int"),
        F.col("n_ifd0_entries").cast("int"),
        F.col("width").cast("long"),
        F.col("height").cast("long"),
        "make",
        F.col("iso").cast("long"),
        F.col("exif_ifd_offset").cast("long"),
        "status",
    )
