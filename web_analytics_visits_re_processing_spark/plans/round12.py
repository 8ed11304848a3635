"""Round-12 registrations: the MP4/ISO-BMFF container walk (the r11
verdict's capability item — video metadata probing was the one
multimodal container the tier lacked; frame sampling rode APNG).

Reference scope note: the Beam reference (konosp/
Web-Analytics-Visits-re-processing) has no multimodal surface at all —
this tier exists for the large-scale training-data-pipeline mandate,
same contract as ``operators/multimodal.py``: real container
plumbing, stubbed media payloads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from web_analytics_visits_re_processing_spark.plans.registry import query
from web_analytics_visits_re_processing_spark.sources.tables import load_table


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


@query(
    "mp4_container_meta",
    # Recursive box walk replayed from the generation rule: the
    # fixture MP4 (with_mp4_blob) is ftyp(24) + k free boxes of
    # 8+m bytes (k = n%3, m = n%5+1), then moov/mdat in fast-start
    # order or mdat/moov in streaming order on (n>>1)&1, so
    # moov_offset = 24 + k*(m+8) (+ the 8+n mdat when streaming) and
    # the walk count is 3 + k boxes. Hashing the OFFSET and box count
    # pins the walk; timescale/duration/handlers/codecs pin the
    # nested mvhd/hdlr/stsd descent.
    oracle="""
WITH d AS (
    SELECT doc_id, octet_length(encode(text)) AS n FROM documents
)
SELECT doc_id,
       'isom' AS major_brand,
       (24 + (n % 3) * ((n % 5 + 1) + 8)
           + CASE WHEN (n // 2) % 2 = 1 THEN n + 8 ELSE 0 END
       )::BIGINT AS moov_offset,
       (3 + n % 3)::INT AS n_top_boxes,
       (n % 900 + 100)::BIGINT AS timescale,
       (n % 9000 + 1000)::BIGINT AS duration,
       ((n % 9000 + 1000)::HUGEINT * 1000
        // (n % 900 + 100))::BIGINT AS duration_ms,
       (n % 2 + 1)::INT AS n_tracks,
       CASE WHEN n % 2 = 0 THEN 'vide' ELSE 'vide,soun' END AS handlers,
       CASE WHEN n % 2 = 0 THEN 'avc1' ELSE 'avc1,mp4a' END AS codecs,
       'ok' AS status
FROM d
""",
)
def q_mp4_container_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MP4/ISO-BMFF metadata probe — the fifth multimodal decode shape
    and the first RECURSIVE container walk (JPEG's marker hop is a
    flat chain; ISO boxes NEST): top-level boxes by embedded BE32
    sizes (64-bit largesize and to-EOF size-0 handled, pinned by
    hand-built pytests), then moov > mvhd for timescale/duration and
    moov > trak > mdia > (hdlr, minf > stbl > stsd) for per-track
    handler and codec fourccs — what ffprobe does without touching a
    media sample (``operators.multimodal.decode_mp4_container_meta``).
    The fixture varies BOTH the padding before moov and the
    fast-start/streaming box order, so a fixed-offset or
    assume-moov-first read cannot fake the parse; the gate hashes the
    moov offset and the top-level box count, pinning the walk itself.
    Scale: Arrow-batched mapInPandas, per-doc loops over BOXES (≤6
    top-level, ≤2 trak trees), one bounded row per doc, blobs never
    leave executor batches."""
    from web_analytics_visits_re_processing_spark.operators.multimodal import (
        decode_mp4_container_meta,
        with_mp4_blob,
    )

    return decode_mp4_container_meta(with_mp4_blob(_docs(spark, sf_dir)))
