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


# --- winnowing candidate pairs ------------------------------------------------
#
# The per-doc winnowing profile (``winnowing_fingerprints`` in
# plans/llmdata.py, MOSS scheme, 3-gram/4-window) already ships; what
# the dedup tier lacked is the CROSS-DOC join it exists for: the
# memorized-span candidate pairs. Same selection (functions.text.
# winnowing_fingerprints), then a df-capped posting-list self-join —
# the count-banded escalation every pair emitter in the tier uses.

_WINNOW_DF_CAP = 8  # stop-gram band: posting lists above this df drop

# DuckDB twin of functions.text.winnowing_fingerprints(ngram=3,
# window=4) — copied verbatim from the per-doc gate's oracle so the
# two gates can never drift apart.
_WINNOW_FPS_SQL = """
WITH g AS (
    SELECT doc_id,
           list_transform(
               range(1, greatest(len(string_split(text, ' ')) - 2, 1) + 1),
               i -> array_to_string(string_split(text, ' ')[i:i+2], ' ')) AS grams
    FROM documents
), h AS (
    SELECT doc_id,
           list_transform(grams,
               s -> ('0x' || substring(md5(s), 1, 15))::BIGINT) AS hs
    FROM g
), m AS (
    SELECT doc_id,
           list_sort(list_distinct(list_transform(
               range(1, greatest(len(hs) - 3, 1) + 1),
               i -> list_min(hs[i:i+3])))) AS fps
    FROM h
)
"""


@query(
    "winnowing_candidate_pairs",
    oracle=f"""{_WINNOW_FPS_SQL},
post AS (SELECT unnest(fps) AS fp, doc_id FROM m),
capped AS (SELECT fp FROM post GROUP BY fp HAVING COUNT(*) <= {_WINNOW_DF_CAP}),
pp AS (SELECT p.fp, p.doc_id FROM post p JOIN capped USING (fp))
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*)::BIGINT AS n_shared
FROM pp a JOIN pp b ON a.fp = b.fp AND a.doc_id < b.doc_id
GROUP BY 1, 2 HAVING COUNT(*) >= 2
""",
)
def q_winnowing_candidate_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-doc memorized-span candidates — the join the winnowing
    profile exists FOR (the per-doc gate pins selection; this gate
    pins detection): explode each doc's selected fingerprints into a
    posting table, drop stop-grams (document frequency >
    _WINNOW_DF_CAP=8 — the count-banded escalation every pair emitter
    in the dedup tier uses: posting lists are bounded, so pair
    emission per fingerprint is ≤ C(cap,2), never all-pairs),
    self-join on fingerprint equality and keep pairs sharing ≥ 2
    selected fingerprints. By the winnowing guarantee (any shared run
    of ≥ window+ngram−1 = 6 tokens leaves a common fingerprint) a
    surviving pair carries ≥ 2 spans' worth of evidence — the
    candidate set a byte-level verifier confirms. Positionally aware
    where MinHash is not: a long copied span diluted inside an
    otherwise-unique doc still collides here. The posting table comes
    from the RELATIONAL winnowing form (``winnowing_posting``:
    posexplode → lead-window n-grams → rows-frame minima → distinct)
    — linear per token, where the HOF column form re-binds its nested
    lambda subtree per window (quadratic per doc, measured 88 s for
    5 000 54-token docs before the rewrite; equivalence pinned in
    pytest)."""
    from web_analytics_visits_re_processing_spark.functions.text import (
        winnowing_posting,
    )

    docs = load_table(spark, sf_dir, "documents")
    # referenced 3× below (df count, semi join, self join) — the
    # relational pipeline is cheap enough to re-evaluate; a persist
    # here would leak a cached frame per invocation (the _daily_seq
    # cache lesson) for a sub-second saving
    post = winnowing_posting(docs, ngram=3, window=4)
    capped = (
        post.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") <= _WINNOW_DF_CAP)
        .select("fp")
    )
    pp = post.join(capped, "fp", "left_semi")
    a, b = pp.alias("a"), pp.alias("b")
    return (
        a.join(
            b,
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .where(F.col("n_shared") >= 2)
    )


# --- Hampel filter (rolling-median outlier flags) -----------------------------


@query(
    "hampel_outlier_daily_revenue",
    # ×2-scaled medians stay integral (interpolated median of ints is
    # z or z+0.5; both engines interpolate (a+b)/2), and the flag is
    # the cross-multiplied integer form of |x−med| > 3·1.4826·MAD:
    # |2x−med2|·10000 > 22239·mad2x2 (mad2x2 = 4·MAD exactly).
    oracle="""
WITH rev AS (
    SELECT o_orderdate AS day,
           SUM(FLOOR(o_totalprice * 100)::BIGINT)::BIGINT AS cents
    FROM orders GROUP BY 1
), med AS (
    SELECT a.day,
           MAX(a.cents) AS cents,
           CAST(median(b.cents) * 2 AS BIGINT) AS med2,
           COUNT(*)::BIGINT AS n_win
    FROM rev a JOIN rev b ON ABS(datediff('day', a.day, b.day)) <= 3
    GROUP BY a.day
), mad AS (
    SELECT m.day, MAX(m.cents) AS cents, MAX(m.med2) AS med2,
           MAX(m.n_win) AS n_win,
           CAST(median(ABS(2 * b.cents - m.med2)) * 2 AS BIGINT) AS mad2x2
    FROM med m JOIN rev b ON ABS(datediff('day', m.day, b.day)) <= 3
    GROUP BY m.day
)
SELECT day, cents, med2, mad2x2, n_win,
       (CASE WHEN ABS(2 * cents - med2) * 10000 > 22239 * mad2x2
             THEN 1 ELSE 0 END)::BIGINT AS is_outlier
FROM mad
""",
)
def q_hampel_outlier_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hampel filter over the daily-revenue series: each day is
    flagged against the MEDIAN and MAD of its ±3-day neighborhood —
    the robust outlier detector a rolling mean/stddev cannot be (one
    whale day shifts a mean window; the median ignores it). Both
    passes are date-range self-joins (≤ 7 members per center row) —
    identical semantics both engines at series edges, unlike
    ROWS-frame windows over calendar gaps; the daily spine is
    calendar-bounded, so the join is tiny at ANY data scale (days,
    not orders). Exactness: medians of cents ship ×2 (interpolation
    at .5 stays integral), MAD ships as mad2x2 = 4·MAD, and the
    3·1.4826·MAD cut is the cross-multiplied integer inequality
    |2x−med2|·10000 > 22239·mad2x2 — no float comparisons anywhere."""
    o = load_table(spark, sf_dir, "orders")
    rev = o.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.sum(F.floor(F.col("o_totalprice") * 100).cast("long")).alias("cents")
    )
    a, b = rev.alias("a"), rev.alias("b")
    med = (
        a.join(
            b,
            F.abs(F.datediff(F.col("a.day"), F.col("b.day"))) <= 3,
        )
        .groupBy(F.col("a.day").alias("day"))
        .agg(
            F.max("a.cents").alias("cents"),
            F.expr("CAST(percentile(b.cents, 0.5) * 2 AS BIGINT)").alias(
                "med2"
            ),
            F.count(F.lit(1)).alias("n_win"),
        )
    )
    m, b2 = med.alias("m"), rev.alias("b")
    mad = (
        m.join(
            b2,
            F.abs(F.datediff(F.col("m.day"), F.col("b.day"))) <= 3,
        )
        .groupBy(F.col("m.day").alias("day"))
        .agg(
            F.max("m.cents").alias("cents"),
            F.max("m.med2").alias("med2"),
            F.max("m.n_win").alias("n_win"),
            F.expr(
                "CAST(percentile(ABS(2 * b.cents - m.med2), 0.5) * 2 AS BIGINT)"
            ).alias("mad2x2"),
        )
    )
    return mad.select(
        "day",
        "cents",
        "med2",
        "mad2x2",
        "n_win",
        F.when(
            F.abs(F.lit(2) * F.col("cents") - F.col("med2")) * 10000
            > F.lit(22239) * F.col("mad2x2"),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("is_outlier"),
    )
