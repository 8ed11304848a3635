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
    # r13: the old form referenced the posting pipeline 3× (df count,
    # semi-join probe, self-join legs) and re-evaluated it per
    # reference, then paid an fp-keyed self-join. ONE groupBy now
    # collects each fingerprint's sorted doc list (df = list size, so
    # the ≤ _WINNOW_DF_CAP guard is a size() filter on the same pass)
    # and pairs enumerate array-side (≤ C(8,2) structs per fp) — the
    # posting pipeline runs exactly once and no self-join remains.
    # Same pair multiset: post is DISTINCT (doc_id, fp), ascending
    # sort ⇒ doc_a < doc_b.
    post = winnowing_posting(docs, ngram=3, window=4)
    grp = (
        post.groupBy("fp")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
        .where(F.size("ids") <= _WINNOW_DF_CAP)
    )
    return (
        grp.select(
            F.explode(
                F.expr(
                    "flatten(transform(ids, (x, i) ->"
                    " transform(slice(ids, i + 2, size(ids) - i - 1),"
                    " y -> struct(x AS doc_a, y AS doc_b))))"
                )
            ).alias("p")
        )
        .select("p.doc_a", "p.doc_b")
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


# --- time-series similarity: PAA + equi-depth SAX + DTW -----------------------
#
# The time-series similarity-search tier (cf. the retrieved EDBT 2019
# distributed streaming-similarity paper; Lin et al. 2007 for SAX,
# Keogh 2001 for PAA, Sakoe & Chiba 1978 for DTW): per-user daily
# revenue series → Piecewise Aggregate Approximation (7 segments of
# 5 days over the fixture's bounded calendar window) → SYMBOLIZED
# with EQUI-DEPTH breakpoints (empirical quartiles by the repo's
# cumulative-rank integer rule — classic SAX uses Gaussian
# breakpoints, which are floats and assume normality; equi-depth is
# engine-exact AND distribution-honest) → shape words. The word is
# the BLOCKING key: exact integer DTW runs only within word groups
# (count-banded ≤ 16 users — the df-cap convention), never all-pairs.
# DTW itself is the fully UNROLLED 7×7 dynamic program — 49 chained
# integer expressions generated by the same Python loop for BOTH
# engines, so the recurrence cannot drift between them.

_PAA_SEGS = 7
_PAA_SEG_DAYS = 5
_SAX_GROUP_CAP = 16

_PAA_SQL = f"""
base AS (
    SELECT user_id,
           datediff('day',
                    (SELECT MIN(CAST(ts AS DATE)) FROM events),
                    CAST(ts AS DATE)) AS dd,
           FLOOR(value * 100)::BIGINT AS cents
    FROM events
), seg AS (
    SELECT user_id, dd // {_PAA_SEG_DAYS} AS seg,
           SUM(cents)::BIGINT AS segsum
    FROM base WHERE dd < {_PAA_SEGS * _PAA_SEG_DAYS} GROUP BY 1, 2
), users AS (
    SELECT DISTINCT user_id FROM base
    WHERE dd < {_PAA_SEGS * _PAA_SEG_DAYS}
), spine AS (
    SELECT user_id, s.range AS seg
    FROM users CROSS JOIN range(0, {_PAA_SEGS}) s
), paa AS (
    SELECT sp.user_id, sp.seg,
           (COALESCE(seg.segsum, 0) // {_PAA_SEG_DAYS})::BIGINT AS v
    FROM spine sp LEFT JOIN seg
      ON seg.user_id = sp.user_id AND seg.seg = sp.seg
), q AS (
    SELECT MIN(CASE WHEN cum * 4 >= n THEN v END) AS q25,
           MIN(CASE WHEN cum * 2 >= n THEN v END) AS q50,
           MIN(CASE WHEN cum * 4 >= 3 * n THEN v END) AS q75
    FROM (
        SELECT v, SUM(c) OVER (ORDER BY v) AS cum,
               SUM(c) OVER () AS n
        FROM (SELECT v, COUNT(*)::BIGINT AS c FROM paa GROUP BY v))
), sym AS (
    SELECT user_id, seg, v,
           ((v > q.q25)::INT + (v > q.q50)::INT + (v > q.q75)::INT) AS s
    FROM paa, q
), words AS (
    SELECT user_id, string_agg(chr(97 + s), '' ORDER BY seg) AS word
    FROM sym GROUP BY user_id
)"""


def _dtw_stage_exprs(ua: str, ub: str, elem) -> list[list[str]]:
    """The 7×7 DTW dynamic program, unrolled: stage i yields the 7
    aliased expressions of DP row i (referencing row i−1's aliases).
    ``elem(vec, j)`` renders 1-based element access for the target
    engine. dp[1][j] = prefix sum of costs; dp[i][1] = dp[i−1][1] +
    cost; interior = cost + least(diag, up, left)."""
    n = _PAA_SEGS

    def cost(i: int, j: int) -> str:
        return f"abs({elem(ua, i)} - {elem(ub, j)})"

    stages = []
    row1 = [f"{cost(1, 1)} AS d1_1"]
    for j in range(2, n + 1):
        row1.append(f"d1_{j - 1} + {cost(1, j)} AS d1_{j}")
    stages.append(row1)
    for i in range(2, n + 1):
        row = [f"d{i - 1}_1 + {cost(i, 1)} AS d{i}_1"]
        for j in range(2, n + 1):
            row.append(
                f"{cost(i, j)} + least(d{i - 1}_{j}, d{i - 1}_{j - 1}, "
                f"d{i}_{j - 1}) AS d{i}_{j}"
            )
        stages.append(row)
    return stages


def _sax_frames(spark: SparkSession, sf_dir: str):
    """(paa, words): the shared PAA table (user_id, seg, v) and the
    per-user SAX word table — DataFrame twins of ``_PAA_SQL``."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    min_day = ev.agg(F.min(F.to_date("ts")).alias("d0"))
    base = (
        ev.crossJoin(F.broadcast(min_day))
        .select(
            "user_id",
            F.datediff(F.to_date("ts"), F.col("d0")).alias("dd"),
            F.floor(F.col("value") * 100).cast("long").alias("cents"),
        )
        .where(F.col("dd") < _PAA_SEGS * _PAA_SEG_DAYS)
    )
    seg = base.groupBy(
        "user_id", F.expr(f"dd div {_PAA_SEG_DAYS}").alias("seg")
    ).agg(F.sum("cents").alias("segsum"))
    users = base.select("user_id").distinct()
    spine = users.crossJoin(
        F.broadcast(
            spark.range(_PAA_SEGS).select(F.col("id").cast("long").alias("seg"))
        )
    )
    paa = spine.join(seg, ["user_id", "seg"], "left").select(
        "user_id",
        "seg",
        F.expr(
            f"CAST(coalesce(segsum, 0) div {_PAA_SEG_DAYS} AS BIGINT)"
        ).alias("v"),
    )
    # r13: paa feeds the quartile build (hist) AND the symbolize join
    # (sym) — and each of those references replayed the events scan
    # twice (seg + the user spine). Checkpoint the bounded
    # user×segment frame once; everything downstream reads blocks.
    paa = paa.localCheckpoint(eager=True)
    hist = paa.groupBy("v").agg(F.count(F.lit(1)).alias("c"))
    wv = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.select(
        "v",
        F.sum("c").over(wv).alias("cum"),
        F.sum("c").over(Window.partitionBy()).alias("n"),
    )
    q = cum.agg(
        F.min(F.when(F.col("cum") * 4 >= F.col("n"), F.col("v"))).alias("q25"),
        F.min(F.when(F.col("cum") * 2 >= F.col("n"), F.col("v"))).alias("q50"),
        F.min(
            F.when(F.col("cum") * 4 >= 3 * F.col("n"), F.col("v"))
        ).alias("q75"),
    )
    sym = paa.crossJoin(F.broadcast(q)).select(
        "user_id",
        "seg",
        "v",
        (
            (F.col("v") > F.col("q25")).cast("int")
            + (F.col("v") > F.col("q50")).cast("int")
            + (F.col("v") > F.col("q75")).cast("int")
        ).alias("s"),
    )
    words = sym.groupBy("user_id").agg(
        F.expr(
            "array_join(transform(array_sort(collect_list(struct(seg, s))),"
            " p -> char(97 + p.s)), '')"
        ).alias("word")
    )
    return paa, words


@query(
    "sax_shape_clusters",
    oracle=f"""
WITH {_PAA_SQL}
SELECT word, COUNT(*)::BIGINT AS n_users,
       MIN(user_id)::BIGINT AS min_user_id
FROM words GROUP BY word
""",
)
def q_sax_shape_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symbolic shape clustering of per-user daily-revenue series:
    PAA (7 × 5-day segment means, integer div, zero-filled calendar
    spine) symbolized with EQUI-DEPTH quartile breakpoints (the
    cumulative-rank integer rule — classic SAX's Gaussian breakpoints
    are floats and assume normality; equi-depth is engine-exact AND
    distribution-honest) → one 7-letter word per user; users sharing
    a word share a coarse revenue shape. This is the INDEXING half of
    time-series similarity search (Lin et al. 2007; the retrieved
    EDBT 2019 distributed streaming-similarity paper is the
    motivating shape) — ``dtw_similar_user_pairs`` is the
    verification half, blocked on this word. Scale: one user×seg
    rollup with map-side combine over the bounded calendar window, a
    3-constant broadcast of the quartiles, one word groupBy — nothing
    pair-shaped; at 100 TB the word table is the index you persist."""
    _paa, words = _sax_frames(spark, sf_dir)
    return words.groupBy("word").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.min("user_id").alias("min_user_id"),
    )


@query(
    "dtw_similar_user_pairs",
    oracle=(
        lambda stages: f"""
WITH {_PAA_SQL},
vecs AS (
    SELECT user_id, list(v ORDER BY seg) AS vec FROM paa GROUP BY user_id
), wc AS (
    SELECT word FROM words GROUP BY word
    HAVING COUNT(*) BETWEEN 2 AND {_SAX_GROUP_CAP}
), cand AS (
    SELECT a.user_id AS user_a, b.user_id AS user_b, a.word
    FROM words a
    JOIN wc ON wc.word = a.word
    JOIN words b ON b.word = a.word AND a.user_id < b.user_id
), pairs AS (
    SELECT cand.user_a, cand.user_b, cand.word,
           va.vec AS ua, vb.vec AS ub
    FROM cand
    JOIN vecs va ON va.user_id = cand.user_a
    JOIN vecs vb ON vb.user_id = cand.user_b
),
{", ".join(
    f"s{i} AS (SELECT *, {', '.join(row)} FROM "
    + ("pairs" if i == 1 else f"s{i - 1}") + ")"
    for i, row in enumerate(stages, start=1)
)}
SELECT user_a, user_b, word,
       d{_PAA_SEGS}_{_PAA_SEGS}::BIGINT AS dtw_cents
FROM s{_PAA_SEGS}
"""
    )(_dtw_stage_exprs("ua", "ub", lambda v, j: f"{v}[{j}]")),
)
def q_dtw_similar_user_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series similarity SEARCH: exact integer DTW (Sakoe &
    Chiba 1978) between per-user PAA revenue series, run ONLY inside
    SAX-word blocks of 2..16 users (the count-banded convention — the
    word index prunes the pair space exactly like LSH bands prune
    near-dup candidates; the cap keeps the degenerate all-quiet-users
    block from going quadratic). The 7×7 dynamic program is fully
    UNROLLED into 49 chained integer expressions emitted by ONE
    Python generator for both engines (``_dtw_stage_exprs``), so the
    recurrence — dp[i][j] = |ua_i − ub_j| + min(diag, up, left), row-1
    /col-1 prefix edges — cannot drift between Spark and the oracle.
    Output: every candidate pair with its DTW distance in cents; the
    caller thresholds. Scale: pair count is Σ_block C(n,2) ≤
    C(16,2)·n_blocks; the DP is 49 codegen'd projections per pair —
    compute-bound, shuffle-free past the block join."""
    # r13 opt: this query references ``words`` three times (wc + both
    # legs of the block self-join) — each reference replayed the
    # symbolize lineage (paa itself checkpoints inside _sax_frames).
    # Checkpoint the user-grain word table once.
    paa, words = _sax_frames(spark, sf_dir)
    words = words.localCheckpoint(eager=True)
    vecs = paa.groupBy("user_id").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(seg, v))), p -> p.v)"
        ).alias("vec")
    )
    wc = (
        words.groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .where((F.col("n") >= 2) & (F.col("n") <= _SAX_GROUP_CAP))
        .select("word")
    )
    wa, wb = words.alias("a"), words.alias("b")
    cand = (
        wa.join(wc, "word", "left_semi")
        .join(
            wb,
            (F.col("a.word") == F.col("b.word"))
            & (F.col("a.user_id") < F.col("b.user_id")),
        )
        .select(
            F.col("a.user_id").alias("user_a"),
            F.col("b.user_id").alias("user_b"),
            F.col("a.word").alias("word"),
        )
    )
    pairs = (
        cand.join(
            vecs.select(F.col("user_id").alias("user_a"), F.col("vec").alias("ua")),
            "user_a",
        )
        .join(
            vecs.select(F.col("user_id").alias("user_b"), F.col("vec").alias("ub")),
            "user_b",
        )
    )
    out = pairs
    for row in _dtw_stage_exprs(
        "ua", "ub", lambda v, j: f"element_at({v}, {j})"
    ):
        out = out.selectExpr("*", *row)
    return out.selectExpr(
        "user_a",
        "user_b",
        "word",
        f"CAST(d{_PAA_SEGS}_{_PAA_SEGS} AS BIGINT) AS dtw_cents",
    )


# --- MRR@10 of the ANN path (retrieval-eval family completion) ---------------


from web_analytics_visits_re_processing_spark.plans.llmdata import (
    _lsh_bucket_sql,
)


@query(
    "mrr_at_10_ann",
    # Mean-reciprocal-rank member of the eval family: recall@5
    # scores the id SET, nDCG@10 the graded ORDER; MRR asks the
    # navigational question — at what position does THE true nearest
    # neighbor surface? rr = 1e6 div pos (0 if the ANN top-10 misses
    # it); the oracle recomputes BOTH retrieval paths end to end.
    oracle="""
WITH cb AS (
    SELECT vec_id, embedding, {bucket_sql} AS b
    FROM embeddings
),
qb AS (SELECT * FROM cb WHERE vec_id < 10),
approx AS (
    SELECT query_id, vec_id, rk AS pos FROM (
        SELECT q.vec_id AS query_id, c.vec_id,
               ROW_NUMBER() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY ROUND(list_cosine_similarity(
                                q.embedding::DOUBLE[],
                                c.embedding::DOUBLE[]), 4) DESC,
                            c.vec_id) AS rk
        FROM qb q JOIN cb c
          ON bit_count(xor(q.b, c.b)) <= 1 AND q.vec_id != c.vec_id
    ) WHERE rk <= 10
),
nn AS (
    SELECT query_id, vec_id AS nn_vec_id FROM (
        SELECT q.vec_id AS query_id, c.vec_id,
               ROW_NUMBER() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY ROUND(list_cosine_similarity(
                                q.embedding::DOUBLE[],
                                c.embedding::DOUBLE[]), 4) DESC,
                            c.vec_id) AS rk
        FROM embeddings q JOIN embeddings c ON q.vec_id != c.vec_id
        WHERE q.vec_id < 10
    ) WHERE rk = 1
)
SELECT nn.query_id, nn.nn_vec_id,
       COALESCE(a.pos, 0)::BIGINT AS nn_pos,
       COALESCE(1000000 // a.pos, 0)::BIGINT AS rr_ppm
FROM nn LEFT JOIN approx a
  ON a.query_id = nn.query_id AND a.vec_id = nn.nn_vec_id
""".replace("{bucket_sql}", _lsh_bucket_sql("embedding")),
)
def q_mrr_at_10_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MRR@10 of the MULTI-PROBE LSH ANN path — the NAVIGATIONAL
    member of the retrieval-eval family (recall@5 scores the id set,
    nDCG@10 the graded order; MRR scores where THE true nearest
    neighbor surfaces: rr = 1e6 div its ANN position, 0 when the
    bucket misses it entirely — the exact-side spine keeps missed
    queries in the eval instead of vanishing them). Integer
    reciprocal ranks, both retrieval paths recomputed end to end by
    the oracle (hyperplane bucket literals included) — the
    eval-harness-certifying convention of ann_recall_at_5/
    ndcg_at_10_ann. Multi-probe (hamming ≤ 1), not single-probe: the
    rank-1 neighbor specifically sits across a bucket boundary for
    every eval query on this fixture (single-probe MRR is 0 across
    the board — measured, which is itself the finding multi-probe
    exists to fix), and a dead eval would be vacuous. Scale shape:
    identical — the exact arm is affordable because eval query sets
    are small by design.
    Citation: Voorhees 1999 (TREC-8), the standard MRR
    formulation."""
    from web_analytics_visits_re_processing_spark.operators.similarity import (
        cosine_topk_bruteforce,
        cosine_topk_lsh,
    )
    from web_analytics_visits_re_processing_spark.sources.tables import (
        load_table,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    qs = emb.where(F.col("vec_id") < 10)
    nn = cosine_topk_bruteforce(emb, qs, k=1).select(
        "query_id", F.col("vec_id").alias("nn_vec_id")
    )
    approx = cosine_topk_lsh(
        emb, qs, k=10, dim=64, probe_hamming=1
    ).select(
        F.col("query_id").alias("a_query_id"),
        F.col("vec_id").alias("a_vec_id"),
        F.col("rk").alias("pos"),
    )
    return (
        nn.join(
            approx,
            (F.col("query_id") == F.col("a_query_id"))
            & (F.col("nn_vec_id") == F.col("a_vec_id")),
            "left",
        )
        .select(
            "query_id",
            "nn_vec_id",
            F.coalesce(F.col("pos"), F.lit(0)).cast("long").alias("nn_pos"),
            F.coalesce(
                F.expr("1000000 div pos"), F.lit(0)
            ).cast("long").alias("rr_ppm"),
        )
    )
