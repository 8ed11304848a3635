"""Streaming queries in the driver inventory.

Both replay the bounded fixture through the PRODUCTION topology: file
source → watermark → APPEND mode → parquet file sink (state evicted as
the watermark advances; a sentinel row flushes the tail — see
``streaming.sessionize_stream``). The results still equal the batch
equivalents, so the batch DuckDB oracles apply verbatim: the strongest
batch≡streaming check the driver can record, now under real state
eviction instead of the old complete-mode memory-sink replay.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from web_analytics_visits_re_processing_spark.plans.analytics import _SESSION_CTE
from web_analytics_visits_re_processing_spark.plans.registry import query
from web_analytics_visits_re_processing_spark.streaming.sessionize_stream import (
    streaming_tumbling_counts_append,
    streaming_visits_append,
)


@query(
    "streaming_sessionize_visits",
    oracle=_SESSION_CTE
    + """
SELECT CAST(user_id AS VARCHAR) || '_' || CAST(epoch_us(MIN(ts)) AS VARCHAR)
           AS visit_key,
       user_id,
       epoch_us(MIN(ts)) AS visit_start_us,
       epoch_us(MAX(ts)) AS visit_end_us,
       COUNT(*) AS n_hits,
       SUM(FLOOR(value * 100)::BIGINT)::BIGINT AS total_value_cents
FROM sess
GROUP BY user_id, session_seq
""",
)
def q_streaming_visits(spark: SparkSession, sf_dir: str) -> DataFrame:
    return streaming_visits_append(spark, sf_dir)


@query(
    "streaming_tumbling_counts",
    oracle="""
SELECT (epoch_us(ts) // 3600000000) * 3600000000 AS window_start_us,
       event_type,
       COUNT(*) AS n_events,
       SUM(FLOOR(value * 100)::BIGINT)::BIGINT AS value_cents_sum
FROM events
GROUP BY 1, 2
""",
)
def q_streaming_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    return streaming_tumbling_counts_append(spark, sf_dir)


@query(
    "streaming_sliding_counts",
    # identical to the batch sliding_window_counts oracle: explicit
    # half-hour-slot arithmetic replays F.window(1h, 30min) assignment.
    oracle="""
SELECT (epoch_us(ts) // 1800000000) * 1800000000
           - (s.i * 1800000000) AS window_start_us,
       COUNT(*) AS n_events
FROM events, (SELECT unnest([0, 1]) AS i) s
WHERE (epoch_us(ts) // 1800000000) - s.i >= 0
GROUP BY 1
""",
)
def q_streaming_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding event-time windows under real append-mode replay with
    watermark eviction — equals the batch sliding-window oracle."""
    from web_analytics_visits_re_processing_spark.streaming.sessionize_stream import (
        streaming_sliding_counts_append,
    )

    return streaming_sliding_counts_append(spark, sf_dir)


@query(
    "streaming_abandoned_sessions",
    # batch equivalent of the stateful operator: sessions containing a
    # 'click' (add-to-cart stand-in) but no 'purchase'.
    oracle=_SESSION_CTE
    + """
SELECT user_id,
       epoch_us(MIN(ts)) AS session_start_us,
       epoch_us(MAX(ts)) AS session_end_us,
       SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)::BIGINT AS n_trigger,
       COUNT(*) AS n_events
FROM sess
GROUP BY user_id, session_seq
HAVING SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) > 0
   AND SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) = 0
""",
)
def q_streaming_abandoned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom STATEFUL streaming operator (applyInPandasWithState,
    event-time timeouts): abandoned-session detection — emit once per
    closed session that saw an add-to-cart-class event but no
    purchase. Hash-gated against the batch-sessionization oracle."""
    from web_analytics_visits_re_processing_spark.streaming.stateful import (
        abandoned_sessions_replay,
    )

    return abandoned_sessions_replay(spark, sf_dir)


@query(
    "streaming_dedup_events",
    oracle="""
SELECT DISTINCT user_id, event_type,
       epoch_us(date_trunc('minute', ts)) AS ts_min_us
FROM events
""",
)
def q_streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked streaming dropDuplicates ≡ batch DISTINCT, with key
    state genuinely evicted (event-time member in the dedup key)."""
    from web_analytics_visits_re_processing_spark.streaming.sessionize_stream import (
        streaming_dedup_append,
    )

    return streaming_dedup_append(spark, sf_dir)


@query(
    "streaming_interval_join",
    oracle="""
SELECT c.event_id AS click_id,
       p.event_id AS purchase_id,
       c.user_id,
       epoch_us(c.ts) AS click_ts_us,
       epoch_us(p.ts) AS purchase_ts_us
FROM events c
JOIN events p
  ON c.user_id = p.user_id
 AND p.ts >= c.ts
 AND p.ts <= c.ts + INTERVAL 30 MINUTES
WHERE c.event_type = 'click' AND p.event_type = 'purchase'
""",
)
def q_streaming_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join (purchases ≤30 min after a same-user
    click) ≡ the batch time-bounded self-join oracle, with join state
    bounded by watermark + interval condition."""
    from web_analytics_visits_re_processing_spark.streaming.sessionize_stream import (
        streaming_interval_join_append,
    )

    return streaming_interval_join_append(spark, sf_dir)


@query(
    "streaming_foreach_batch_upsert",
    oracle="""
SELECT user_id, event_type, epoch_us(ts) AS ts_us, value FROM (
    SELECT user_id, event_type, ts, value,
           row_number() OVER (PARTITION BY user_id, event_type
                              ORDER BY ts DESC, event_id DESC) AS rn
    FROM events
) WHERE rn = 1
""",
)
def q_streaming_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """foreachBatch upsert sink under the gate: the stream-maintained
    latest-state serving table (versioned-snapshot merge,
    streaming/upsert_sink.py) must equal the batch latest-per-key
    oracle. maxFilesPerTrigger splits the replay into several
    micro-batches, so multiple incremental merges — not one big batch
    — produce the final state; the merge being idempotent
    latest-per-key makes the result invariant to the batch split."""
    import os
    import shutil

    from pyspark.sql import functions as F

    from web_analytics_visits_re_processing_spark.streaming.sessionize_stream import (
        _SENTINEL_EVENT_TYPE,
        _TMP_ROOT,
        _prepare_replay_input,
        _read_replay_stream,
    )
    from web_analytics_visits_re_processing_spark.streaming.upsert_sink import (
        read_state,
        run_upsert_stream,
    )

    workdir = os.path.join(
        _TMP_ROOT, "stream_upsert", os.path.basename(sf_dir.rstrip("/")) or "sf"
    )
    input_dir = _prepare_replay_input(spark, sf_dir, workdir)
    state = os.path.join(workdir, "state")
    ckpt = os.path.join(workdir, "ckpt_upsert")
    shutil.rmtree(state, ignore_errors=True)
    shutil.rmtree(ckpt, ignore_errors=True)
    stream = (
        _read_replay_stream(spark, input_dir, max_files_per_trigger=4)
        .where(F.col("event_type") != _SENTINEL_EVENT_TYPE)
        .select("event_id", "user_id", "event_type", "ts", "value")
    )
    run_upsert_stream(
        stream, state, ckpt,
        key_cols=["user_id", "event_type"], order_cols=["ts", "event_id"],
    )
    return read_state(spark, state).select(
        "user_id", "event_type", F.unix_micros("ts").alias("ts_us"), "value"
    )


def _cms_oracle() -> str:
    from web_analytics_visits_re_processing_spark.plans.extended import CMS_ORACLE

    return CMS_ORACLE


@query("streaming_cms_event_counts", oracle=_cms_oracle())
def q_streaming_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch maintained from the STREAM (update-mode
    streaming agg → foreachBatch upsert snapshot): sketch state is
    ≤ depth×width rows regardless of stream length, and the finished
    sketch equals the batch build bucket-for-bucket — so the batch CMS
    oracle gates the whole streaming path verbatim."""
    from pyspark.sql import functions as F

    from web_analytics_visits_re_processing_spark.operators.sketch import (
        cms_estimate,
    )
    from web_analytics_visits_re_processing_spark.sources.tables import load_table
    from web_analytics_visits_re_processing_spark.streaming.sessionize_stream import (
        streaming_cms_state,
    )

    cms = streaming_cms_state(spark, sf_dir)
    ev = load_table(spark, sf_dir, "events")
    keys = ev.select("event_type").distinct()
    exact = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("exact_count"))
    return cms_estimate(cms, keys, "event_type").join(exact, "event_type")


@query(
    "streaming_interval_join_left",
    oracle="""
SELECT c.event_id AS click_id,
       p.event_id AS purchase_id,
       c.user_id,
       epoch_us(c.ts) AS click_ts_us,
       epoch_us(p.ts) AS purchase_ts_us
FROM (SELECT * FROM events WHERE event_type = 'click') c
LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON c.user_id = p.user_id
 AND p.ts >= c.ts
 AND p.ts <= c.ts + INTERVAL 30 MINUTES
""",
)
def q_streaming_interval_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER stream-stream join: unmatched clicks must emit a
    null-padded row exactly once — and only after the watermark proves
    no in-window purchase can still arrive (the hard emission rule
    outer stream joins add over inner ones). ≡ the batch left join."""
    from web_analytics_visits_re_processing_spark.streaming.sessionize_stream import (
        streaming_interval_join_append,
    )

    return streaming_interval_join_append(spark, sf_dir, how="left_outer")


def _hll_regs_oracle() -> str:
    from web_analytics_visits_re_processing_spark.plans.extended import (
        HLL_REGISTERS_ORACLE,
    )

    return HLL_REGISTERS_ORACLE


@query("streaming_hll_registers", oracle=_hll_regs_oracle())
def q_streaming_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct-user registers maintained from the STREAM
    (update-mode MAX agg → foreachBatch upsert snapshot): state is
    ≤ 64 rows per event_type forever, rho merges are monotone, and
    the finished register table equals the batch build
    register-for-register — the batch HLL oracle gates the streaming
    path verbatim."""
    from web_analytics_visits_re_processing_spark.streaming.sessionize_stream import (
        streaming_hll_state,
    )

    return streaming_hll_state(spark, sf_dir).select("event_type", "r_idx", "r_rho")


@query(
    "streaming_interval_join_full",
    oracle="""
SELECT c.event_id AS click_id,
       p.event_id AS purchase_id,
       COALESCE(c.user_id, p.user_id) AS user_id,
       epoch_us(c.ts) AS click_ts_us,
       epoch_us(p.ts) AS purchase_ts_us
FROM (SELECT * FROM events WHERE event_type = 'click') c
FULL JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON c.user_id = p.user_id
 AND p.ts >= c.ts
 AND p.ts <= c.ts + INTERVAL 30 MINUTES
""",
)
def q_streaming_interval_join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER stream-stream interval join — both emission rules at
    once: unmatched clicks AND unmatched purchases each surface their
    null-padded row exactly once, only after the watermark proves no
    in-window partner can still arrive; state on both sides is evicted
    by the interval bound. ≡ the batch full join verbatim (the
    sentinel flushes both tails)."""
    from web_analytics_visits_re_processing_spark.streaming.sessionize_stream import (
        streaming_interval_join_append,
    )

    return streaming_interval_join_append(spark, sf_dir, how="full_outer")


# --- transformWithStateInPandas (runtime-conditional) ------------------------
#
# The transformWithState state-server protocol speaks protobuf. Since
# round 12 the repo vendors a clean-room minimal protobuf runtime
# (``vendor/protoshim``) that serves ``google.protobuf`` when the real
# distribution is absent, so the probe now passes in the no-install
# container too and this gate registers everywhere; the conditional
# stays as an honest guard for a runtime where neither works. Batch
# equivalence: the timer-emitted set equals the batch groupBy verbatim
# (order-free aggregates), which is what makes a custom-stateful
# streaming operator SQL-oracle-able at all.

from web_analytics_visits_re_processing_spark.streaming.tws import (  # noqa: E402
    transform_with_state_available,
)

if transform_with_state_available():

    @query(
        "streaming_tws_user_lifetime",
        oracle="""
SELECT user_id,
       epoch_us(MIN(ts)) AS first_ts_us,
       epoch_us(MAX(ts)) AS last_ts_us,
       COUNT(*) AS n_events,
       SUM(FLOOR(value * 100)::BIGINT)::BIGINT AS value_cents
FROM events
GROUP BY user_id
""",
    )
    def q_streaming_tws_user_lifetime(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Per-user lifetime aggregates via transformWithStateInPandas
        (ValueState merge + re-armed event-time timer, emitted exactly
        once per user when the watermark passes last_event + gap — see
        ``streaming.tws``), replayed append-mode with the sentinel
        flushing every timer. r13 optimization: back on its OWN
        minimal stream (``user_lifetime_replay``). The round briefly
        pointed both tws gates at one combined ValueState+MapState+
        ListState stream whose RESULT was staged — but with result
        staging removed (caching results across invocations is
        gaming, not optimization) the combined topology made every
        call pay for BOTH gates' state machinery and discard half
        the rows; the standalone processor does strictly less state-
        server work per call (ValueState + timers only; per-call
        numbers in OPTIMIZATION_r13.md). The combined processor and
        its pytests remain the cross-state consistency surface."""
        from web_analytics_visits_re_processing_spark.streaming.tws import (
            user_lifetime_replay,
        )

        return user_lifetime_replay(spark, sf_dir).select(
            "user_id", "first_ts_us", "last_ts_us", "n_events", "value_cents"
        )

    @query(
        "streaming_tws_type_rollup",
        oracle="""
WITH t AS (
    SELECT user_id, event_type,
           COUNT(*)::BIGINT AS n_events,
           SUM(FLOOR(value * 100)::BIGINT)::BIGINT AS value_cents
    FROM events GROUP BY 1, 2
), u AS (
    SELECT user_id, SUM(n_events)::BIGINT AS log_total FROM t GROUP BY 1
)
SELECT t.user_id, t.event_type, t.n_events, t.value_cents, u.log_total
FROM t JOIN u USING (user_id)
""",
    )
    def q_streaming_tws_type_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Per-user per-event-type rollup via transformWithStateInPandas
        MAP state + a ListState batch log (``streaming.tws.
        TypeRollupProcessor``) — exists to wire-verify, through the
        real JVM state server, the state-client protocol paths the
        ValueState operator never touches (MapState GetValue /
        ContainsKey / UpdateValue / Iterator with KeyAndValuePair
        pagination; ListState AppendValue / paged ListStateGet). The
        emitted set equals the batch ``groupBy(user, type)`` verbatim,
        and ``log_total`` (ListState-derived) must equal the per-user
        batch count — a cross-state consistency the oracle checks for
        free. r13 optimization: back on its OWN minimal stream
        (``user_type_rollup_replay`` — MapState/ListState only; see
        ``streaming_tws_user_lifetime`` for why the shared combined
        stream was reverted once its result stage was removed). The
        pagination pytests on the standalone replay are untouched."""
        from web_analytics_visits_re_processing_spark.streaming.tws import (
            user_type_rollup_replay,
        )

        return user_type_rollup_replay(spark, sf_dir).select(
            "user_id", "event_type", "n_events", "value_cents", "log_total"
        )


@query(
    "streaming_static_enrich",
    # batch equivalent: same left join against the customer dim, same
    # tumbling-hour arithmetic as the streaming_tumbling oracle.
    oracle="""
SELECT (epoch_us(ts) // 3600000000) * 3600000000 AS window_start_us,
       COALESCE(c.c_mktsegment, 'NONE') AS segment,
       COUNT(*) AS n_events,
       SUM(FLOOR(value * 100)::BIGINT)::BIGINT AS value_cents_sum
FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
GROUP BY 1, 2
""",
)
def q_streaming_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static LEFT join (the stateless enrichment topology —
    dimension stamps without join state) + windowed per-segment agg
    under real append-mode replay; equals the batch join verbatim.
    Completes the streaming join matrix: stream-stream inner/left/
    full interval joins + stream-static."""
    from web_analytics_visits_re_processing_spark.streaming.sessionize_stream import (
        streaming_static_enrich_append,
    )

    return streaming_static_enrich_append(spark, sf_dir)


@query(
    "streaming_histogram_quantiles",
    # identical oracle to the batch histogram_quantiles_by_type —
    # binning commutes with streaming aggregation, so the served
    # state must equal the batch histogram bin-for-bin.
    oracle="""
WITH b AS (
    SELECT event_type,
           CAST(FLOOR(value * 100) AS BIGINT) AS bin,
           COUNT(*)::BIGINT AS c
    FROM events GROUP BY event_type, bin
),
cum AS (
    SELECT event_type, bin, c,
           SUM(c) OVER (PARTITION BY event_type ORDER BY bin) AS cum,
           SUM(c) OVER (PARTITION BY event_type) AS n
    FROM b
)
SELECT event_type, MAX(n)::BIGINT AS n,
       MIN(CASE WHEN cum * 2 >= n THEN bin END)::BIGINT AS p50_cents,
       MIN(CASE WHEN cum * 10 >= n * 9 THEN bin END)::BIGINT AS p90_cents,
       MIN(CASE WHEN cum * 100 >= n * 99 THEN bin END)::BIGINT AS p99_cents
FROM cum GROUP BY event_type
""",
)
def q_streaming_histogram_quantiles(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Distribution quantiles maintained ON the stream: (type, bin)
    counts accumulate through update-mode streaming agg + snapshot
    upsert (state = bin domain, constant in row count), and p50/p90/
    p99 read off the SERVED state with the cross-multiplied integer
    cumulative rule. The mergeable histogram is the design that makes
    streaming quantiles possible at all — GK sketch state is neither
    inspectable nor engine-portable; bins add. Gate: the streamed
    state must reproduce the batch histogram exactly, then the same
    quantile read-off."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from web_analytics_visits_re_processing_spark.streaming.sessionize_stream import (
        streaming_histogram_state,
    )

    b = streaming_histogram_state(spark, sf_dir)
    wc = Window.partitionBy("event_type").orderBy("bin")
    wn = Window.partitionBy("event_type")
    cum = b.select(
        "event_type",
        "bin",
        F.sum("c").over(wc).alias("cum"),
        F.sum("c").over(wn).alias("n"),
    )
    return cum.groupBy("event_type").agg(
        F.max("n").alias("n"),
        F.min(F.when(F.col("cum") * 2 >= F.col("n"), F.col("bin"))).alias(
            "p50_cents"
        ),
        F.min(
            F.when(F.col("cum") * 10 >= F.col("n") * 9, F.col("bin"))
        ).alias("p90_cents"),
        F.min(
            F.when(F.col("cum") * 100 >= F.col("n") * 99, F.col("bin"))
        ).alias("p99_cents"),
    )


@query(
    "streaming_topk_user_leaderboard",
    oracle="""
SELECT user_id,
       SUM(FLOOR(value * 100)::BIGINT)::BIGINT AS total_cents,
       COUNT(*)::BIGINT AS n_events,
       ROW_NUMBER() OVER (ORDER BY SUM(FLOOR(value * 100)::BIGINT) DESC,
                          user_id) AS rk
FROM events
GROUP BY user_id
QUALIFY rk <= 10
""",
)
def q_streaming_topk_leaderboard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming top-k leaderboard: per-user cumulative value rides
    the update-mode agg + snapshot-upsert serving pattern; the top-10
    ranks on the SERVED state (keeping top-k inside the stream would
    need arbitrary stateful processing for nothing — the served table
    is already per-key). Gate: the streamed totals must equal batch
    totals exactly, then the same deterministic rank."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from web_analytics_visits_re_processing_spark.streaming.sessionize_stream import (
        streaming_user_totals_state,
    )

    t = streaming_user_totals_state(spark, sf_dir)
    # TakeOrdered top-10 first, then rank the bounded result — r9
    # single-partition-window retirement (the state table is
    # user-grain and grows with the data).
    w = Window.orderBy(F.col("total_cents").desc(), F.col("user_id"))
    return (
        t.orderBy(F.col("total_cents").desc(), F.col("user_id"))
        .limit(10)
        .withColumn("rk", F.row_number().over(w))
        .select("user_id", "total_cents", "n_events", "rk")
    )


@query(
    "streaming_activity_heatmap",
    # identical oracle to the batch heatmap — calendar bucketing
    # commutes with streaming aggregation, so the served state must
    # equal the batch cells count-for-count; shares read off the
    # SERVED state.
    oracle="""
WITH cell AS (
    SELECT (isodow(ts) - 1)::BIGINT AS dow,
           EXTRACT(hour FROM ts)::BIGINT AS hour,
           COUNT(*)::BIGINT AS n_events
    FROM events GROUP BY 1, 2
)
SELECT dow, hour, n_events,
       ((n_events * 1000000) // SUM(n_events) OVER ())::BIGINT
           AS share_ppm
FROM cell
""",
)
def q_streaming_activity_heatmap(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The weekday × hour load-shape heatmap maintained ON the stream
    (18th streaming replay): (dow, hour) cells accumulate through the
    update-mode agg + snapshot-upsert serving pattern — state is
    CONSTANT at ≤ 168 rows no matter the traffic volume, the extreme
    case of the bounded-state argument every sketch replay makes.
    Traffic shares read off the SERVED state, exactly how a live ops
    dashboard consumes it. Gate: streamed cells must equal the batch
    heatmap count-for-count."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from web_analytics_visits_re_processing_spark.streaming.sessionize_stream import (
        streaming_heatmap_state,
    )

    cells = streaming_heatmap_state(spark, sf_dir)
    wall = Window.partitionBy()
    return cells.select(
        "dow",
        "hour",
        F.col("c").alias("n_events"),
        F.expr(
            "(c * 1000000) div sum(c) over ()"
        ).alias("share_ppm"),
    )


@query(
    "streaming_benford_digits",
    # identical oracle to a batch first-digit count over value cents
    # ≥ 1 — digit bucketing commutes with streaming aggregation; the
    # served state is NINE rows no matter the volume.
    oracle="""
SELECT CAST(substring(CAST(FLOOR(value * 100)::BIGINT AS VARCHAR),
                      1, 1) AS BIGINT) AS digit,
       COUNT(*)::BIGINT AS n
FROM events WHERE FLOOR(value * 100) >= 1
GROUP BY 1
""",
)
def q_streaming_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Benford first-digit screen maintained ON the stream (19th
    streaming replay) — the serving pattern's limit case: state is
    NINE rows, full stop, which makes it the cheapest possible
    always-on fraud monitor (the batch audit `benford_first_digit_audit`
    compares these counts to the log-law expectation). Gate: streamed
    digit counts must equal the batch count-for-count."""
    from pyspark.sql import functions as F

    from web_analytics_visits_re_processing_spark.streaming.sessionize_stream import (
        streaming_benford_state,
    )

    d = streaming_benford_state(spark, sf_dir)
    return d.select("digit", F.col("c").alias("n"))


@query(
    "streaming_count_min_sketch",
    # Identical oracle to count_min_heavy_hitters: CM counters merge
    # associatively across micro-batches (the sketch's defining
    # property, Cormode & Muthukrishnan 2005 §4), so the INCREMENTAL
    # sketch must equal the batch sketch cell-for-cell — the gate
    # probes the streamed cells with the batch top-20 and every
    # estimate must hash-match the one-shot build.
    oracle="""
WITH u AS (
    SELECT user_id, COUNT(*)::BIGINT AS cnt FROM events GROUP BY user_id
), rows_ AS (SELECT range::BIGINT AS r FROM range(0, 4)),
cells AS (
    SELECT r.r,
           ('0x' || substring(md5(CAST(r.r AS VARCHAR) || ':'
                || CAST(u.user_id AS VARCHAR)), 1, 15))::BIGINT
               % 256 AS bucket,
           SUM(u.cnt)::BIGINT AS counter
    FROM u CROSS JOIN rows_ r
    GROUP BY 1, 2
), top AS (
    SELECT user_id, cnt,
           ROW_NUMBER() OVER (ORDER BY cnt DESC, user_id) AS rk
    FROM u
), est AS (
    SELECT t.user_id, t.cnt, t.rk,
           MIN(c.counter)::BIGINT AS cm_estimate
    FROM top t
    JOIN rows_ r ON TRUE
    JOIN cells c
      ON c.r = r.r
     AND c.bucket = ('0x' || substring(md5(CAST(r.r AS VARCHAR) || ':'
            || CAST(t.user_id AS VARCHAR)), 1, 15))::BIGINT % 256
    WHERE t.rk <= 20
    GROUP BY 1, 2, 3
)
SELECT user_id, cnt AS true_count, cm_estimate, rk,
       ((cm_estimate - cnt) * 1000000 // cnt)::BIGINT AS overestimate_ppm
FROM est
""",
)
def q_streaming_count_min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch maintained ON the stream (20th streaming
    replay) — the mergeability thesis made operational: per-batch
    partial counters add associatively, so the incrementally-built
    sketch must equal ``count_min_heavy_hitters``' one-shot build
    CELL-FOR-CELL, and this gate proves it by probing the SERVED
    streamed cells with the batch top-20 heavy hitters and hashing
    the identical readout. State inside the stream is 4×256 counters
    — constant in traffic volume (the heatmap argument, one further:
    the sketch answers frequency queries about an UNBOUNDED key set
    from bounded state). Serving read and ranking stay batch-side,
    as with the top-k leaderboard."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from web_analytics_visits_re_processing_spark.functions.text import hash64
    from web_analytics_visits_re_processing_spark.plans.webanalytics import (
        _events,
    )
    from web_analytics_visits_re_processing_spark.streaming.sessionize_stream import (
        streaming_count_min_state,
    )

    cells = streaming_count_min_state(spark, sf_dir)
    u = _events(spark, sf_dir).groupBy("user_id").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    # TakeOrdered top-20 first, then rank the bounded result — r9
    # single-partition-window retirement (mirrors the batch
    # count_min_heavy_hitters fix).
    top = (
        u.orderBy(F.col("cnt").desc(), "user_id")
        .limit(20)
        .withColumn(
            "rk",
            F.row_number().over(
                Window.orderBy(F.col("cnt").desc(), "user_id")
            ),
        )
    )
    rows_ = spark.range(4).select(F.col("id").alias("r"))
    probe = top.crossJoin(F.broadcast(rows_)).select(
        "user_id",
        "cnt",
        "rk",
        "r",
        (
            hash64(
                F.concat_ws(
                    ":",
                    F.col("r").cast("string"),
                    F.col("user_id").cast("string"),
                )
            )
            % 256
        ).alias("bucket"),
    )
    est = (
        probe.join(F.broadcast(cells), ["r", "bucket"])
        .groupBy("user_id", "cnt", "rk")
        .agg(F.min("counter").cast("long").alias("cm_estimate"))
    )
    return est.select(
        "user_id",
        F.col("cnt").alias("true_count"),
        "cm_estimate",
        "rk",
        F.expr("(cm_estimate - cnt) * 1000000 div cnt").alias(
            "overestimate_ppm"
        ),
    )


def _obf_oracle() -> str:
    from web_analytics_visits_re_processing_spark.plans.webanalytics_r8 import (
        OBF_ORACLE_SQL,
    )

    return OBF_ORACLE_SQL


@query(
    "streaming_obf_monitor",
    # Identical oracle to obf_sequential_looks: period cutting
    # commutes with streaming aggregation, so the monitor built from
    # the SERVED streamed cells must produce the exact same look
    # table — the gate hashes the full five-look readout.
    oracle=_obf_oracle(),
)
def q_streaming_obf_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-sequential experiment monitoring ON the stream (21st
    streaming replay) — what an experimentation platform's live
    peeking guard actually runs: the ≤10 (look-period × arm)
    trial/conversion cells accumulate incrementally through the
    update-mode agg → snapshot-upsert topology (counts are monotone,
    so latest-per-key by n is the correct snapshot merge), and the
    OBF look table — cumulative z², pinned O'Brien–Fleming e4
    criticals, first_cross_look — is computed from the SERVED cells
    by the same shared pipeline as the batch gate. Because period
    bucketing commutes with streaming aggregation, the streamed
    readout must equal ``obf_sequential_looks`` row-for-row, which is
    exactly what the shared oracle pins. State is constant in traffic
    volume; the inference is a ≤10-row computation at serve time."""
    from pyspark.sql import functions as F

    from web_analytics_visits_re_processing_spark.plans.webanalytics_r8 import (
        obf_looks_from_periods,
    )
    from web_analytics_visits_re_processing_spark.streaming.sessionize_stream import (
        streaming_obf_cells_state,
    )

    cells = streaming_obf_cells_state(spark, sf_dir)
    periods = cells.select(
        "p", "arm", F.col("n").cast("long").alias("n"),
        F.col("k").cast("long").alias("k"),
    )
    return obf_looks_from_periods(spark, periods)


def _dyngap_oracle() -> str:
    from web_analytics_visits_re_processing_spark.plans.analytics import (
        DYNGAP_ORACLE,
    )

    return DYNGAP_ORACLE


@query("streaming_dynamic_gap_sessions", oracle=_dyngap_oracle())
def q_streaming_dynamic_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming sessionization with a per-event-type DYNAMIC gap
    expression (clicks 5 min, purchases 10, rest 30) — the streaming
    twin of ``sessionize_dynamic_gap``, SAME oracle text: per-row
    timeout policy rides ``session_window(ts, gap_expr)`` under a
    watermark with no custom state operator, through the production
    append-mode file-sink topology with genuine state eviction. The
    hash proves the streaming dynamic merge rule (interval overlap
    against the running window end) equals batch semantics exactly."""
    from web_analytics_visits_re_processing_spark.streaming.sessionize_stream import (
        streaming_dynamic_gap_append,
    )

    return streaming_dynamic_gap_append(spark, sf_dir)


def _cross_device_oracle() -> str:
    from web_analytics_visits_re_processing_spark.plans.round10 import (
        _CROSS_DEVICE_ORACLE,
    )

    return _CROSS_DEVICE_ORACLE


@query("streaming_cross_device_sessionize", oracle=_cross_device_oracle())
def q_streaming_cross_device(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming enrich-then-sessionize: the event stream joins the
    batch-computed stitched-visitor map (stream⋈static) and
    sessionizes at the visitor grain under a watermark — the
    production cross-device topology (identity graph on a slow
    refresh cadence, events streaming). Gated against the batch
    ``cross_device_sessionize`` oracle VERBATIM: the recursive
    stitch, the stream-static join AND the streaming session-window
    semantics must all hold for the hash to match."""
    from web_analytics_visits_re_processing_spark.streaming.sessionize_stream import (
        streaming_cross_device_append,
    )

    return streaming_cross_device_append(spark, sf_dir)
