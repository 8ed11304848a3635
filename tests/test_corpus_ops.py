"""Corpus-curation operators (operators/corpus.py): benchmark
decontamination, concat-and-chunk sequence packing, temperature
resampling. Planted deterministic cases — the oracle-gated registry
queries (`decontaminate_train_docs`, `pack_training_sequences`,
`temperature_sample_langs`) run the same operators over the fixture
corpus."""

from __future__ import annotations

import hashlib

from web_analytics_visits_re_processing_spark.operators.corpus import (
    contamination_flags,
    pack_sequences,
    temperature_sample,
)


def test_contamination_flags_planted_overlap(spark):
    """A train doc sharing one 5-gram with the eval set is flagged; a
    disjoint-vocabulary doc is not; n_grams counts DISTINCT grams."""
    eval_docs = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta")],
        "doc_id long, text string",
    )
    train = spark.createDataFrame(
        [
            # contains eval 5-gram "beta gamma delta epsilon zeta"
            (1, "intro beta gamma delta epsilon zeta outro"),
            (2, "totally different words with no shared grams here"),
            # repeated gram inside one doc still counts once
            (3, "x y z w v x y z w v"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_grams"], r["n_overlap"], r["contaminated"])
        for r in contamination_flags(train, eval_docs, n=5, min_overlap=1).collect()
    }
    assert got[1][1] >= 1 and got[1][2] is True
    assert got[2] == (4, 0, False)  # 8 tokens -> 4 grams, no overlap
    # doc 3: 10 tokens -> 6 positional grams, but "x y z w v" occurs
    # at positions 1 AND 6 -> 5 distinct
    assert got[3] == (5, 0, False)


def test_pack_sequences_offsets_and_boundary_spans(spark):
    """Hand-checked layout: one shard, seq_len 10 — a doc crossing the
    boundary spans two sequences; offsets are the exclusive cumsum."""
    docs = spark.createDataFrame(
        [
            (0, " ".join(["a"] * 6)),   # offset 0, seqs 0-0
            (16, " ".join(["b"] * 6)),  # offset 6, crosses 10 -> seqs 0-1
            (32, " ".join(["c"] * 10)), # offset 12, seqs 1-2
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (
            r["shard"], r["start_offset"], r["first_seq"], r["last_seq"], r["n_seqs"]
        )
        for r in pack_sequences(docs, seq_len=10, n_shards=16).collect()
    }
    assert got[0] == (0, 0, 0, 0, 1)
    assert got[16] == (0, 6, 0, 1, 2)
    assert got[32] == (0, 12, 1, 2, 2)


def test_pack_sequences_shards_are_independent(spark):
    """Docs in different shards get independent offset streams."""
    docs = spark.createDataFrame(
        [(0, "a a a"), (1, "b b b b"), (16, "c c")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["shard"], r["start_offset"])
        for r in pack_sequences(docs, seq_len=10, n_shards=16).collect()
    }
    assert got[0] == (0, 0)
    assert got[1] == (1, 0)   # own shard, own stream
    assert got[16] == (0, 3)  # after doc 0 in shard 0


def test_pack_sequences_offsets_partition_the_shard_stream(spark):
    """Structural invariant on a 200-doc deterministic corpus: within
    every shard, offsets ordered by doc_id are exactly contiguous
    (each start = previous start + previous n_tokens, beginning at 0)
    — i.e. the layout is a partition of the concatenated token
    stream with no gaps or overlaps."""
    # token counts vary deterministically 1..7
    rows = [(i, " ".join(f"t{i}_{j}" for j in range((i * 13) % 7 + 1))) for i in range(200)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = pack_sequences(docs, seq_len=16, n_shards=8).collect()
    by_shard: dict = {}
    for r in got:
        by_shard.setdefault(r["shard"], []).append(r)
    assert len(by_shard) == 8
    for shard, items in by_shard.items():
        items.sort(key=lambda r: r["doc_id"])
        expect = 0
        for r in items:
            assert r["start_offset"] == expect, (shard, r)
            assert r["first_seq"] == r["start_offset"] // 16
            assert r["last_seq"] == (r["start_offset"] + r["n_tokens"] - 1) // 16
            expect += r["n_tokens"]


def test_temperature_sample_rates_and_membership(spark):
    """1:4 language imbalance -> min lang keeps 10^6 ppm, the big one
    floor(sqrt(1/4)*10^6) = 500000 ppm; membership equals the salted
    portable-hash rule computed independently in Python."""
    rows = [(i, "small") for i in range(5)] + [
        (100 + i, "big") for i in range(20)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, lang string")
    got = {
        r["doc_id"]: (r["lang"], r["rate_ppm"], r["kept"])
        for r in temperature_sample(docs).collect()
    }
    assert all(got[i] == ("small", 1_000_000, True) for i in range(5))

    def keep(doc_id, rate):
        h = int(hashlib.md5(f"{doc_id}|tsample".encode()).hexdigest()[:15], 16)
        return (h % 1_000_000) < rate

    for i in range(20):
        lang, rate, kept = got[100 + i]
        assert (lang, rate) == ("big", 500_000)
        assert kept == keep(100 + i, rate)
    # the curve actually downsamples: not everything survives
    assert 0 < sum(1 for i in range(20) if got[100 + i][2]) < 20


def test_linear_interpolation_math_and_edges(spark):
    """operators-level check of the interpolation expression used by
    `interpolate_hourly_value_series` via a planted series: a 3-hour
    interior gap interpolates at the exact linear positions; leading
    and trailing gaps stay null (no extrapolation)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    # hours 0..6 for one type; observed only at hours 2 (=100) and 6 (=500)
    rows = [(h, {2: 100, 6: 500}.get(h)) for h in range(8)]
    g = spark.createDataFrame(rows, "hn long, cents long")
    pw = Window.orderBy("hn").rowsBetween(Window.unboundedPreceding, -1)
    nw = Window.orderBy("hn").rowsBetween(1, Window.unboundedFollowing)
    hn_nn = F.when(F.col("cents").isNotNull(), F.col("hn"))
    w = g.select(
        "hn", "cents",
        F.last("cents", ignorenulls=True).over(pw).alias("pv"),
        F.last(hn_nn, ignorenulls=True).over(pw).alias("ph"),
        F.first("cents", ignorenulls=True).over(nw).alias("nv"),
        F.first(hn_nn, ignorenulls=True).over(nw).alias("nh"),
    )
    interp = F.round(
        F.col("pv")
        + (F.col("nv") - F.col("pv"))
        * (F.col("hn") - F.col("ph")).cast("double")
        / (F.col("nh") - F.col("ph")).cast("double"),
        4,
    )
    out = {
        r["hn"]: r["v"]
        for r in w.select(
            "hn",
            F.when(F.col("cents").isNotNull(), F.col("cents").cast("double"))
            .when(F.col("pv").isNotNull() & F.col("nv").isNotNull(), interp)
            .alias("v"),
        ).collect()
    }
    assert out[0] is None and out[1] is None      # leading gap: no extrapolation
    assert out[2] == 100.0 and out[6] == 500.0    # observed pass through
    assert out[3] == 200.0 and out[4] == 300.0 and out[5] == 400.0
    assert out[7] is None                          # trailing gap


def test_importance_scores_prefer_target_like_docs(spark):
    """DSIR contract on planted data: a raw doc written in the target
    corpus's vocabulary out-scores (per gram) a doc with disjoint
    vocabulary — its grams land in buckets the target populated."""
    from web_analytics_visits_re_processing_spark.operators.corpus import (
        importance_scores,
    )

    target = spark.createDataFrame(
        [(100 + i, "alpha beta gamma delta " * 5) for i in range(5)],
        "doc_id long, text string",
    )
    raw = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta alpha beta gamma delta"),
            (2, "zork quux blorb frotz gnusto rezrov yomin bozbar"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_grams"], r["score_e6"])
        for r in importance_scores(raw, target, n_buckets=1024, ngram=2).collect()
    }
    # same gram counts -> directly comparable totals
    assert got[1][0] == got[2][0] == 7
    assert got[1][1] > got[2][1]


def test_importance_scores_gram_cache_never_survives_the_call(spark):
    """Persist-leak regression gate (r6 verdict item): after
    ``importance_scores`` returns, NO exploded-gram partition is still
    persisted — the gram cache is unpersisted inside the call once the
    eagerly-checkpointed result materializes. Across repeated calls the
    persisted-RDD census stays bounded (at most the single-slot
    doc-level result checkpoint), instead of accumulating one gram
    cache per invocation."""
    from web_analytics_visits_re_processing_spark.operators import corpus
    from web_analytics_visits_re_processing_spark.operators.corpus import (
        importance_scores,
    )

    target = spark.createDataFrame(
        [(100 + i, "alpha beta gamma delta " * 5) for i in range(5)],
        "doc_id long, text string",
    )
    raw = spark.createDataFrame(
        [(i, f"alpha beta w{i} gamma") for i in range(20)],
        "doc_id long, text string",
    )

    import time

    def persisted_ids():
        return set(spark.sparkContext._jsc.getPersistentRDDs().keySet())

    def settled(base, limit, timeout=10.0):
        # in-call unpersists are non-blocking; poll until the async
        # block removals drain (or time out and report the census).
        deadline = time.monotonic() + timeout
        while True:
            now = persisted_ids() - base
            if len(now) <= limit or time.monotonic() > deadline:
                return now
            time.sleep(0.2)

    base = persisted_ids()
    sizes = []
    for _ in range(3):
        importance_scores(raw, target, n_buckets=64, ngram=2).collect()
        sizes.append(len(settled(base, 1)))
    # bounded: never more than the one live result checkpoint — if the
    # gram cache leaked, each call would add one more persisted RDD.
    assert max(sizes) <= 1, sizes
    # and the registry holds exactly the last result, which is the
    # small doc-level output, not the gram explode.
    last = corpus._LAST_RESULT_CACHE.get("df")
    assert last is not None and set(last.columns) == {
        "doc_id",
        "n_grams",
        "score_e6",
    }
    last.unpersist(blocking=True)
    corpus._LAST_RESULT_CACHE.clear()
    assert settled(base, 0) == set()


def test_line_dedup_strips_boilerplate_only(spark):
    """Planted CCNet case: a 5-token footer shared by 3 docs is
    stripped from all of them; a chunk shared by only 2 docs stays
    (min_docs=3); unique content is untouched and order-preserved."""
    import hashlib

    from pyspark.sql import functions as F

    from web_analytics_visits_re_processing_spark.operators.corpus import (
        line_dedup_stats,
    )

    footer = "visit our site for more"       # 5 tokens, in docs 1-3
    pair = "only two docs share this"        # 5 tokens, in docs 1-2
    uniq = {i: f"unique words number {i} here" for i in (1, 2, 3)}
    rows = [
        (1, f"{uniq[1]} {footer} {pair}"),
        (2, f"{pair} {footer} {uniq[2]}"),
        (3, f"{footer} {uniq[3]}"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r
        for r in line_dedup_stats(docs, chunk_tokens=5, min_docs=3).collect()
    }
    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()
    assert got[1]["n_lines"] == 3 and got[1]["n_dup_lines"] == 1
    assert got[1]["kept_fp"] == md5(f"{uniq[1]} {pair}")
    assert got[2]["kept_fp"] == md5(f"{pair} {uniq[2]}")
    assert got[3]["kept_fp"] == md5(uniq[3])
    assert got[3]["dup_ppm"] == 500_000
