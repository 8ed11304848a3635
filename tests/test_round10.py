"""Round-10 pins: corpus-banded SimHash (signature width + generalized
pigeonhole block count) and the demand-diversity rank conversion.

The banding rule (dedup.simhash_bits_for / simhash_blocks_for) is the
lsh_planes_for precedent applied to the pigeonhole block universe the
r9 verdict flagged (fixed 32-bit/4-block split → 2^11 buckets →
~3n²/2048 candidate volume at corpus scale). No fixture exercises the
48/60-bit arms, so these tests pin (a) the exact band boundaries,
(b) cross-engine signature equality for every arm's unrolled SQL, and
(c) losslessness of the generalized (b−k)-subset combo join vs brute
force at the widths the wide bands actually use."""

from __future__ import annotations

import itertools

import duckdb
import pytest
from pyspark.sql import functions as F

from web_analytics_visits_re_processing_spark.operators.dedup import (
    simhash_bits_for,
    simhash_blocks_for,
    simhash_near_dup_pairs,
    simhash_signatures_df,
)


def _near_dup_docs(spark):
    """Deterministic corpus with exact dups (hamming-0 pairs
    guaranteed), one-token variants (small hamming) and unrelated
    filler — enough structure that the lossless checks compare
    non-empty sets."""
    base = " ".join(f"tok{i}" for i in range(24))
    rows = []
    for i in range(6):
        rows.append((i, base))  # exact-dup class of 6
    for i in range(6, 18):
        toks = base.split()
        toks[i % 24] = f"alt{i}"
        rows.append((i, " ".join(toks)))
    for i in range(18, 40):
        rows.append(
            (i, " ".join(f"w{i}_{j}" for j in range(10)))
        )
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_simhash_band_boundaries():
    """The banding rule at its exact edges: 2^16 stays in the
    32-bit/4-block arm, one past it jumps to 48/6; likewise
    2^24 → 60 bits."""
    assert simhash_bits_for(1) == 32
    assert simhash_bits_for(1 << 16) == 32
    assert simhash_bits_for((1 << 16) + 1) == 48
    assert simhash_bits_for(1 << 24) == 48
    assert simhash_bits_for((1 << 24) + 1) == 60
    assert simhash_blocks_for(1 << 16, 3) == 4
    assert simhash_blocks_for((1 << 16) + 1, 3) == 6
    assert simhash_blocks_for((1 << 24) + 1, 3) == 6


def test_simhash_sig_arms_match_duckdb(spark):
    """The oracle's 48- and 60-bit CASE arms are never exercised at
    any fixture SF, so their unrolled bit-majority SQL is pinned here
    directly: Spark's simhash_signatures_df and DuckDB's
    _simhash_sig_sql must assign IDENTICAL signatures at every banded
    width over the deterministic corpus."""
    from web_analytics_visits_re_processing_spark.plans.llmdata import (
        _SIMHASH_TOKEN_HASHES_SQL,
        _simhash_sig_sql,
    )

    docs = _near_dup_docs(spark)
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, {t!r})" for i, t in docs.collect())
        + ") t(doc_id, text)"
    )
    for bits in (32, 48, 60):
        got = {
            r["doc_id"]: r["simhash"]
            for r in simhash_signatures_df(docs, bits=bits).collect()
        }
        want = dict(
            con.execute(
                f"WITH h AS ({_SIMHASH_TOKEN_HASHES_SQL}) "
                f"SELECT doc_id, {_simhash_sig_sql(bits)} FROM h"
            ).fetchall()
        )
        assert got == want, bits


@pytest.mark.parametrize("bits,n_blocks", [(48, 6), (60, 6), (60, 4)])
def test_simhash_combo_blocking_lossless(spark, bits, n_blocks):
    """Generalized pigeonhole at the wide-band parameters: indexing
    every (b−k)-subset of b blocks must return EXACTLY the brute-force
    hamming ≤ k pair set (recall 1), with each pair emitted once (the
    first-agreeing-combo guard kills multi-subset duplicates without a
    distinct())."""
    k = 3
    docs = _near_dup_docs(spark)
    sigs = {
        r["doc_id"]: r["simhash"]
        for r in simhash_signatures_df(docs, bits=bits).collect()
    }
    want = {
        (a, b, bin(sigs[a] ^ sigs[b]).count("1"))
        for a, b in itertools.combinations(sorted(sigs), 2)
        if bin(sigs[a] ^ sigs[b]).count("1") <= k
    }
    assert want, "fixture must produce near-dup pairs"
    rows = simhash_near_dup_pairs(
        docs, max_hamming=k, bits=bits, n_blocks=n_blocks
    ).collect()
    got = [(r["id_a"], r["id_b"], r["hamming"]) for r in rows]
    assert len(got) == len(set(got)), "duplicate pair emitted"
    assert set(got) == want


def test_simhash_default_blocks_unchanged(spark):
    """Band 1 (every fixture SF) is byte-for-byte the pre-banding
    behavior: n_blocks defaults to max_hamming+1 single-block combos,
    and the banded call at a small count equals the legacy
    32-bit/4-block output."""
    docs = _near_dup_docs(spark)
    legacy = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in simhash_near_dup_pairs(docs, max_hamming=3).collect()
    }
    banded = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in simhash_near_dup_pairs(
            docs,
            max_hamming=3,
            bits=simhash_bits_for(40),
            n_blocks=simhash_blocks_for(40, 3),
        ).collect()
    }
    assert banded == legacy


def test_bench_compare_thresholds():
    """bench_compare flags >threshold× moves in either direction,
    ignores sub-floor noise entries, and reports added/removed names
    — the contract the per-round BENCH_DETAIL_r{N} snapshots rely on."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "bench_compare",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "scripts",
            "bench_compare.py",
        ),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    old = {"value": 10.0, "reps": 3, "queries": {
        "slowed": 1.0, "sped": 3.0, "noise": 0.05, "steady": 2.0, "gone": 1.0,
    }}
    new = {"value": 11.0, "reps": 3, "queries": {
        "slowed": 1.6, "sped": 1.9, "noise": 0.12, "steady": 2.1, "fresh": 0.5,
    }}
    rep = mod.compare(old, new, threshold=1.5, floor=0.3)
    assert list(rep["regressions"]) == ["slowed"]
    assert list(rep["improvements"]) == ["sped"]
    assert "noise" not in rep["regressions"]  # 2.4× but sub-floor
    assert rep["added"] == ["fresh"] and rep["removed"] == ["gone"]
