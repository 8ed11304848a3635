"""Planted-case tests: vocab coverage arithmetic, truncation loss,
cross-source gram overlap."""

from __future__ import annotations

from web_analytics_visits_re_processing_spark.plans import QUERIES

DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def _write(spark, tmp_path, rows):
    spark.createDataFrame(rows, DOC_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "documents.parquet"))


def test_vocab_coverage_partial(spark, tmp_path):
    # 7 types with counts 7,6,5,4,3,2,1 (total 28): top-5 covers 25
    # → 892857 ppm; sizes 10/20 cover everything.
    toks = []
    for i, c in enumerate([7, 6, 5, 4, 3, 2, 1]):
        toks += [f"t{i}"] * c
    _write(spark, tmp_path, [(1, " ".join(toks), "en", "s", 1)])
    got = {
        r["vocab_size"]: (r["covered_tokens"], r["total_tokens"], r["coverage_ppm"])
        for r in QUERIES["vocab_coverage_curve"](spark, str(tmp_path)).collect()
    }
    assert got[5] == (25, 28, 892_857)
    assert got[10] == (28, 28, 1_000_000)
    assert got[20] == (28, 28, 1_000_000)


def test_truncation_loss_caps(spark, tmp_path):
    # lens 10 and 40 (total 50): cap16 loses 24 → 480000 ppm;
    # cap32 loses 8 → 160000; cap64 loses 0.
    _write(spark, tmp_path, [
        (1, " ".join(["a"] * 10), "en", "s", 1),
        (2, " ".join(["b"] * 40), "en", "s", 1),
    ])
    got = {
        r["cap"]: (r["n_docs_over"], r["tokens_lost"], r["loss_ppm"])
        for r in QUERIES["truncation_loss_report"](spark, str(tmp_path)).collect()
    }
    assert got[16] == (1, 24, 480_000)
    assert got[32] == (1, 8, 160_000)
    assert got[64] == (0, 0, 0)


def test_cross_source_shared_gram(spark, tmp_path):
    # Sources A and B share exactly the 5-gram "v w x y z"; C shares
    # nothing → one matrix row (A, B, 1).
    _write(spark, tmp_path, [
        (1, "v w x y z q1 q2", "en", "A", 1),
        (2, "p1 v w x y z", "en", "B", 1),
        (3, "r1 r2 r3 r4 r5 r6", "en", "C", 1),
    ])
    rows = QUERIES["cross_source_overlap_matrix"](
        spark, str(tmp_path)
    ).collect()
    assert len(rows) == 1
    (r,) = rows
    assert (r["source_a"], r["source_b"], r["shared_grams"]) == ("A", "B", 1)


def test_missing_mass_singleton_share(spark, tmp_path):
    # lang en: tokens [a a b] → 3 tokens, 2 types, 1 singleton →
    # missing mass 333333 ppm. lang de: all repeated → 0.
    _write(spark, tmp_path, [
        (1, "a a b", "en", "s", 1),
        (2, "x x", "de", "s", 1),
    ])
    got = {
        r["lang"]: (r["n_tokens"], r["n_types"], r["n_singletons"],
                    r["missing_mass_ppm"])
        for r in QUERIES["missing_mass_estimate"](
            spark, str(tmp_path)
        ).collect()
    }
    assert got["en"] == (3, 2, 1, 333_333)
    assert got["de"] == (2, 1, 0, 0)
