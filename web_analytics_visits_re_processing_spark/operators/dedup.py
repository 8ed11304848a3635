"""Deduplication operators for LLM-training-data pipelines.

Four tiers, all pure DataFrame expressions (no Python in the hot
path), each designed so the candidate-generation step is a hash
shuffle on a SMALL key (fingerprint / band / bucket) rather than an
O(n²) comparison:

- **exact**: group by content fingerprint (md5). One shuffle on a
  16-byte key; at 100 TB this is the cheapest possible dedup.
- **MinHash + LSH**: per-doc k-permutation signature (portable 60-bit
  md5 hash, see ``functions.text.hash64``) → band keys → self-join on
  band → candidate pairs → exact Jaccard verify. Shuffle volume is
  |docs|×bands tiny rows, never |docs|²; the verify join touches only
  colliding candidates. This is the standard near-dup design from the
  MinHash/LSH literature (Broder '97; used by most public LLM data
  pipelines).
- **SimHash**: 32-bit bitwise-majority signature; near-dups = equal
  (or low-hamming) signatures. One shuffle on the signature.
- **n-gram Jaccard**: exact Jaccard over word-n-gram shingle sets for
  a bounded candidate set (same LSH band or same-source blocking) —
  the verification primitive the other tiers reuse.

Every operator keeps the full lineage DataFrame-declarative so
Catalyst prunes document text out of the plan the moment only hashes
are needed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from web_analytics_visits_re_processing_spark.functions.text import (
    exact_fingerprint,
    hash64,
    tokens,
    word_ngrams,
)

DEFAULT_NUM_HASHES = 8
DEFAULT_BANDS = 4  # rows-per-band = num_hashes / bands

# k-permutation MinHash constants: mh_i = min over shingles of
# (A[i] * (h % M) + B[i]) % M, with h the 60-bit portable base hash.
# M = 2^31-1 (prime); A[i] < 2^30 keeps every product < 2^61 — no
# bigint overflow in Spark OR DuckDB (DuckDB raises on overflow
# rather than wrapping, so staying in range is a correctness
# requirement for the oracle, not just hygiene).
MINHASH_M = 2_147_483_647
MINHASH_A = (
    1_000_000_007,
    998_244_353,
    754_974_721,
    167_772_161,
    469_762_049,
    595_591_169,
    645_922_817,
    880_803_841,
)
MINHASH_B = tuple(range(1, 9))


def minhash_params(num_hashes: int) -> tuple[tuple[int, ...], tuple[int, ...]]:
    """(A, B) permutation parameters for ``num_hashes`` permutations.

    The first 8 are the frozen constants above (keeps every committed
    oracle string stable); beyond 8 they come from a deterministic
    MINSTD LCG — same engine-portable bounded-parameter recipe as the
    k-means/PQ/IVF codebooks. Every A stays < 2^30 so ``A·h`` with
    ``h < M = 2^31-1`` is < 2^61: no int64 overflow in Spark, and no
    overflow ERROR in DuckDB (which raises rather than wraps — a
    correctness requirement for the oracle, not hygiene)."""
    a, b = list(MINHASH_A[:num_hashes]), list(MINHASH_B[:num_hashes])
    x = 20_260_813  # fixed seed — params are part of the model contract
    while len(a) < num_hashes:
        x = (48271 * x) % MINHASH_M
        a.append(x % ((1 << 30) - 1) + 1)
        x = (48271 * x) % MINHASH_M
        b.append(x % (MINHASH_M - 1) + 1)
    return tuple(a), tuple(b)


def exact_dup_groups(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Fingerprint → (fp, n_dups, keep_id): groups of byte-identical
    documents; keep the smallest id as canonical."""
    return (
        df.select(exact_fingerprint(text_col).alias("fp"), F.col(id_col))
        .groupBy("fp")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min(id_col).alias("keep_id"))
    )


def dedup_exact(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep one doc per identical content (min id wins)."""
    ranked = df.withColumn("_fp", exact_fingerprint(text_col)).withColumn(
        "_rk", F.row_number().over(Window.partitionBy("_fp").orderBy(id_col))
    )
    return ranked.where(F.col("_rk") == 1).drop("_fp", "_rk")


def minhash_signatures_df(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = DEFAULT_NUM_HASHES,
    ngram: int = 3,
) -> DataFrame:
    """Per-doc k-permutation MinHash → (id, mh_0..mh_{k-1}).

    Plan shape (the fast one): explode shingles → ONE portable md5
    hash per shingle as a regular codegen'd projection → groupBy(id)
    with k cheap ``min((aᵢ·h + bᵢ) % M)`` aggregates. Partial
    aggregation combines map-side, so the doc_id shuffle carries one
    k-long row per doc per partition.

    Why not column expressions over the shingle array: higher-order
    functions (``transform``/``aggregate``) are interpreted
    (CodegenFallback) and get NO subexpression elimination, so k
    signature columns each re-derive the shingle array and re-hash
    every shingle — measured ~6× slower at sf0.1 than this explode
    formulation, and the gap widens with k.

    Portable: same values in DuckDB via ``list_min(list_transform(hs,
    h -> (a * h + b) % M))`` over ``hs = list_transform(shingles,
    s -> ('0x' || substring(md5(s), 1, 15))::BIGINT % M)``.
    """
    shingles = F.array_distinct(word_ngrams(F.col(text_col), ngram))
    hashed = df.select(
        F.col(id_col), F.explode(shingles).alias("_sh")
    ).select(F.col(id_col), (hash64(F.col("_sh")) % MINHASH_M).alias("_hm"))
    pa, pb = minhash_params(num_hashes)
    aggs = [
        F.min(
            (F.lit(pa[i]) * F.col("_hm") + F.lit(pb[i])) % MINHASH_M
        ).alias(f"mh_{i}")
        for i in range(num_hashes)
    ]
    return hashed.groupBy(id_col).agg(*aggs)


def minhash_bands(num_hashes: int = DEFAULT_NUM_HASHES, bands: int = DEFAULT_BANDS) -> list[Column]:
    """Band keys: md5 over each signature slice (classic LSH banding)."""
    rows_per_band = num_hashes // bands
    out = []
    for b in range(bands):
        cols = [F.col(f"mh_{b * rows_per_band + j}").cast("string") for j in range(rows_per_band)]
        out.append(F.md5(F.concat_ws("|", *cols)).alias(f"band_{b}"))
    return out


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = DEFAULT_NUM_HASHES,
    bands: int = DEFAULT_BANDS,
    ngram: int = 3,
) -> DataFrame:
    """Candidate near-dup pairs (id_a < id_b): docs sharing ≥1 LSH band.

    Plan shape: project to (id, band_0..b) → melt via stack/explode →
    self-join on (band_idx, band_key) → distinct pairs. The join key
    cardinality is the number of distinct band values — shuffle stays
    proportional to data, not to pairs.
    """
    sig = minhash_signatures_df(df, text_col, id_col, num_hashes, ngram)
    banded = sig.select(
        id_col, F.array(*minhash_bands(num_hashes, bands)).alias("bands")
    )
    # The full band-key ARRAY rides along so the first-agreeing-band
    # guard below can dedupe multi-band collisions as a join-time
    # expression instead of a distinct() shuffle over the pair stream
    # (pairs are quadratic in dup-group size; bands×|docs| melt rows
    # are not). One array column instead of `bands` separate columns
    # keeps the join condition a SINGLE expression — at realistic
    # parameter counts (16+ bands) the per-column formulation made
    # janino compile a guard with 2×bands column comparisons, and the
    # one-shot codegen time dwarfed the actual run.
    melted = banded.select(
        id_col, "bands", F.posexplode("bands").alias("band_idx", "band_key")
    )
    a = melted.alias("a")
    b = melted.alias("b")
    # slice(zip_with(...)) not sequence(): sequence(1, 0) is the
    # DESCENDING [1, 0] in Spark, while slice(arr, 1, 0) is the empty
    # prefix we want at band_idx = 0.
    earlier_agrees = F.expr(
        "exists(slice(zip_with(a.bands, b.bands, (x, y) -> x = y),"
        " 1, a.band_idx), v -> v)"
    )
    return a.join(
        b,
        (F.col("a.band_idx") == F.col("b.band_idx"))
        & (F.col("a.band_key") == F.col("b.band_key"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        & ~earlier_agrees,
    ).select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))


def jaccard_verify(
    candidates: DataFrame,
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram: int = 3,
    threshold: float = 0.7,
) -> DataFrame:
    """Exact n-gram Jaccard on candidate pairs → (id_a, id_b, jaccard).

    Shingle sets are joined in as arrays; intersection/union sizes via
    native array ops — per-pair cost is bounded by doc length, and the
    join is a broadcast-able equi-join on ids.

    r13: the shingle table feeds BOTH join legs, and each DataFrame
    reference replays the corpus scan + n-gram HOF + distinct —
    checkpoint it once so the (id, shingles) rows build a single
    time and both legs read materialized blocks."""
    shingles = df.select(
        F.col(id_col),
        F.array_distinct(word_ngrams(text_col, ngram)).alias("sh"),
    ).localCheckpoint(eager=True)
    out = (
        candidates.join(shingles.withColumnRenamed(id_col, "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
        .join(shingles.withColumnRenamed(id_col, "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
        .withColumn("inter", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn("uni", F.size(F.array_union("sh_a", "sh_b")))
        .select(
            "id_a",
            "id_b",
            F.round(F.col("inter") / F.col("uni"), 4).alias("jaccard"),
        )
    )
    return out.where(F.col("jaccard") >= threshold)


def minhash_lsh_near_dups(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = DEFAULT_NUM_HASHES,
    bands: int = DEFAULT_BANDS,
    ngram: int = 3,
    threshold: float = 0.7,
) -> DataFrame:
    """Full near-dup pipeline: LSH candidates → exact Jaccard verify."""
    cand = minhash_lsh_candidates(df, text_col, id_col, num_hashes, bands, ngram)
    return jaccard_verify(cand, df, text_col, id_col, ngram, threshold)


def collapse_exact_reps(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> tuple[DataFrame, DataFrame]:
    """Representative-collapse pre-pass for pair search: one doc (min
    id) survives per exact-fingerprint class.

    Returns ``(reps, mapping)``: ``reps`` keeps every input column plus
    ``n_docs`` (class size) for the representatives only; ``mapping``
    is ``(id_col, rep_id)`` for every input doc. One shuffle on the
    16-byte fingerprint produces both (two window functions over the
    same partitioning).

    Why: near-dup pair output is quadratic in dup-group size — a class
    of m byte-identical docs alone emits m(m-1)/2 pairs. Collapsing
    first makes the pair stream quadratic only in DISTINCT-text group
    size; the full pair set stays recoverable lazily via
    ``expand_rep_pairs`` (signatures are pure functions of text, so
    every class member has its representative's signature)."""
    wfp = Window.partitionBy("_fp")
    ranked = (
        df.withColumn("_fp", exact_fingerprint(text_col))
        .withColumn("_rep", F.min(id_col).over(wfp))
        .withColumn("_n", F.count(F.lit(1)).over(wfp))
    )
    reps = (
        ranked.where(F.col(id_col) == F.col("_rep"))
        .drop("_fp", "_rep")
        .withColumnRenamed("_n", "n_docs")
    )
    mapping = ranked.select(F.col(id_col), F.col("_rep").alias("rep_id"))
    return reps, mapping


def simhash_near_dup_pairs_collapsed(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 32,
    max_hamming: int = 2,
    n_blocks: int | None = None,
) -> DataFrame:
    """SimHash pair search over exact-dup class REPRESENTATIVES →
    (id_a, id_b, hamming, n_docs_a, n_docs_b, n_expanded_pairs).

    The pair stream shrinks from quadratic-in-dup-group-size to
    quadratic-in-distinct-text-group-size (the mitigation named in
    ``simhash_near_dup_pairs``'s scale note); ``n_expanded_pairs``
    (= n_docs_a × n_docs_b) counts the doc-level pairs each rep pair
    stands for, and ``expand_rep_pairs`` materializes them on demand."""
    reps, _ = collapse_exact_reps(df, text_col, id_col)
    pairs = simhash_near_dup_pairs(
        reps.drop("n_docs"), text_col, id_col, bits, max_hamming, n_blocks
    )
    return _annotate_class_sizes(pairs, reps, id_col, ("hamming",))


def minhash_near_dups_collapsed(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = DEFAULT_NUM_HASHES,
    bands: int = DEFAULT_BANDS,
    ngram: int = 3,
    threshold: float = 0.7,
) -> DataFrame:
    """MinHash-LSH near-dup pipeline over exact-dup class
    REPRESENTATIVES → (id_a, id_b, jaccard, n_docs_a, n_docs_b,
    n_expanded_pairs) — same collapse rationale as
    ``simhash_near_dup_pairs_collapsed`` (jaccard is a pure function
    of text, so rep-level scores stand for every class member)."""
    reps, _ = collapse_exact_reps(df, text_col, id_col)
    pairs = minhash_lsh_near_dups(
        reps.drop("n_docs"), text_col, id_col, num_hashes, bands, ngram, threshold
    )
    return _annotate_class_sizes(pairs, reps, id_col, ("jaccard",))


def _annotate_class_sizes(
    pairs: DataFrame, reps: DataFrame, id_col: str, score_cols: tuple[str, ...]
) -> DataFrame:
    """Join class sizes onto rep-level pairs and count the doc-level
    pairs each stands for (broadcastable equi-joins on rep ids)."""
    sizes = reps.select(F.col(id_col), "n_docs")
    return (
        pairs.join(
            sizes.withColumnRenamed(id_col, "id_a").withColumnRenamed(
                "n_docs", "n_docs_a"
            ),
            "id_a",
        )
        .join(
            sizes.withColumnRenamed(id_col, "id_b").withColumnRenamed(
                "n_docs", "n_docs_b"
            ),
            "id_b",
        )
        .select(
            "id_a",
            "id_b",
            *score_cols,
            "n_docs_a",
            "n_docs_b",
            (F.col("n_docs_a") * F.col("n_docs_b")).alias("n_expanded_pairs"),
        )
    )


def expand_rep_pairs(
    rep_pairs: DataFrame,
    mapping: DataFrame,
    id_col: str = "doc_id",
    score_cols: tuple[str, ...] = ("hamming",),
    intra_values: tuple = (0,),
) -> DataFrame:
    """Lazily expand rep-level pairs to the full doc-level pair set:
    cross-class pairs via two mapping joins (each member inherits its
    representative's signature, so hamming/jaccard carry over
    verbatim — the scores are pure functions of text) plus intra-class
    pairs, whose scores are the byte-identical constants in
    ``intra_values`` (hamming 0, jaccard 1.0, ...). Disjoint by
    construction — cross pairs different classes, intra pairs the same
    class — so the union needs no dedup."""
    cross = (
        rep_pairs.select("id_a", "id_b", *score_cols)
        .join(
            mapping.select(
                F.col("rep_id").alias("id_a"), F.col(id_col).alias("_doc_a")
            ),
            "id_a",
        )
        .join(
            mapping.select(
                F.col("rep_id").alias("id_b"), F.col(id_col).alias("_doc_b")
            ),
            "id_b",
        )
        .select(
            F.least("_doc_a", "_doc_b").alias("id_a"),
            F.greatest("_doc_a", "_doc_b").alias("id_b"),
            *score_cols,
        )
    )
    score_types = {f.name: f.dataType for f in rep_pairs.schema.fields}
    x, y = mapping.alias("x"), mapping.alias("y")
    intra = x.join(
        y,
        (F.col("x.rep_id") == F.col("y.rep_id"))
        & (F.col(f"x.{id_col}") < F.col(f"y.{id_col}")),
    ).select(
        F.col(f"x.{id_col}").alias("id_a"),
        F.col(f"y.{id_col}").alias("id_b"),
        *[
            F.lit(v).cast(score_types[c]).alias(c)
            for c, v in zip(score_cols, intra_values)
        ],
    )
    return cross.unionByName(intra)


def simhash_signatures_df(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 32,
    portable: bool = True,
) -> DataFrame:
    """Per-doc SimHash → (id, simhash): bit j of the signature =
    majority vote of bit j across distinct-token hashes.

    Plan shape mirrors ``minhash_signatures_df``: explode tokens → one
    codegen'd hash per token → groupBy(id) with ``bits`` cheap
    ``sum(bit±1)`` vote aggregates → recombine bits. The per-bit
    ``aggregate``-fold formulation this replaces re-hashed every token
    once per bit (interpreted HOFs, no subexpression elimination) —
    32× the md5 work.
    """
    toks = F.array_distinct(F.split(F.col(text_col), " "))
    hashed = df.select(F.col(id_col), F.explode(toks).alias("_t")).select(
        F.col(id_col), hash64(F.col("_t"), portable=portable).alias("_h")
    )
    votes = hashed.groupBy(id_col).agg(
        *[
            F.sum(F.shiftright("_h", j).bitwiseAND(F.lit(1)) * 2 - 1).alias(f"_v{j}")
            for j in range(bits)
        ]
    )
    sig = F.lit(0).cast("long")
    for j in range(bits):
        sig = sig + F.when(F.col(f"_v{j}") > 0, F.lit(1 << j).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return votes.select(F.col(id_col), sig.alias("simhash"))


def simhash_dup_groups(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 32
) -> DataFrame:
    """Docs sharing an identical SimHash signature (hamming distance 0
    groups; for distance ≤ k see ``simhash_near_dup_pairs``)."""
    sig = simhash_signatures_df(df, text_col, id_col, bits)
    return sig.groupBy("simhash").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min(id_col).alias("keep_id"),
    )


def simhash_bits_for(n: int) -> int:
    """Corpus-banded SimHash signature width for PAIR-emitting
    searches: a fixed 32-bit signature fixes both the hamming-ball
    density (C(32,≤k)/2³² of RANDOM pairs land inside the radius —
    output itself goes quadratic at corpus scale) and the pigeonhole
    block universe. Banding by a static COUNT(*) keeps the rule
    oracle-mirrorable (a CASE over the same COUNT picks the arm on
    the DuckDB side) and every fixture SF resolves to the original
    32 bits, so gate values never move. 60 is the portable-hash
    ceiling (``hash64`` = 15 hex chars of md5); paired with
    ``simhash_blocks_for`` the top band's combo keys span 30 bits.
    Same precedent as ``similarity.lsh_planes_for`` (the SemDeDup
    fixed-k class)."""
    if n <= 1 << 16:
        return 32
    if n <= 1 << 24:
        return 48
    return 60


def simhash_blocks_for(n: int, max_hamming: int = 3) -> int:
    """Corpus-banded pigeonhole block count. ``max_hamming + 1``
    blocks index single blocks (key universe 2^(bits/b) — 256 at the
    32-bit fixture band); past 2^16 docs the generalized pigeonhole
    kicks in: with ``b`` blocks, two signatures within hamming k
    agree on ≥ b−k WHOLE blocks (≤ k blocks can differ), so indexing
    every (b−k)-subset of blocks is still lossless while the join key
    concatenates b−k block values — universe 2^24 at the 48-bit band
    and 2^30 at the 60-bit band (expected bucket occupancy ≤ 256
    through ~2.7×10¹¹ docs, past a 100 TB corpus), vs the fixed
    2^11 the r9 verdict flagged. Fan-out per doc is C(b, b−k) rows
    (4 → 20 for k=3) — linear, the constant-factor price of killing
    the n²/2^11 candidate term (Manku et al., WWW'07 §3's
    table-multiplication trade, expressed as one equi-join)."""
    if n <= 1 << 16:
        return max_hamming + 1
    return max_hamming + 3


def simhash_near_dup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 32,
    max_hamming: int = 2,
    n_blocks: int | None = None,
) -> DataFrame:
    """Pairs whose SimHash signatures are within ``max_hamming`` bits
    → (id_a, id_b, hamming).

    Pigeonhole candidate generation (the standard scale shape for
    hamming-ball search, cf. Manku et al., WWW'07 §3): split the
    signature into ``n_blocks`` contiguous blocks — two signatures
    within distance ``max_hamming`` MUST agree on at least
    ``n_blocks − max_hamming`` whole blocks — then equi-join on
    (combo_idx, concatenated block values) over every
    (n_blocks − max_hamming)-subset of blocks and verify with
    ``bit_count(xor) ≤ k`` on the colliding candidates. With the
    default ``n_blocks = max_hamming + 1`` the subsets are single
    blocks (the classic split); corpus-banded callers pass
    ``simhash_blocks_for`` to widen the key universe instead of the
    bucket occupancy. Shuffle volume is |docs|×C(b, b−k) small rows
    on combo keys, never |docs|²; recall is exactly 1 (pigeonhole is
    lossless either way), so a brute-force all-pairs oracle must
    return the identical set.

    Scale note: the OUTPUT is quadratic in near-dup group size (a
    class of m mutual near-dups emits m(m-1)/2 pairs — 2.1M pairs on
    the dup-heavy sf0.1 fixture). For corpora with large exact-dup
    classes, collapse to one representative per ``simhash_dup_groups``
    group first and pair-search representatives; plan-side cost here
    is already bucketed either way.
    """
    from itertools import combinations

    if n_blocks is None:
        n_blocks = max_hamming + 1
    if n_blocks <= max_hamming:
        raise ValueError("n_blocks must exceed max_hamming for pigeonhole")
    widths = [
        bits // n_blocks + (1 if i < bits % n_blocks else 0) for i in range(n_blocks)
    ]
    offsets = [sum(widths[:i]) for i in range(n_blocks)]
    combos = list(combinations(range(n_blocks), n_blocks - max_hamming))
    # r13: the signature aggregation (per-token md5 + ``bits`` partial
    # sums per doc) feeds BOTH legs of the combo-key self-join below,
    # and each DataFrame reference replays the whole build (the plan
    # showed two full scan→explode→md5→32-sum towers). Checkpoint the
    # |docs|-row signature table once; both legs read materialized
    # blocks.
    sig = simhash_signatures_df(df, text_col, id_col, bits).localCheckpoint(
        eager=True
    )

    def _block_of(col: Column, i: int) -> Column:
        return F.shiftright(col, offsets[i]).bitwiseAND(F.lit((1 << widths[i]) - 1))

    def _combo_key(col: Column, combo: tuple[int, ...]) -> Column:
        # concatenate the combo's block values into one ≤ 60-bit long
        key = _block_of(col, combo[0])
        for i in combo[1:]:
            key = F.shiftleft(key, widths[i]) + _block_of(col, i)
        return key

    melted = sig.select(
        id_col,
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(ci).alias("combo_idx"),
                        _combo_key(F.col("simhash"), combo).alias("combo_key"),
                    )
                    for ci, combo in enumerate(combos)
                ]
            )
        ).alias("b"),
    ).select(id_col, "simhash", "b.combo_idx", "b.combo_key")
    a, b = melted.alias("a"), melted.alias("b")

    # First-agreeing-combo guard: a pair whose signatures agree on m
    # of the indexed block subsets would surface m times from the
    # equi-join; instead of deduping with a distinct() — a full
    # shuffle of the PAIR stream, the one quadratic-in-group-size
    # artifact — emit only from the lexicographically-first agreeing
    # subset. The guard is a pure expression on the carried
    # signatures (no earlier subset may fully agree), so the join
    # output flows straight to the verify filter with no post-join
    # exchange at all.
    sig_a, sig_b = F.col("a.simhash"), F.col("b.simhash")
    earlier_agrees = F.lit(False)
    for cj, combo in enumerate(combos[:-1]):
        agrees = F.lit(True)
        for blk in combo:
            agrees = agrees & (_block_of(sig_a, blk) == _block_of(sig_b, blk))
        earlier_agrees = earlier_agrees | (
            (F.lit(cj) < F.col("a.combo_idx")) & agrees
        )
    cand = a.join(
        b,
        (F.col("a.combo_idx") == F.col("b.combo_idx"))
        & (F.col("a.combo_key") == F.col("b.combo_key"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        & ~earlier_agrees,
    ).select(
        F.col(f"a.{id_col}").alias("id_a"),
        F.col(f"b.{id_col}").alias("id_b"),
        F.col("a.simhash").alias("sig_a"),
        F.col("b.simhash").alias("sig_b"),
    )
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return cand.where(hamming <= max_hamming).select(
        "id_a", "id_b", hamming.cast("int").alias("hamming")
    )


# --- exact duplicated-substring spans (Lee et al. 2022 shape) -----------------

def duplicated_ngram_spans(
    docs: DataFrame, n: int = 4, min_count: int = 2, id_col: str = "doc_id"
) -> DataFrame:
    """Per-document merged spans of tokens covered by any n-gram that
    occurs ≥ min_count times in the WHOLE corpus — the distributed
    fixed-length approximation of exact-substring training-data dedup
    (Lee et al. 2022 use suffix arrays on one machine; a fixed n with
    a gram-hash shuffle is the standard horizontally-scalable shape:
    every length-≥n duplicated substring is exactly the union of its
    duplicated n-gram windows, which is what the span merge computes).

    Shape: gram hashes built array-side (one ``transform`` per doc —
    tokens never explode), ONE shuffle keyed on the 60-bit gram hash
    to find global duplicates, one membership join back, then a
    per-doc window pass (gaps-and-islands: running-max end, island =
    cumsum of gap starts) that merges overlapping-or-adjacent windows
    into maximal spans. Output is quadratic in nothing — ≤ one row
    per (doc, maximal span).

    Returns one row per doc that has ≥ 1 duplicated span:
    ``doc_id, n_tokens, n_spans, dup_tokens, dup_frac_e4`` (the
    fraction ships as integer-division basis points — float-free)."""
    toks = tokens(F.col("text"))
    d = docs.select(
        F.col(id_col), toks.alias("toks")
    ).where(F.size("toks") >= n)
    gram_hashes = F.transform(
        F.sequence(F.lit(1), F.size("toks") - (n - 1)),
        lambda i: hash64(F.array_join(F.slice(F.col("toks"), i, n), " ")),
    )
    g = d.select(
        id_col,
        F.size("toks").alias("n_tokens"),
        F.posexplode(gram_hashes).alias("p", "h"),
    ).select(
        id_col,
        "n_tokens",
        (F.col("p") + 1).alias("start"),
        (F.col("p") + n).alias("end"),
        "h",
    )
    # r13: the duplicate-gram membership used to be a groupBy(h) →
    # semi-join back onto g, which evaluated the gram build (tokenize
    # + per-window hash + posexplode — the expensive part) TWICE and
    # shuffled it twice. A count over the h-partition computes the
    # same corpus-wide frequency with ONE evaluation and ONE shuffle
    # of g; rows with c >= min_count are exactly the old join output.
    w_h = Window.partitionBy("h")
    hits = (
        g.withColumn("c", F.count(F.lit(1)).over(w_h))
        .where(F.col("c") >= min_count)
        .select(id_col, "n_tokens", "start", "end")
    )
    w_prev = (
        Window.partitionBy(id_col)
        .orderBy("start")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy(id_col)
        .orderBy("start")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    prev_end = F.max("end").over(w_prev)
    is_new = (
        prev_end.isNull() | (F.col("start") > prev_end + 1)
    ).cast("int")
    isl = hits.withColumn("island", F.sum(is_new).over(w_run))
    spans = isl.groupBy(id_col, "island").agg(
        F.first("n_tokens").alias("n_tokens"),
        F.min("start").alias("s"),
        F.max("end").alias("e"),
    )
    return spans.groupBy(id_col, "n_tokens").agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum(F.col("e") - F.col("s") + 1).alias("dup_tokens"),
    ).select(
        id_col,
        "n_tokens",
        "n_spans",
        "dup_tokens",
        F.expr("dup_tokens * 10000 div n_tokens").alias("dup_frac_e4"),
    )


# --- incremental (cross-run) dedup -------------------------------------------


def minhash_band_table(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = DEFAULT_NUM_HASHES,
    bands: int = DEFAULT_BANDS,
    ngram: int = 3,
) -> DataFrame:
    """The persistable LSH index of a frozen corpus: one row per
    (doc, band) — ``(id, band_idx, band_key)``.

    This is the artifact a training-data pipeline writes once per
    corpus freeze and probes on every new crawl shard (see
    ``incremental_minhash_matches``). At 100 TB the table is written
    bucketed by ``band_key`` so shard probes are join-pruned to the
    colliding buckets; row count is |corpus| × bands regardless of
    document size."""
    sig = minhash_signatures_df(df, text_col, id_col, num_hashes, ngram)
    return sig.select(
        F.col(id_col), F.array(*minhash_bands(num_hashes, bands)).alias("bands")
    ).select(id_col, F.posexplode("bands").alias("band_idx", "band_key"))


def incremental_minhash_matches(
    new_docs: DataFrame,
    corpus_docs: DataFrame,
    corpus_band_table: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = DEFAULT_NUM_HASHES,
    bands: int = DEFAULT_BANDS,
    ngram: int = 3,
    threshold: float = 0.7,
) -> DataFrame:
    """Cross-run dedup: probe a NEW shard against the persisted band
    table of a FROZEN corpus — the missing piece between within-corpus
    dedup and a real ingestion pipeline, where each day's crawl must
    be deduped against everything already accepted without ever
    re-signing the corpus.

    Plan shape (the scale design): the new shard's banded signatures
    are tiny relative to the corpus, so the probe side is BROADCAST
    into the candidate equi-join on (band_idx, band_key) — the frozen
    band table is never re-shuffled (and in production is read
    bucketed by band_key, so the scan itself prunes to colliding
    buckets). Candidates collapse to distinct (new_id, corpus_id)
    pairs (bounded by collisions, never |new|×|corpus|), then exact
    Jaccard verifies each pair: the candidate set joins the corpus
    text by id — again broadcast-able, touching only matched corpus
    docs. One row per new doc: its best surviving match (highest
    Jaccard, ties to the smallest corpus id) or NULLs if clean.

    Returns ``(new_id, matched_corpus_id, jaccard, is_dup)``.
    """
    sig = minhash_signatures_df(new_docs, text_col, id_col, num_hashes, ngram)
    probe = sig.select(
        F.col(id_col), F.array(*minhash_bands(num_hashes, bands)).alias("bands")
    ).select(
        F.col(id_col).alias("new_id"),
        F.posexplode("bands").alias("band_idx", "band_key"),
    )
    cand = (
        F.broadcast(probe)
        .join(
            corpus_band_table.select(
                F.col(id_col).alias("corpus_id"), "band_idx", "band_key"
            ),
            ["band_idx", "band_key"],
        )
        .select("new_id", "corpus_id")
        .distinct()
    )

    def _shingles(df: DataFrame, out_id: str) -> DataFrame:
        return df.select(
            F.col(id_col).alias(out_id),
            F.array_distinct(word_ngrams(F.col(text_col), ngram)).alias(f"sh_{out_id}"),
        )

    verified = (
        F.broadcast(cand)
        .join(_shingles(corpus_docs, "corpus_id"), "corpus_id")
        .join(F.broadcast(_shingles(new_docs, "new_id")), "new_id")
        .withColumn(
            "jaccard",
            F.round(
                F.size(F.array_intersect("sh_new_id", "sh_corpus_id"))
                / F.size(F.array_union("sh_new_id", "sh_corpus_id")),
                4,
            ),
        )
        .where(F.col("jaccard") >= threshold)
    )
    best = verified.groupBy("new_id").agg(
        F.max_by(
            F.struct(F.col("corpus_id"), F.col("jaccard")),
            F.struct(F.col("jaccard").alias("j"), (-F.col("corpus_id")).alias("nid")),
        ).alias("m")
    )
    return (
        new_docs.select(F.col(id_col).alias("new_id"))
        .join(best, "new_id", "left")
        .select(
            "new_id",
            F.col("m.corpus_id").alias("matched_corpus_id"),
            F.col("m.jaccard").alias("jaccard"),
            F.col("m").isNotNull().alias("is_dup"),
        )
    )
