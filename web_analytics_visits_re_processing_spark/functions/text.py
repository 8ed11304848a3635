"""Text-analysis column functions — all native expressions (no UDFs).

Portable-hash convention: anywhere a hash must be reproducible outside
Spark (DuckDB oracles, cross-engine fingerprints) we use
``md5 → first 15 hex digits → base-16 to bigint`` — 60 bits, exact in
any engine with ``md5`` (DuckDB: ``('0x' || substring(md5(x),1,15))::BIGINT``).
xxhash64 would be faster but is Spark-specific; swap via ``hash64``'s
``portable=False`` on a closed Spark-only pipeline.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Minimal multi-language stopword sets for the n-gram language-ID
# heuristic and quality scoring (public common-word lists).
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it", "for", "on"],
    "de": ["der", "die", "das", "und", "ist", "ein", "zu", "mit", "von", "auf"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es", "por", "con"],
    "fr": ["le", "la", "de", "et", "un", "est", "que", "pour", "dans", "sur"],
}


def tokens(text: Column | str, sep: str = " ") -> Column:
    return F.split(text, sep)


def hash64(col: Column, portable: bool = True) -> Column:
    """60-bit deterministic hash; portable variant reproducible in any
    SQL engine via md5 (see module doc)."""
    if portable:
        return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")
    return F.xxhash64(col)


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text))


def distinct_token_count(text: Column | str) -> Column:
    return F.size(F.array_distinct(tokens(text)))


def avg_token_length(text: Column | str) -> Column:
    t = F.col(text) if isinstance(text, str) else text
    return F.round(
        (F.length(t) - token_count(t) + 1) / token_count(t), 4
    )


def stopword_count(text: Column | str, lang: str = "en") -> Column:
    words = STOPWORDS[lang]
    return F.size(F.filter(tokens(text), lambda t: t.isin(*words)))


def quality_score(text: Column | str) -> Column:
    """Heuristic [0,1] quality: rewards stopword presence and sane
    token lengths, penalizes very short docs — the standard cheap
    pre-filter before expensive LLM-pipeline stages."""
    t = F.col(text) if isinstance(text, str) else text
    n = token_count(t)
    sw_ratio = stopword_count(t) / n
    len_ok = F.when((avg_token_length(t) >= 2) & (avg_token_length(t) <= 12), 1.0).otherwise(0.3)
    size_ok = F.when(n >= 10, 1.0).otherwise(n / 10.0)
    return F.round((0.4 * sw_ratio + 0.3 * len_ok + 0.3 * size_ok), 4)


def exact_fingerprint(text: Column | str) -> Column:
    """Order-sensitive exact-dup fingerprint."""
    return F.md5(text)


def shingle_fingerprint(text: Column | str) -> Column:
    """Order-insensitive content fingerprint: md5 over the sorted
    distinct token set."""
    return F.md5(F.array_join(F.array_sort(F.array_distinct(tokens(text))), " "))


# BPE-ish pre-tokenization pattern (word / number / single symbol —
# the coarse split BPE vocabularies start from, without the merges
# table). Deliberately restricted to a regex subset that Java
# (Spark) and RE2 (DuckDB) evaluate identically: char classes,
# alternation, + — no lookarounds, no \p classes.
BPE_TOKEN_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


def bpe_tokens(text: Column | str) -> Column:
    """Regex pre-tokenization (words, integers, single symbols)."""
    t = F.col(text) if isinstance(text, str) else text
    return F.regexp_extract_all(t, F.lit(BPE_TOKEN_PATTERN), F.lit(0))


def bpe_token_count(text: Column | str) -> Column:
    return F.size(bpe_tokens(text))


def max_element_count(arr: Column | str) -> Column:
    """Count of the MOST FREQUENT element of a string array — the
    Gopher-style top-token repetition numerator — as INT, NULL on an
    empty array (matching ``array_max(transform(array_distinct(a),
    e -> size(filter(a, x -> x = e))))``, the form this replaces).

    The distinct×filter form is QUADRATIC per row (for each distinct
    element the whole array is re-scanned by an interpreted lambda);
    equal elements are adjacent after ``array_sort``, so one
    run-length fold gets the same maximum in O(n log n) comparisons
    and a single pass."""
    a = F.col(arr) if isinstance(arr, str) else arr
    folded = F.aggregate(
        F.array_sort(a),
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(acc["prev"].isNotNull() & (x == acc["prev"]), acc["run"] + 1)
            .otherwise(F.lit(1))
            .alias("run"),
            F.greatest(
                acc["best"],
                F.when(
                    acc["prev"].isNotNull() & (x == acc["prev"]), acc["run"] + 1
                ).otherwise(F.lit(1)),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    return F.when(F.size(a) > 0, folded).cast("int")


def word_ngrams(text: Column | str, n: int = 3) -> Column:
    """Token n-gram shingles via transform over sliding offsets —
    native, no UDF: shingle i = tokens[i..i+n-1] joined by space.

    Lambda-rebinding note (the winnowing lesson): Catalyst does no
    CSE across lambda scopes, so ``slice(toks, i, n)`` re-evaluates
    the ``split`` subtree once per offset — O(n_grams · n_chars) per
    doc. Harmless at survey doc sizes (≤ ~600 chars), and the SINGLE
    rebound subtree here is one split (the winnowing column form
    rebound an n_grams-deep md5 pipeline per window — quadratic in
    md5 calls — and was replaced by ``winnowing_posting``). For
    100 KB-class documents, posexplode tokens + ``lead`` windows
    (the ``winnowing_posting`` pattern) is the scale form."""
    toks = tokens(text)
    offsets = F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(1)))
    return F.transform(
        offsets, lambda i: F.array_join(F.slice(toks, i, F.lit(n)), " ")
    )


def winnowing_posting(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram: int = 3,
    window: int = 4,
):
    """Winnowing as a RELATIONAL posting table: (id, fp) with one row
    per DISTINCT selected fingerprint per document — value-identical
    to ``winnowing_fingerprints`` (equivalence pinned in pytest), but
    linear per token where the HOF column form is quadratic per doc:
    Catalyst does not common-subexpression-eliminate across lambda
    scopes, so the nested ``transform(... slice(hs, i, w))`` re-binds
    the ENTIRE k-gram-hash subtree per window (n_windows × n_grams
    md5 evaluations per document — measured ~17 ms/doc on 54-token
    docs, 88 s for 5 000 of them). Here each stage is a real
    projection evaluated once per ROW: posexplode tokens, n-gram via
    ``lead`` windows, hash, per-window minima via a rows-frame MIN,
    then DISTINCT. Scale: two doc-partitioned window passes + one
    distinct — shuffle-partitioned by document id, linear in corpus
    token count, the form the cross-doc posting join wants anyway."""
    from pyspark.sql import Window

    wd = Window.partitionBy(id_col).orderBy("pos")
    toks = df.select(
        id_col, F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "tok")
    )
    leads = [F.lead("tok", k).over(wd) for k in range(1, ngram)]
    grams = toks.select(
        id_col,
        "pos",
        F.count(F.lit(1)).over(Window.partitionBy(id_col)).alias("n_toks"),
        F.concat_ws(" ", F.col("tok"), *leads).alias("gram"),
        leads[-1].isNotNull().alias("full"),
    ).where(
        # one gram per sliding offset; docs shorter than the n-gram
        # keep their single join-of-everything gram (the column form's
        # greatest(size-n+1, 1) rule)
        F.col("full") | ((F.col("pos") == 0) & (F.col("n_toks") < ngram))
    )
    hashes = grams.select(
        id_col,
        "pos",
        F.col("n_toks"),
        hash64(F.col("gram")).alias("h"),
    )
    n_grams = F.greatest(F.col("n_toks") - (ngram - 1), F.lit(1))
    wmin = hashes.select(
        id_col,
        "pos",
        n_grams.alias("n_grams"),
        F.min("h")
        .over(wd.rowsBetween(Window.currentRow, window - 1))
        .alias("fp"),
    ).where(
        # window starts: 1..n_grams-window+1 (0-based pos <= n_grams-window),
        # or the single truncated window when n_grams < window
        (F.col("pos") <= F.col("n_grams") - window)
        | ((F.col("pos") == 0) & (F.col("n_grams") < window))
    )
    return wmin.select(id_col, "fp").distinct()


def winnowing_fingerprints(
    text: Column | str, ngram: int = 3, window: int = 4
) -> Column:
    """Winnowing document fingerprints (Schleimer et al., SIGMOD'03 —
    the MOSS scheme): hash every positional k-gram (rolling sequence,
    duplicates kept), slide a window of ``window`` consecutive hashes,
    keep each window's minimum → sorted distinct selections.

    Guarantees: any shared substring of ≥ window+ngram-1 tokens
    between two documents contributes at least one IDENTICAL
    fingerprint — the property plagiarism/overlap detection needs and
    plain MinHash doesn't give. Portable-hash based, so the whole
    construction replays in SQL for the oracle.
    """
    grams = word_ngrams(text, ngram)  # positional, duplicates kept
    hs = F.transform(grams, lambda s: hash64(s))
    n_windows = F.greatest(F.size(hs) - (window - 1), F.lit(1))
    mins = F.transform(
        F.sequence(F.lit(1), n_windows),
        lambda i: F.array_min(F.slice(hs, i, F.lit(window))),
    )
    return F.array_sort(F.array_distinct(mins))
