"""Deduplication operators for web-scale training corpora (documents table).

Five families (task brief): exact (hash groupBy), MinHash+LSH banding,
SimHash, word-n-gram Jaccard, embedding-cosine near-dup. Everything is pure
Column logic / relational algebra — no Python on the data path — so each
operator both stays in whole-stage codegen and has an exact DuckDB oracle.

Scale shape notes (the part that matters at 100 TB):
- exact dedup: one hash agg on a 16-byte digest — shuffle width is (digest,
  doc_id), partial-agg'd map-side.
- MinHash banding: signatures AND band keys are computed scan-side (no
  shuffle); the shuffles are the band-key membership collection (one hash
  exchange, window-count-bounded state — ``_grouped_docs_bounded``) and
  the pair agg; oversized buckets get capped exactly like
  pairs.candidate_pairs, and pairs are generated JVM-side from each
  bucket's member list — never a bucket self-join.
- Jaccard pairs: shingle explode → one hash exchange on which a window
  count sizes each shingle's doc set BEFORE the list is collected →
  JVM-side pair combinations → per-pair intersection counts (union size =
  |A|+|B|−∩ needs no second pass). A shingle shared by n docs yields n²/2
  pairs, so globally-hot shingles (document frequency > ``max_df`` —
  boilerplate headers, licence blurbs) are DROPPED before any pair exists
  — without ever materializing their doc lists (see
  ``_grouped_docs_bounded``) — from both the intersections and the per-doc
  set sizes; the drop is surfaced by ``dropped_shingles`` (no silent caps).
- hash functions: md5-derived 60-bit ints by default (bit-identical to the
  DuckDB oracles); pass ``fast_hash=True`` for xxhash64 on the production /
  bench path (~3× faster, Spark-only — same dataflow shape).
- cosine near-dup: brute force is O(n²) — only for gold/test scale; the
  LSH-bucketed variant in similarity_search bounds candidates per bucket.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from address_parser_spark.operators.partitioning import fan_out
from address_parser_spark.operators.textquality import _md5_60, tokens_col

MINHASH_P = 2147483647  # Mersenne 2^31-1: a·h+b < 2^63 under ANSI arithmetic

DEFAULT_MAX_DF = 200  # shingle document-frequency cap for the Jaccard self-join


# Deterministic (a, b) parameter table shared with the SQL oracle.
MINHASH_PARAMS: list[tuple[int, int]] = [
    ((17 * (j + 1) ** 2 + 31 * (j + 1) + 7) % MINHASH_P or 1, (101 * (j + 1) ** 3 + 13) % MINHASH_P)
    for j in range(8)
]


def word_shingles_col(text: Column, k: int = 3) -> Column:
    """Distinct word k-shingles of lowercased whitespace-split text.

    NOTE: the token array is inlined in the per-position transform lambda, so
    Catalyst re-tokenizes the text once per shingle position (no loop-invariant
    hoisting inside higher-order functions). Fine for one-off expressions over
    short strings; every data-path caller should use ``with_word_shingles``,
    which stages the token array as a real column first."""
    toks = tokens_col(F.lower(text))
    n = F.size(toks)
    sh = F.when(
        n >= k,
        F.transform(F.sequence(F.lit(1), n - (k - 1)), lambda i: F.concat_ws(" ", F.slice(toks, i, k))),
    ).otherwise(F.array(F.concat_ws(" ", toks)))
    return F.array_distinct(sh)


def with_word_shingles(df: DataFrame, text_col: str, k: int = 3, out: str = "_sh") -> DataFrame:
    """``df`` + a distinct word-k-shingle array column ``out``.

    Tokens are staged as a REAL column before the shingle transform: the
    lambda body then references a cheap attribute instead of re-running
    split+filter per shingle position (CollapseProject leaves multi-referenced
    non-trivial aliases staged — the same trap ``fingerprints`` documents)."""
    toks = F.col("_wsh_toks")
    n = F.size(toks)
    sh = F.when(
        n >= k,
        F.transform(F.sequence(F.lit(1), n - (k - 1)), lambda i: F.concat_ws(" ", F.slice(toks, i, k))),
    ).otherwise(F.array(F.concat_ws(" ", toks)))
    return (
        df.withColumn("_wsh_toks", tokens_col(F.lower(F.col(text_col))))
        .withColumn(out, F.array_distinct(sh))
        .drop("_wsh_toks")
    )


def with_hashed_shingles(df: DataFrame, text_col: str, k: int, fast_hash: bool,
                         out: str = "_shh_arr") -> DataFrame:
    """``df`` + an array<long> column of DISTINCT word-k-shingle hashes.

    The fast path hashes each token slice directly (``xxhash64`` recurses
    into array elements) — the shingle STRING is never built, so the scan
    stage skips one ``concat_ws`` allocation + UTF8 re-hash per shingle
    instance and dedups over longs instead of strings. That matters beyond
    constant factors: the memory-bandwidth probe recorded in BASELINE.md
    shows this box's per-core bandwidth collapsing 2.9 → 1.1 GB/s from 4- to
    16-wide, so allocation-heavy scan stages are what break the N→4N scaling
    target — fewer bytes touched per row is a scaling fix, not a micro-opt.
    The md5 path keeps the string formulation byte-compatible with the
    DuckDB oracles. Hash-collision risk on the fast path is the usual
    64-bit birthday bound (~1e-8 at a billion distinct shingles)."""
    if not fast_hash:
        sh = with_word_shingles(df, text_col, k, out="_hsh_str")
        return sh.withColumn(
            out, F.transform(F.col("_hsh_str"), lambda s: _md5_60(s))
        ).drop("_hsh_str")
    toks = F.col("_hsh_toks")
    n = F.size(toks)
    hashed = F.when(
        n >= k,
        F.transform(F.sequence(F.lit(1), n - (k - 1)), lambda i: F.xxhash64(F.slice(toks, i, k))),
    ).otherwise(F.array(F.xxhash64(toks)))
    return (
        df.withColumn("_hsh_toks", tokens_col(F.lower(F.col(text_col))))
        .withColumn(out, F.array_distinct(hashed))
        .drop("_hsh_toks")
    )


def exact_duplicates(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact dedup: (doc_id, content hash, group size, is_canonical) — the
    canonical representative is the minimum doc_id per digest."""
    h = fan_out(docs).select("doc_id", F.md5(F.lower(F.col(text_col))).alias("content_md5"))
    groups = h.groupBy("content_md5").agg(
        F.count(F.lit(1)).alias("dup_count"), F.min("doc_id").alias("canonical_doc_id")
    )
    return (
        h.join(groups, "content_md5")
        .select(
            "doc_id", "content_md5", "dup_count",
            (F.col("doc_id") == F.col("canonical_doc_id")).alias("is_canonical"),
        )
    )


def _minhash_sig_structs(docs: DataFrame, text_col: str, k: int,
                         fast_hash: bool) -> DataFrame:
    """(doc_id, _sig array<struct<h_idx,minhash>>) — the full signature
    computed map-side in one pass over the scan; no shuffle.

    The 8 permutations are computed inside ONE ``transform`` over a literal
    (h_idx, a, b) parameter array, so the hashed-shingle expression is
    referenced exactly once. Eight sibling per-permutation structs each
    referencing a staged `_sh_hashed` column measured 9 inlined copies of the
    whole shingle pipeline in the optimized plan (~37 s vs ~4 s at sf0.1):
    with the struct array feeding a Generate, column pruning rewrites past
    the staging projection and CollapseProject's multi-reference guard never
    sees the alias. A single reference can be inlined at most once, so the
    plan shape is immune to that rule interplay by construction (guarded by
    tests/test_plan_audit.py). pmod maps signed hashes into [0, P) so
    xxhash64 and the unsigned md5-60 ints behave identically under the
    permutation."""
    staged = with_hashed_shingles(fan_out(docs), text_col, k, fast_hash).withColumn(
        "_sh_hashed",
        F.transform(F.col("_shh_arr"), lambda h: F.pmod(h, F.lit(MINHASH_P))),
    )
    params = F.array(*[
        F.struct(
            F.lit(j).alias("h_idx"), F.lit(a).alias("a"), F.lit(b).alias("b")
        )
        for j, (a, b) in enumerate(MINHASH_PARAMS)
    ])
    sig = F.transform(
        params,
        lambda p: F.struct(
            p["h_idx"].alias("h_idx"),
            F.coalesce(
                F.array_min(
                    F.transform(
                        F.col("_sh_hashed"),
                        lambda h: F.pmod(p["a"] * h + p["b"], F.lit(MINHASH_P)),
                    )
                ),
                F.lit(MINHASH_P),
            ).alias("minhash"),
        ),
    )
    return staged.select("doc_id", sig.alias("_sig"))


def minhash_signatures(docs: DataFrame, text_col: str = "text", k: int = 3,
                       fast_hash: bool = False) -> DataFrame:
    """8-permutation MinHash signature per document, exploded one row per
    hash index: (doc_id, h_idx, minhash). Cross-engine deterministic with the
    default md5 shingle hashing; ``fast_hash=True`` switches to xxhash64 for
    the production/bench path (signatures differ but dedup semantics and the
    dataflow shape are identical)."""
    return _minhash_sig_structs(docs, text_col, k, fast_hash).select(
        "doc_id", F.explode("_sig").alias("s")
    ).select("doc_id", F.col("s.h_idx").alias("h_idx"), F.col("s.minhash").alias("minhash"))


def _grouped_docs_bounded(rows: DataFrame, key: str, cap: int,
                          value: Column | None = None,
                          out: str = "docs") -> DataFrame:
    """(key, df=instance count, ``out``=sorted ``value`` array) for keys
    with df <= cap, with BOUNDED aggregation state on corpus-hot keys and
    ONE wide shuffle of the instances. ``value`` defaults to ``doc_id``;
    pairs.candidate_pairs reuses this exact shape with a struct value —
    keep the implementations shared so the single-exchange plan guarantee
    is tested once and holds for both.

    A naive ``groupBy(key).agg(collect_list(doc_id)).filter(size <= cap)``
    materializes the FULL doc list of every key before the filter — one
    boilerplate shingle shared by millions of documents puts a multi-million-
    element array in a single aggregation buffer (OOM / extreme skew) even
    though the key is discarded the next instant. Instead the instances are
    hash-partitioned by key ONCE, and everything downstream rides that same
    exchange (Spark writes the shuffle once and re-reads it per consumer —
    ReusedExchange):

      1. ``df`` per key: a window count over the partition — WindowExec
         buffers one key group at a time in a SPILLABLE row array
         (ExternalAppendOnlyUnsafeRowArray), so a hot key costs disk, never
         an OOM;
      2. the df <= cap filter drops every hot key's instances BEFORE any
         list exists;
      3. the collect_list — its state is now ≤ cap elements per key by
         construction, and the window's clustering satisfies its
         distribution, so no second exchange.

    Results are bit-identical to the naive formulation (and the DuckDB
    oracles): exact df, exact multiset doc lists, same-doc multiplicity
    preserved. Two alternatives were built and rejected on measurement:
    a salted two-stage collection (pre-aggregation cannot compress
    mostly-unique keys — the normal shingle distribution — so it
    re-shuffled ~every instance with array overhead on top, −26% on the
    800k-doc sweep) and a count-aggregate + co-partitioned semi-join
    (column-pruning divergence defeats ReuseExchange, so the instances
    shipped twice). The plan-shape test below pins the single-exchange
    property."""
    from pyspark.sql.window import Window

    value = F.col("doc_id") if value is None else value
    inst = rows.repartition(F.col(key))
    return (
        inst.withColumn("df", F.count(F.lit(1)).over(Window.partitionBy(key)))
        .filter(F.col("df") <= cap)
        .groupBy(key, "df")
        .agg(F.array_sort(F.collect_list(value)).alias(out))
        .select(key, "df", out)
    )


def _doc_pairs_per_bucket(grouped: DataFrame, docs_col: str = "docs") -> DataFrame:
    """All (doc_a < doc_b) pairs from each row's SORTED doc_id array,
    generated JVM-side (``transform × slice`` combinations — the same
    two-shuffle shape as pairs.candidate_pairs, no self-join). Duplicate
    ids inside one array contribute multiplicity, same-doc pairs are
    skipped."""
    ds = F.col(docs_col)
    return (
        grouped.select(
            F.explode(
                F.flatten(
                    F.transform(
                        ds,
                        lambda x, i: F.transform(
                            F.slice(ds, i + 2, F.size(ds)),
                            lambda y: F.struct(x.alias("a"), y.alias("b")),
                        ),
                    )
                )
            ).alias("p")
        )
        .filter(F.col("p.a") != F.col("p.b"))
        .select(F.col("p.a").alias("doc_a"), F.col("p.b").alias("doc_b"))
    )


def minhash_band_pairs(docs: DataFrame, text_col: str = "text", rows_per_band: int = 2,
                       max_block: int = 50, fast_hash: bool = False) -> DataFrame:
    """LSH banding → candidate near-dup pairs (doc_a < doc_b, shared bands).

    Band keys are computed map-side from the per-doc signature array (the
    previous formulation exploded the signature and shuffled 8 rows/doc just
    to regroup them); bucket membership is collected with BOUNDED per-key
    state (``_grouped_docs_bounded`` — degenerate buckets like the
    all-short-docs band can hold millions of members before the
    ``max_block`` filter discards them), then one hash-agg by pair counts
    shared bands."""
    if rows_per_band <= 0 or len(MINHASH_PARAMS) % rows_per_band:
        raise ValueError(
            f"rows_per_band={rows_per_band} must divide the signature size "
            f"{len(MINHASH_PARAMS)} — trailing permutations would be silently dropped"
        )
    sig = _minhash_sig_structs(docs, text_col, 3, fast_hash)
    n_bands = len(MINHASH_PARAMS) // rows_per_band
    # Per band: xxhash64("<band>#<sorted 'h_idx:minhash' members joined by
    # ','>"). The key is INTERNAL — the query's output is (doc_a, doc_b,
    # shared_bands) and the DuckDB oracle groups by its own raw member
    # string — so any injective-enough key over the same member string
    # yields identical buckets. An 8-byte long shuffles 4× narrower than
    # the previous 32-char md5 hex and hashes cheaper; 64-bit collision
    # posture is the same as ``mid``/``fast_hash`` (birthday bound ~1e-8 at
    # a billion distinct buckets).
    band_keys = []
    for j in range(n_bands):
        members = F.array(*[
            F.concat_ws(
                ":",
                F.lit(str(i)),
                F.element_at(F.col("_sig"), i + 1)["minhash"].cast("string"),
            )
            for i in range(j * rows_per_band, (j + 1) * rows_per_band)
        ])
        band_keys.append(
            F.xxhash64(F.concat_ws("#", F.lit(str(j)), F.array_join(F.array_sort(members), ",")))
        )
    bands = sig.select("doc_id", F.explode(F.array(*band_keys)).alias("bkey"))
    grouped = _grouped_docs_bounded(bands, "bkey", max_block).filter(F.col("df") >= 2)
    return (
        _doc_pairs_per_bucket(grouped)
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("shared_bands"))
    )


def simhash32(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """32-bit SimHash over word tokens (md5-hashed; bit b of the fingerprint
    is the sign of the per-bit vote sum, votes weighted by term frequency).

    ZERO shuffle: SimHash is per-document math, so the 32 vote counters are
    folded map-side in ONE ``F.aggregate`` pass over the token-hash array
    (struct-of-32 accumulator). The previous explode → groupBy(doc_id)
    formulation shuffled every token INSTANCE — at web scale that is a
    shuffle of the whole tokenized corpus to compute a per-row value. The
    hashed array is referenced exactly once, so the plan is immune to the
    CollapseProject/Generate re-inlining trap by construction (the minhash
    lesson, tests/test_plan_audit.py). Docs with no tokens are dropped,
    matching the explode semantics (and the DuckDB oracle) — via a
    whitespace-only-text predicate applied BEFORE fan_out, deliberately:
    a `size(tokens) > 0` filter gets predicate-pushed below the staging
    projection AND the repartition, re-running the whole tokenization a
    second time serially at the scan (measured on the optimized plan);
    ``rlike '\\S'`` is scan-cheap and prunes exactly the zero-token rows
    (tokens_col drops whitespace-only splits — trim() would miss
    tab/newline-only texts, which trim spaces only)."""
    # Hash array staged as a REAL column (md5 evaluated once per token — the
    # CollapseProject/Generate re-inlining guard, see minhash_signatures /
    # test_plan_audit; plan-verified: one md5, one split). Per bit, the vote
    # sign reduces to a POPCOUNT comparison: votes_b = ones_b − (n − ones_b),
    # so bit b is set iff 2·ones_b > n. 32 scalar int-add aggregates over the
    # staged array replace the previous single aggregate that allocated a
    # fresh 32-field struct PER TOKEN — same operation count, zero per-token
    # allocation (measured 0.52 → 0.30 s warm at sf0.1; bit-identical on all
    # 5000 fixture docs).
    hashed = F.col("_simh_hs")
    n = F.size(hashed)

    def _popcount(b: int) -> Column:
        # integer bit extraction — float division would lose low bits
        return F.aggregate(
            hashed,
            F.lit(0),
            lambda acc, h: acc + F.shiftright(h, b).bitwiseAND(F.lit(1)).cast("int"),
        )

    fingerprint = None
    for b in range(32):
        ones = _popcount(b)
        bit = F.when(ones * 2 > n, F.lit(1 << b)).otherwise(F.lit(0))
        fingerprint = bit if fingerprint is None else fingerprint + bit
    return (
        fan_out(docs.filter(F.col(text_col).rlike(r"\S")))
        .withColumn("_simh_toks", tokens_col(F.lower(F.col(text_col))))
        .withColumn("_simh_hs", F.transform(F.col("_simh_toks"), lambda t: _md5_60(t)))
        .select("doc_id", fingerprint.cast("long").alias("simhash"))
    )


def ngram_jaccard_pairs(docs: DataFrame, text_col: str = "text", k: int = 3,
                        threshold: float = 0.2, max_df: int = DEFAULT_MAX_DF,
                        fast_hash: bool = False) -> DataFrame:
    """Word-k-shingle Jaccard near-dup pairs: explode → hash-agg by shingle
    → JVM-side pair combinations → intersection counts; union = |A|+|B|−∩
    (no second pass, no self-join).

    Shingles with document frequency > ``max_df`` are dropped globally BEFORE
    the self-join (a shingle in n docs produces n²/2 join rows — one piece of
    common boilerplate would otherwise make the join quadratic in corpus
    size). Jaccard is computed over the FILTERED shingle sets on both sides
    of the ratio, so the result is exactly "Jaccard similarity ignoring
    corpus-hot shingles" — which is also the better dedup signal: boilerplate
    shared by everything carries no near-duplicate evidence. Inspect the drop
    with ``dropped_shingles`` (no silent caps)."""
    raw_sh = with_hashed_shingles(fan_out(docs), text_col, k, fast_hash).select(
        "doc_id", F.explode("_shh_arr").alias("shh")
    )
    # ONE shuffle of the shingle instances (window-count sizing + collect
    # on the same exchange): per shingle hash, the sorted multiset of
    # containing docs — same result as the previous count(*)-then-semi-join
    # formulation, which paid three shuffles over the exploded shingles and
    # re-evaluated the shingling per consumer (75% of the dedup-sweep
    # profile). Collection state on corpus-hot shingles is BOUNDED (see
    # _grouped_docs_bounded): the df > max_df boilerplate keys this filter
    # exists for are exactly the ones that would otherwise accumulate
    # million-element arrays before being discarded.
    #
    # NOTE (measured, round 6): the grouped doc lists feed TWO consumers
    # (per-doc sizes, pair intersections), and each consumer re-runs the
    # window sort + df-filter + collect_list pipeline above the ONE reused
    # instance exchange. A staging repartition(shh) after the aggregation is
    # elided by the planner (same-key, same partitioning), so the extra pass
    # cannot be removed that way; timing the duplicated pass at sf0.1 showed
    # it within run-to-run noise (the shuffle — the scale-limiting term — is
    # already shared via ReusedExchange, and the duplicated work is CPU over
    # post-filter compact lists).
    grouped = _grouped_docs_bounded(raw_sh, "shh", max_df)
    # per-doc surviving-shingle counts (compact post-shuffle longs, the
    # exchange below is reused for the pair branch)
    sizes = (
        grouped.select(F.explode("docs").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_sh"))
    )
    inter = (
        _doc_pairs_per_bucket(grouped.filter(F.col("df") >= 2))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    # Cheap integer-arithmetic pre-filter before the rounded ratio: round()
    # goes through BigDecimal/double-to-string per row (a measured 26-thread
    # dtoa hot spot with 1.1M candidate pairs feeding 258 survivors at
    # sf0.1), so it must only run on pairs that can possibly pass. The
    # margin keeps every pair whose ROUNDED ratio could still reach the
    # threshold (round-half-up at 4 decimals moves a value by < 5e-5); the
    # exact rounded filter below is unchanged, so results are bit-identical.
    prefilter = F.col("inter") >= (
        F.lit(threshold - 1e-4) * (F.col("n_a") + F.col("n_b") - F.col("inter"))
    )
    return (
        inter.join(sa, "doc_a").join(sb, "doc_b")
        .filter(prefilter)
        .withColumn("jaccard", F.round(F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter")), 4))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "inter", "jaccard")
    )


def dropped_shingles(docs: DataFrame, text_col: str = "text", k: int = 3,
                     max_df: int = DEFAULT_MAX_DF, fast_hash: bool = False) -> DataFrame:
    """Shingle hashes excluded from ``ngram_jaccard_pairs`` by the document-
    frequency cap — surfaced for lineage/metrics (no silent caps). One row per
    dropped shingle hash with its document frequency."""
    raw_sh = with_hashed_shingles(fan_out(docs), text_col, k, fast_hash).select(
        "doc_id", F.explode("_shh_arr").alias("shh")
    )
    return raw_sh.groupBy("shh").agg(F.count(F.lit(1)).alias("df")).filter(F.col("df") > max_df)


def embedding_near_dups(embeddings: DataFrame, threshold: float = 0.95,
                        bucket_dims: int = 4) -> DataFrame:
    """Embedding-cosine near-dup pairs, LSH-bucketed by the sign pattern of
    the first ``bucket_dims`` dimensions (deterministic axis projections).
    Exact within buckets; candidates across buckets are sacrificed — the
    recall/cost dial is ``bucket_dims`` (0 = brute force)."""
    vec = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    bucket = F.concat_ws(
        "", *[F.when(vec[i] >= 0, F.lit("1")).otherwise(F.lit("0")) for i in range(bucket_dims)]
    )
    norm = F.sqrt(F.aggregate(F.transform(F.col("v"), lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))
    # per-vector norm computed ONCE scan-side, not once per candidate pair
    e = fan_out(embeddings).select("vec_id", vec.alias("v"), bucket.alias("bucket")).withColumn("nrm", norm)
    a = e.select(F.col("vec_id").alias("id_a"), F.col("v").alias("va"), F.col("nrm").alias("na"), "bucket")
    b = e.select(F.col("vec_id").alias("id_b"), F.col("v").alias("vb"), F.col("nrm").alias("nb"), "bucket")
    dot = F.aggregate(F.zip_with("va", "vb", lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)
    return (
        a.join(b, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", F.round(dot / (F.col("na") * F.col("nb")), 4))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )
