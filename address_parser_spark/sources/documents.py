"""Deterministic synthetic documents corpus (distributed generation).

Scale-bench input for the dedup/text-quality operator family: the driver's
testdata documents table tops out at 5,000 rows (sf0.1), far too small to
evidence the north_rule's two-parallelism-level scaling criterion for these
operators. This generator produces an arbitrarily large corpus with the same
shape (doc_id, text, lang, source) entirely from Column expressions seeded by
``xxhash64(doc_id, tag)`` — no Python on the data path, no driver-side
materialization, and the content of every row depends only on its doc_id, so
the corpus is identical under any partitioning or parallelism (the property
the scaling protocol needs: both levels must scan identical bytes).

Near-duplicate structure: every doc whose ``xxhash64(id,'dup') % 10 == 0``
(with id > 0 AND the predecessor id-1 NOT itself flagged — no chained
flags, so every planted pair genuinely shares its token stream)
re-generates the PREVIOUS doc's token stream and appends one extra token —
a planted (id-1, id) near-dup pair, ~9% of the corpus, so the
MinHash/Jaccard operators exercise their match paths, not just the empty
case. ``tests/test_fast_hash_parity.py`` mirrors this exact predicate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

# Small embedded vocabulary: a few real stopwords (so lang-id/quality rules
# fire) plus synthetic word shapes. Token choice is hash-uniform over it.
_STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "la", "de", "und"]
_VOCAB = _STOPWORDS + [f"w{i:03d}" for i in range(490)]


def synth_documents_spark(
    spark: SparkSession,
    n_docs: int,
    partitions: int = 64,
    min_tokens: int = 20,
    max_tokens: int = 100,
    seed: int = 42,
) -> DataFrame:
    """(doc_id long, text string, lang string, source string) — deterministic
    in content for a given (n_docs, token bounds, seed) under ANY partitioning."""
    vocab = F.array(*[F.lit(w) for w in _VOCAB])
    span = max_tokens - min_tokens + 1

    def tok_stream(seed_id):
        n = F.lit(min_tokens) + F.pmod(F.xxhash64(seed_id, F.lit("len"), F.lit(seed)), F.lit(span))
        return F.transform(
            F.sequence(F.lit(1), n),
            lambda i: F.element_at(
                vocab,
                (F.pmod(F.xxhash64(seed_id, i, F.lit(seed)), F.lit(len(_VOCAB))) + 1).cast("int"),
            ),
        )

    base = spark.range(0, n_docs, 1, partitions)

    def _dup_flagged(c):
        return F.pmod(F.xxhash64(c, F.lit("dup"), F.lit(seed)), F.lit(10)) == 0

    # A doc is a planted near-dup of its predecessor ONLY when the
    # predecessor is itself non-dup: without that guard, chained flags
    # (id-1 also flagged) make doc id copy tok_stream(id-1) while doc id-1's
    # actual text is tok_stream(id-2)+extra — a "planted pair" sharing no
    # tokens, breaking the corpus's documented near-dup contract for ~10%
    # of pairs (and the banding-recall gate built on it).
    is_dup = _dup_flagged(F.col("id")) & ~_dup_flagged(F.col("id") - 1) & (F.col("id") > 0)
    seed_id = F.when(is_dup, F.col("id") - 1).otherwise(F.col("id"))
    # staged columns (not inlined) — same CollapseProject discipline as the
    # operators: the token array feeds both the text join and the dup suffix
    return (
        base.withColumn("_toks", tok_stream(seed_id))
        .withColumn(
            "text",
            F.when(
                is_dup,
                F.concat_ws(
                    " ",
                    F.concat_ws(" ", F.col("_toks")),
                    F.element_at(
                        vocab,
                        (F.pmod(F.xxhash64(F.col("id"), F.lit("extra"), F.lit(seed)),
                                F.lit(len(_VOCAB))) + 1).cast("int"),
                    ),
                ),
            ).otherwise(F.concat_ws(" ", F.col("_toks"))),
        )
        .select(
            F.col("id").alias("doc_id"),
            "text",
            F.lit("en").alias("lang"),
            F.lit("synth").alias("source"),
        )
    )
