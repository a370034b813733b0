"""The bench/production path (fast_hash=True → xxhash64) must be the SAME
operator as the oracle path (md5-derived hashes), not a look-alike: for
operators where the hash is only a set-element identity (Jaccard shingles,
exact-dup digests, fingerprint shingle sets), the OUTPUT must be value-equal
under either hash. MinHash signatures legitimately differ by hash family, so
there the contract is behavioral: the banded candidate set still recovers
the planted near-dup pairs.
"""

from __future__ import annotations

import pytest

from address_parser_spark.sources.documents import synth_documents_spark


@pytest.fixture(scope="module")
def docs(spark):
    return synth_documents_spark(spark, 300, partitions=4).cache()


def test_jaccard_pairs_identical_under_either_hash(spark, docs):
    from address_parser_spark.operators.dedup import ngram_jaccard_pairs

    def rows(fast):
        return sorted(
            (r["doc_a"], r["doc_b"], r["inter"], r["jaccard"])
            for r in ngram_jaccard_pairs(docs, threshold=0.3, fast_hash=fast).collect()
        )

    slow, fast = rows(False), rows(True)
    assert slow == fast
    assert len(slow) > 0  # the corpus plants ~10% near-dups — non-vacuous


def test_fingerprint_minhash_partitions_docs_identically(spark, docs):
    """min_shingle_hash differs by hash family (that's its point), but the
    hash-independent fingerprint outputs — the exact-dup grouping induced by
    content_md5 and the distinct-shingle counts — must be value-equal."""
    from address_parser_spark.operators.textquality import fingerprints

    def views(fast):
        rows = fingerprints(docs, fast_hash=fast).collect()
        by_hash: dict = {}
        for r in rows:
            by_hash.setdefault(r["content_md5"], set()).add(r["doc_id"])
        grouping = {frozenset(v) for v in by_hash.values()}
        n_shingles = {r["doc_id"]: r["n_shingles"] for r in rows}
        return grouping, n_shingles

    slow, fast = views(False), views(True)
    assert slow[0] == fast[0]  # content-hash dup grouping is hash-independent
    assert slow[1] == fast[1]  # shingle-set sizes don't depend on the hash


def test_minhash_bands_recover_planted_dups_under_either_hash(spark, docs):
    from address_parser_spark.operators.dedup import minhash_band_pairs

    from pyspark.sql import functions as F

    def flagged(c):
        return F.pmod(F.xxhash64(c, F.lit("dup"), F.lit(42)), F.lit(10)) == 0

    # same predicate as sources/documents.py: a doc is a planted dup only
    # when its predecessor is NOT itself flagged (no chained flags — every
    # planted pair genuinely shares its token stream)
    is_dup = flagged(F.col("doc_id")) & ~flagged(F.col("doc_id") - 1) & (F.col("doc_id") > 0)
    planted = {
        (r["doc_id"] - 1, r["doc_id"])
        for r in docs.filter(is_dup).select("doc_id").collect()
    }
    assert planted, "corpus must plant near-dups"
    for fast in (False, True):
        got = {
            (r["doc_a"], r["doc_b"])
            for r in minhash_band_pairs(docs, fast_hash=fast).collect()
        }
        recall = len(planted & got) / len(planted)
        assert recall >= 0.95, f"fast_hash={fast}: banding recall {recall:.2f}"
