"""synth_documents_spark: partition-invariant deterministic corpus with
planted near-dup structure (sources/documents.py)."""

from pyspark.sql import functions as F

from address_parser_spark.sources.documents import synth_documents_spark


def test_content_is_partition_invariant(spark):
    a = synth_documents_spark(spark, 200, partitions=2).orderBy("doc_id").collect()
    b = synth_documents_spark(spark, 200, partitions=13).orderBy("doc_id").collect()
    assert [r["text"] for r in a] == [r["text"] for r in b]
    assert [r["doc_id"] for r in a] == list(range(200))


def test_schema_and_token_bounds(spark):
    df = synth_documents_spark(spark, 300, partitions=4)
    assert [f.name for f in df.schema] == ["doc_id", "text", "lang", "source"]
    stats = df.select(
        F.min(F.size(F.split("text", " "))).alias("lo"),
        F.max(F.size(F.split("text", " "))).alias("hi"),
    ).first()
    # dup docs append one extra token beyond max_tokens
    assert stats["lo"] >= 20 and stats["hi"] <= 101


def test_planted_near_dups_are_found_by_jaccard(spark):
    from address_parser_spark.operators.dedup import ngram_jaccard_pairs

    docs = synth_documents_spark(spark, 400, partitions=4)
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in ngram_jaccard_pairs(docs, threshold=0.5, fast_hash=True).collect()
    }
    # every planted pair is adjacent (id-1, id); ~10% of docs are dups
    adjacent = [p for p in pairs if p[1] - p[0] == 1]
    assert len(adjacent) >= 20
    assert all(b - a == 1 for a, b in pairs)
