"""fan_out scan-width defense + staged-shingle parity (operators/partitioning,
dedup.with_word_shingles)."""

from pyspark.sql import functions as F

from address_parser_spark.operators.dedup import with_word_shingles, word_shingles_col
from address_parser_spark.operators.partitioning import fan_out


def test_fan_out_widens_narrow_plans(spark):
    narrow = spark.range(1000).coalesce(1)
    widened = fan_out(narrow)
    target = spark.sparkContext.defaultParallelism
    assert widened.rdd.getNumPartitions() == target
    assert widened.count() == 1000


def test_fan_out_is_noop_on_wide_plans(spark):
    target = spark.sparkContext.defaultParallelism
    wide = spark.range(1000).repartition(target)
    # already at parallelism: the plan must come back untouched (no shuffle)
    assert fan_out(wide) is wide


def test_fan_out_preserves_rows_and_values(spark):
    df = spark.createDataFrame([(i, f"t{i}") for i in range(50)], "id long, text string").coalesce(1)
    out = fan_out(df)
    assert sorted(r["id"] for r in out.collect()) == list(range(50))


def test_with_word_shingles_matches_column_form(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "short text"),
            (3, "One Two Three One Two Three One Two Three"),
            (4, "solo"),
        ],
        "doc_id long, text string",
    )
    staged = {
        r["doc_id"]: sorted(r["sh"])
        for r in with_word_shingles(docs, "text", 3, out="sh").select("doc_id", "sh").collect()
    }
    inline = {
        r["doc_id"]: sorted(r["sh"])
        for r in docs.select("doc_id", word_shingles_col(F.col("text"), 3).alias("sh")).collect()
    }
    assert staged == inline
    assert staged[2] == ["short text"]  # below k: single joined shingle
    assert len(staged[3]) == 3  # distinct shingles of a repeating text


def test_with_word_shingles_drops_staging_column(spark):
    docs = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    out = with_word_shingles(docs, "text", 3)
    assert set(out.columns) == {"doc_id", "text", "_sh"}
