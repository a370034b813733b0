"""End-to-end gates (SURVEY §5 / BASELINE.json):

1. extraction invariant — byte-identical extracted mention text per url;
2. blocking recall — every gold pair shares ≥1 blocking key;
3. pairwise F1 ≥ 0.99 on labeled pairs at shared blocking keys;
4. resume — stages read back from committed snapshots, identical output.
"""

import shutil

import pytest
from pyspark.sql import functions as F

from address_parser_spark.gazetteer import synth_gazetteer
from address_parser_spark.operators.eval import gold_entity_col, labeled_pairs, pairwise_f1
from address_parser_spark.operators.pairs import with_blocking_keys
from address_parser_spark.plans.pipeline import run_pipeline
from address_parser_spark.sources.lineage import StageStore
from address_parser_spark.sources.pages import GOLD_SCHEMA, PAGES_SCHEMA, synth_pages_local
from address_parser_spark.textops.extract import extract_mentions

N_PAGES = 250


@pytest.fixture(scope="module")
def corpus(gaz):
    return synth_pages_local(gaz, N_PAGES)


@pytest.fixture(scope="module")
def clustered(spark, gaz, corpus):
    pages, _ = corpus
    pages_df = spark.createDataFrame(pages, PAGES_SCHEMA)
    return run_pipeline(spark, pages_df, gaz).persist()


def test_extraction_byte_identity(corpus):
    pages, golds = corpus
    gold_by_url: dict[str, set[str]] = {}
    for g in golds:
        gold_by_url.setdefault(g[0], set()).add(g[1])
    for url, _ts, _html, text, lang in pages:
        got = set(extract_mentions(text))
        want = gold_by_url.get(url, set())
        assert want <= got, f"missed mentions on {url}: {want - got}"
        if lang == "vi":
            assert got == want, f"false spans on {url}: {got - want}"


def test_overlong_abbrev_extension_falls_back_to_longest_cut():
    # An abbreviation dot ("TP.") extends the span into a long terminator-free
    # tail that overshoots MAX_MENTION_LEN. The extractor must fall back to
    # the longest unextended cut instead of silently dropping the mention —
    # and strip the dangling bare admin-prefix token the cut lands on (the
    # ", TP" with no following name), so no stray token reaches detection.
    addr = "12 Nguyễn Trãi, P. Bến Thành, Q. 1"
    text = "Địa chỉ: " + addr + ", TP. " + "x" * 250
    assert extract_mentions(text) == [addr]


def test_blocking_recall_on_gold_pairs(spark, corpus, clustered):
    _, golds = corpus
    gold_df = (
        spark.createDataFrame(golds, GOLD_SCHEMA)
        .withColumn("gold_entity", gold_entity_col())
        .select("url", "mention", "gold_entity")
    )
    keyed = (
        with_blocking_keys(clustered)
        .join(gold_df, ["url", "mention"])
        .select("mid", F.explode("keys").alias("key"), "gold_entity")
        .distinct()
    )
    # nearly every gold entity with >=2 mentions must have at least one key
    # shared by >=2 of its mentions (the pair is generatable). A small tail of
    # glued-compound variants ("TP.ĐàNẵng" → "danang" vs "da nang") legally
    # escapes key sharing — those still cluster via canonical-node anchors.
    per_entity = (
        keyed.groupBy("gold_entity", "key").agg(F.countDistinct("mid").alias("n"))
        .groupBy("gold_entity").agg(F.max("n").alias("max_shared"))
    )
    multi = (
        keyed.groupBy("gold_entity").agg(F.countDistinct("mid").alias("m")).filter("m >= 2")
    )
    joined = multi.join(per_entity, "gold_entity")
    total = joined.count()
    bad = joined.filter(F.col("max_shared") < 2).count()
    assert total > 20
    assert bad / total <= 0.02, f"{bad}/{total} multi-mention entities lack a shared key"


def test_pairwise_f1_gate(spark, corpus, clustered):
    _, golds = corpus
    gold_df = (
        spark.createDataFrame(golds, GOLD_SCHEMA)
        .withColumn("gold_entity", gold_entity_col())
        .select("url", "mention", "gold_entity")
    )
    keyed = with_blocking_keys(clustered).join(gold_df, ["url", "mention"])
    metrics = pairwise_f1(labeled_pairs(keyed.select("mid", "keys", "gold_entity", "cluster_id")))
    assert metrics["n_pairs"] > 100
    assert metrics["f1"] >= 0.99, metrics


def test_resume_from_checkpoint(spark, gaz, corpus, tmp_path_factory):
    pages, _ = corpus
    pages_df = spark.createDataFrame(pages[:80], PAGES_SCHEMA)
    base = str(tmp_path_factory.mktemp("ckpt"))

    store = StageStore(spark, base)
    first = run_pipeline(spark, pages_df, gaz, store=store)
    a = first.select("mid", "cluster_id").collect()
    stages = {e["stage"] for e in store.lineage() if "rows" in e}
    assert {"resolved", "keyed", "edges", "clustered"} <= stages

    # simulate crash after 'edges': final stage lost, earlier stages resume
    shutil.rmtree(f"{base}/clustered", ignore_errors=True)
    store2 = StageStore(spark, base)
    second = run_pipeline(spark, pages_df, gaz, store=store2)
    resumed = {e["stage"] for e in store2.lineage() if e.get("resumed")}
    assert {"resolved", "keyed", "edges"} <= resumed
    # identical cluster structure, not just row count
    b = second.select("mid", "cluster_id").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_pipeline_from_html_only_pages(spark, gaz, corpus, clustered):
    """input_hint closure: pages arriving with ONLY the html:binary column
    populated (text null) must produce exactly the text-path pipeline output
    — ensure_text() extracts the text from markup, and since html_to_text is
    byte-identical to the text column on this corpus, every downstream row
    (mention, std, entity_key) matches. F1 gate therefore holds verbatim."""
    pages, _ = corpus
    pages_df = (
        spark.createDataFrame(pages, PAGES_SCHEMA)
        .withColumn("text", F.lit(None).cast("string"))
    )
    out = run_pipeline(spark, pages_df, gaz)
    cols = ["url", "mention", "std", "entity_key"]
    got = {tuple(r) for r in out.select(*cols).collect()}
    want = {tuple(r) for r in clustered.select(*cols).collect()}
    assert got == want
