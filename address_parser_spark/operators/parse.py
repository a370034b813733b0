"""Mention → canonical-entity resolution as a DataFrame program.

This is the reference's ``AddressParser.process`` (inexus_parser.py:133-466)
re-planned for Catalyst (SURVEY §3.1). Stages and their physical shape:

1. **extract+normalize** (narrow): trigger-scan extraction UDF → explode;
   advanced + basic normalization UDFs; JVM-side distinct 4-gram shingles;
   prefix-detection UDF (reference ``_detect_by_prefix`` :2685-2762) against
   broadcast alias registries. Each mention gets a compact 64-bit key ``mid``
   so downstream shuffles move longs, not strings.
2. **blocking join** (shuffle on ``mid``): ``explode(grams)`` ⋈ broadcast
   inverted index → ``groupBy(mid, node_id).count()``. The exploded probe
   relation is deliberately two columns wide — at 10^12 documents the shuffle
   volume is (mentions × ~60 grams) × 16 bytes, the narrowest possible. The
   per-pair count IS the distinct-gram intersection (reference
   ``ngram_address_piece_list`` :2670-2680), so Dice (gate ≥0.4, :2824-2827)
   is computed JVM-side BEFORE any Python scoring — the staged predicate
   Catalyst cannot reorder around an opaque UDF (SURVEY §4).
3. **score** (same ``mid`` partitioning, exchange reuse): top-K cap
   (TOPK=400, :114) with deterministic tiebreak, broadcast node attributes,
   Arrow-batched ratio/partial/WRatio blend + component boosts
   (:2855-2912).
4. **argmax**: ``max_by`` over the reference's lexicographic sort key
   (final, combined, specificity, name length; :2926-2934), min-node_id tie.
   One hash agg — no sort, no window.

Skew: gram postings fan out ≤ nodes-per-gram (bounded by the catalog, not the
corpus); hot mentions (identical address strings across pages) stay separate
``mid``s and thus spread. AQE skew-join + coalesce mop up residuals.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

from address_parser_spark.functions.columns import char_ngrams_col, dice_col
from address_parser_spark.functions.udfs import (
    candidate_score_udf,
    make_extract_features_udf,
    street_and_entity_udf,
)

DICE_GATE = 0.4
TOPK_CANDIDATES = 400
SCORE_CANDIDATES = 120  # reference's max_candidates slice (inexus_parser.py:2878)
PARTIAL_MASS_TOP_N = 5
PARTIAL_MASS_THRESHOLD = 12


def extract_normalize(pages: DataFrame, registries: dict[str, list[str]] | None = None,
                      lang: str = "vi", carry_cols: list[str] | None = None) -> DataFrame:
    """pages → one row per extracted mention: normalized forms, shingles,
    detected components, compact key. Narrow — no shuffle; the scan reads only
    (url, text, lang) plus any ``carry_cols`` (e.g. the event-time column for
    the streaming path)."""
    features = make_extract_features_udf(registries or {"province": [], "district": [], "ward": []},
                                         spark=pages.sparkSession)
    return (
        pages
        .filter(F.col("lang") == lang)
        .select("url", *(carry_cols or []), F.explode(features(F.col("text"))).alias("f"))
        .select(
            "url",
            *(carry_cols or []),
            F.col("f.mention").alias("mention"),
            F.col("f.std").alias("std"),
            F.col("f.std_basic").alias("std_basic"),
            F.struct(
                F.col("f.det_p").alias("det_p"),
                F.col("f.det_d").alias("det_d"),
                F.col("f.det_w").alias("det_w"),
            ).alias("det"),
        )
        .withColumn("grams", char_ngrams_col(F.col("std")))
        .withColumn("n_in", F.size("grams"))
        .withColumn("mid", F.xxhash64("url", "mention"))
    )


def block_candidates(mentions: DataFrame, index_df: DataFrame) -> DataFrame:
    """Blocking join on the narrowest possible probe relation (mid, gram)."""
    probe = mentions.select("mid", F.explode("grams").alias("g"))
    return (
        probe.join(F.broadcast(index_df), "g")
        .groupBy("mid", "node_id")
        .agg(
            F.count(F.lit(1)).alias("inter"),
            F.sum(F.col("is_primary").cast("long")).alias("inter_primary"),
            F.first("n_primary").alias("n_primary"),
        )
    )


def _partial_flag() -> Column:
    """Top-5 hit-mass heuristic (inexus_parser.py:148-154): when the five most
    overlapping nodes absorb ≥12 distinct grams, the input is likely a
    fragment → scorer leans on partial_ratio."""
    top5 = F.slice(F.sort_array(F.collect_list("inter"), asc=False), 1, PARTIAL_MASS_TOP_N)
    return (
        F.aggregate(top5, F.lit(0).cast("long"), lambda acc, x: acc + x)
        >= PARTIAL_MASS_THRESHOLD
    )


def score_candidates(cands: DataFrame, mentions: DataFrame, nodes_df: DataFrame) -> DataFrame:
    """Dice gate → top-K cap → broadcast node attrs → Arrow scoring + boosts."""
    flags = cands.groupBy("mid").agg(_partial_flag().alias("partial_input"))

    mention_attrs = mentions.select(
        "mid", "url", "mention", "std", "n_in",
        F.col("det.det_p").alias("det_p"),
        F.col("det.det_d").alias("det_d"),
        F.col("det.det_w").alias("det_w"),
    )

    by_hits = Window.partitionBy("mid").orderBy(F.desc("inter"), F.asc("node_id"))
    gated = (
        cands
        .join(mention_attrs, "mid")
        # Pre-gate cap: the reference keeps only the 400 most-hit nodes from
        # the inverted-index counter BEFORE the Dice gate (inexus_parser.py
        # :114, 2680) — this bounds per-mention fan-out when a gram-rich
        # mention overlaps many nodes, which is exactly the blow-up mode at
        # corpus scale. Deterministic tiebreak on node_id.
        .withColumn("rk_pre", F.row_number().over(by_hits))
        .filter(F.col("rk_pre") <= TOPK_CANDIDATES)
        .withColumn("dice", dice_col(F.col("inter_primary"), F.col("n_in"), F.col("n_primary")))
        .filter(F.col("dice") >= DICE_GATE)
        .withColumn("rk", F.row_number().over(by_hits))
        .filter(F.col("rk") <= SCORE_CANDIDATES)
        .drop("rk_pre", "rk")
        .join(flags, "mid", "left")
    )

    node_side = F.broadcast(
        nodes_df.select(
            "node_id", "level", "is_new", "province", "district", "ward",
            "province_code", "district_code", "ward_code",
            "p_std", "d_std", "w_std",
            F.col("std_name").alias("cand_std"),
        )
    )
    return (
        gated
        .join(node_side, "node_id")
        .withColumn(
            "sc",
            candidate_score_udf(
                F.col("std"), F.col("cand_std"), F.coalesce("partial_input", F.lit(False)),
                F.col("det_p"), F.col("det_d"), F.col("det_w"),
                F.col("p_std"), F.col("d_std"), F.col("w_std"),
            ),
        )
        .withColumn(
            "comps",
            F.col("province").isNotNull().cast("int")
            + F.col("district").isNotNull().cast("int")
            + F.col("ward").isNotNull().cast("int"),
        )
        .withColumn("has_ward", F.col("ward").isNotNull().cast("int"))
        .withColumn(
            "final_score",
            F.col("sc.combined") + F.col("sc.boost")
            + F.col("comps") * 1.5 + F.col("has_ward") * 1.0 + F.col("dice") * 10.0,
        )
    )


def pick_winners(scored: DataFrame) -> DataFrame:
    """Argmax per mention over the reference's sort key — one ``max_by`` agg."""
    order_key = F.struct(
        F.col("final_score").alias("s1"),
        F.col("sc.combined").alias("s2"),
        F.col("comps").alias("s3"),
        F.col("has_ward").alias("s4"),
        F.length("cand_std").alias("s5"),
        (-F.col("node_id")).alias("s6"),
    )
    payload = F.struct(
        "node_id", "level", "is_new", "province", "district", "ward",
        "province_code", "district_code", "ward_code", "cand_std",
        "final_score", F.col("sc.combined").alias("combined"), "dice",
    )
    return (
        scored.groupBy("mid")
        .agg(
            F.max_by(payload, order_key).alias("w"),
            F.first("url").alias("url"),
            F.first("mention").alias("mention"),
            F.first("std").alias("std"),
        )
        .select("mid", "url", "mention", "std", "w.*")
    )


def attach_street(winners: DataFrame) -> DataFrame:
    """Row-local street extraction + format tag + entity key (steps 7-8).

    ``entity_std`` is the normalized mention with the street tokens removed —
    the entity-bearing portion. Blocking keys and pair scoring downstream run
    on it (two mentions of the same ward with different street addresses must
    land in the same block); computed as a JVM array_except, no extra UDF pass
    beyond normalizing the extracted street.
    """
    return (
        winners
        .withColumn(
            "se",
            street_and_entity_udf(
                F.col("mention"), F.col("std"),
                F.col("province"), F.col("district"), F.col("ward"),
            ),
        )
        .withColumn("street_address", F.col("se.street_address"))
        .withColumn("entity_std", F.col("se.entity_std"))
        .drop("se")
        .withColumn("format", F.when(F.col("is_new"), F.lit("new")).otherwise(F.lit("old")))
        .withColumn(
            "entity_key",
            F.concat_ws(
                "|",
                F.coalesce("province_code", F.lit("")),
                F.coalesce("district_code", F.lit("")),
                F.coalesce("ward_code", F.lit("")),
                F.col("is_new").cast("string"),
            ),
        )
    )


def resolve_mentions(
    pages: DataFrame,
    nodes_df: DataFrame,
    index_df: DataFrame,
    registries: dict[str, list[str]] | None = None,
    persist_intermediates: bool = True,
) -> DataFrame:
    """Full extract → block → gate → score → argmax → street pipeline.

    ``mentions`` feeds both the blocking probe and the attribute join, and
    ``cands`` feeds both the partial-flag agg and the gate — without explicit
    materialization Catalyst re-executes the extraction/detection UDF stage
    and the blocking join once per consumer (plan-level common subexpressions
    are not shared across branches). ``localCheckpoint`` is used instead of
    ``persist``: it materializes AND truncates the plan, keeping downstream
    analysis cheap and the CacheManager registry empty (big cached plans make
    every later query pay plan-canonicalization time on the driver). The
    buffers are mention-sized, not corpus-sized.
    """
    mentions = extract_normalize(pages, registries)
    if persist_intermediates:
        mentions = mentions.localCheckpoint(eager=True)
    cands = block_candidates(mentions, index_df)
    if persist_intermediates:
        cands = cands.localCheckpoint(eager=True)
    scored = score_candidates(cands, mentions, nodes_df)
    return attach_street(pick_winners(scored))
