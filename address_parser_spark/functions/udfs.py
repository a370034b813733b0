"""Arrow-batched pandas UDFs — the only Python on the hot path.

Every UDF here is vectorized at the batch level (Arrow exchange, one Python
call per ~10k rows) and calls the pure ``textops`` core per value. No per-row
Spark Python UDFs anywhere in the engine (``input_hint`` requirement).

The candidate scorer reproduces the reference's blend
(inexus_parser.py:2885-2901): ratio / partial_ratio / WRatio composite with
the partial-usage rule driven by the length ratio and the ngram-mass flag.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from address_parser_spark.textops.extract import extract_mentions
from address_parser_spark.textops.normalize import normalize_advanced, normalize_basic
from address_parser_spark.textops.similarity import (
    indel_ratio,
    jaro_winkler,
    levenshtein,
    partial_ratio,
    token_overlap,
    wratio,
)
from address_parser_spark.textops.street import extract_street


@pandas_udf(T.ArrayType(T.StringType()))
def extract_mentions_udf(text: pd.Series) -> pd.Series:
    return text.map(lambda t: extract_mentions(t) if isinstance(t, str) else [])


@pandas_udf(T.StringType())
def normalize_advanced_udf(s: pd.Series) -> pd.Series:
    return s.map(lambda v: normalize_advanced(v) if isinstance(v, str) else "")


@pandas_udf(T.StringType())
def normalize_basic_udf(s: pd.Series) -> pd.Series:
    return s.map(lambda v: normalize_basic(v) if isinstance(v, str) else "")


_DETECT_SCHEMA = T.StructType(
    [
        T.StructField("det_p", T.StringType()),
        T.StructField("det_d", T.StringType()),
        T.StructField("det_w", T.StringType()),
    ]
)


_REGISTRY_CACHE: dict[int, tuple] = {}

_FEATURES_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("mention", T.StringType()),
            T.StructField("std", T.StringType()),
            T.StructField("std_basic", T.StringType()),
            T.StructField("det_p", T.StringType()),
            T.StructField("det_d", T.StringType()),
            T.StructField("det_w", T.StringType()),
        ]
    )
)


def make_extract_features_udf(registries: dict[str, list[str]], spark=None):
    """FUSED extraction + normalization (advanced & basic) + prefix detection
    in a single Arrow node.

    Chaining these as four separate pandas UDFs plants four ArrowEvalPython
    operators in ONE stage — every task then runs four python workers
    concurrently (task slots × UDF nodes processes; measured: a 32-core ×
    64-partition run spent ~25s spawning/importing ~128 workers). One fused
    UDF keeps it at one worker per task slot and one Arrow round-trip.
    """
    from address_parser_spark.textops.detect import AliasRegistry, detect_by_prefix
    from address_parser_spark.textops.extract import extract_mentions
    from address_parser_spark.textops.normalize import normalize_advanced, normalize_basic

    bc = spark.sparkContext.broadcast(registries) if spark is not None else None
    local = registries if bc is None else None

    def _get_regs():
        raw = bc.value if bc is not None else local
        key = id(raw)
        hit = _REGISTRY_CACHE.get(key)
        if hit is None:
            hit = (
                AliasRegistry(raw["province"]),
                AliasRegistry(raw["district"]),
                AliasRegistry(raw["ward"]),
            )
            _REGISTRY_CACHE.clear()
            _REGISTRY_CACHE[key] = hit
        return hit

    @pandas_udf(_FEATURES_SCHEMA)
    def extract_features_udf(text: pd.Series) -> pd.Series:
        reg_p, reg_d, reg_w = _get_regs()
        det_cache: dict[str, tuple] = {}

        def run(t):
            if not isinstance(t, str) or not t:
                return []
            out = []
            for mention in extract_mentions(t):
                std = normalize_advanced(mention)
                if len(std) < 2:
                    continue
                basic = normalize_basic(mention)
                det = det_cache.get(basic)
                if det is None:
                    det = detect_by_prefix(basic, reg_p, reg_d, reg_w)
                    det_cache[basic] = det
                out.append((mention, std, basic) + det)
            return out

        return text.map(run)

    return extract_features_udf


def make_detect_udf(registries: dict[str, list[str]], spark=None):
    """Prefix-detection UDF bound to the gazetteer alias registries.

    The registries are dimension-sized (≤ tens of thousands of short strings).
    When a SparkSession is provided they ship as a BROADCAST — deserialized
    once per executor process instead of once per task closure (task-binary
    deserialization of a multi-MB registry dominated small-job wall time).
    The derived ``AliasRegistry`` prefilter indexes are built lazily worker-
    side and cached per process. Per-batch memoization collapses repeated
    fragments; the exact-registry hit short-circuits the fuzzy scan
    (reference ``_pick_best`` fast path, inexus_parser.py:2715-2717).
    """
    from address_parser_spark.textops.detect import AliasRegistry, detect_by_prefix

    bc = spark.sparkContext.broadcast(registries) if spark is not None else None
    local = registries if bc is None else None

    def _get_regs():
        raw = bc.value if bc is not None else local
        key = id(raw)
        hit = _REGISTRY_CACHE.get(key)
        if hit is None:
            hit = (
                AliasRegistry(raw["province"]),
                AliasRegistry(raw["district"]),
                AliasRegistry(raw["ward"]),
            )
            _REGISTRY_CACHE.clear()
            _REGISTRY_CACHE[key] = hit
        return hit

    @pandas_udf(_DETECT_SCHEMA)
    def detect_udf(std_basic: pd.Series) -> pd.DataFrame:
        reg_p, reg_d, reg_w = _get_regs()
        cache: dict[str, tuple] = {}

        def run(s):
            if not isinstance(s, str) or not s:
                return (None, None, None)
            hit = cache.get(s)
            if hit is None:
                hit = detect_by_prefix(s, reg_p, reg_d, reg_w)
                cache[s] = hit
            return hit

        rows = [run(s) for s in std_basic]
        return pd.DataFrame(rows, columns=["det_p", "det_d", "det_w"])

    return detect_udf


_CAND_SCHEMA = T.StructType(
    [
        T.StructField("base", T.DoubleType()),
        T.StructField("partial", T.DoubleType()),
        T.StructField("wratio", T.DoubleType()),
        T.StructField("combined", T.DoubleType()),
        T.StructField("boost", T.DoubleType()),
    ]
)


def _component_boost(cand_std, detected, exact_bonus, fuzzy_bonus, missing_penalty):
    """Reference ``_component_boost`` (inexus_parser.py:2855-2876): exact
    alias agreement earns the full bonus, close fuzzy agreement a partial one,
    a missing/contradicting component the penalty."""
    if not detected:
        return 0.0
    if not cand_std:
        return missing_penalty
    if cand_std == detected:
        return exact_bonus
    similarity = indel_ratio(cand_std, detected)
    if similarity >= 90:
        return fuzzy_bonus
    if similarity >= 80:
        return fuzzy_bonus / 2
    return missing_penalty


def _combined_score(inp: str, cand: str, use_partial_flag: bool) -> tuple[float, float, float, float]:
    """Reference blend: max of ratio/WRatio, partial under the length rule,
    then floor at 0.6·ratio + 0.4·WRatio (inexus_parser.py:2886-2901).

    ``partial_ratio`` (the expensive sliding-window scorer) is evaluated
    lazily — only when the length rule or the low-base fallback can actually
    use it. Same outputs, a fraction of the work on the common path.
    """
    base = indel_ratio(inp, cand)
    wr = wratio(inp, cand)
    length_ratio = max(len(inp), 1) / max(len(cand), 1)
    use_partial = use_partial_flag or length_ratio >= 1.25
    combined = max(base, wr)
    part = -1.0
    if use_partial:
        part = partial_ratio(inp, cand)
        combined = max(combined, part)
    elif base < 80:
        part = partial_ratio(inp, cand)
        if part >= 90:
            combined = max(combined, part * 0.95)
    combined = max(combined, 0.6 * base + 0.4 * wr)
    return base, part, wr, combined


@pandas_udf(_CAND_SCHEMA)
def candidate_score_udf(
    inp: pd.Series, cand: pd.Series, use_partial: pd.Series,
    det_p: pd.Series, det_d: pd.Series, det_w: pd.Series,
    node_p: pd.Series, node_d: pd.Series, node_w: pd.Series,
) -> pd.DataFrame:
    score_memo: dict[tuple, tuple] = {}
    boost_memo: dict[tuple, float] = {}
    rows = []
    for i, c, f, dp, dd, dw, np_, nd, nw in zip(
        inp, cand, use_partial, det_p, det_d, det_w, node_p, node_d, node_w
    ):
        skey = (i, c, bool(f))
        scores = score_memo.get(skey)
        if scores is None:
            scores = _combined_score(
                i if isinstance(i, str) else "", c if isinstance(c, str) else "", bool(f)
            )
            score_memo[skey] = scores
        bkey = (dp, dd, dw, np_, nd, nw)
        boost = boost_memo.get(bkey)
        if boost is None:
            boost = (
                _component_boost(nw, dw, 18.0, 12.0, -12.0)
                + _component_boost(nd, dd, 14.0, 9.0, -10.0)
                + _component_boost(np_, dp, 6.0, 3.5, -4.0)
            )
            boost_memo[bkey] = boost
        rows.append(scores + (boost,))
    return pd.DataFrame(rows, columns=["base", "partial", "wratio", "combined", "boost"])


_PAIR_SCHEMA = T.StructType(
    [
        T.StructField("jw", T.DoubleType()),
        T.StructField("lev_sim", T.DoubleType()),
        T.StructField("tok_overlap", T.DoubleType()),
    ]
)


@pandas_udf(_PAIR_SCHEMA)
def pair_score_udf(a: pd.Series, b: pd.Series) -> pd.DataFrame:
    """Mention↔mention similarity bundle for the pair stage (north_star:
    batched Jaro-Winkler / Levenshtein / token-overlap)."""
    rows = []
    for x, y in zip(a, b):
        x = x if isinstance(x, str) else ""
        y = y if isinstance(y, str) else ""
        denom = max(len(x), len(y), 1)
        rows.append(
            (
                jaro_winkler(x, y),
                1.0 - levenshtein(x, y) / denom,
                token_overlap(x, y),
            )
        )
    return pd.DataFrame(rows, columns=["jw", "lev_sim", "tok_overlap"])


@pandas_udf(T.StringType())
def street_extract_udf(
    original: pd.Series, province: pd.Series, district: pd.Series, ward: pd.Series
) -> pd.Series:
    return pd.Series(
        [
            extract_street(
                o if isinstance(o, str) else "",
                p if isinstance(p, str) else None,
                d if isinstance(d, str) else None,
                w if isinstance(w, str) else None,
            )
            for o, p, d, w in zip(original, province, district, ward)
        ]
    )


_STREET_ENTITY_SCHEMA = T.StructType(
    [
        T.StructField("street_address", T.StringType()),
        T.StructField("entity_std", T.StringType()),
    ]
)


@pandas_udf(_STREET_ENTITY_SCHEMA)
def street_and_entity_udf(
    original: pd.Series, std: pd.Series,
    province: pd.Series, district: pd.Series, ward: pd.Series,
) -> pd.DataFrame:
    """Fused street extraction + entity_std derivation (one Arrow node).

    entity_std = distinct tokens of the normalized mention minus the
    normalized street's tokens, first-occurrence order (the semantics of the
    previous JVM ``array_except``); falls back to the full std when the
    subtraction leaves fewer than 2 chars.
    """
    from address_parser_spark.textops.normalize import normalize_advanced

    rows = []
    for o, s, p, d, w in zip(original, std, province, district, ward):
        o = o if isinstance(o, str) else ""
        s = s if isinstance(s, str) else ""
        street = extract_street(
            o,
            p if isinstance(p, str) else None,
            d if isinstance(d, str) else None,
            w if isinstance(w, str) else None,
        )
        street_toks = set(normalize_advanced(street).split()) if street else set()
        seen: set[str] = set()
        kept = []
        for tok in s.split():
            if tok in street_toks or tok in seen:
                continue
            seen.add(tok)
            kept.append(tok)
        entity_std = " ".join(kept)
        if len(entity_std) < 2:
            entity_std = s
        rows.append((street, entity_std))
    return pd.DataFrame(rows, columns=["street_address", "entity_std"])
