"""Prefix-based component detection on basic-normalized text.

Exact parity with the reference's ``_detect_by_prefix``
(inexus_parser.py:2685-2762): three regexes capture the fragment after a type
keyword up to the next keyword (FIRST match only — ``search``, not a scan);
the fragment is trimmed to ≤3 tokens (4 when the 4th is single-char) and
resolved against the level's standardized alias registry — exact hit first,
else the best of the top-10 ``partial_ratio ≥ 70`` candidates with a
smallest-length-delta tiebreak (the reference's ``rf_process.extract(...,
limit=10)`` shape; candidate order is this registry's sorted order, standing
in for the reference's arbitrary set order).

Used twice in the engine: component boosts + prefilter reordering during
candidate scoring (inexus_parser.py:2836-2912) and the repair cascade on
winners (textops.repair).
"""

from __future__ import annotations

import re
from typing import Optional, Sequence

from address_parser_spark.textops.similarity import partial_ratio

# DELIBERATE DEVIATION from the reference regexes: the short abbreviations
# "q"/"p"/"h"/"x"/"tx"/"tt" (basic normalization turns "Q.5"/"P.12"/
# "H. Đức Nghĩa"/"X. Thái Xá"/"TX. Phú Mỹ"/"TT. Củ Chi" into bare tokens)
# join the keyword sets and every fragment-terminating lookahead — digit
# wards/districts and abbreviated-type renderings are otherwise only
# recoverable through the candidate winner, and alias-diluted Dice can gate
# those nodes out on street-heavy mentions. Validated on the golden-450
# harness (accuracy stays ≥ the reference's) and load-bearing for the
# synthetic-corpus F1 gate.
# "thuoc" ("thuộc" = belongs-to) is a connector between components, never
# part of a name — it terminates fragments like any type keyword.
# Bare "t" terminates fragments: it only arises from dotted abbreviations
# ("T.P"/"T.X"/"T." → "t p"/"t x"/"t") — Vietnamese names never contain a
# lone "t" syllable, and without it "F Tân Dân T.Xã Nghi Sơn" captures the
# fragment "tan dan t" (no exact registry hit) instead of "tan dan".
_STOP = (
    r"(?=\b(?:quan|huyen|thi xa|thi tran|phuong|xa|tp|tinh|district|ward"
    r"|commune|town|thanh pho|city|province|p|q|h|x|t|tx|tt|ttr|f|thuoc)\b|$)"
)
_PROVINCE_PREF = re.compile(
    r"\b(?:thanh pho|tp|tinh|city|province|municipality)\b\s+([a-z0-9 ]+?)" + _STOP
)
_DISTRICT_PREF = re.compile(
    r"\b(?:quan|huyen|thi xa|thi tran|thanh pho|tp|city|municipality|district|county|q|h|tx)\b\s+([a-z0-9 ]+?)"
    + _STOP
)
# Bare "p"/"x" are ward keywords (P.5, X. Thái Xá) — but NOT when preceded
# by a bare "t" TOKEN: basic normalization renders "T.P"/"T.X" (thành phố /
# thị xã, city/town — district-or-above) as "t p"/"t x", and letting the
# "p" fire there turns the CITY name into a ward detection ("P Ea Tam T.P
# Buôn Ma Thuột" detected ward=buon ma thuot, burying the real labeled
# ward). The lookbehind is word-bounded — only the bare token "t" blocks,
# never a word that merely ENDS in t ("Bến Cát P. Mỹ Phước" must still
# detect its ward; final-t syllables are everywhere in Vietnamese).
# "ttr" (TTr. = thị trấn) and "f" (F.7 = phường, common web shorthand) are
# additional ward labels the golden corpus uses.
# "xa" gets the same bare-t lookbehind as p/x: "T.Xã" (thị xã, a town —
# district level) normalizes to "t xa", and an unblocked "xa" there turns
# the TOWN name into a ward detection.
_WARD_PREF = re.compile(
    r"\b(?:phuong|(?<!\bt )xa|thi tran|ward|commune|town|(?<!\bt )p|(?<!\bt )x|tt|ttr|f)\b\s+([a-z0-9 ]+?)"
    + _STOP
)

PARTIAL_CUTOFF = 70.0
_EXTRACT_LIMIT = 10


def _trim_fragment(fragment: str) -> str:
    """≤4 tokens kept when the 4th is single-char, else ≤3 (reference rule)."""
    tokens = fragment.split()
    if len(tokens) <= 4:
        return " ".join(tokens)
    if len(tokens) > 3 and len(tokens[3]) == 1:
        return " ".join(tokens[:4])
    return " ".join(tokens[:3])


class AliasRegistry:
    """A level's standardized alias list plus a char-3-gram prefilter index.

    The fuzzy fallback (``partial_ratio ≥ 70``) only ever fires for choices
    sharing at least one 3-gram with the fragment — a ``partial_ratio`` that
    high implies a common substring run, so the prefilter is recall-safe in
    practice and turns an O(|registry|) scan into a postings-union probe.
    """

    __slots__ = ("choices", "choice_set", "grams", "compressed")

    def __init__(self, choices: Sequence[str]):
        self.choices = list(choices)
        self.choice_set = frozenset(self.choices)
        self.grams: dict[str, list[int]] = {}
        # space-free alias form → alias ("hanoi" → "ha noi"): web text glues
        # CamelCase names ("Thành phốHàNội" normalizes to a spaceless token)
        # that no fuzzy window scores reliably; an exact hit on the
        # compressed form recovers the real alias (first choice wins on the
        # rare compression collision — deterministic via sorted choices).
        self.compressed: dict[str, str] = {}
        for idx, choice in enumerate(self.choices):
            self.compressed.setdefault(choice.replace(" ", ""), choice)
            padded = f" {choice} "
            for i in range(max(len(padded) - 2, 0)):
                self.grams.setdefault(padded[i : i + 3], []).append(idx)

    def candidates(self, fragment: str) -> list[str]:
        padded = f" {fragment} "
        seen: set[int] = set()
        for i in range(max(len(padded) - 2, 0)):
            seen.update(self.grams.get(padded[i : i + 3], ()))
        return [self.choices[idx] for idx in sorted(seen)]


def _pick_best(fragment: str, registry: AliasRegistry) -> Optional[str]:
    fragment = _trim_fragment(fragment.strip())
    if not fragment:
        return None
    if fragment in registry.choice_set:
        return fragment
    glued = registry.compressed.get(fragment.replace(" ", ""))
    if glued:
        return glued
    # top-10 by (score desc, registry order), then smallest length delta
    scored: list[tuple[float, int, str]] = []
    for order, choice in enumerate(registry.candidates(fragment)):
        score = partial_ratio(fragment, choice)
        if score >= PARTIAL_CUTOFF:
            scored.append((-score, order, choice))
    if not scored:
        return None
    scored.sort()
    best_choice: Optional[str] = None
    best_score = -1.0
    best_key: Optional[tuple] = None
    frag_prefixed = f"{fragment} "
    for neg_score, _, choice in scored[:_EXTRACT_LIMIT]:
        score = -neg_score
        # Tiebreak order: (1) the fragment STARTS with the choice — the
        # fragment is anchored right after the type keyword, so an alias
        # matching its head is the labeled name, while an equal-scoring
        # mid-fragment match is over-capture (a glued following component:
        # "yen lac huyennhu thanh" must pick "yen lac", not "nhu thanh");
        # (2) smallest length delta (the reference's tiebreak).
        anchored = 0 if frag_prefixed.startswith(f"{choice} ") else 1
        key = (anchored, abs(len(choice) - len(fragment)))
        if score > best_score:
            best_choice, best_score, best_key = choice, score, key
        elif score == best_score and best_key is not None and key < best_key:
            best_choice, best_key = choice, key
    return best_choice


def _first_valid(
    pattern: re.Pattern,
    text: str,
    registry: AliasRegistry,
    exact_elsewhere: Optional[AliasRegistry] = None,
) -> Optional[str]:
    """All keyword matches scanned; the first EXACT registry hit wins, else
    the first fuzzy hit. DELIBERATE DEVIATION from the reference's single
    ``.search`` (inexus_parser.py:2733-2750): the district keyword set
    contains "thanh pho"/"tp" (a provincial-city district can carry them), so
    in province-FIRST renderings ("Thanh pho X, Quan 5, Phuong 12") the first
    match captures the province fragment and detection dies — the reference's
    golden corpus is province-LAST so it never hits this. Exact-first keeps
    the fuzzy behavior identical whenever the reference's match validated.
    Validated on golden-450 (accuracy ≥ reference) + the corpus F1 gate."""
    fuzzy: Optional[str] = None
    for m in pattern.finditer(text):
        frag = _trim_fragment(m.group(1).strip())
        if not frag:
            continue
        if frag in registry.choice_set:
            return frag
        comp = frag.replace(" ", "")
        # the other-level poison guard must run BEFORE the compressed-form
        # hit, and on the compressed form too — otherwise "thanh pho hanoi"
        # hands "hanoi" to the DISTRICT detector as a valid hit
        if exact_elsewhere is not None and comp in exact_elsewhere.compressed:
            continue
        glued = registry.compressed.get(comp)
        if glued:
            return glued
        if exact_elsewhere is not None and frag in exact_elsewhere.choice_set:
            # The fragment IS another level's alias, verbatim ("thanh pho
            # da nang" capturing "da nang" as a district candidate when
            # "da nang" is exactly a province) — fuzzy-matching it into this
            # level hallucinates a component and poisons boosts/prefilters.
            continue
        if fuzzy is None:
            fuzzy = _pick_best(frag, registry)
    return fuzzy


# Admin keywords that web text glues straight onto the following name
# ("TỉnhLong An" → "tinhlong an", "HuyệnNhu Thanh" → "huyennhu thanh",
# "tPPhổ Yên" → "tppho yen"). Split ONLY for detection — global
# normalization must stay byte-stable (goldens pin it). A token is split
# when it starts with one of these keywords and the remainder has ≥2 chars;
# the keyword set excludes short/ambiguous prefixes whose split would
# corrupt real names ("xa" would split "xanh", "q" would split everything).
# "quan(?!g)": glued CamelCase "Quang*" names ("QuangTrung", "QuangNam")
# normalize to tokens starting with "quang" — splitting them at "quan"
# fabricates a district keyword plus a garbage fragment and hallucinates a
# detection. Quang-initial names vastly outnumber glued "Quận G…" strings.
_GLUE_SPLIT = re.compile(r"\b(tinh|huyen|quan(?!g)|phuong|thanh|ttr|tp)([a-z]{2,})\b")
# "thanh pho" glued at the second word ("thanh phoha noi" → "thanh pho ha noi")
_GLUE_SPLIT_PHO = re.compile(r"\b(thanh) pho([a-z]{2,})\b")


def _unglue(std_basic: str) -> str:
    s = _GLUE_SPLIT_PHO.sub(r"\1 pho \2", std_basic)
    return _GLUE_SPLIT.sub(r"\1 \2", s)


def detect_by_prefix(
    std_basic: str,
    provinces: AliasRegistry,
    districts: AliasRegistry,
    wards: AliasRegistry,
) -> tuple[Optional[str], Optional[str], Optional[str]]:
    """Detect (province, district, ward) standardized aliases in the input."""
    if not std_basic:
        return None, None, None
    std_basic = _unglue(std_basic)
    return (
        _first_valid(_PROVINCE_PREF, std_basic, provinces),
        _first_valid(_DISTRICT_PREF, std_basic, districts, exact_elsewhere=provinces),
        _first_valid(_WARD_PREF, std_basic, wards),
    )
