"""Prefix-based component detection on basic-normalized text.

Parity with the reference's ``_detect_by_prefix`` (inexus_parser.py:2685-2762):
three regexes capture the fragment after a type keyword (``thanh pho|tp|…`` /
``quan|huyen|…`` / ``phuong|xa|…``) up to the next keyword; the fragment is
trimmed to ≤3-4 tokens and resolved against the level's standardized alias
registry — exact hit first, else best ``partial_ratio ≥ 70`` with smallest
length-delta tiebreak.

Used twice in the engine: component boosts during candidate scoring
(inexus_parser.py:2855-2912) and the repair cascade on winners.
"""

from __future__ import annotations

import re
from typing import Optional, Sequence

from address_parser_spark.textops.similarity import partial_ratio

_NEXT = r"(?=\b(?:phuong|xa|thi tran|quan|huyen|thi xa|district|ward|commune|town|thanh pho|city|province|p|q)\b|$)"
_PROVINCE_PREF = re.compile(
    r"\b(?:thanh pho|tp|tinh|city|province|municipality)\b\s+([a-z0-9 ]+?)"
    r"(?=\b(?:quan|huyen|thi xa|thi tran|phuong|xa|tp|tinh|district|ward|commune|town|thanh pho|city|province|p|q)\b|$)"
)
# District keywords split in two tiers: specific (quan/huyen/… and the bare
# "q" abbreviation surviving basic normalization of "Q.") vs city-ish words
# that more often introduce the PROVINCE — specific matches are tried first
# and a candidate equal to the detected province is rejected (the reference's
# single first-match search, inexus_parser.py:2754-2756, grabs "thanh pho
# <province>" here and mis-detects; fixed deliberately).
_DISTRICT_PREF_SPECIFIC = re.compile(
    r"\b(?:quan|huyen|thi xa|thi tran|district|county|q)\b\s+([a-z0-9 ]+?)" + _NEXT
)
_DISTRICT_PREF_CITYISH = re.compile(
    r"\b(?:thanh pho|tp|city|municipality)\b\s+([a-z0-9 ]+?)" + _NEXT
)
# "p" joins the ward keywords: basic normalization turns "P.25" into "p 25".
_WARD_PREF = re.compile(r"\b(?:phuong|xa|thi tran|ward|commune|town|p)\b\s+([a-z0-9 ]+?)" + _NEXT)

PARTIAL_CUTOFF = 70.0


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

    __slots__ = ("choices", "choice_set", "grams")

    def __init__(self, choices: Sequence[str]):
        self.choices = list(choices)
        self.choice_set = frozenset(self.choices)
        self.grams: dict[str, list[int]] = {}
        for idx, choice in enumerate(self.choices):
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
    best_choice: Optional[str] = None
    best_score = -1.0
    best_delta: Optional[int] = None
    for choice in registry.candidates(fragment):
        score = partial_ratio(fragment, choice)
        if score < PARTIAL_CUTOFF:
            continue
        delta = abs(len(choice) - len(fragment))
        if score > best_score:
            best_choice, best_score, best_delta = choice, score, delta
        elif score == best_score and best_delta is not None and delta < best_delta:
            best_choice, best_delta = choice, delta
    return best_choice


def detect_by_prefix(
    std_basic: str,
    provinces: AliasRegistry,
    districts: AliasRegistry,
    wards: AliasRegistry,
) -> tuple[Optional[str], Optional[str], Optional[str]]:
    """Detect (province, district, ward) standardized aliases in the input."""
    if not std_basic:
        return None, None, None
    prov = dist = ward = None

    for m in _PROVINCE_PREF.finditer(std_basic):
        prov = _pick_best(m.group(1), provinces)
        if prov:
            break

    for pattern in (_DISTRICT_PREF_SPECIFIC, _DISTRICT_PREF_CITYISH):
        for m in pattern.finditer(std_basic):
            cand = _pick_best(m.group(1), districts)
            if cand and cand != prov:
                dist = cand
                break
        if dist:
            break

    for m in _WARD_PREF.finditer(std_basic):
        cand = _pick_best(m.group(1), wards)
        if cand:
            ward = cand
            break

    return prov, dist, ward
