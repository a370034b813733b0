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

_NEXT = r"(?=\b(?:phuong|xa|thi tran|quan|huyen|thi xa|district|ward|commune|town|thanh pho|city|province)\b|$)"
_PROVINCE_PREF = re.compile(
    r"\b(?:thanh pho|tp|tinh|city|province|municipality)\b\s+([a-z0-9 ]+?)"
    r"(?=\b(?:quan|huyen|thi xa|thi tran|phuong|xa|tp|tinh|district|ward|commune|town|thanh pho|city|province)\b|$)"
)
_DISTRICT_PREF = re.compile(
    r"\b(?:quan|huyen|thi xa|thi tran|thanh pho|tp|city|municipality|district|county)\b\s+([a-z0-9 ]+?)" + _NEXT
)
_WARD_PREF = re.compile(r"\b(?:phuong|xa|thi tran|ward|commune|town)\b\s+([a-z0-9 ]+?)" + _NEXT)

PARTIAL_CUTOFF = 70.0


def _trim_fragment(fragment: str) -> str:
    """≤4 tokens kept when the 4th is single-char, else ≤3 (reference rule)."""
    tokens = fragment.split()
    if len(tokens) <= 4:
        return " ".join(tokens)
    if len(tokens) > 3 and len(tokens[3]) == 1:
        return " ".join(tokens[:4])
    return " ".join(tokens[:3])


def _pick_best(fragment: str, choices: Sequence[str], choice_set: frozenset[str]) -> Optional[str]:
    fragment = _trim_fragment(fragment.strip())
    if not fragment:
        return None
    if fragment in choice_set:
        return fragment
    best_choice: Optional[str] = None
    best_score = -1.0
    best_delta: Optional[int] = None
    for choice in choices:
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
    province_names: Sequence[str],
    district_names: Sequence[str],
    ward_names: Sequence[str],
    province_set: frozenset[str],
    district_set: frozenset[str],
    ward_set: frozenset[str],
) -> tuple[Optional[str], Optional[str], Optional[str]]:
    """Detect (province, district, ward) standardized aliases in the input."""
    if not std_basic:
        return None, None, None
    prov = dist = ward = None
    m = _PROVINCE_PREF.search(std_basic)
    if m and province_names:
        prov = _pick_best(m.group(1), province_names, province_set)
    m = _DISTRICT_PREF.search(std_basic)
    if m and district_names:
        dist = _pick_best(m.group(1), district_names, district_set)
    m = _WARD_PREF.search(std_basic)
    if m and ward_names:
        ward = _pick_best(m.group(1), ward_names, ward_set)
    return prov, dist, ward
