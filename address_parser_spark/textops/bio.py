"""BIO token labeling for NER dataset generation.

Parity with the reference generator's ``tag_phrase`` / ``label_tokens``
(ner/build_standard_dataset.py:92-145): tokenize the cleaned address with the
``\\w+|[^\\w\\s]`` pattern, find the FIRST window whose accent-stripped
lowercase tokens equal the phrase's, mark it ``B-<label>`` / ``I-<label>``.
Tag order STREET → WARD → DISTRICT → PROVINCE matters: earlier labels claim
overlapping windows first (reference behavior — later phrases overwrite tags
in their window, including windows already tagged).
"""

from __future__ import annotations

from typing import Optional

from address_parser_spark.textops.normalize import clean_text, strip_accents, tokenize

LABEL_ORDER = ("STREET", "WARD", "DISTRICT", "PROVINCE")


def _norm_token(token: str) -> str:
    return strip_accents(token or "").lower()


def _phrase_tokens(text: Optional[str]) -> list[str]:
    if not text:
        return []
    return tokenize(clean_text(text, remove_slash=False))


def label_tokens(
    address: str,
    street: Optional[str] = None,
    province: Optional[str] = None,
    district: Optional[str] = None,
    ward: Optional[str] = None,
) -> dict:
    """→ {tokens, ner_tags, matches{label: bool}} — reference-shape record."""
    tokens = tokenize(clean_text(address, remove_slash=False))
    tags = ["O"] * len(tokens)
    norm_tokens = [_norm_token(t) for t in tokens]

    phrases = {"STREET": street, "WARD": ward, "DISTRICT": district, "PROVINCE": province}
    matches: dict[str, bool] = {}
    for label in LABEL_ORDER:
        phrase = _phrase_tokens(phrases[label])
        matched = False
        if phrase:
            norm_phrase = [_norm_token(t) for t in phrase]
            window = len(norm_phrase)
            for start in range(len(tokens) - window + 1):
                if norm_tokens[start : start + window] == norm_phrase:
                    tags[start] = f"B-{label}"
                    for off in range(1, window):
                        tags[start + off] = f"I-{label}"
                    matched = True
                    break
        matches[label] = matched
    return {"tokens": tokens, "ner_tags": tags, "matches": matches}
