"""Vietnamese address normalization — the char-exact invariant core.

Re-derivation (NOT a copy) of the normalization semantics of the reference
parser: ``/root/reference/fuzz/inexus_parser.py:2295-2473`` (``standardize_name``,
``_normalize_token_basic``) and ``ner/build_standard_dataset.py:375-440``
(``strip_accents``, ``clean_text``, ``tokenize``). The transformation ORDER is
semantic (plain substring replacements cascade), so the step sequence and the
replacement table below must match the reference byte-for-byte; the code around
them is original.

Everything is pure and row-local; the Spark layer wraps these in Arrow-batched
pandas UDFs (one Python call per value inside a vectorized batch — never a
per-row Spark Python UDF).
"""

from __future__ import annotations

import re
import unicodedata

# --------------------------------------------------------------------------
# Diacritic folding
# --------------------------------------------------------------------------

_MN_CACHE: dict[str, str] = {}


def fold_diacritics(s: str) -> str:
    """Lower-case-side fold: đ→d then NFD-decompose and drop combining marks.

    Matches the fold embedded in the reference's ``standardize_name`` step 4
    (inexus_parser.py:2418-2420). Input is expected lowercase (đ only, not Đ).
    """
    s = s.replace("đ", "d")  # đ
    decomposed = unicodedata.normalize("NFD", s)
    return "".join(ch for ch in decomposed if unicodedata.category(ch) != "Mn")


def strip_accents(s: str) -> str:
    """Case-preserving accent strip: NFD, drop Mn marks, đ/Đ→d/D.

    Semantics of the NER generator's ``strip_accents``
    (ner/build_standard_dataset.py:375-387) — note: does NOT lowercase.
    """
    decomposed = unicodedata.normalize("NFD", s)
    out = "".join(ch for ch in decomposed if unicodedata.category(ch) != "Mn")
    return out.replace("đ", "d").replace("Đ", "D")


# --------------------------------------------------------------------------
# Replacement data (order-sensitive; mirrors reference data exactly)
# --------------------------------------------------------------------------

# Administrative-unit noise phrases removed (replaced by a single space) in
# EXACTLY this order via plain substring replacement — later entries see the
# output of earlier ones (e.g. "t." fires before the bare " t " pattern).
# Data parity with inexus_parser.py:2319-2380.
REDUNDANT_UNIT_PHRASES: tuple[str, ...] = (
    "thành phố", "thành phô", "thành fhố", "thanh fho", "thanh pho ",
    "thành. phố", "thành.phố", "tp.", "t.p", "tp ", "t.phố", "t. phố",
    "tỉnh", "tinh", "tt.", "t.", " t ",
    "quận", "qận", "qun", "q.", "q ",
    "huyện", "h.", " h ", ".h ",
    "district", "dist.", "dist ", "ward", "w.", "w ",
    "city", "province", "municipality", "town", "village", "commune",
    "thị xã", "thị.xã", "tx.", "t.xã", "tx ",
    "thị trấn", "thị.trấn", "tt ",
    "xã", "x.", "x ",
    "phường", "kp.", "p.", " p ", ".p ", "phường.", "phường ",
    "f", "j", "z", "w",
)

# Abbreviation→full-name expansions applied only when the string mentions
# Ho Chi Minh City (inexus_parser.py:2432-2446).
HCM_DISTRICT_ABBREVIATIONS: tuple[tuple[str, str], ...] = (
    ("bc", "binh chanh"),
    ("tb", "tan binh"),
    ("bt", "binh thanh"),
    ("gv", "go vap"),
    ("pn", "phu nhuan"),
    ("cc", "cu chi"),
    ("hm", "hoc mon"),
    ("nb", "nha be"),
)

# --------------------------------------------------------------------------
# Precompiled patterns
# --------------------------------------------------------------------------

_EDGE_PUNCT_HEAD = re.compile(r"^[\.,]+")
_EDGE_PUNCT_TAIL = re.compile(r"[\.,]+$")

# NOTE: the dots in these alias patterns are intentionally UNESCAPED wildcards
# — that is the reference's observed behavior (inexus_parser.py:2312-2316):
# "t.t.h" matches t‹any›t‹any›h, etc.
_ALIAS_TTH = re.compile(r"\b(t.t.h)\b", re.IGNORECASE)
_ALIAS_HCM = re.compile(r"\b(h.c.m|h.c.minh)\b", re.IGNORECASE)
_ALIAS_HANOI = re.compile(r"\b(hn|h.noi|ha ni)\b", re.IGNORECASE)

# Hamlet / alley / block clauses dropped wholesale (inexus_parser.py:2385-2412).
# The leading empty alternative is preserved deliberately: it makes the whole
# group nullable exactly as in the reference (a zero-width no-op under re.sub).
_HAMLET_CLAUSES = re.compile(
    r"\b("
    r"|tiểu\s*khu(\s*\d+\w*)?"
    r"|khu\s*pho(\s*\d+\w*)?"
    r"|khu\s*phố(\s*\d+\w*)?"
    r"|khu\s*vuc(\s*\d+\w*)?"
    r"|khu\s*vực(\s*\d+\w*)?"
    r"|khu(\s*\d+\w*)?"
    r"|kp(\s*\d+\w*)?"
    r"|tổ\s*dân\s*phố(\s*\d+\w*)?"
    r"|tổ(\s*\d+\w*)?"
    r"|thôn(\s*\d+\w*)?"
    r"|xóm(\s*\d+\w*)?"
    r"|cụm(\s*\d+\w*)?"
    r"|phố(\s*\d+\w*)?"
    r"|khóm(\s*\d+\w*)?"
    r"|số\s*nhà(\s*\d+\w*)?"
    r"|số(\s*\d+\w*)?"
    r"|nhà(\s*\d+\w*)?"
    r"|ấp(\s*\d+\w*)?"
    r"|ngách\s*\d+\w*"
    r"|ngõ\s*\d+\w*"
    r"|hẻm\s*\d+\w*"
    r")\b",
    re.IGNORECASE,
)

_TP_GLUED = re.compile(r"\btp([a-z0-9]+)")
_NON_ALNUM_SPACE = re.compile(r"[^a-z0-9\s]+")
_HCM_VARIANTS = re.compile(r"\b(hochiminh|hochi\s*minh|ho\s*chiminh|hcm|hcminh)\b", re.IGNORECASE)
_HCM_PRESENT = re.compile(r"\bho chi minh\b", re.IGNORECASE)
_HCM_ABBREV_PATTERNS: tuple[tuple[re.Pattern[str], str], ...] = tuple(
    (re.compile(rf"\b{abbr}\b", re.IGNORECASE), full)
    for abbr, full in HCM_DISTRICT_ABBREVIATIONS
)
_LEADING_ZEROS = re.compile(r"\b0+(\d+)\b")
_LONG_DIGIT_RUN = re.compile(r"\d{3,}")
_PQ_NUMBER = re.compile(r"\b[pq](\d+)\b")
_MULTI_SPACE = re.compile(r"\s+")
_NON_ALNUM_ALL = re.compile(r"[^a-z0-9]+")
_TOKEN_PATTERN = re.compile(r"\w+|[^\w\s]", re.UNICODE)


# --------------------------------------------------------------------------
# Public API
# --------------------------------------------------------------------------

def standardize_name(name: str, advanced: bool = False) -> str:
    """Canonicalize a Vietnamese place name / address fragment.

    Behavioral parity with the reference's ``standardize_name``
    (inexus_parser.py:2295-2463); golden-tested char-for-char in
    ``tests/test_textops_golden.py``. ``advanced=False`` is the light fold used
    for gazetteer names; ``advanced=True`` additionally strips administrative
    noise words, hamlet clauses, long digit runs and expands HCM aliases — the
    form used for free-text inputs.
    """
    if not name:
        return ""

    s = name.lower()
    s = _EDGE_PUNCT_HEAD.sub("", s)
    s = _EDGE_PUNCT_TAIL.sub("", s)
    s = s.replace("/", "")

    if advanced:
        s = _ALIAS_TTH.sub(" thua thien hue ", s)
        s = _ALIAS_HCM.sub(" ho chi minh ", s)
        s = _ALIAS_HANOI.sub(" ha noi ", s)
        for phrase in REDUNDANT_UNIT_PHRASES:
            s = s.replace(phrase, " ")
        s = _HAMLET_CLAUSES.sub("", s)
        s = _TP_GLUED.sub(r"\1", s)

    s = fold_diacritics(s)
    s = _NON_ALNUM_SPACE.sub(" ", s)

    if advanced:
        s = _HCM_VARIANTS.sub("ho chi minh", s)
        if _HCM_PRESENT.search(s):
            for pattern, full in _HCM_ABBREV_PATTERNS:
                s = pattern.sub(full, s)
        s = _LEADING_ZEROS.sub(r"\1", s)
        s = _LONG_DIGIT_RUN.sub("", s)
        s = _PQ_NUMBER.sub(r"\1", s)

    return _MULTI_SPACE.sub(" ", s).strip()


def normalize_basic(name: str) -> str:
    """``standardize_name(name, advanced=False)`` — gazetteer-side fold."""
    return standardize_name(name, False)


def normalize_advanced(name: str) -> str:
    """``standardize_name(name, advanced=True)`` — input-side fold."""
    return standardize_name(name, True)


def normalize_token(token: str) -> str:
    """Single-token fold: lower, đ→d, accent-strip, keep only [a-z0-9].

    Parity with ``_normalize_token_basic`` (inexus_parser.py:2465-2473).
    """
    if not token:
        return ""
    return _NON_ALNUM_ALL.sub("", fold_diacritics(token.lower()))


def clean_text(s: str | None, remove_slash: bool = True) -> str:
    """NBSP → space, optionally ``/`` → space, collapse whitespace.

    Parity with the NER generator's ``clean_text``
    (ner/build_standard_dataset.py:410-417).
    """
    if not s:
        return ""
    s = s.replace("\u00a0", " ")
    if remove_slash:
        s = s.replace("/", " ")
    return _MULTI_SPACE.sub(" ", s).strip()


def tokenize(s: str) -> list[str]:
    """``\\w+|[^\\w\\s]`` tokenization (ner/build_standard_dataset.py:16)."""
    return _TOKEN_PATTERN.findall(s)
