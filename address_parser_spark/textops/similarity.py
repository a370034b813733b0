"""String similarity scorers — from scratch, no third-party fuzz library.

The reference scores candidates with RapidFuzz (``ratio`` = normalized Indel,
``partial_ratio``, ``WRatio``; inexus_parser.py:7-9, 2886-2900). RapidFuzz is
not available in this environment, so the scorers are re-implemented here with
bit-parallel algorithms (Hyyrö's LCS bit-vector for Indel, Myers' bit-vector
for Levenshtein) — O(ceil(m/w)·n) with Python big-int words, microseconds per
pair for address-length strings. Properties are cross-checked against naive
DP implementations with Hypothesis in ``tests/test_similarity.py``.

All ``*_ratio`` functions return floats on the 0..100 scale (RapidFuzz
convention); ``jaro_winkler`` returns 0..1 (the conventional scale).
"""

from __future__ import annotations

from functools import lru_cache


# --------------------------------------------------------------------------
# Bit-parallel cores
# --------------------------------------------------------------------------

@lru_cache(maxsize=16384)
def _char_masks(pattern: str) -> dict[str, int]:
    """Per-character position bitmasks for *pattern* (bit i ⇔ pattern[i])."""
    masks: dict[str, int] = {}
    bit = 1
    for ch in pattern:
        masks[ch] = masks.get(ch, 0) | bit
        bit <<= 1
    return masks


def lcs_length(a: str, b: str) -> int:
    """Longest-common-subsequence length via the Allison–Dix/Hyyrö bit-vector.

    ``V`` holds one bit per character of ``a``; after consuming ``b`` the count
    of ZERO bits in ``V`` is the LCS length.
    """
    if not a or not b:
        return 0
    if len(a) > len(b):
        a, b = b, a
    masks = _char_masks(a)
    m = len(a)
    full = (1 << m) - 1
    v = full
    for ch in b:
        pm = masks.get(ch)
        if pm is None:
            continue
        u = v & pm
        v = ((v + u) | (v - u)) & full
    return m - v.bit_count()


def levenshtein(a: str, b: str) -> int:
    """Unit-cost edit distance via Myers' 1999 bit-vector algorithm."""
    if not a:
        return len(b)
    if not b:
        return len(a)
    if len(a) > len(b):
        a, b = b, a
    masks = _char_masks(a)
    m = len(a)
    full = (1 << m) - 1
    high = 1 << (m - 1)
    vp, vn = full, 0
    dist = m
    for ch in b:
        pm = masks.get(ch, 0) | vn
        d0 = (((pm & vp) + vp) ^ vp) | pm
        hp = vn | (~(d0 | vp) & full)
        hn = d0 & vp
        if hp & high:
            dist += 1
        elif hn & high:
            dist -= 1
        hp = ((hp << 1) | 1) & full
        hn = (hn << 1) & full
        vp = hn | (~(d0 | hp) & full)
        vn = d0 & hp
    return dist


def indel_distance(a: str, b: str) -> int:
    """Insert/delete-only edit distance: ``m + n − 2·LCS``."""
    return len(a) + len(b) - 2 * lcs_length(a, b)


# --------------------------------------------------------------------------
# Ratio-scale scorers (0..100)
# --------------------------------------------------------------------------

def indel_ratio(a: str, b: str) -> float:
    """Normalized Indel similarity ×100 — RapidFuzz ``fuzz.ratio`` semantics."""
    total = len(a) + len(b)
    if total == 0:
        return 100.0
    return 100.0 * (2.0 * lcs_length(a, b)) / total


@lru_cache(maxsize=65536)
def partial_ratio(a: str, b: str) -> float:
    """Best ``indel_ratio`` of the shorter string against same-length windows
    of the longer one (edge windows included). lru-cached: the scoring blend
    evaluates partial_ratio(inp, cand) both directly and inside ``wratio``
    for the same pair — the cache collapses the duplicate scan.

    Exact-output pruning (the scan is the kernel's hottest loop):

    - **Lipschitz window skip.** Sliding a fixed-length window by one char
      changes its LCS with ``short`` by at most 1, so after measuring window
      ``i`` at LCS ``L``, no window ``i+k`` can beat the current best LCS
      before ``k > best_lcs − L`` — those windows are skipped unmeasured.
    - **Edge-window length bound.** A truncated window of length ``k`` has
      LCS ≤ k, so ratio ≤ 200k/(ls+k); k below the bound implied by the
      running best cannot win and is never measured.
    """
    if not a and not b:
        return 100.0
    if not a or not b:
        return 0.0
    short, long_ = (a, b) if len(a) <= len(b) else (b, a)
    ls, ll = len(short), len(long_)
    if ls == ll:
        return indel_ratio(short, long_)
    # The whole-string alignment is always a candidate: partial_ratio must
    # dominate plain ratio (windows alone can lose to it, e.g. "11"/"101").
    best = indel_ratio(short, long_)
    # Full-length interior windows: ratio = 100·lcs/ls, so track best as lcs.
    best_lcs = int(best * ls / 100.0)  # floor: current best ⇒ beat this lcs
    i = 0
    last = ll - ls
    while i <= last:
        lcs = lcs_length(short, long_[i : i + ls])
        if lcs > best_lcs:
            best_lcs = lcs
            score = 100.0 * lcs / ls
            if score > best:
                best = score
                if best >= 100.0:
                    return 100.0
            i += 1
        else:
            # windows i+1 .. i+(best_lcs-lcs) cannot exceed best_lcs
            i += best_lcs - lcs + 1
    # Truncated edge windows (prefix/suffix overhangs).
    for k in range(1, ls):
        if 200.0 * k / (ls + k) <= best:
            continue
        score = indel_ratio(short, long_[:k])
        if score > best:
            best = score
        score = indel_ratio(short, long_[ll - k :])
        if score > best:
            best = score
    return best


@lru_cache(maxsize=65536)
def _token_sorted(s: str) -> str:
    return " ".join(sorted(s.split()))




def token_sort_ratio(a: str, b: str) -> float:
    return indel_ratio(_token_sorted(a), _token_sorted(b))


def token_set_ratio(a: str, b: str) -> float:
    ta, tb = set(a.split()), set(b.split())
    if not ta and not tb:
        return 100.0
    inter = " ".join(sorted(ta & tb))
    sect_a = (inter + " " + " ".join(sorted(ta - tb))).strip()
    sect_b = (inter + " " + " ".join(sorted(tb - ta))).strip()
    return max(
        indel_ratio(inter, sect_a),
        indel_ratio(inter, sect_b),
        indel_ratio(sect_a, sect_b),
    )


def wratio(a: str, b: str) -> float:
    """Weighted composite ratio (RapidFuzz ``fuzz.WRatio`` shape): plain ratio
    vs 0.95-scaled token ratios, switching to 0.9/0.6-scaled partials when the
    operand lengths diverge."""
    if not a or not b:
        return 0.0
    base = indel_ratio(a, b)
    la, lb = len(a), len(b)
    len_ratio = max(la, lb) / max(min(la, lb), 1)
    token = max(token_sort_ratio(a, b), token_set_ratio(a, b))
    if len_ratio < 1.5:
        return max(base, token * 0.95)
    # NOTE: a char-count upper-bound prune of the two partial scans was tried
    # and removed — blocking-derived candidate pairs share most of their
    # characters by construction, so the bound almost never fired and its
    # cost exceeded the savings (measured 7.5 → 8.1 ms/mention).
    partial_scale = 0.9 if len_ratio < 8.0 else 0.6
    partial = partial_ratio(a, b)
    partial_token = partial_ratio(_token_sorted(a), _token_sorted(b))
    return max(base, partial * partial_scale, partial_token * 0.95 * partial_scale)


# --------------------------------------------------------------------------
# Set / edit scorers for the pair stage
# --------------------------------------------------------------------------

def dice_coefficient(set_a: frozenset | set, set_b: frozenset | set) -> float:
    """Sørensen–Dice over shingle sets: ``2·|A∩B| / (|A|+|B|)``."""
    denom = len(set_a) + len(set_b)
    if denom == 0:
        return 0.0
    return (2.0 * len(set_a & set_b)) / denom


def dice_from_counts(intersection: int, size_a: int, size_b: int) -> float:
    """Dice from precomputed sizes — used when the blocking join already
    produced the intersection cardinality (no set materialization)."""
    denom = size_a + size_b
    if denom == 0:
        return 0.0
    return (2.0 * intersection) / denom


def token_overlap(a: str, b: str) -> float:
    """Overlap coefficient over whitespace tokens: ``|A∩B| / min(|A|,|B|)``."""
    ta, tb = set(a.split()), set(b.split())
    if not ta or not tb:
        return 0.0
    return len(ta & tb) / min(len(ta), len(tb))


def jaro(a: str, b: str) -> float:
    la, lb = len(a), len(b)
    if la == 0 and lb == 0:
        return 1.0
    if la == 0 or lb == 0:
        return 0.0
    window = max(la, lb) // 2 - 1
    if window < 0:
        window = 0
    match_a = [False] * la
    match_b = [False] * lb
    matches = 0
    for i, ch in enumerate(a):
        lo = max(0, i - window)
        hi = min(lb, i + window + 1)
        for j in range(lo, hi):
            if not match_b[j] and b[j] == ch:
                match_a[i] = True
                match_b[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    transpositions = 0
    j = 0
    for i in range(la):
        if match_a[i]:
            while not match_b[j]:
                j += 1
            if a[i] != b[j]:
                transpositions += 1
            j += 1
    t = transpositions // 2
    return (matches / la + matches / lb + (matches - t) / matches) / 3.0


def jaro_winkler(a: str, b: str, prefix_weight: float = 0.1, max_prefix: int = 4) -> float:
    base = jaro(a, b)
    if base <= 0.7:
        return base
    prefix = 0
    for ca, cb in zip(a, b):
        if ca != cb or prefix >= max_prefix:
            break
        prefix += 1
    return base + prefix * prefix_weight * (1.0 - base)
