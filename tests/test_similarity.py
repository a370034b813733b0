"""Property tests for the from-scratch similarity scorers.

Bit-parallel LCS (Allison–Dix/Hyyrö) and Levenshtein (Myers) are cross-checked
against naive O(m·n) dynamic programs with Hypothesis.
"""

from hypothesis import given, settings
from hypothesis import strategies as st

from address_parser_spark.textops.similarity import (
    dice_coefficient,
    indel_ratio,
    jaro,
    jaro_winkler,
    lcs_length,
    levenshtein,
    partial_ratio,
    token_set_ratio,
    token_sort_ratio,
    wratio,
)

ALPHABET = "abc d01đàá"
short_text = st.text(alphabet=ALPHABET, max_size=24)


def lcs_dp(a: str, b: str) -> int:
    prev = [0] * (len(b) + 1)
    for ca in a:
        cur = [0]
        for j, cb in enumerate(b):
            cur.append(prev[j] + 1 if ca == cb else max(prev[j + 1], cur[j]))
        prev = cur
    return prev[-1]


def lev_dp(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


@settings(max_examples=300, deadline=None)
@given(short_text, short_text)
def test_lcs_matches_dp(a, b):
    assert lcs_length(a, b) == lcs_dp(a, b)


@settings(max_examples=300, deadline=None)
@given(short_text, short_text)
def test_levenshtein_matches_dp(a, b):
    assert levenshtein(a, b) == lev_dp(a, b)


@settings(max_examples=200, deadline=None)
@given(short_text, short_text)
def test_ratio_bounds_and_symmetry(a, b):
    r = indel_ratio(a, b)
    assert 0.0 <= r <= 100.0
    assert abs(r - indel_ratio(b, a)) < 1e-9
    assert indel_ratio(a, a) == 100.0


@settings(max_examples=200, deadline=None)
@given(short_text, short_text)
def test_partial_ratio_dominates_ratio(a, b):
    assert partial_ratio(a, b) >= indel_ratio(a, b) - 1e-9


@settings(max_examples=100, deadline=None)
@given(short_text, short_text)
def test_composite_scorers_bounded(a, b):
    for fn in (wratio, token_sort_ratio, token_set_ratio):
        assert 0.0 <= fn(a, b) <= 100.0 + 1e-9
    assert 0.0 <= jaro(a, b) <= 1.0
    assert 0.0 <= jaro_winkler(a, b) <= 1.0


def test_known_values():
    assert levenshtein("kitten", "sitting") == 3
    assert lcs_length("abcde", "ace") == 3
    assert indel_ratio("", "") == 100.0
    assert indel_ratio("abc", "") == 0.0
    assert partial_ratio("ha noi", "thanh pho ha noi viet nam") == 100.0
    assert dice_coefficient({"ab", "bc"}, {"ab", "cd"}) == 0.5
    assert jaro("martha", "marhta") > 0.94
    assert jaro_winkler("dwayne", "duane") > jaro("dwayne", "duane")
