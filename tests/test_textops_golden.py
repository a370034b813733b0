"""Char-for-char parity of the textops core vs reference-derived fixtures.

Fixtures were produced once by scripts/gen_golden_fixtures.py running the
reference parser's pure string functions (inexus_parser.py:2295-2660) and are
committed — the suite has no runtime dependency on /root/reference.
"""

import json
from pathlib import Path

import pytest

from address_parser_spark.textops import (
    char_ngrams,
    component_signature,
    extract_street,
    normalize_token,
    standardize_name,
)

FIXTURES = json.loads(
    (Path(__file__).parent / "fixtures" / "norm_golden.json").read_text(encoding="utf-8")
)


@pytest.mark.parametrize("row", FIXTURES["normalize"], ids=lambda r: repr(r["raw"])[:40])
def test_standardize_parity(row):
    assert standardize_name(row["raw"], False) == row["std_basic"]
    assert standardize_name(row["raw"], True) == row["std_advanced"]
    assert normalize_token(row["raw"]) == row["token_basic"]
    assert char_ngrams(standardize_name(row["raw"], True)) == row["ngrams"]


@pytest.mark.parametrize("row", FIXTURES["street"], ids=lambda r: repr(r["original"])[:40])
def test_street_extraction_parity(row):
    got = extract_street(row["original"], row["province"], row["district"], row["ward"])
    assert got == row["street"]


@pytest.mark.parametrize("row", FIXTURES["signatures"], ids=lambda r: repr(r["component"]))
def test_component_signature_parity(row):
    sequences, tokens = component_signature(row["component"])
    assert sequences == row["sequences"]
    assert sorted(tokens) == row["tokens"]


@pytest.mark.parametrize("row", FIXTURES["bio"], ids=lambda r: repr(r["original"])[:40])
def test_bio_labeling_parity(row):
    from address_parser_spark.textops.bio import label_tokens

    got = label_tokens(
        row["original"], street=None, province=row["province"],
        district=row["district"], ward=row["ward"],
    )
    assert got["tokens"] == row["tokens"]
    assert got["ner_tags"] == row["ner_tags"]
    assert got["matches"] == row["matches"]


# ---------------------------------------------------------------------------
# html → text extraction (textops/html.py)
# ---------------------------------------------------------------------------

_HTML_DIR = Path(__file__).parent / "fixtures" / "html"


@pytest.mark.parametrize("name", ["shop_page", "edge_cases", "plain"])
def test_html_to_text_golden_byte_identity(name):
    """Committed, human-reviewed goldens: extraction output must match the
    expected .txt fixture byte-for-byte (the per-url extraction invariant
    extended to the html:binary intake)."""
    from address_parser_spark.textops.html import html_to_text

    markup = (_HTML_DIR / f"{name}.html").read_bytes()
    want = (_HTML_DIR / f"{name}.txt").read_bytes()
    assert html_to_text(markup).encode("utf-8") == want


def test_html_to_text_matches_synth_text_exactly(gaz):
    """For every synthetic page, extracting from the html column reproduces
    the text column byte-for-byte — markup chrome (head/script/style/
    comments), inline tags, and entity references all stripped/decoded."""
    from address_parser_spark.sources.pages import synth_pages_local
    from address_parser_spark.textops.html import html_to_text

    pages, _ = synth_pages_local(gaz, 400)
    for url, _ts, html, text, _lang in pages:
        assert html_to_text(html) == text, url


def test_html_to_text_defensive_inputs():
    from address_parser_spark.textops.html import html_to_text

    assert html_to_text(None) == ""
    assert html_to_text(b"") == ""
    assert html_to_text(b"\xff\xfe broken <b>utf8</b>") == "�� broken utf8"
    # unterminated script: swallowed to EOF is wrong; content after a lone
    # open tag must still surface (regex needs the closing tag to drop)
    assert html_to_text(b"<script>var x = 1;") == "var x = 1;"
