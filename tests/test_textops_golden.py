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


def test_detect_ward_keyword_after_final_t_token(gaz):
    """Regression (round-5 review): the t-p/t-x suppression must block the
    ward keyword only after a BARE "t" token (T.P/T.X normalization), never
    after a word merely ending in t ("Bến Cát P. Mỹ Phước") — final-t
    syllables are everywhere in Vietnamese."""
    from address_parser_spark.gazetteer.nodes import alias_registries
    from address_parser_spark.textops.detect import AliasRegistry, detect_by_prefix

    regs = alias_registries(gaz)
    rp, rd, rw = (AliasRegistry(regs[k]) for k in ("province", "district", "ward"))
    # synthetic gazetteer: pick a real ward alias and place it after a
    # final-t word with the bare "p" keyword
    ward_alias = sorted(regs["ward"])[0]
    _, _, dw = detect_by_prefix(f"thi xa ben cat p {ward_alias}", rp, rd, rw)
    assert dw == ward_alias
    # the T.P form (bare t token) must still be suppressed
    _, _, dw2 = detect_by_prefix(f"so 9 t p {ward_alias}", rp, rd, rw)
    assert dw2 != ward_alias or dw2 is None


def test_glue_split_never_splits_quang_names():
    from address_parser_spark.textops.detect import _unglue

    assert _unglue("nha 5 quangtrung ha noi") == "nha 5 quangtrung ha noi"
    assert _unglue("tinhquang nam") == "tinh quang nam"
    assert _unglue("huyennhu thanh") == "huyen nhu thanh"
    assert _unglue("thanh phoha noi") == "thanh pho ha noi"


def test_html_literal_lt_is_content():
    """Regression (round-5 review): a raw '<' in text is content per the
    HTML5 tokenizer, not a tag opener — it must not swallow the page."""
    from address_parser_spark.textops.html import html_to_text

    out = html_to_text(b"<p>Gi\xc3\xa1 < 100k. \xc4\x90/c: 12 L\xc3\xaa L\xe1\xbb\xa3i, Q.1 x > y</p>")
    assert "12 L" in out and "< 100k" in out


def test_detect_compressed_alias_with_poison_guard(gaz):
    """Glued CamelCase names ("Thành phốHàNội" → fragment "hanoi") resolve
    via the compressed-alias map — and the other-level poison guard runs on
    the compressed form too, so the district detector must SKIP a fragment
    that is exactly a province alias instead of claiming it."""
    from address_parser_spark.gazetteer.nodes import alias_registries
    from address_parser_spark.textops.detect import AliasRegistry, detect_by_prefix

    regs = alias_registries(gaz)
    rp, rd, rw = (AliasRegistry(regs[k]) for k in ("province", "district", "ward"))
    prov = sorted(regs["province"], key=len)[-1]  # a multi-token province alias
    glued = prov.replace(" ", "")
    dp, dd, _ = detect_by_prefix(f"so 1 le loi thanh pho {glued}", rp, rd, rw)
    assert dp == prov
    assert dd != prov  # guard: the province fragment never becomes a district
