"""Style coverage of the variant-spec renderer (reference
``ner/build_standard_dataset.py:223-372`` — the 34-spec table — plus
``collect_variants``/``infer_includes_type`` :558-576/:420-436).

Three contracts:
1. the spec table carries all 34 reference spec families (names + knobs);
2. every ER-eligible family actually renders on a sample corpus;
3. the renderer-parser contract holds: ≥98.5% of rendered mentions resolve
   to their gold entity key through LocalParser (the same pure functions the
   distributed kernel runs) — the F1 gate's mention-level counterpart.
"""

from __future__ import annotations

import random

import pytest

from address_parser_spark.gazetteer import synth_gazetteer
from address_parser_spark.sources.pages import (
    RENDER_SPECS,
    _NEW_SPECS,
    _OLD_FULL_SPECS,
    _OLD_PARTIAL_SPECS,
    _GazIndex,
    _collect_variants,
    _infer_includes_type,
    _render_mention,
)

_REFERENCE_SPEC_NAMES = {
    "standard", "standard_no_commas", "lowercase", "lowercase_no_commas",
    "accentless", "accentless_commas", "abbrev_commas", "abbrev_no_commas",
    "compact_commas", "compact_no_commas", "compact_short", "compact_short_evil",
    "meaningful_connectors", "no_street_compact",
    "ward_only", "ward_only_abbrev", "district_only", "district_only_abbrev",
    "province_only", "province_only_abbrev",
    "ward_province", "ward_province_abbrev", "province_ward", "province_ward_abbrev",
    "district_province", "district_province_abbrev",
    "province_district", "province_district_abbrev",
    "ward_district", "ward_district_abbrev",
    "district_first", "district_first_abbrev",
    "province_first", "province_first_abbrev",
}


def test_spec_table_matches_reference_families():
    assert len(RENDER_SPECS) == 34
    assert {s.name for s in RENDER_SPECS} == _REFERENCE_SPEC_NAMES
    by_name = {s.name: s for s in RENDER_SPECS}
    # spot-check knob parity with the reference table
    evil = by_name["compact_short_evil"]
    assert evil.lowercase and evil.strip_accents and evil.abbreviate_types
    assert evil.drop_type_tokens and evil.prefer_short_name and not evil.use_commas
    mc = by_name["meaningful_connectors"]
    assert mc.prefer_full_name and dict(mc.connectors)["WARD|DISTRICT"] == "thuộc"
    assert by_name["province_first"].component_order == ("PROVINCE", "DISTRICT", "WARD")
    assert not by_name["ward_only"].include_street


def test_infer_includes_type():
    assert _infer_includes_type("Thành phố Hồ Chí Minh")
    assert _infer_includes_type("phuong tan binh")
    assert _infer_includes_type("Thị trấn Củ Chi")
    assert not _infer_includes_type("Tân Bình")
    assert not _infer_includes_type("Hồ Chí Minh")


def test_collect_variants_pool():
    rec = {"name": "Tân Bình", "full_name": "Quận Tân Bình", "code_name": "tan_binh"}
    pool = dict(_collect_variants(rec))
    assert pool["Tân Bình"] is False
    assert pool["Quận Tân Bình"] is True
    # code_name dedups against the accentless key of "Tân Bình"
    assert "tan binh" not in pool


@pytest.fixture(scope="module")
def gidx():
    return _GazIndex(synth_gazetteer())


def test_all_eligible_families_render(gidx):
    rng = random.Random(11)
    seen: set[str] = set()
    for _ in range(3000):
        w = rng.choice(gidx.old_wards)
        d = gidx.old_districts[w["district_code"]]
        p = gidx.old_provinces[d["province_code"]]
        name, _ = _render_mention(rng, w, d, p, gidx.unique_wd, with_spec_name=True)
        seen.add(name)
    for _ in range(1500):
        w = rng.choice(gidx.new_wards)
        p = gidx.new_provinces[w["province_code"]]
        name, _ = _render_mention(rng, w, None, p, with_spec_name=True)
        seen.add(name)
    eligible = {s.name for s in _OLD_FULL_SPECS + _OLD_PARTIAL_SPECS + _NEW_SPECS}
    assert eligible <= seen, f"families never rendered: {eligible - seen}"
    # partial *_only specs must NOT appear in the ER corpus
    assert not seen & {"ward_only", "district_only", "province_only"}


@pytest.mark.slow
def test_mention_entity_recovery_rate(gidx):
    from address_parser_spark.plans.local_parser import LocalParser

    lp = LocalParser(synth_gazetteer())

    def ekey(p, d, w, is_new):
        return "|".join([p or "", "" if is_new is True else (d or ""), w or "",
                         {True: "true", False: "false"}.get(is_new, "unknown")])

    rng = random.Random(123)
    wrong = total = 0
    for _ in range(1500):
        use_new = rng.random() < 0.25
        if use_new:
            w = rng.choice(gidx.new_wards)
            p = gidx.new_provinces[w["province_code"]]
            d = None
            gold = ekey(p["code"], None, w["code"], True)
        else:
            w = rng.choice(gidx.old_wards)
            d = gidx.old_districts[w["district_code"]]
            p = gidx.old_provinces[d["province_code"]]
            gold = ekey(p["code"], d["code"], w["code"], False)
        _, text = _render_mention(rng, w, d, p, gidx.unique_wd, with_spec_name=True)
        out = lp.process(text)
        got = ekey(out["province"]["code"] if out["province"] else None,
                   out["district"]["code"] if out["district"] else None,
                   out["ward"]["code"] if out["ward"] else None, out["is_new"])
        total += 1
        wrong += got != gold
    assert wrong / total <= 0.015, f"{wrong}/{total} mentions lost their entity"
