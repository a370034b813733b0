"""Generate char-exact golden fixtures from the reference parser's pure string
functions (standardize_name / _normalize_token_basic / generate_ngrams /
_extract_street_address).

Run ONCE; output is committed at tests/fixtures/norm_golden.json so the test
suite never needs /root/reference at runtime. The reference imports rapidfuzz
(absent in this container) — we stub it before import; none of the functions
exercised here call into it.

Usage: python scripts/gen_golden_fixtures.py
"""

from __future__ import annotations

import json
import sys
import types
from pathlib import Path

REFERENCE = Path("/root/reference")
OUT = Path(__file__).resolve().parent.parent / "tests" / "fixtures" / "norm_golden.json"


def _stub_rapidfuzz() -> None:
    rf = types.ModuleType("rapidfuzz")
    fuzz = types.ModuleType("rapidfuzz.fuzz")
    process = types.ModuleType("rapidfuzz.process")
    for name in ("ratio", "partial_ratio", "WRatio", "QRatio", "token_sort_ratio"):
        setattr(fuzz, name, lambda *a, **k: 0.0)
    process.extractOne = lambda *a, **k: None
    process.extract = lambda *a, **k: []
    process.cdist = lambda *a, **k: []
    rf.fuzz = fuzz
    rf.process = process
    rf.distance = types.ModuleType("rapidfuzz.distance")
    sys.modules["rapidfuzz"] = rf
    sys.modules["rapidfuzz.fuzz"] = fuzz
    sys.modules["rapidfuzz.process"] = process


def main() -> None:
    _stub_rapidfuzz()
    sys.path.insert(0, str(REFERENCE))
    from fuzz.inexus_parser import AddressParser  # noqa: E402

    # Pure string methods don't need __init__ (no gazetteer state).
    parser = AddressParser.__new__(AddressParser)

    inputs: list[str] = []
    # Reference's own 450 golden cases — the adversarial corpus.
    golden_path = REFERENCE / "hcmut_assigment" / "test.json"
    cases = json.loads(golden_path.read_text(encoding="utf-8"))
    street_cases: list[dict] = []
    for case in cases:
        text = case.get("text", "")
        if text:
            inputs.append(text)
            res = case.get("result", {})
            street_cases.append(
                {
                    "original": text,
                    "province": res.get("province") or None,
                    "district": res.get("district") or None,
                    "ward": res.get("ward") or None,
                }
            )

    # Synthetic adversarial forms touching every normalization branch.
    inputs += [
        "",
        "   ",
        "..,,TP.Hồ Chí Minh,,..",
        "357/28,Ng-T- Thuật,P1,Q3,TP.HồChíMinh.",
        "tphcm q1 p5",
        "HCM, quận Bình Thạnh",
        "t.t.h khu phố 3",
        "h.c.minh, hn, ha ni",
        "Số nhà 12 ngõ 34 thôn 5 xã Phúc Xá",
        "ward 7 district 3 city",
        "đường Điện Biên Phủ, P.25, Q.Bình Thạnh",
        "KP3, TT Củ Chi, H.Củ Chi",
        "x. Ea Kao, tx. Buôn Hồ, tỉnh Đắk Lắk",
        "tổ dân phố 12a, phường 015, quận 010",
        "ấp 4, xã Tân Thạnh Tây, huyện Củ Chi, TPHCM",
        "abc123456xyz 007 p01 q09",
        "bc hcm", "tb tp ho chi minh", "gv gò vấp hochiminh",
        "tiểu khu 3 khu vực 2 cụm 7 khóm 1",
        "ngách 12a hẻm 45/6 ngõ 78b",
        "ttr. An Châu – Sơn Động – Bắc Giang",
        "Vĩnh Kim, Châu Thành, Tiền Giang",
        "F5, Quận 8, TP. Hồ Chí Minh",
        "W.12, D.Gò Vấp, HCM City",
        "so 3 duong 100, to 5, kp 7",
        "Thành.Phố Hải Phòng",
        "t.phố Đà Nẵng",
        "  ,.,.phường Bến Nghé.,.,  ",
        "q10, tphcm, việt nam",
        "Xóm 2, Thôn Đoài, Xã Tam Giang, Huyện Yên Phong, Tỉnh Bắc Ninh, Việt Nam.",
    ]

    seen: set[str] = set()
    norm_rows = []
    for raw in inputs:
        if raw in seen:
            continue
        seen.add(raw)
        norm_rows.append(
            {
                "raw": raw,
                "std_basic": parser.standardize_name(raw, False),
                "std_advanced": parser.standardize_name(raw, True),
                "token_basic": parser._normalize_token_basic(raw),
                "ngrams": parser.generate_ngrams(parser.standardize_name(raw, True)),
            }
        )

    street_rows = []
    for case in street_cases:
        node = types.SimpleNamespace(
            province_name=case["province"],
            district_name=case["district"],
            ward_name=case["ward"],
        )
        street_rows.append({**case, "street": parser._extract_street_address(case["original"], node)})

    sig_rows = []
    for comp in ["Hồ Chí Minh", "Bình Thạnh", "Phúc Xá", "1", "Thừa Thiên Huế", None, "", "Đắk Lắk"]:
        sig = parser._build_component_signature(comp)
        sig_rows.append(
            {
                "component": comp,
                "sequences": sig["sequences"],
                "tokens": sorted(sig["tokens"]),
            }
        )

    # BIO-labeling goldens from the NER generator's label_tokens.
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_bsd", REFERENCE / "ner" / "build_standard_dataset.py"
    )
    ref_bsd = importlib.util.module_from_spec(spec)
    sys.modules["ref_bsd"] = ref_bsd  # dataclass decorator resolves __module__
    spec.loader.exec_module(ref_bsd)
    bio_rows = []
    for case in street_cases[:150]:
        res = ref_bsd.label_tokens(
            case["original"],
            street=None,
            province=case["province"],
            district=case["district"],
            ward=case["ward"],
        )
        bio_rows.append(
            {
                **case,
                "tokens": res.tokens,
                "ner_tags": res.ner_tags,
                "matches": res.matches,
            }
        )

    OUT.parent.mkdir(parents=True, exist_ok=True)
    OUT.write_text(
        json.dumps(
            {"normalize": norm_rows, "street": street_rows, "signatures": sig_rows,
             "bio": bio_rows},
            ensure_ascii=False,
            indent=1,
        ),
        encoding="utf-8",
    )
    print(f"wrote {OUT}: {len(norm_rows)} normalize rows, {len(street_rows)} street rows")


if __name__ == "__main__":
    main()
