"""Deterministic synthetic Vietnamese administrative gazetteer.

Generates, from a fixed seed, a scaled-down catalog with the exact record
shapes of the reference data files (``fuzz/data/*.json``; loaders
``fuzz/inexus_parser.py:938-1042``): 3-level old-format provinces → districts
→ wards, 2-level new-format provinces → wards, and an old↔new ward mapping
table (``ward_mappings.json`` shape, converter ``fuzz/inexus_parser.py:
1121-1190``). No external data; FK closure holds; the Hồ Chí Minh / Thủ Đức
special-case rows the parser hardcodes (``fuzz/inexus_parser.py:2224-2232,
2432-2446``) are always present.
"""

from __future__ import annotations

import random
from dataclasses import dataclass, field

# Toponym syllable pool — composed names, not copied records.
_SYLLABLES = [
    "Tân", "Bình", "Phú", "Xuân", "An", "Hòa", "Long", "Thạnh", "Minh",
    "Đông", "Hải", "Giang", "Sơn", "Lâm", "Quang", "Vĩnh", "Kim", "Châu",
    "Thành", "Tiền", "Yên", "Phong", "Ninh", "Phúc", "Xá", "Mỹ", "Trung",
    "Hưng", "Đức", "Lộc", "Thu", "Thủy", "Cát", "Liên", "Khánh", "Nghĩa",
    "Thái", "Triều", "Bảo", "Chiểu", "Nhuận", "Thới", "Hiệp", "Thuận",
]

# Anchor rows the reference parser special-cases; kept verbatim so the
# HCM abbreviation and Thủ Đức inference branches are exercised.
_HCM_PROVINCE = "Hồ Chí Minh"
_HCM_DISTRICTS = [
    "1", "3", "4", "5", "7", "10", "12", "Bình Thạnh", "Gò Vấp", "Phú Nhuận",
    "Tân Bình", "Bình Chánh", "Củ Chi", "Hóc Môn", "Nhà Bè", "Thủ Đức",
]
_EXTRA_PROVINCES = ["Hà Nội", "Đà Nẵng", "Thừa Thiên Huế", "Tiền Giang", "Bắc Ninh", "Đắk Lắk"]

_UNIT_PROVINCE_CITY = 1   # administrative_unit_id conventions (10 in reference)
_UNIT_PROVINCE = 2
_UNIT_DISTRICT_URBAN = 4
_UNIT_DISTRICT = 5
_UNIT_WARD = 8
_UNIT_COMMUNE = 9


@dataclass
class Gazetteer:
    """In-memory catalog in the reference record shapes (lists of dicts)."""

    old_provinces: list[dict] = field(default_factory=list)
    old_districts: list[dict] = field(default_factory=list)
    old_wards: list[dict] = field(default_factory=list)
    new_provinces: list[dict] = field(default_factory=list)
    new_wards: list[dict] = field(default_factory=list)
    ward_mappings: list[dict] = field(default_factory=list)

    def counts(self) -> dict[str, int]:
        return {
            "old_provinces": len(self.old_provinces),
            "old_districts": len(self.old_districts),
            "old_wards": len(self.old_wards),
            "new_provinces": len(self.new_provinces),
            "new_wards": len(self.new_wards),
            "ward_mappings": len(self.ward_mappings),
        }


def _slug(name: str) -> str:
    from address_parser_spark.textops.normalize import normalize_basic

    return normalize_basic(name).replace(" ", "_")


def _record(code: str, name: str, type_word: str, unit_id: int, **parents) -> dict:
    full = f"{type_word} {name}" if type_word else name
    return {
        "code": code,
        "name": name,
        "name_en": name,
        "full_name": full,
        "full_name_en": full,
        "code_name": _slug(name),
        "administrative_unit_id": unit_id,
        **parents,
    }


def synth_gazetteer(
    seed: int = 42,
    n_provinces: int = 8,
    districts_per_province: int = 4,
    wards_per_district: int = 6,
) -> Gazetteer:
    """Build the deterministic catalog. Same seed ⇒ identical output."""
    rng = random.Random(seed)
    gaz = Gazetteer()

    def fresh_name(used: set[str], n_syll: int = 2) -> str:
        for _ in range(1000):
            name = " ".join(rng.sample(_SYLLABLES, n_syll))
            if name not in used:
                used.add(name)
                return name
        raise RuntimeError("name pool exhausted")

    used_names: set[str] = set(_EXTRA_PROVINCES) | {_HCM_PROVINCE} | set(_HCM_DISTRICTS)

    province_names = [_HCM_PROVINCE] + _EXTRA_PROVINCES
    while len(province_names) < n_provinces:
        province_names.append(fresh_name(used_names))

    ward_seq = 0
    district_seq = 0
    for p_idx, p_name in enumerate(province_names, start=1):
        p_code = f"{p_idx:02d}"
        is_city = p_name in (_HCM_PROVINCE, "Hà Nội", "Đà Nẵng")
        gaz.old_provinces.append(
            _record(p_code, p_name, "Thành phố" if is_city else "Tỉnh",
                    _UNIT_PROVINCE_CITY if is_city else _UNIT_PROVINCE)
        )
        if p_name == _HCM_PROVINCE:
            district_names = list(_HCM_DISTRICTS)
        else:
            district_names = [fresh_name(used_names) for _ in range(districts_per_province)]
        for d_name in district_names:
            district_seq += 1
            d_code = f"{district_seq:03d}"
            d_is_urban = d_name.isdigit() or p_name == _HCM_PROVINCE
            gaz.old_districts.append(
                _record(d_code, d_name, "Quận" if d_is_urban else "Huyện",
                        _UNIT_DISTRICT_URBAN if d_is_urban else _UNIT_DISTRICT,
                        province_code=p_code)
            )
            n_wards = wards_per_district if not d_name.isdigit() else 3
            ward_names = []
            if d_name.isdigit():
                ward_names = [str(w) for w in rng.sample(range(1, 16), n_wards)]
            else:
                ward_names = [fresh_name(used_names) for _ in range(n_wards)]
            for w_name in ward_names:
                ward_seq += 1
                w_code = f"{ward_seq:05d}"
                w_is_ward = d_is_urban or rng.random() < 0.4
                gaz.old_wards.append(
                    _record(w_code, w_name, "Phường" if w_is_ward else "Xã",
                            _UNIT_WARD if w_is_ward else _UNIT_COMMUNE,
                            district_code=d_code)
                )

    # --- New format (post-merger 2-level): merge pairs of old provinces, and
    # merge groups of old wards into new wards deterministically. ---
    merged: list[tuple[str, list[dict]]] = []
    i = 0
    while i < len(gaz.old_provinces):
        group = gaz.old_provinces[i : i + 2]
        merged.append((group[0]["name"], group))
        i += 2
    district_by_code = {d["code"]: d for d in gaz.old_districts}
    province_by_code = {p["code"]: p for p in gaz.old_provinces}

    new_ward_seq = 0
    mapping_seq = 0
    # New-format codes live in their own namespace (offset): the reference
    # attaches new-format full_name/name_en aliases to OLD records by raw
    # code-string collision, and with sequential codes on both sides every
    # old record would inherit a random new record's aliases — far denser
    # than the real catalog's occasional collisions.
    for np_idx, (np_name, old_group) in enumerate(merged, start=1):
        np_code = f"{np_idx + 50:02d}"
        is_city = np_name in (_HCM_PROVINCE, "Hà Nội", "Đà Nẵng")
        gaz.new_provinces.append(
            _record(np_code, np_name, "Thành phố" if is_city else "Tỉnh",
                    _UNIT_PROVINCE_CITY if is_city else _UNIT_PROVINCE)
        )
        old_codes = {p["code"] for p in old_group}
        member_wards = [
            w for w in gaz.old_wards
            if district_by_code[w["district_code"]]["province_code"] in old_codes
        ]
        # Group consecutive old wards 2-at-a-time into one new ward; the first
        # old ward's name survives (mirrors the real merger's renaming shape).
        # New-ward names are made UNIQUE within their new province — as in the
        # real post-merger catalog, where duplicate names were renamed; without
        # this, two byte-identical mentions could denote different entities and
        # no string-based system (reference included) could separate them.
        used_new_names: set[str] = set()
        for j in range(0, len(member_wards), 2):
            group = member_wards[j : j + 2]
            new_ward_seq += 1
            nw_code = f"{new_ward_seq + 90000:05d}"
            nw_name = next(
                (w["name"] for w in group if w["name"] not in used_new_names),
                None,
            )
            if nw_name is None:
                nw_name = fresh_name(used_names)
            used_new_names.add(nw_name)
            nw_is_ward = group[0]["administrative_unit_id"] == _UNIT_WARD
            gaz.new_wards.append(
                _record(nw_code, nw_name, "Phường" if nw_is_ward else "Xã",
                        _UNIT_WARD if nw_is_ward else _UNIT_COMMUNE,
                        province_code=np_code)
            )
            for old_w in group:
                mapping_seq += 1
                old_d = district_by_code[old_w["district_code"]]
                old_p = province_by_code[old_d["province_code"]]
                gaz.ward_mappings.append(
                    {
                        "id": mapping_seq,
                        "old_ward_code": old_w["code"],
                        "old_ward_name": old_w["full_name"],
                        "old_district_name": old_d["full_name"],
                        "old_province_name": old_p["full_name"],
                        "new_ward_code": nw_code,
                        "new_ward_name": f"{'Phường' if nw_is_ward else 'Xã'} {nw_name}",
                        "new_province_name": gaz.new_provinces[-1]["full_name"],
                        "created_at": "2025-07-01T00:00:00Z",
                        "updated_at": "2025-07-01T00:00:00Z",
                    }
                )

    return gaz
