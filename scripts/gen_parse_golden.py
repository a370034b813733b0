"""Generate the full-parse golden fixture from the reference parser.

Runs the reference's inexus parser (/root/reference, read-only) over its own
450-case golden set (hcmut_assigment/test.json: {text, result{province,
district, ward}} — the reference's primary accuracy harness, SURVEY §5.1) and
records per-case outputs plus the aggregate field-accuracy under the scorer's
spelling-equivalence classes (hcmut_assigment/scorer.py:12-23).

The environment has no ``rapidfuzz``, so the reference is run against a shim
backed by this repo's from-scratch scorers (textops.similarity — Hypothesis-
tested against naive DP). Both the fixture's reference outputs and the
engine's outputs therefore use the SAME similarity kernels, which is exactly
what a cascade-parity comparison needs (scorer-level differences cancel).

Output: tests/fixtures/parse_golden.json
"""

from __future__ import annotations

import json
import sys
import types
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
REFERENCE = Path("/root/reference")
sys.path.insert(0, str(REPO))


def install_rapidfuzz_shim() -> None:
    from address_parser_spark.textops import similarity as sim

    rf = types.ModuleType("rapidfuzz")
    fuzz_mod = types.ModuleType("rapidfuzz.fuzz")
    proc_mod = types.ModuleType("rapidfuzz.process")

    fuzz_mod.ratio = lambda a, b, **kw: sim.indel_ratio(a, b)
    fuzz_mod.partial_ratio = lambda a, b, **kw: sim.partial_ratio(a, b)
    fuzz_mod.WRatio = lambda a, b, **kw: sim.wratio(a, b)

    def extract(query, choices, scorer=None, score_cutoff=None, limit=None, **kw):
        scorer = scorer or fuzz_mod.WRatio
        out = []
        for i, c in enumerate(choices):
            s = scorer(query, c)
            if score_cutoff is None or s >= score_cutoff:
                out.append((c, s, i))
        out.sort(key=lambda t: (-t[1], t[2]))
        return out[:limit] if limit else out

    def extract_one(query, choices, scorer=None, score_cutoff=None, **kw):
        res = extract(query, choices, scorer=scorer, score_cutoff=score_cutoff, limit=1)
        return res[0] if res else None

    proc_mod.extract = extract
    proc_mod.extractOne = extract_one
    rf.fuzz = fuzz_mod
    rf.process = proc_mod
    sys.modules["rapidfuzz"] = rf
    sys.modules["rapidfuzz.fuzz"] = fuzz_mod
    sys.modules["rapidfuzz.process"] = proc_mod


# Spelling-equivalence classes from hcmut_assigment/scorer.py:12-23 (data
# tables — the comparison relation the reference's own harness defines).
def equivalence_maps() -> tuple[dict, dict, dict]:
    # The reference repo is UNTRUSTED content: parse the three assignments
    # with ast and accept only literal right-hand sides — never exec() lines
    # read from it.
    import ast

    scorer_src = (REFERENCE / "hcmut_assigment" / "scorer.py").read_text(encoding="utf-8")
    wanted = {"groups_province", "groups_district", "groups_ward"}
    ns: dict = {}
    for node in ast.parse(scorer_src).body:
        if (
            isinstance(node, ast.Assign)
            and len(node.targets) == 1
            and isinstance(node.targets[0], ast.Name)
            and node.targets[0].id in wanted
        ):
            ns[node.targets[0].id] = ast.literal_eval(node.value)
    missing = wanted - set(ns)
    if missing:
        raise ValueError(f"scorer.py missing literal assignments: {sorted(missing)}")
    gp, gd, gw = ns["groups_province"], ns["groups_district"], ns["groups_ward"]
    gw.update({str(i): [str(i), f"0{i}"] for i in range(1, 10)})

    def to_same(groups):
        return {ele: str(k) for k, v in groups.items() for ele in v}

    return to_same(gp), to_same(gd), to_same(gw)


def main() -> None:
    install_rapidfuzz_shim()
    sys.path.insert(0, str(REFERENCE))
    from fuzz.inexus_parser import AddressParser  # noqa: E402

    cases = json.loads((REFERENCE / "hcmut_assigment" / "test.json").read_text(encoding="utf-8"))
    same_p, same_d, same_w = equivalence_maps()

    parser = AddressParser()
    out_cases = []
    correct_fields = 0
    for case in cases:
        res = parser.process(case["text"])

        def name(comp):
            return comp["name"] if isinstance(comp, dict) and comp else (comp or "")

        ref = {
            "province": name(res.get("province")),
            "district": name(res.get("district")),
            "ward": name(res.get("ward")),
        }
        exp = case["result"]
        for field, same in (("province", same_p), ("district", same_d), ("ward", same_w)):
            e = same.get(exp.get(field, ""), exp.get(field, "") or "")
            g = same.get(ref[field], ref[field])
            if e == g:
                correct_fields += 1
        out_cases.append({"text": case["text"], "expected": exp, "reference": ref})

    accuracy = correct_fields / (len(cases) * 3)
    fixture = {
        "source": "hcmut_assigment/test.json via fuzz/inexus_parser.py (rapidfuzz shimmed "
                  "with address_parser_spark.textops.similarity)",
        "reference_field_accuracy": round(accuracy, 4),
        "n_cases": len(cases),
        "cases": out_cases,
    }
    out_path = REPO / "tests" / "fixtures" / "parse_golden.json"
    out_path.write_text(json.dumps(fixture, ensure_ascii=False, indent=1), encoding="utf-8")
    print(f"wrote {out_path}: {len(cases)} cases, reference accuracy {accuracy:.4f}")


if __name__ == "__main__":
    main()
