#!/usr/bin/env python3
"""Reference-code oracle: computes expected extraction outputs by running the
ACTUAL reference modules (cleaner.py / driving_license_processor.py /
passport_processor.py / pydantic schemas + validator) on the synthesized
OCR IR dumped by graft.tools.DumpCorpus.

Only the top-level flow of pipeline/extractor.py:50-117 (routing, donut
merge, metadata attach) is restated here, because extractor.py itself
imports cv2/paddle at module load. Every piece of extraction/validation
semantics is executed from the reference's own code.

Usage: python3 tools/ref_oracle.py fixtures/ocr_ir.json fixtures/expected.json [--donut]
"""
import importlib.util
import json
import re
import sys

BASE = '/root/reference/neutrix_workspace/prototype'


def load(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


cleaner_mod = load('ref_cleaner', f'{BASE}/pipeline/cleaner.py')
dlp = load('ref_dlp', f'{BASE}/pipeline/driving_license_processor.py')
ppp = load('ref_ppp', f'{BASE}/pipeline/passport_processor.py')
sys.path.insert(0, BASE)
validator_mod = load('ref_validator', f'{BASE}/pipeline/validator.py')

cleaner = cleaner_mod.RegexCleaner()


# --- restated flow from pipeline/extractor.py:60-89 (secondary routing) ----
def is_driving_license(text: str) -> bool:
    patterns = [r"dl\sno", r"driving\slicence", r"driving\slicense",
                r"valid\sthroughout\sindia", r"\bmcwg\b", r"\blmv\b", r"\bform\s7\b"]
    return any(re.search(p, text) for p in patterns)


def is_passport(text: str) -> bool:
    patterns = [r"passport", r"p<ind", r"republic\s*of\s*india", r"/nationality",
                r"/placeofssue", r"x[0-9]{7}", r"\bp<"]
    text_clean = text.replace(" ", "")
    return any(re.search(p, text) or re.search(p, text_clean) for p in patterns)


def canonical_error(schema_name, ve):
    errs = ve.errors()
    n = len(errs)
    header = f"{n} validation error{'s' if n > 1 else ''} for {schema_name}"
    body = "\n".join(f"{e['loc'][0]}\n  {e['msg']}" for e in errs)
    return header + "\n" + body


def validate(data):
    """validator.py:18-52 with a canonical error rendering."""
    from schemas import (AadhaarSchema, PANSchema, DLSchema, DrivingLicenseSchema,
                         PassportSchema, MarksheetSchema, VoterIDSchema,
                         BaseDocumentSchema)
    doc_type = data.get("document_type", "Unknown")
    schema = {
        "Aadhaar Card": AadhaarSchema, "PAN Card": PANSchema,
        "Driving License": DLSchema, "driving_license": DrivingLicenseSchema,
        "Passport": PassportSchema, "passport": PassportSchema,
        "Marksheet": MarksheetSchema, "Voter ID": VoterIDSchema,
    }.get(doc_type, BaseDocumentSchema)
    try:
        validated = schema(**data)
        return True, validated.model_dump(), ""
    except ValueError as ve:
        return False, data, canonical_error(schema.__name__, ve)


def process(ir, use_donut):
    raw_text, lines = ir["raw_text"], ir["lines"]
    extracted = cleaner.extract_document(raw_text, lines)

    if extracted.get("document_type") == "Unknown":
        text_lower = raw_text.lower()
        if is_driving_license(text_lower):
            extracted = dlp.process_driving_license(raw_text, lines)
        elif is_passport(text_lower):
            extracted = ppp.process_passport(raw_text, lines)

    if use_donut and extracted.get("document_type") == "Unknown":
        donut_data = ir.get("donut") or {}
        if donut_data and "document_type" in donut_data:
            for k, v in donut_data.items():
                if k not in extracted or not extracted[k]:
                    extracted[k] = v

    if extracted.get("document_type") == "Unknown" and raw_text:
        extracted["raw_text"] = raw_text

    extracted["face_image"] = ir["face_b64"]
    extracted["ocr_accuracy_score"] = round(ir["avg_conf"] * 100, 2)

    is_valid, final_data, error_msg = validate(extracted)

    # span contract (repo SURVEY.md §7.2): field spans in dict order,
    # face media span, trailing metric span
    def span_text(v):
        if isinstance(v, str):
            return v
        return json.dumps(v, ensure_ascii=False)

    spans = []
    for k, v in final_data.items():
        spans.append({"kind": f"field:{k}", "text": span_text(v),
                      "media_ref": None, "offset": len(spans)})
    if ir["face_ref"]:
        spans.append({"kind": "media", "text": "", "media_ref": ir["face_ref"],
                      "offset": len(spans)})
    score = final_data.get("ocr_accuracy_score", extracted["ocr_accuracy_score"])
    spans.append({"kind": "metric", "text": json.dumps(extracted["ocr_accuracy_score"]),
                  "media_ref": None, "offset": len(spans)})

    doc_type = final_data.get("document_type", "Unknown")
    return {
        "doc_id": ir["doc_id"],
        "document_type": doc_type,
        "doc_type_dir": doc_type.replace(" ", "_").lower(),
        "is_valid": is_valid,
        "validation_error": error_msg,
        "ocr_accuracy_score": extracted["ocr_accuracy_score"],
        "record_json": json.dumps(final_data, ensure_ascii=False),
        "spans": spans,
    }


def main():
    src, dst = sys.argv[1], sys.argv[2]
    use_donut = "--donut" in sys.argv
    with open(src) as f:
        irs = json.load(f)
    out = [process(ir, use_donut) for ir in irs]
    with open(dst, "w") as f:
        json.dump(out, f, ensure_ascii=False, indent=1)
    print(f"wrote {len(out)} expected results to {dst}")


if __name__ == "__main__":
    main()
