#!/usr/bin/env python3
"""Convert the reference-code parity fixtures (expected*.json, produced by
tools/ref_oracle.py executing the REFERENCE repo's own Python over the
synthesized OCR IR) into parquet goldens the driver's DuckDB oracle can
read — turning x01/x04/x05 from rows-only into fully-oracled queries.

Golden columns (must match graft.SparkEntry.goldenResult exactly):
  doc_id            string
  document_type     string
  is_valid          bool
  validation_error  string
  ocr_cents         int64   = floor(score*100 + 0.5), float64 arithmetic on
                              the identical stored double both sides
  record_md5        string  = md5(record_json utf-8)
  spans_md5         string  = md5 of the canonical span serialization:
                              \\x01-joined "kind\\x02text\\x02media_ref\\x02offset"
                              (None media_ref -> ''), the same string the
                              Spark side builds with transform+concat_ws.

Usage: python3 tools/make_golden.py fixtures/expected.json out.parquet
"""
import hashlib
import json
import math
import sys

import pyarrow as pa
import pyarrow.parquet as pq


def canonical_spans(spans):
    return "\x01".join(
        f"{s['kind']}\x02{s['text']}\x02{s['media_ref'] or ''}\x02{s['offset']}"
        for s in spans)


def main():
    src, dst = sys.argv[1], sys.argv[2]
    with open(src) as f:
        rows = json.load(f)
    cols = {
        "doc_id": [r["doc_id"] for r in rows],
        "document_type": [r["document_type"] for r in rows],
        "is_valid": [r["is_valid"] for r in rows],
        "validation_error": [r["validation_error"] for r in rows],
        "ocr_cents": [int(math.floor(r["ocr_accuracy_score"] * 100 + 0.5))
                      for r in rows],
        "record_md5": [hashlib.md5(r["record_json"].encode("utf-8")).hexdigest()
                       for r in rows],
        "spans_md5": [hashlib.md5(canonical_spans(r["spans"]).encode("utf-8"))
                      .hexdigest() for r in rows],
    }
    schema = pa.schema([
        ("doc_id", pa.string()),
        ("document_type", pa.string()),
        ("is_valid", pa.bool_()),
        ("validation_error", pa.string()),
        ("ocr_cents", pa.int64()),
        ("record_md5", pa.string()),
        ("spans_md5", pa.string()),
    ])
    pq.write_table(pa.table(cols, schema=schema), dst)
    print(f"wrote {len(rows)} golden rows to {dst}")


if __name__ == "__main__":
    main()
