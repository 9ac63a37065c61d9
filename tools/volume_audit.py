#!/usr/bin/env python3
"""Assemble VOLUME_AUDIT_r{N}.json from two Verify dumps.

Usage: volume_audit.py <round> <dump_sf001_dir> <dump_sf01_dir> [out.json]

Reads per-query result row counts from both dumps (parquet dirs written
by graft.Verify), flags queries returning <5 rows at BOTH SFs (the
trivially-green risk band), and hard-fails on any ZERO-row result at
either SF — an empty frame is the actual trivially-green shape (the
x160 zero-row trap: a framing geometry that needs more samples than the
corpus has returns 0 rows and every hash trivially matches).

Flag notes for by-design scalar/summary queries carry over from the
previous round's artifact when present.
"""
import glob
import json
import os
import sys

import pyarrow.parquet as pq


def rows_of(dump_dir):
    out = {}
    for d in sorted(os.listdir(dump_dir)):
        p = os.path.join(dump_dir, d)
        if not os.path.isdir(p):
            continue
        n = 0
        for f in glob.glob(os.path.join(p, "*.parquet")):
            n += pq.ParquetFile(f).metadata.num_rows
        out[d] = n
    return out


def main():
    rnd, d001, d01 = sys.argv[1], sys.argv[2], sys.argv[3]
    out_path = sys.argv[4] if len(sys.argv) > 4 else f"VOLUME_AUDIT_r{rnd}.json"
    a, b = rows_of(d001), rows_of(d01)
    qs = sorted(set(a) | set(b))
    missing = [q for q in qs if q not in a or q not in b]
    if missing:
        sys.exit(f"FAIL: queries missing from one dump: {missing}")
    zero = [q for q in qs if a[q] == 0 or b[q] == 0]
    if zero:
        sys.exit(f"FAIL: zero-row results (trivially-green): {zero}")
    flagged = sorted(q for q in qs if a[q] < 5 and b[q] < 5)
    prev_notes = {}
    prevs = sorted(glob.glob("VOLUME_AUDIT_r*.json"))
    for p in prevs:
        if p != out_path:
            try:
                prev_notes.update(json.load(open(p)).get("flag_notes", {}))
            except Exception:
                pass
    art = {
        "round": int(rnd),
        "note": ("per-query result rows at sf0.01 (oracle gate SF) and sf0.1 "
                 "(bench SF); flagged = <5 rows at BOTH SFs (trivially-green "
                 "risk). None return 0 rows at either SF (an empty frame is "
                 "the actual trivially-green shape); every flagged query is a "
                 "by-design scalar/summary or fixed-domain report whose CELLS "
                 "each hash a full-corpus aggregate — see flag_notes."),
        "flagged": flagged,
        "queries": {q: {"rows_sf001": a[q], "rows_sf01": b[q]} for q in qs},
        "flag_notes": {q: prev_notes[q] for q in flagged if q in prev_notes},
    }
    unnoted = [q for q in flagged if q not in prev_notes]
    json.dump(art, open(out_path, "w"), indent=1)
    print(f"wrote {out_path}: {len(qs)} queries, flagged {len(flagged)}")
    if unnoted:
        print(f"NEW flagged queries needing a flag_note: {unnoted}")


if __name__ == "__main__":
    main()
