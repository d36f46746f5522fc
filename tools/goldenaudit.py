#!/usr/bin/env python3
"""Committed-golden audit (VERDICT r9 task #6).

Usage: python3 tools/goldenaudit.py [goldenDir] [verifyOutDir]

Structural pass (always, every SF subdir): each golden file must parse
as one of the two committed kinds —

  checksum kind:  '#checksum engine bit_xor(xxhash64) per column, <q>'
                  'rows=<n> <col>=<hash> ...'   (cols sorted, unique)
  cell kind:      '# <q> cols=<c1,...,ck>'      (cols sorted, unique)
                  k pipe-separated fields per data line

with <q> equal to the file name. A malformed or misnamed golden would
silently never match (or worse, match the wrong query) in Verify's
golden dispatch.

Live pass (when verifyOutDir is given): for every golden whose query
has a parquet dump in verifyOutDir, the golden's column-name set must
equal the live output's schema, and — cell kind — each column's value
tokens must be consistent with the live type (double columns carry
float-looking tokens, int64 columns integer tokens). This is what makes
a STALE golden visible: if a final projection's type drifts, the golden
stops type-checking against the live schema instead of silently pinning
the old shape.

Exit 1 on any finding, so verify_full.sh fails loudly.
"""
import glob
import os
import re
import sys

import pyarrow.parquet as pq

CHECKSUM_HDR = re.compile(
    r"^#checksum engine bit_xor\(xxhash64\) per column, (\S+)$")
CELL_HDR = re.compile(r"^# (\S+) cols=(.+)$")  # col names may contain spaces
CHECKSUM_LINE = re.compile(r"^rows=(\d+)((?: \S+=-?\d+)*)$")
INT_TOK = re.compile(r"^-?\d+$")
FLOAT_TOK = re.compile(r"^-?(\d+\.\d*([eE][-+]?\d+)?|\d+[eE][-+]?\d+|"
                       r"\d*\.\d+([eE][-+]?\d+)?|Infinity|NaN)$")


def audit_file(path):
    """Return (query_name, kind, cols, n_rows_or_None, problems)."""
    name = os.path.basename(path)[:-len(".txt")]
    probs = []
    lines = open(path).read().splitlines()
    if not lines:
        return name, None, [], None, ["empty file"]
    m = CHECKSUM_HDR.match(lines[0])
    if m:
        if m.group(1) != name:
            probs.append(f"header names '{m.group(1)}', file is '{name}'")
        if len(lines) != 2:
            probs.append(f"checksum golden has {len(lines)} lines, want 2")
            return name, "checksum", [], None, probs
        m2 = CHECKSUM_LINE.match(lines[1])
        if not m2:
            probs.append(f"bad checksum line: {lines[1][:80]}")
            return name, "checksum", [], None, probs
        cols = [kv.split("=", 1)[0] for kv in m2.group(2).split()]
        if cols != sorted(cols):
            probs.append(f"checksum cols not sorted: {cols}")
        if len(cols) != len(set(cols)):
            probs.append(f"duplicate checksum cols: {cols}")
        return name, "checksum", cols, int(m2.group(1)), probs
    m = CELL_HDR.match(lines[0])
    if m:
        if m.group(1) != name:
            probs.append(f"header names '{m.group(1)}', file is '{name}'")
        cols = m.group(2).split(",")
        if cols != sorted(cols):
            probs.append(f"cell cols not sorted: {cols}")
        if len(cols) != len(set(cols)):
            probs.append(f"duplicate cell cols: {cols}")
        for i, ln in enumerate(lines[1:], start=2):
            # lower bound only: string cells may themselves contain the
            # pipe separator (q51's string_agg), inflating the count
            if ln.count("|") < len(cols) - 1:
                probs.append(f"line {i} has {ln.count('|') + 1} fields, "
                             f"want >= {len(cols)}")
                break
        return name, "cell", cols, len(lines) - 1, probs
    return name, None, [], None, [f"unrecognized header: {lines[0][:80]}"]


def live_schema(out_dir, name):
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files:
        return None
    sch = pq.read_schema(files[0])
    return {f.name: str(f.type) for f in sch}


def type_check_cells(path, cols, types):
    """Token-class consistency of cell goldens vs the live parquet types."""
    probs = []
    lines = open(path).read().splitlines()[1:]
    for ci, c in enumerate(cols):
        t = types.get(c)
        if t not in ("double", "int64"):
            continue  # strings/dates/bools/arrays: any token is legal
        for ln in lines[:200]:  # bounded: class drift shows immediately
            parts = ln.split("|")
            if len(parts) != len(cols):
                continue  # embedded separators: alignment unknowable
            tok = parts[ci]
            if tok == "NULL" or tok == "":
                continue
            # integer-rendered doubles ('42' for 42.0) are legal: engines
            # differ on whether the trailing '.0' is kept, and the value
            # class is still numeric — only a non-numeric token is drift
            if t == "double" and not (FLOAT_TOK.match(tok)
                                      or INT_TOK.match(tok)):
                probs.append(f"{c}: double column carries non-float "
                             f"token '{tok[:40]}'")
                break
            if t == "int64" and not INT_TOK.match(tok):
                probs.append(f"{c}: int64 column carries non-integer "
                             f"token '{tok[:40]}'")
                break
    return probs


def main():
    golden_dir = sys.argv[1] if len(sys.argv) > 1 else "golden"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else None
    n_bad = n_files = n_live = 0
    for sf in sorted(os.listdir(golden_dir)):
        sub = os.path.join(golden_dir, sf)
        if not os.path.isdir(sub):
            continue
        for path in sorted(glob.glob(f"{sub}/*.txt")):
            n_files += 1
            name, kind, cols, _, probs = audit_file(path)
            if out_dir and not probs:
                types = live_schema(out_dir, name)
                if types is not None:
                    n_live += 1
                    if sorted(types) != cols:
                        probs.append(
                            f"cols drifted: golden={cols} live={sorted(types)}")
                    elif kind == "cell":
                        probs.extend(type_check_cells(path, cols, types))
            if probs:
                n_bad += 1
                print(f"BAD  {sf}/{name}: " + "; ".join(probs))
    live = f", {n_live} type-checked against live output" if out_dir else ""
    print(f"goldenaudit: {n_bad} flagged of {n_files} golden files{live}")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
