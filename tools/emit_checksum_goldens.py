#!/usr/bin/env python3
"""Close the >100-row hole in the golden sweep: parse a graft.Verify
stderr log and write `#checksum` golden files for every query that
printed a [verify:checksum] line and has no committed golden yet.

The checksum is the ENGINE's own per-column bit_xor(xxhash64) over the
canonically-rendered cells — DuckDB cannot reproduce Spark's xxhash64,
so emit these only from a verify run whose full DuckDB compare passed;
they then pin partitioning invariance (5-way vs 32-way) and
round-over-round regressions, while oracle parity remains the DuckDB
compare's job.

Usage: emit_checksum_goldens.py <verify_log> <golden_dir>/<sf_name>
"""
import os
import re
import sys


def main():
    log_path, out_dir = sys.argv[1], sys.argv[2]
    os.makedirs(out_dir, exist_ok=True)
    pat = re.compile(r"\[verify:checksum\] (q\S+) (rows=\d+ .*)$")
    lines = {}
    with open(log_path) as f:
        for raw in f:
            m = pat.search(raw.rstrip("\n"))
            if m:
                lines[m.group(1)] = m.group(2)
    wrote = skipped = 0
    for name, line in sorted(lines.items()):
        path = os.path.join(out_dir, f"{name}.txt")
        if os.path.exists(path):
            skipped += 1
            continue
        with open(path, "w") as f:
            f.write(f"#checksum engine bit_xor(xxhash64) per column, {name}\n")
            f.write(line + "\n")
        wrote += 1
    print(f"== wrote {wrote} checksum goldens to {out_dir} "
          f"({skipped} already covered) ==")


if __name__ == "__main__":
    main()
