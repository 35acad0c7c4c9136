#!/usr/bin/env python
"""Summarize a scripts/bench_all_tpu.sh log into a markdown table.

Usage: python scripts/summarize_sweep.py [/tmp/bench_all.log]

Each sweep entry is `=== [ENV=..] python scripts/bench_X.py scene ===`
followed by the script's stdout and `rc=N`. This prints one row per
entry: the env knobs, the script+scene, the headline ms/frame (or the
script's own summary lines), and the rc.
"""

import re
import sys


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/bench_all.log"
    with open(path) as f:
        text = f.read()

    blocks = re.split(r"^=== (.*?) ===$", text, flags=re.M)
    # blocks[0] is preamble; then pairs of (header, body)
    rows = []
    for i in range(1, len(blocks) - 1, 2):
        header, body = blocks[i], blocks[i + 1]
        rc = re.search(r"^rc=(\d+)", body, flags=re.M)
        rc = rc.group(1) if rc else "?"
        keep = [
            ln for ln in body.splitlines()
            if re.search(r"ms/frame|Mrays|fps|ms\b|\bmetric\b", ln)
            and "WARNING" not in ln and not ln.startswith("rc=")
        ]
        rows.append((header, rc, keep))

    for header, rc, keep in rows:
        print(f"### {header}  (rc={rc})")
        for ln in keep:
            print(f"    {ln.strip()}")
        print()


if __name__ == "__main__":
    main()
