"""Refold new per-query minima into BASELINE.md's ACTIVE gate table.

Reads one or more bench JSON logs (bench.py output lines), takes the
min per query across them, and lowers any ACTIVE-table entry that the
new minima undercut. Prints the changed rows and the new gate total;
rewrites the table in place.

Usage: python scripts/refold_baseline.py /tmp/bench1.log [/tmp/b2.log ...]
"""
from __future__ import annotations

import json
import re
import sys

BASELINE = "/root/repo/BASELINE.md"


def main() -> int:
    mins: dict[str, float] = {}
    for path in sys.argv[1:]:
        for line in open(path):
            if line.startswith('{"metric"'):
                q = json.loads(line)["queries"]
                for k, v in q.items():
                    mins[k] = min(mins.get(k, float("inf")), v)
    lines = open(BASELINE).read().split("\n")
    # Scope strictly to the ACTIVE gate table: the FIRST
    # "| query | sec | query | sec |" header's contiguous row block.
    # Later identical headers belong to superseded historical tables,
    # which must stay as recorded.
    hdr = next(i for i, ln in enumerate(lines)
               if ln.startswith("| query | sec | query | sec |"))
    start = hdr + 2  # skip header + |---| separator
    end = start
    while end < len(lines) and lines[end].startswith("|"):
        end += 1
    text = "\n".join(lines[start:end])

    # Match both cells of each two-column table row (lookahead keeps
    # the middle pipe available for the second cell's leading match).
    pat = re.compile(r"\| (q[\w]+|automl_e2e) \| ([0-9.]+) (?=\|)")
    lowered = []
    total_old = total_new = 0.0

    def repl(m: re.Match) -> str:
        nonlocal total_old, total_new
        name, old = m.group(1), float(m.group(2))
        total_old += old
        new = mins.get(name, float("inf"))
        if new < old:
            lowered.append((name, old, new))
            total_new += new
            return f"| {name} | {new} "
        total_new += old
        return m.group(0)

    new_text = pat.sub(repl, text)
    out = lines[:start] + new_text.split("\n") + lines[end:]
    open(BASELINE, "w").write("\n".join(out))
    for name, old, new in sorted(lowered, key=lambda t: t[1] - t[2],
                                 reverse=True):
        print(f"  {name:42s} {old:8.3f} -> {new:8.3f}")
    print(f"lowered {len(lowered)} minima; table sum "
          f"{total_old:.2f} -> {total_new:.2f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
