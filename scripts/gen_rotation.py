"""Generate the driver-budget rotation for ``registry._PRIORITY``.

The correctness driver verifies queries in ``queries()`` order under a
~50-query budget per round, so the registry's priority tuple IS the
round's evidence-currency policy. This script makes the policy
reproducible instead of hand-derived each round:

  1-6    canary slots — one long-green query per module family (pinned
         below), so a regression in shared infrastructure still gets
         witnessed every round;
  next   every oracle-backed query with NO driver-verified row in any
         CORRECTNESS_r*.json (the fresh registrations);
  rest   all remaining oracle-backed queries ranked by
         (last-witnessed round ASC, name ASC) — stalest evidence
         first; the head-50 boundary falls wherever the budget lands.

Rows-only queries are excluded entirely: a budget slot spent on a
weaker rows-only check is a slot wasted (their machinery is witnessed
via oracle-checked twins — README "Evidence ledger").

Usage:  python scripts/gen_rotation.py [repo_dir]
Prints the full ``_PRIORITY`` tuple body (two names per line, the
existing registry formatting) plus a header summary to update the
comment block; paste both into registry.py and run
``pytest tests/test_registry.py`` (update the rotation test's head
composition to match — that test pins the policy for the round).
"""

from __future__ import annotations

import glob
import json
import os
import sys

CANARIES = (
    "q01_head", "q06_acf",
    "q12_f1_confusion", "q18_jaccard_pairs",
    "q35_embedding_neardup", "q125_key_skew",
)


def last_witnessed(repo: str) -> dict[str, int]:
    """query -> newest round with a green driver row (hash_match, or
    rows_match for legacy no-oracle rows)."""
    seen: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        rnd = int(path.rsplit("_r", 1)[1].split(".")[0])
        with open(path) as fh:
            data = json.load(fh)
        for name, row in data.items():
            ok = row.get("hash_match") or (
                row.get("err") in (None, "no_oracle") and row.get("rows_match"))
            if ok:
                seen[name] = max(seen.get(name, 0), rnd)
    return seen


def main() -> int:
    repo = sys.argv[1] if len(sys.argv) > 1 else os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    from auto_ml_platform_with_timeseries_data_spark import registry

    oracle_backed = set(registry.oracles())
    seen = last_witnessed(repo)
    fresh = sorted(n for n in oracle_backed
                   if n not in seen and n not in CANARIES)
    rest = sorted((n for n in oracle_backed
                   if n in seen and n not in CANARIES),
                  key=lambda n: (seen[n], n))
    order = list(CANARIES) + fresh + rest

    head = order[:50]
    stale_rounds = sorted({seen[n] for n in head if n in seen})
    print(f"# head-50: {len(CANARIES)} canaries + {len(fresh)} fresh "
          f"({', '.join(fresh) or 'none'}) + stalest evidence "
          f"(rounds {stale_rounds})")
    tiers: dict[int, int] = {}
    for n in rest:
        tiers[seen[n]] = tiers.get(seen[n], 0) + 1
    print(f"# staleness tiers (round -> count): "
          f"{dict(sorted(tiers.items()))}")
    print("_PRIORITY: tuple[str, ...] = (")
    for i in range(0, len(order), 2):
        pair = ", ".join(f'"{n}"' for n in order[i:i + 2])
        print(f"    {pair},")
    print(")")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
