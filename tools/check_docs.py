#!/usr/bin/env python3
"""Doc-claim guard: entry counts stated in README/SURVEY/PLANS must match
the actual driver contract.

Truth source: target/verify_out/oracle_sql.json (written by every full
`graft.Verify` run) — its key count IS the oracle-bound entry count.
Scans the three status docs for "<N> oracle-bound/oracle-checked" claims
and fails if any of them disagrees with the truth. Run after the full
gate; stale counts were the one finding class two review passes hit.
"""
import json
import re
import sys

TRUTH = "target/verify_out/oracle_sql.json"
# README and SURVEY present CURRENT state; PLANS is an append-only log
# whose historical "N oracle-checked entries added" lines are not totals
DOCS = ["README.md", "SURVEY.md"]
# claims look like "258 oracle-bound entries" / "258 oracle-checked";
# "NNN/NNN oracle-checked OK" sweep records are run logs, excluded via
# the lookbehind; "... entries added" session tallies are excluded too
CLAIM = re.compile(
    r"(?<![\d/])(\d{2,4})\s+oracle-(?:bound|checked)(?![\s\S]{0,30}added)")

def main() -> int:
    try:
        with open(TRUTH) as f:
            actual = len(json.load(f))
    except FileNotFoundError:
        print(f"[check_docs] no {TRUTH} — run the full graft.Verify first")
        return 2
    bad = 0
    for doc in DOCS:
        try:
            text = open(doc).read()
        except FileNotFoundError:
            continue
        # only police the current-state sections: claims carrying a round
        # marker of an EARLIER round stay historical. Heuristic: check the
        # LAST claim in each doc (status docs append; the tail is current).
        claims = CLAIM.findall(text)
        if not claims:
            continue
        last = int(claims[-1])
        if last != actual:
            print(f"[check_docs] {doc}: latest claim says {last} "
                  f"oracle entries, contract has {actual}")
            bad += 1
    if bad:
        return 1
    print(f"[check_docs] OK — latest claims in {', '.join(DOCS)} "
          f"all match the {actual}-entry contract")
    return 0

if __name__ == "__main__":
    sys.exit(main())
