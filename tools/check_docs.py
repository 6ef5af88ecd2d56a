#!/usr/bin/env python3
"""Doc-claim guard: entry counts stated in README and SURVEY must match
the actual driver contract. (PLANS.md is an append-only log whose
historical per-session tallies are not totals — deliberately excluded.)

Truth source: target/verify_out/oracle_sql.json (written by every full
`graft.Verify` run) — its key count IS the oracle-bound entry count.
Scans both status docs for "<N> oracle-bound/oracle-checked" claims and
fails if ANY of them disagrees with the truth (every claim in these two
docs describes current state, so all must match — a last-match-only
check would let a stale count elsewhere in the doc pass). Run after the
full gate; stale counts were the finding class two review passes hit.
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
# exclusion is the EXACT session-tally phrasing ("... entries added"),
# not a 30-char any-character window — a stale current-state claim that
# merely mentions "added" nearby must still be checked
CLAIM = re.compile(
    r"(?<![\d/])(\d{2,4})\s+oracle-(?:bound|checked)(?!\s+entries\s+added\b)")

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
        for m in CLAIM.finditer(text):
            n = int(m.group(1))
            if n != actual:
                line = text.count("\n", 0, m.start()) + 1
                print(f"[check_docs] {doc}:{line}: claim says {n} "
                      f"oracle entries, contract has {actual}")
                bad += 1
    if bad:
        return 1
    print(f"[check_docs] OK — every claim in {', '.join(DOCS)} "
          f"matches the {actual}-entry contract")
    return 0

if __name__ == "__main__":
    sys.exit(main())
