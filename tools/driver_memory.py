#!/usr/bin/env python3
"""Driver-memory envelope guard (round-12 verdict ask #3).

Runs the FULL contract (graft.Verify) at sf0.01 and sf0.1 and compares
the driver-side memory gauge each run emits ([verify] DRIVER_PEAK
{...}, see graft.DriverPeak). The claim under test: every driver-side
structure is CARDINALITY-bounded (vocab caps, config-literal frames,
bounded collects, the upsert sink's version listing), so 10x the data
must not mean 10x the driver.

Assertions:
  - HARD: live heap (post-GC retained state) at sf0.1 must stay within
    RATIO x live(sf0.01) + SLACK_MB. Retained state is the signal the
    round-12 verdict named: a "bounded" structure that actually grows
    with corpus cardinality shows up here first.
  - SOFT (warn-only): peak heap / RSS high-water ratios are reported
    and flagged above the same ratio, but do not fail the guard — both
    include not-yet-collected garbage, which legitimately scales with
    allocation churn up to the GC trigger, not with retained state.

Writes target/driver_memory.json (and echoes the table). Exit 0 iff the
hard assertion holds at every step.

Usage: tools/driver_memory.py [--ratio 1.5] [--slack-mb 256]
                              [--small sfDir] [--big sfDir]
"""
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LINE = re.compile(r"\[verify\] DRIVER_PEAK (\{.*\})")


def run_verify(sf_dir, out_dir, log):
    env = dict(os.environ)
    env.setdefault("SPARK_GRAFT_CPUS", "32")
    with open(log, "w") as lf:
        rc = subprocess.call(
            [os.path.join(REPO, "tools", "run_main.sh"), "graft.Verify",
             sf_dir, out_dir],
            stdout=lf, stderr=subprocess.STDOUT, env=env, cwd=REPO)
    if rc != 0:
        print(f"[drvmem] verify FAILED rc={rc} at {sf_dir} — see {log}")
        sys.exit(2)
    for line in open(log):
        m = LINE.search(line)
        if m:
            return json.loads(m.group(1))
    print(f"[drvmem] no DRIVER_PEAK line in {log}")
    sys.exit(2)


def main():
    ratio = 1.5
    slack = 256.0
    small = "/root/testdata/sf0.01"
    big = "/root/testdata/sf0.1"
    argv = sys.argv
    for i, a in enumerate(argv):
        if a == "--ratio":
            ratio = float(argv[i + 1])
        elif a == "--slack-mb":
            slack = float(argv[i + 1])
        elif a == "--small":
            small = argv[i + 1]
        elif a == "--big":
            big = argv[i + 1]
    os.makedirs(os.path.join(REPO, "target"), exist_ok=True)
    res = {}
    for tag, sf in (("small", small), ("big", big)):
        out = os.path.join(REPO, "target", f"drvmem_{tag}")
        log = os.path.join(REPO, "target", f"drvmem_{tag}.log")
        print(f"[drvmem] full Verify at {sf} ...")
        res[tag] = {"sf_dir": sf, **run_verify(sf, out, log)}
        print(f"[drvmem]   {res[tag]}")
    s, b = res["small"], res["big"]
    verdicts = {}
    ok = True
    for key, hard in (("driver_live_heap_mb", True),
                      ("driver_peak_heap_mb", False),
                      ("driver_rss_hwm_mb", False)):
        sv, bv = s[key], b[key]
        bound = ratio * sv + slack
        passed = (bv <= bound) or sv < 0 or bv < 0
        verdicts[key] = {
            "small_mb": sv, "big_mb": bv,
            "bound_mb": round(bound, 1), "hard": hard, "pass": passed}
        lvl = "HARD" if hard else "soft"
        print(f"[drvmem] {key}: sf0.01={sv} MB, sf0.1={bv} MB, "
              f"bound={bound:.0f} MB ({lvl}) -> "
              f"{'OK' if passed else 'VIOLATION'}")
        if hard and not passed:
            ok = False
    artifact = {"ratio": ratio, "slack_mb": slack, "runs": res,
                "verdicts": verdicts, "pass": ok}
    dst = os.path.join(REPO, "target", "driver_memory.json")
    with open(dst, "w") as f:
        json.dump(artifact, f, indent=1)
    print(f"[drvmem] wrote {dst} — {'PASS' if ok else 'FAIL'}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
