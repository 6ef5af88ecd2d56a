#!/usr/bin/env python3
"""Full-contract giant-row oracle replay (round-11 verdict ask #3).

Round 11's giant-row fuzz axis engine-drained all 271 entries but only
~60 were DuckDB-oracle-checked per forced trial — DuckDB's per-position
substr is O(position) with no linear spelling, so a full replay costs
~70 CPU-min and was capped for campaign throughput. This burns that
cost ONCE, resumably: build one giant-corpus snapshot (fuzz generator,
GRAFT_FUZZ_GIANT forced, fixed seed), run the FULL graft.Verify over
it, then drive tools/replay_scale.py's per-entry subprocess harness
(timeout + address-space cap per entry, per-entry resumable state)
with the sf3-only oracle walls disabled — every entry gets a real
DuckDB verdict or an explicit TIMEOUT/MEMORY row, no silent subset.

Usage: python3 tools/giant_replay.py [seed] [state.json]
Corpus+dump live under target/giant_replay/; re-running resumes.
Dev-only tool (driver-side python); not part of the shipped library.
"""
import os
import random
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))
import fuzz_diff  # noqa: E402  (reuses the axis-forced corpus generator)


def main():
    seed = int(sys.argv[1]) if len(sys.argv) > 1 else 1210
    state = sys.argv[2] if len(sys.argv) > 2 else \
        f"{REPO}/target/giant_replay/state.json"
    base = f"{REPO}/target/giant_replay"
    cdir, odir = f"{base}/c{seed}", f"{base}/out{seed}"
    os.makedirs(base, exist_ok=True)
    os.environ["GRAFT_FUZZ_GIANT"] = "1"
    if not os.path.exists(f"{odir}/oracle_sql.json"):
        shutil.rmtree(cdir, ignore_errors=True)
        shutil.rmtree(odir, ignore_errors=True)
        dials = fuzz_diff.gen_corpus(random.Random(seed), cdir)
        print(f"[giant] seed={seed} dials={dials}", flush=True)
        r = subprocess.run(
            [f"{REPO}/tools/run_main.sh", "graft.Verify", cdir, odir],
            cwd=REPO, capture_output=True, text=True)
        verr = [l for l in (r.stdout + r.stderr).splitlines()
                if "[verify]" in l]
        for l in verr:
            print(f"[giant] {l}", flush=True)
        if not os.path.exists(f"{odir}/oracle_sql.json"):
            print("[giant] Verify produced no dump — aborting", flush=True)
            return 2
    # per-entry resumable oracle replay, NO walls (micro-corpus scale),
    # 20-min / 40 GB per-entry caps (a single giant-doc substr oracle
    # measured 30-40 min ÷ 271 entries spread, these caps flag true
    # outliers as TIMEOUT rows rather than hanging the sweep)
    env = dict(os.environ, GRAFT_REPLAY_WALLS="")
    rv = subprocess.run(
        [sys.executable, f"{REPO}/tools/replay_scale.py",
         cdir, odir, state, "1200", "40"], cwd=REPO, env=env)
    return rv.returncode


if __name__ == "__main__":
    sys.exit(main())
