#!/usr/bin/env python3
"""Resumable per-entry DuckDB oracle replay for above-bench scales
(round-9 verdict ask #1: the FULL contract verified at sf3, replay-grade).

Why not one check_local run: at 30x bench scale single oracles can take
tens of minutes or exhaust memory (round 8's walls: the recursive-CTE
connected-components and the wedge join needed 90+ GB / 74 GB spill).
This wrapper runs check_local.py ONE ENTRY AT A TIME in a subprocess
with an address-space cap and a timeout, records per-entry status in a
state file, and skips already-green entries on re-run — so a wall or a
crash costs one entry, not the sweep.

The two known oracle-resource walls (ext_triangle_count,
ext_embed_clusters) are excluded here and verified by
tools/check_sf3.py's structural / chunked-replay methods instead; any
NEW wall (TIMEOUT / MEMORY status in the state file) gets the same
treatment, not an asterisk.

Usage:
    python3 tools/replay_scale.py <sfDir> <dumpDir> <state.json> \
        [timeout_s] [mem_gb]

Dev-only tool (driver-side python); not part of the shipped library.
"""
import json
import os
import resource
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# GRAFT_REPLAY_WALLS overrides (comma list, empty = no exclusions):
# the two defaults are DuckDB resource walls AT sf3 SCALE ONLY — a
# giant-corpus micro replay (round-11 verdict ask #3) excludes nothing.
WALLS = set(filter(None, os.environ.get(
    "GRAFT_REPLAY_WALLS", "ext_triangle_count,ext_embed_clusters"
).split(",")))


def main():
    sf_dir, dump_dir, state_path = sys.argv[1:4]
    timeout = int(sys.argv[4]) if len(sys.argv) > 4 else 3600
    mem_gb = int(sys.argv[5]) if len(sys.argv) > 5 else 100
    oracle = json.load(open(f"{dump_dir}/oracle_sql.json"))
    state = {}
    if os.path.exists(state_path):
        state = json.load(open(state_path))

    def save():
        tmp = state_path + ".tmp"
        json.dump(state, open(tmp, "w"), indent=0, sort_keys=True)
        os.replace(tmp, state_path)

    def limits():
        cap = mem_gb * (1 << 30)
        resource.setrlimit(resource.RLIMIT_AS, (cap, cap))

    todo = [n for n in sorted(oracle)
            if n not in WALLS and not str(state.get(n, "")).startswith("OK")]
    print(f"[replay] {len(todo)} to run, {len(state)} in state, "
          f"{len(WALLS)} walls delegated to check_sf3", flush=True)
    for n in todo:
        t0 = time.time()
        try:
            r = subprocess.run(
                [sys.executable, f"{REPO}/tools/check_local.py",
                 sf_dir, dump_dir, n],
                capture_output=True, text=True, timeout=timeout,
                preexec_fn=limits)
            out = r.stdout
            line = next((l for l in out.splitlines()
                         if l.startswith(n)), "").strip()
            if f"== 1/1 oracle-checked OK" in out:
                state[n] = f"OK {time.time()-t0:.1f}s"
            elif r.returncode != 0 and "Error" in out + r.stderr \
                    and ("OutOfMemory" in out + r.stderr
                         or "memory" in (out + r.stderr).lower()):
                state[n] = f"MEMORY {time.time()-t0:.1f}s: {line[:200]}"
            else:
                state[n] = f"FAIL {time.time()-t0:.1f}s: {line[:300]}"
        except subprocess.TimeoutExpired:
            state[n] = f"TIMEOUT {timeout}s"
        save()
        print(f"[replay] {n}: {state[n]}", flush=True)
    for w in WALLS:
        state.setdefault(w, "WALL: verified by tools/check_sf3.py")
        save()
    ok = sum(1 for v in state.values() if str(v).startswith("OK"))
    walls = sum(1 for v in state.values() if str(v).startswith("WALL"))
    bad = {k: v for k, v in state.items()
           if not str(v).startswith(("OK", "WALL"))}
    print(f"[replay] done: {ok} OK, {walls} wall(s) delegated, "
          f"{len(bad)} problem(s)")
    for k, v in sorted(bad.items()):
        print(f"[replay] PROBLEM {k}: {v}")
    return 0 if not bad else 1


if __name__ == "__main__":
    sys.exit(main())
